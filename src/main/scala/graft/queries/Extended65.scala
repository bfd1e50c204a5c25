package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Num
import QueryDef.tbl

/** Round-11 batch 5: q320 — declarative data-quality suite (the Deequ
  * posture: constraints are DATA, not code). The battery has point
  * checks (q14 validation gate, q84 profile, q162 FD check, q197 FK
  * audit); production pipelines run a RULE TABLE over each ingested
  * batch and gate on the readout. Five constraint families over orders:
  * completeness, key uniqueness, numeric range, set membership, and
  * referential integrity — the first four computed in ONE scan (a
  * single multi-metric aggregate, no per-rule passes), RI as one
  * broadcast-able anti-join count. The readout (rule, metric, threshold,
  * passed) is itself the oracled result, so the engine's evaluation —
  * not a summary of it — sits under the hash gate.
  *
  * Scale shape: metrics scan orders once (map-side combined aggregate);
  * the RI check is a LEFT ANTI count against the customer key set (at
  * 100 TB: a shuffled semi-join or q74's bloom prefilter); the rule
  * assembly is a union of 1-row selects off the broadcast metric row.
  */
object Extended65 {

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q320_quality_suite",
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        val statuses = Seq("O", "F", "P")
        // ONE pass: every single-table metric from the same aggregate
        val m = o.agg(
          count(lit(1)).as("n"),
          count(col("o_custkey")).as("nn_cust"),
          count(col("o_orderdate")).as("nn_date"),
          countDistinct(col("o_orderkey")).as("nd_key"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          count(when(col("o_orderstatus").isin(statuses.map(x => x: Any): _*), lit(1)))
            .as("n_status_ok"))
        // RI: order custkeys that do not resolve to a customer
        val orphans = o.select(col("o_custkey"))
          .join(tbl(s, dir, "customer").select(col("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        val r = broadcast(m).crossJoin(broadcast(orphans))
        val nD = col("n").cast("double")
        def rule(id: String, metric: org.apache.spark.sql.Column,
                 threshold: Double, pass: org.apache.spark.sql.Column) =
          r.select(lit(id).as("rule_id"),
            Num.roundTo(metric, 6).as("metric_r"),
            lit(threshold).as("threshold"), pass.as("passed"))
        rule("completeness_custkey", col("nn_cust").cast("double") / nD, 1.0,
            col("nn_cust") === col("n"))
          .unionAll(rule("completeness_orderdate", col("nn_date").cast("double") / nD, 1.0,
            col("nn_date") === col("n")))
          .unionAll(rule("unique_orderkey", col("nd_key").cast("double") / nD, 1.0,
            col("nd_key") === col("n")))
          .unionAll(rule("range_totalprice_min", col("min_price").cast("double"), 0.0,
            col("min_price") > 0.0))
          .unionAll(rule("range_totalprice_max", col("max_price").cast("double"), 600000.0,
            col("max_price") <= 600000.0))
          .unionAll(rule("set_orderstatus", col("n_status_ok").cast("double") / nD, 1.0,
            col("n_status_ok") === col("n")))
          .unionAll(rule("fk_custkey_resolves", col("n_orphans").cast("double"), 0.0,
            col("n_orphans") === 0L))
          .orderBy("rule_id")
      },
      Some(s"""WITH m AS (
              |  SELECT count(*) AS n,
              |    count(o_custkey) AS nn_cust,
              |    count(o_orderdate) AS nn_date,
              |    count(DISTINCT o_orderkey) AS nd_key,
              |    min(o_totalprice) AS min_price,
              |    max(o_totalprice) AS max_price,
              |    count(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END) AS n_status_ok
              |  FROM orders),
              |ri AS (
              |  SELECT count(*) AS n_orphans FROM orders o
              |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
              |r AS (SELECT * FROM m CROSS JOIN ri),
              |rules AS (
              |  SELECT 'completeness_custkey' AS rule_id,
              |    ${Num.roundSql("CAST(nn_cust AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS metric_r,
              |    CAST(1.0 AS DOUBLE) AS threshold, nn_cust = n AS passed FROM r
              |  UNION ALL SELECT 'completeness_orderdate',
              |    ${Num.roundSql("CAST(nn_date AS DOUBLE) / CAST(n AS DOUBLE)", 6)},
              |    CAST(1.0 AS DOUBLE), nn_date = n FROM r
              |  UNION ALL SELECT 'unique_orderkey',
              |    ${Num.roundSql("CAST(nd_key AS DOUBLE) / CAST(n AS DOUBLE)", 6)},
              |    CAST(1.0 AS DOUBLE), nd_key = n FROM r
              |  UNION ALL SELECT 'range_totalprice_min',
              |    ${Num.roundSql("CAST(min_price AS DOUBLE)", 6)}, CAST(0.0 AS DOUBLE), min_price > 0.0 FROM r
              |  UNION ALL SELECT 'range_totalprice_max',
              |    ${Num.roundSql("CAST(max_price AS DOUBLE)", 6)}, CAST(600000.0 AS DOUBLE),
              |    max_price <= 600000.0 FROM r
              |  UNION ALL SELECT 'set_orderstatus',
              |    ${Num.roundSql("CAST(n_status_ok AS DOUBLE) / CAST(n AS DOUBLE)", 6)},
              |    CAST(1.0 AS DOUBLE), n_status_ok = n FROM r
              |  UNION ALL SELECT 'fk_custkey_resolves',
              |    ${Num.roundSql("CAST(n_orphans AS DOUBLE)", 6)}, CAST(0.0 AS DOUBLE), n_orphans = 0 FROM r)
              |SELECT rule_id, metric_r, threshold, passed
              |FROM rules ORDER BY rule_id""".stripMargin))
  )
}
