package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-8 fifth batch: four operability/audit shapes the first 195
  * queries do not cover — mutual information between two categoricals
  * (the information-theoretic association measure beside q192's χ²), a
  * referential-integrity audit across four FK relations (orphans,
  * childless parents, fan-out — the warehouse health check), id-space gap
  * detection after deletions (bucketed, no global sort), and an I-MR
  * statistical process control chart (the monitoring shape behind every
  * "metric out of bounds" alert).
  *
  * Determinism follows the house contract (QueryDef scaladoc); ln terms
  * use q127's rounded-term parity pattern; SPC constants are inlined
  * E-notation literals shared by both engines.
  */
object Extended21 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q198: ids per bucket. Within-bucket gaps come from partitioned lag
    * windows; cross-bucket gaps from a lag over the buckets relation —
    * 2^10× smaller than the id space, so nothing global ever sorts rows.
    */
  private val Bucket = 1024L

  /** q198/q197: deterministic "retention delete" / partial-extract filter
    * — md5 hex first char '0' drops ≈ 1/16 of keys, like q75's sampling.
    */
  private def keepSql(col_ : String) =
    s"substr(md5(CAST($col_ AS STRING)), 1, 1) <> '0'" // STRING: valid in Spark AND a VARCHAR alias in DuckDB

  /** q199: I-MR chart constants (3/d2 with d2 = 1.128 for n = 2),
    * inlined identically in both engines.
    */
  private val Imr = "2.66E0"

  val all: Seq[QueryDef] = Seq(

    // ----- q196: mutual information between two categoricals ------------
    // MI(event type; day-of-week) plus marginal entropies and normalized
    // MI — the strength-of-association companion to q192's χ²
    // significance test (χ² says "is there association"; MI says "how
    // many bits"). Same engine-neutral dow and full-margin windows as
    // q192; every ln term is rounded to 12 decimals and accumulated as
    // DECIMAL (q127's parity pattern), so cross-libm ULP noise cannot
    // reach the hash. Zero cells contribute zero MI on both engines by
    // omission. One scan, one ≤35-row cell relation, constant-size work.
    QueryDef(
      "q196_mutual_info",
      (s, dir) => {
        val dec = DecimalType(24, 12)
        val cnt = tbl(s, dir, "events")
          .select(col("event_type").as("et"),
            (datediff(to_date(col("ts")), lit("1970-01-01")) + 4).cast("long")
              .mod(7).as("dow"))
          .groupBy(col("et"), col("dow"))
          .agg(count(lit(1)).as("o"))
          .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("et"))))
          .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("dow"))))
          .withColumn("n", sum(col("o")).over(Window.partitionBy()))
        val miT = R(col("o").cast("double") / col("n").cast("double") *
          log((col("o") * col("n")).cast("double") /
            (col("rt") * col("ct")).cast("double")), 12).cast(dec)
        // marginal entropy terms, each counted once via the first cell of
        // its row/column (rank-1 guard keeps the sum over DISTINCT margins)
        val wEt = Window.partitionBy(col("et")).orderBy(col("dow"))
        val wDow = Window.partitionBy(col("dow")).orderBy(col("et"))
        val hEtT = when(row_number().over(wEt) === 1,
          R(lit(-1.0) * col("rt").cast("double") / col("n").cast("double") *
            log(col("rt").cast("double") / col("n").cast("double")), 12)
            .cast(dec))
        val hDowT = when(row_number().over(wDow) === 1,
          R(lit(-1.0) * col("ct").cast("double") / col("n").cast("double") *
            log(col("ct").cast("double") / col("n").cast("double")), 12)
            .cast(dec))
        cnt.select(col("n"), miT.as("mi_t"), hEtT.as("het_t"), hDowT.as("hdow_t"))
          .groupBy()
          .agg(max(col("n")).as("n"),
            sum(col("mi_t")).as("mi"),
            sum(col("het_t")).as("het"),
            sum(col("hdow_t")).as("hdow"))
          .select(col("n"),
            R(col("het").cast("double"), 6).as("h_type_r"),
            R(col("hdow").cast("double"), 6).as("h_dow_r"),
            R(col("mi").cast("double"), 6).as("mi_r"),
            R(col("mi").cast("double") /
              sqrt(col("het").cast("double") * col("hdow").cast("double")), 6)
              .as("nmi_r"))
      },
      Some(s"""WITH src AS (
              |  SELECT event_type AS et,
              |    ((CAST(ts AS DATE) - DATE '1970-01-01') + 4) % 7 AS dow
              |  FROM events),
              |cnt AS (SELECT et, dow, count(*) AS o FROM src GROUP BY 1, 2),
              |w AS (
              |  SELECT *,
              |    CAST(sum(o) OVER (PARTITION BY et) AS BIGINT) AS rt,
              |    CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS ct,
              |    CAST(sum(o) OVER () AS BIGINT) AS n,
              |    row_number() OVER (PARTITION BY et ORDER BY dow) AS ret,
              |    row_number() OVER (PARTITION BY dow ORDER BY et) AS rdow
              |  FROM cnt),
              |t AS (
              |  SELECT n,
              |    CAST(${rs("CAST(o AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST(o * n AS DOUBLE) / CAST(rt * ct AS DOUBLE))", 12)} AS DECIMAL(24,12)) AS mi_t,
              |    CASE WHEN ret = 1 THEN CAST(${rs("-1E0 * CAST(rt AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE))", 12)} AS DECIMAL(24,12)) END AS het_t,
              |    CASE WHEN rdow = 1 THEN CAST(${rs("-1E0 * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))", 12)} AS DECIMAL(24,12)) END AS hdow_t
              |  FROM w)
              |SELECT max(n) AS n,
              |  ${rs("CAST(sum(het_t) AS DOUBLE)", 6)} AS h_type_r,
              |  ${rs("CAST(sum(hdow_t) AS DOUBLE)", 6)} AS h_dow_r,
              |  ${rs("CAST(sum(mi_t) AS DOUBLE)", 6)} AS mi_r,
              |  ${rs("CAST(sum(mi_t) AS DOUBLE) / sqrt(CAST(sum(het_t) AS DOUBLE) * CAST(sum(hdow_t) AS DOUBLE))", 6)} AS nmi_r
              |FROM t""".stripMargin)),

    // ----- q197: referential-integrity (FK) audit -----------------------
    // One report over four FK relations: orphaned children (fact rows
    // whose key has no parent), childless parents, referenced-parent
    // coverage, and fan-out statistics — the data-quality join profile
    // run before trusting any star join. Three arms audit the fixture's
    // real FKs (clean by construction — the zeros ARE the finding); the
    // fourth audits orders against a PARTIAL customer extract (md5-keyed
    // ~15/16 sample), the incremental-dim-load scenario where orphans
    // actually appear. Shape per arm: child hash agg to key counts (the
    // only data-sized shuffle; partial agg absorbs it), then a key-level
    // full outer join against the parent key set. Output is 4 rows.
    QueryDef(
      "q197_fk_audit",
      (s, dir) => {
        def audit(name: String, child: DataFrame, parent: DataFrame): DataFrame = {
          val ck = child.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
          val j = ck.join(parent.select(col("k"), lit(1).as("isp")).distinct(),
            Seq("k"), "full_outer")
          j.groupBy()
            .agg(
              coalesce(sum(col("cnt")), lit(0L)).as("n_child"),
              coalesce(sum(when(col("isp").isNull, col("cnt"))), lit(0L))
                .as("n_orphan"),
              sum(when(col("isp").isNotNull, 1L)).as("n_parent"),
              sum(when(col("isp").isNotNull && col("cnt").isNotNull, 1L))
                .as("n_referenced"),
              coalesce(sum(when(col("isp").isNotNull && col("cnt").isNull, 1L)),
                lit(0L)).as("n_childless"),
              coalesce(max(when(col("isp").isNotNull, col("cnt"))), lit(0L))
                .as("max_fanout"),
              coalesce(sum(when(col("isp").isNotNull, col("cnt"))), lit(0L))
                .as("ref_rows"))
            .select(lit(name).as("relation"), col("n_child"), col("n_orphan"),
              col("n_parent"), col("n_referenced"), col("n_childless"),
              col("max_fanout"),
              R(col("ref_rows").cast("double") /
                when(col("n_referenced") === 0, lit(null))
                  .otherwise(col("n_referenced")).cast("double"), 4)
                .as("avg_fanout_r"))
        }
        val li = tbl(s, dir, "lineitem")
        val o = tbl(s, dir, "orders")
        audit("lineitem->orders",
            li.select(col("l_orderkey").as("k")),
            o.select(col("o_orderkey").as("k")))
          .unionAll(audit("lineitem->part",
            li.select(col("l_partkey").as("k")),
            tbl(s, dir, "part").select(col("p_partkey").as("k"))))
          .unionAll(audit("orders->customer",
            o.select(col("o_custkey").as("k")),
            tbl(s, dir, "customer").select(col("c_custkey").as("k"))))
          .unionAll(audit("orders->customer_extract",
            o.select(col("o_custkey").as("k")),
            tbl(s, dir, "customer").select(col("c_custkey").as("k"))
              .filter(expr(keepSql("k")))))
          .orderBy("relation")
      },
      Some {
        def arm(name: String, childSql: String, parentSql: String) =
          s"""SELECT '$name' AS relation,
             |  CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_child,
             |  CAST(coalesce(sum(CASE WHEN isp IS NULL THEN cnt END), 0) AS BIGINT) AS n_orphan,
             |  CAST(count(CASE WHEN isp IS NOT NULL THEN 1 END) AS BIGINT) AS n_parent,
             |  CAST(count(CASE WHEN isp IS NOT NULL AND cnt IS NOT NULL THEN 1 END) AS BIGINT) AS n_referenced,
             |  CAST(count(CASE WHEN isp IS NOT NULL AND cnt IS NULL THEN 1 END) AS BIGINT) AS n_childless,
             |  CAST(coalesce(max(CASE WHEN isp IS NOT NULL THEN cnt END), 0) AS BIGINT) AS max_fanout,
             |  ${rs("CAST(coalesce(sum(CASE WHEN isp IS NOT NULL THEN cnt END), 0) AS DOUBLE) / CAST(nullif(count(CASE WHEN isp IS NOT NULL AND cnt IS NOT NULL THEN 1 END), 0) AS DOUBLE)", 4)} AS avg_fanout_r
             |FROM (
             |  SELECT * FROM
             |    (SELECT k, count(*) AS cnt FROM ($childSql) c GROUP BY 1) ck
             |  FULL OUTER JOIN
             |    (SELECT DISTINCT k, 1 AS isp FROM ($parentSql) p) pk
             |  USING (k))""".stripMargin
        arm("lineitem->orders",
          "SELECT l_orderkey AS k FROM lineitem",
          "SELECT o_orderkey AS k FROM orders") +
          "\nUNION ALL\n" +
          arm("lineitem->part",
            "SELECT l_partkey AS k FROM lineitem",
            "SELECT p_partkey AS k FROM part") +
          "\nUNION ALL\n" +
          arm("orders->customer",
            "SELECT o_custkey AS k FROM orders",
            "SELECT c_custkey AS k FROM customer") +
          "\nUNION ALL\n" +
          arm("orders->customer_extract",
            "SELECT o_custkey AS k FROM orders",
            s"SELECT c_custkey AS k FROM customer WHERE ${keepSql("c_custkey")}") +
          "\nORDER BY 1"
      }),

    // ----- q198: id-space gap detection (bucketed, no global sort) ------
    // After a deterministic retention delete (md5-keyed, ≈1/16 of ids),
    // find the largest holes in the event_id space — the sequence audit
    // that catches failed ingests and over-eager deletes. The scale
    // design: ids hash into Bucket-sized partitions; WITHIN-bucket gaps
    // come from a PARTITIONED lag window (distributes). CROSS-bucket gaps
    // need each bucket's PREDECESSOR max — and because bucket max ids are
    // strictly increasing in the bucket id, lag(max) over present buckets
    // ≡ the exclusive running MAX, which PrefixSum.exclusiveMaxLong
    // computes with NO single-task stage at all (coarse bucket-id cells +
    // a ≤64-row driver-side cell rollup + per-cell windows — correct even
    // when intermediate buckets are entirely deleted, where a naive
    // `join on b−1` would drop the gap). The final top-10 runs as
    // TakeOrderedAndProject and only the 10 survivors see a rank window.
    // Pure integer arithmetic throughout.
    QueryDef(
      "q198_id_gaps",
      (s, dir) => {
        val kept = tbl(s, dir, "events")
          .select(col("event_id").as("id"))
          .filter(expr(keepSql("id")))
          .withColumn("b", (col("id") / Bucket).cast("long"))
        val wIn = Window.partitionBy(col("b")).orderBy(col("id"))
        val inGaps = kept
          .withColumn("p", lag(col("id"), 1).over(wIn))
          .filter(col("p").isNotNull && col("id") - col("p") > 1)
          .select((col("p") + 1).as("gap_start"), (col("id") - 1).as("gap_end"))
        val bkt = kept.groupBy(col("b"))
          .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
        // mx strictly increases with b, so lag(mx) ≡ exclusive prefix max
        val xGaps = graft.ops.PrefixSum.exclusiveMaxLong(
            bkt, col("b"), Nil, col("mx"), "pmx")
          .filter(col("pmx").isNotNull && col("mn") - col("pmx") > 1)
          .select((col("pmx") + 1).as("gap_start"), (col("mn") - 1).as("gap_end"))
        val gaps = inGaps.unionAll(xGaps)
          .withColumn("gap_len", col("gap_end") - col("gap_start") + 1)
        // top-10 via TakeOrderedAndProject FIRST (distributed top-k over
        // the data-sized gaps relation), THEN rank the 10 survivors —
        // same total order, so ranks are identical to a global
        // rank-filter, without a partition-less window over all gaps
        gaps
          .orderBy(col("gap_len").desc, col("gap_start"))
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("gap_len").desc, col("gap_start"))).cast("long"))
          .select(col("rank"), col("gap_start"), col("gap_end"), col("gap_len"))
          .orderBy("rank")
      },
      Some(s"""WITH kept AS (
              |  SELECT event_id AS id, event_id // $Bucket AS b
              |  FROM events WHERE ${keepSql("event_id")}),
              |ing AS (
              |  SELECT id, lag(id) OVER (PARTITION BY b ORDER BY id) AS p
              |  FROM kept),
              |in_gaps AS (
              |  SELECT p + 1 AS gap_start, id - 1 AS gap_end FROM ing
              |  WHERE p IS NOT NULL AND id - p > 1),
              |bkt AS (
              |  SELECT b, min(id) AS mn, max(id) AS mx FROM kept GROUP BY 1),
              |bg AS (
              |  SELECT mn, lag(mx) OVER (ORDER BY b) AS pmx FROM bkt),
              |x_gaps AS (
              |  SELECT pmx + 1 AS gap_start, mn - 1 AS gap_end FROM bg
              |  WHERE pmx IS NOT NULL AND mn - pmx > 1),
              |gaps AS (
              |  SELECT *, gap_end - gap_start + 1 AS gap_len FROM
              |    (SELECT * FROM in_gaps UNION ALL SELECT * FROM x_gaps) u),
              |rk AS (
              |  SELECT *, row_number() OVER (ORDER BY gap_len DESC, gap_start) AS rank
              |  FROM gaps)
              |SELECT CAST(rank AS BIGINT) AS rank, gap_start, gap_end, gap_len
              |FROM rk WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // ----- q199: I-MR statistical process control chart -----------------
    // Shewhart individuals chart on each type's daily revenue: center
    // line, moving-range-estimated 3σ limits (UCL/LCL = x̄ ± 2.66·MR̄),
    // and the out-of-control day counts — the SPC monitoring shape
    // behind automated metric alerts (q180 detects sustained drift; this
    // flags individual excursions). Exactness: daily revenue and moving
    // ranges are DECIMAL (exact); the limits are one shared IEEE
    // expression; counting excursions compares each exact DECIMAL daily
    // value against the double limits identically on both engines.
    // Shape: one hash agg, lag + aggregate windows over the
    // calendar-bounded daily relation.
    QueryDef(
      "q199_control_chart",
      (s, dir) => {
        val daily = tbl(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(R(col("value"), 4).cast(DecimalType(18, 4))).as("x"))
        val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val mr = daily
          .withColumn("prev", lag(col("x"), 1).over(wOrd))
          .withColumn("mrv", abs(col("x") - col("prev")))
        val g = mr.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("x")).as("sx"),
            sum(col("mrv")).as("smr"),
            count(col("mrv")).as("nmr"))
          .withColumn("center", col("sx").cast("double") / col("n_days"))
          .withColumn("mrbar", col("smr").cast("double") / col("nmr"))
          .withColumn("ucl", col("center") + expr(Imr) * col("mrbar"))
          .withColumn("lcl", col("center") - expr(Imr) * col("mrbar"))
        daily.join(g.select(col("event_type").as("et2"), col("n_days"),
            col("center"), col("ucl"), col("lcl")),
            col("event_type") === col("et2"))
          .groupBy(col("event_type"))
          .agg(max(col("n_days")).as("n_days"),
            max(R(col("center"), 4)).as("center_r"),
            max(R(col("ucl"), 4)).as("ucl_r"),
            max(R(col("lcl"), 4)).as("lcl_r"),
            sum(when(col("x").cast("double") > col("ucl"), 1L).otherwise(0L))
              .as("n_above"),
            sum(when(col("x").cast("double") < col("lcl"), 1L).otherwise(0L))
              .as("n_below"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, CAST(ts AS DATE) AS day,
              |    sum(CAST(${rs("value", 4)} AS DECIMAL(18,4))) AS x
              |  FROM events GROUP BY 1, 2),
              |mr AS (
              |  SELECT *, abs(x - lag(x) OVER (PARTITION BY event_type
              |    ORDER BY day)) AS mrv
              |  FROM daily),
              |g AS (
              |  SELECT event_type, count(*) AS n_days,
              |    CAST(sum(x) AS DOUBLE) / count(*) AS center,
              |    CAST(sum(mrv) AS DOUBLE) / count(mrv) AS mrbar
              |  FROM mr GROUP BY 1),
              |g2 AS (
              |  SELECT *, center + $Imr * mrbar AS ucl,
              |    center - $Imr * mrbar AS lcl
              |  FROM g)
              |SELECT daily.event_type, max(n_days) AS n_days,
              |  max(${rs("center", 4)}) AS center_r,
              |  max(${rs("ucl", 4)}) AS ucl_r,
              |  max(${rs("lcl", 4)}) AS lcl_r,
              |  CAST(sum(CASE WHEN CAST(x AS DOUBLE) > ucl THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
              |  CAST(sum(CASE WHEN CAST(x AS DOUBLE) < lcl THEN 1 ELSE 0 END) AS BIGINT) AS n_below
              |FROM daily JOIN g2 ON g2.event_type = daily.event_type
              |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
