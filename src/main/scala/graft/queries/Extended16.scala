package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.Num
import QueryDef.tbl

/** Round-7 sixth batch: two classic warehouse shapes the first 176 queries
  * do not cover — recursive-hierarchy subtree rollup (org-chart / BOM
  * aggregation) and day-weighted interval proration (revenue recognition).
  * Both are engineered to need ZERO iteration: the hierarchy is walked by
  * bounded-depth path enumeration (a map-side explode, one shuffle) and
  * the proration allocates in exact integer micro-dollar space so monthly
  * sums are order-independent BIGINT arithmetic on both engines.
  */
object Extended16 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q177: max hierarchy depth — custkeys are contiguous from 1, so 13
    * decimal digits covers any SF the fixtures can reach (custkey < 1e13).
    */
  private val MaxDepth = 13

  /** q178: service term in days — 30 + orderkey mod 60, spreading each
    * order across 1–4 calendar months deterministically on both engines.
    */
  private val TermSql = "30 + o_orderkey % 60"

  val all: Seq[QueryDef] = Seq(

    // ----- q177: hierarchy subtree rollup (path-enumeration) ------------
    // Subtree aggregation over a forest — the org-chart / bill-of-
    // materials rollup: every node reports the node count, order count,
    // and revenue of its ENTIRE subtree, plus its share of its root's
    // revenue. The hierarchy is the decimal-digit forest over custkeys
    // (parent(c) = c div 10, roots 1..9): contiguous keys make every
    // ancestor a real node, and depth is bounded by digit count. The
    // scale-shaped trick: instead of an iterative parent-pointer loop
    // (depth × shuffles), each leaf EXPLODES its full ancestor path —
    // floor(c/10^i) for i in 0..12, a map-side 13× fan-out with no
    // shuffle — and one hash aggregate on the ancestor key produces every
    // subtree total at once. The report's node_id < 1000 bound is pushed
    // BELOW the aggregate (subtree totals only need the surviving
    // ancestor rows), capping the post-explode state at 999 groups at ANY
    // data scale; root shares then come from one window over that
    // bounded relation — the whole query is one scan, one tiny shuffle,
    // no join. (A naive roots self-join re-scanned orders: column
    // pruning specializes the two subplans so ReuseExchange cannot fire.)
    QueryDef(
      "q177_hierarchy_rollup",
      (s, dir) => {
        // per-customer measure: order count + exact cent revenue (the
        // half-up-at-cents formula is IEEE-identical on both engines)
        val cm = tbl(s, dir, "customer").select(col("c_custkey").as("c"))
          .join(tbl(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents")),
            col("c") === col("o_custkey"), "left")
          .groupBy(col("c"))
          .agg(count(col("o_orderkey")).as("no"),
            coalesce(sum(col("cents")), lit(0L)).as("cents"))
        // bounded-depth ancestor enumeration: 13 rows per leaf, map-side
        val pows = array((0 until MaxDepth).map(i =>
          lit(math.pow(10, i.toDouble).toLong)): _*)
        val anc = cm.select(col("c"), col("no"), col("cents"),
            explode(pows).as("p"))
          .select(floor(col("c") / col("p")).cast("long").as("node"),
            col("no"), col("cents"))
          .filter(col("node").between(1, 999))
        val sub = anc.groupBy(col("node"))
          .agg(count(lit(1)).as("n_desc"), sum(col("no")).as("n_orders"),
            sum(col("cents")).as("cents"))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy(substring(col("node").cast("string"), 1, 1))
        sub
          .withColumn("rcents",
            max(when(col("node") < 10, col("cents"))).over(wr))
          .select(col("node").as("node_id"),
            (length(col("node").cast("string")) - 1).cast("long").as("depth"),
            col("n_desc"), col("n_orders"),
            R(col("cents").cast("double") / 100.0, 2).as("rev_subtree_r"),
            R(col("cents").cast("double") /
              when(col("rcents") === 0, lit(null)).otherwise(col("rcents"))
                .cast("double"), 6).as("share_of_root_r"))
          .orderBy("node_id")
      },
      Some(s"""WITH cm AS (
              |  SELECT c.c_custkey AS c, count(o.o_orderkey) AS no,
              |    coalesce(CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT), 0) AS cents
              |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
              |  GROUP BY 1),
              |anc AS (
              |  SELECT CAST(floor(c / p) AS BIGINT) AS node, no, cents
              |  FROM cm CROSS JOIN (
              |    SELECT CAST(power(10, i) AS BIGINT) AS p FROM range(0, $MaxDepth) r(i)) pw
              |  WHERE floor(c / p) BETWEEN 1 AND 999),
              |sub AS (
              |  SELECT node, count(*) AS n_desc, CAST(sum(no) AS BIGINT) AS n_orders,
              |         CAST(sum(cents) AS BIGINT) AS cents
              |  FROM anc GROUP BY 1),
              |w AS (
              |  SELECT *, max(CASE WHEN node < 10 THEN cents END)
              |    OVER (PARTITION BY substr(CAST(node AS VARCHAR), 1, 1)) AS rcents
              |  FROM sub)
              |SELECT node AS node_id,
              |  CAST(length(CAST(node AS VARCHAR)) - 1 AS BIGINT) AS depth,
              |  n_desc, n_orders,
              |  ${rs("CAST(cents AS DOUBLE) / 100.0", 2)} AS rev_subtree_r,
              |  ${rs("CAST(cents AS DOUBLE) / CAST(nullif(rcents, 0) AS DOUBLE)", 6)} AS share_of_root_r
              |FROM w
              |ORDER BY node_id""".stripMargin)),

    // ----- q178: interval proration / revenue recognition ---------------
    // Spread each order's value day-weighted across the calendar months
    // its service term covers — the accrual-accounting recognition
    // schedule (also the billing/utilization proration shape). Exactness
    // design: the per-month allocation is floor(price_micro$ × overlap /
    // term) in pure BIGINT arithmetic — identical in any engine, and the
    // monthly rollup is a BIGINT sum, so no float summation order can
    // flip the hash; the only float ops are the two final display
    // divisions. Shape: one orders scan, a map-side months explode (1–4
    // rows per order, bounded by the 89-day max term), one hash agg on
    // month, grand total via one window over the calendar-bounded
    // monthly relation. Partial aggregation absorbs the
    // fan-out map-side; at 100 TB this is a single shuffle keyed on ~no.
    // of months — with AQE coalescing the tiny post-agg side.
    QueryDef(
      "q178_interval_proration",
      (s, dir) => {
        val o = tbl(s, dir, "orders").select(
          col("o_orderkey"),
          col("o_orderdate").cast("date").as("d0"),
          (lit(30) + col("o_orderkey") % 60).cast("int").as("term"),
          (floor(col("o_totalprice") * 100 + 0.5).cast("long") * 10000L).as("pu"))
          .withColumn("d1", expr("date_add(d0, term)")) // exclusive end
        val m = o.select(col("o_orderkey"), col("d0"), col("d1"), col("term"), col("pu"),
            explode(sequence(trunc(col("d0"), "MM"),
              trunc(expr("date_sub(d1, 1)"), "MM"),
              expr("interval 1 month"))).as("ms"))
          .withColumn("me", expr("add_months(ms, 1)"))
          .withColumn("ovl",
            datediff(least(col("me"), col("d1")), greatest(col("ms"), col("d0")))
              .cast("long"))
          .withColumn("alloc", expr("pu * ovl div term"))
        val monthly = m.groupBy(date_format(col("ms"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n_orders"), sum(col("ovl")).as("days_covered"),
            sum(col("alloc")).as("au"))
        // grand total as an unpartitioned window: monthly is bounded by
        // the CALENDAR span (~10² rows at any data scale), so the single-
        // partition window is safe — and it avoids the total-side re-scan
        // a crossJoin(broadcast(agg)) would do (pruning blocks ReuseExchange)
        monthly
          .withColumn("tu",
            sum(col("au")).over(org.apache.spark.sql.expressions.Window
              .partitionBy()))
          .select(col("month"), col("n_orders"), col("days_covered"),
            R(col("au").cast("double") / 1e6, 4).as("rev_recognized_r"),
            R(col("au").cast("double") / col("tu").cast("double"), 6).as("share_r"))
          .orderBy("month")
      },
      Some(s"""WITH o AS (
              |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
              |    CAST($TermSql AS INTEGER) AS term,
              |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 10000 AS pu
              |  FROM orders),
              |o2 AS (SELECT *, d0 + term AS d1 FROM o),
              |m AS (
              |  SELECT o_orderkey, d0, d1, term, pu,
              |    CAST(unnest(generate_series(
              |      CAST(date_trunc('month', d0) AS DATE),
              |      CAST(date_trunc('month', d1 - 1) AS DATE),
              |      INTERVAL 1 MONTH)) AS DATE) AS ms
              |  FROM o2),
              |m2 AS (
              |  SELECT *, CAST((ms + INTERVAL 1 MONTH) AS DATE) AS me FROM m),
              |m3 AS (
              |  SELECT strftime(ms, '%Y-%m') AS month,
              |    CAST(least(me, d1) - greatest(ms, d0) AS BIGINT) AS ovl,
              |    pu, term
              |  FROM m2),
              |monthly AS (
              |  SELECT month, count(*) AS n_orders,
              |    CAST(sum(ovl) AS BIGINT) AS days_covered,
              |    CAST(sum(pu * ovl // term) AS BIGINT) AS au
              |  FROM m3 GROUP BY 1),
              |w AS (SELECT *, CAST(sum(au) OVER () AS BIGINT) AS tu FROM monthly)
              |SELECT month, n_orders, days_covered,
              |  ${rs("CAST(au AS DOUBLE) / 1e6", 4)} AS rev_recognized_r,
              |  ${rs("CAST(au AS DOUBLE) / CAST(tu AS DOUBLE)", 6)} AS share_r
              |FROM w
              |ORDER BY month""".stripMargin))
  )
}
