package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Num
import QueryDef.tbl

/** Round-9 fifteenth batch: the EIGHT remaining TPC-H plan shapes, closing
  * the full 22-query suite (q88/89/98/99/100 + q249/250/251 + q257–q262
  * covered Q3/Q5/Q18/Q4/Q17/Q7/Q8/Q22/Q10/Q13/Q14/Q15/Q19/Q21). As with
  * the earlier batches, predicates are re-anchored on fixture columns (no
  * partsupp / shipmode / commit-receipt dates; supply cost is derived from
  * observed per-unit lineitem price) while the JOIN/SUBQUERY STRUCTURE —
  * what the optimizer is graded on at 100 TB — stays canonical:
  *
  *  - Q1 pricing summary: the wide 8-aggregate scan (sums + averages +
  *    count per flag/status) — one pass, partial-agg, no join.
  *  - Q2 min-cost supplier: correlated scalar MIN subquery over a shared
  *    CTE, 5-way dim chain, top-100. The decorrelation stress test.
  *  - Q6 forecast revenue delta: pure scan-filter-sum; the pushdown test.
  *  - Q9 product-type profit: 5-way star + LIKE filter + per-nation/year
  *    aggregation of a two-term profit expression.
  *  - Q11 important stock: grouped value vs a global-threshold scalar
  *    subquery over the SAME CTE (evaluate once, broadcast).
  *  - Q12 priority-by-lag: CASE-bucketed counts off one join; interval
  *    arithmetic (no engine-specific datediff) for the lag buckets.
  *  - Q16 supplier variety: COUNT(DISTINCT) per part attribute with a
  *    null-free NOT IN anti-subquery on the supplier blocklist.
  *  - Q20 qualified suppliers: two-level nested IN with a correlated
  *    HAVING aggregate — the semi-join pyramid.
  *
  * One SQL text runs verbatim on Spark and DuckDB (shared dialect; exact
  * DECIMAL money sums per the `Num.roundSql` recipe; averages are decimal
  * sums over counts, never engine-native AVG over doubles).
  */
object Extended49 {

  private def registerViews(s: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach(t => tbl(s, dir, t).createOrReplaceTempView(t))

  private def moneySum(e: String) =
    s"CAST(SUM(CAST(${Num.roundSql(e, 4)} AS DECIMAL(18,4))) AS DOUBLE)"

  private val revSum = moneySum("l_extendedprice * (1 - l_discount)")

  /** Q1: the pricing-summary report. Averages are exact-DECIMAL sums
    * divided by the group count (order-independent), then rounded — the
    * engine-native AVG over doubles would be summation-order noise.
    */
  private val sqlQ1 =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${moneySum("l_quantity")} AS sum_qty,
       |  ${moneySum("l_extendedprice")} AS sum_base_price,
       |  $revSum AS sum_disc_price,
       |  ${moneySum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       |  ${Num.roundSql(s"${moneySum("l_quantity")} / COUNT(*)", 4)} AS avg_qty,
       |  ${Num.roundSql(s"${moneySum("l_extendedprice")} / COUNT(*)", 4)} AS avg_price,
       |  ${Num.roundSql(s"${moneySum("l_discount")} / COUNT(*)", 6)} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= DATE '2001-06-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q2: for each STANDARD small part, the EUROPE supplier(s) matching the
    * region-wide minimum observed unit price. Supply cost is the minimum
    * per-unit lineitem price (fixtures carry no partsupp), rounded to 4 dp
    * so the scalar-subquery equality is exact across engines. The
    * correlated MIN subquery re-joins the same `ps` CTE through the
    * region dims — the decorrelation shape Q2 exists to test.
    */
  private val sqlQ2 =
    s"""WITH ps AS (
       |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
       |    MIN(${Num.roundSql("l_extendedprice / l_quantity", 4)}) AS supplycost
       |  FROM lineitem GROUP BY l_partkey, l_suppkey)
       |SELECT ${Num.roundSql("s_acctbal", 2)} AS s_acctbal_r, s_name, n_name,
       |  p_partkey, p_type, s_suppkey, supplycost
       |FROM part
       |JOIN ps ON p_partkey = ps.partkey
       |JOIN supplier ON s_suppkey = ps.suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
       |  AND supplycost = (
       |    SELECT MIN(ps2.supplycost)
       |    FROM ps ps2
       |    JOIN supplier s2 ON s2.s_suppkey = ps2.suppkey
       |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
       |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
       |    WHERE ps2.partkey = p_partkey AND r2.r_name = 'EUROPE')
       |ORDER BY s_acctbal_r DESC, n_name, s_name, p_partkey, s_suppkey
       |LIMIT 100""".stripMargin

  /** Q6: the forecast-revenue-change scan — filter + one money sum, no
    * join. The predicate must reach the parquet scan (PlanSpec pins the
    * pushed shipdate bound).
    */
  private val sqlQ6 =
    s"""SELECT ${moneySum("l_extendedprice * l_discount")} AS revenue,
       |  COUNT(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= DATE '1996-01-01'
       |  AND l_shipdate < DATE '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin

  /** Q9: per-nation/per-year profit on color-named parts. Profit = revenue
    * minus a 10%-of-retail unit-cost stand-in (no ps_supplycost in the
    * fixtures); both terms rounded into one DECIMAL-summed expression.
    */
  private val sqlQ9 =
    s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |  ${moneySum("l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity")} AS profit
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY n_name, year(o_orderdate)
       |ORDER BY nation, o_year DESC""".stripMargin

  /** Q11: parts whose EUROPE-shipped value exceeds 1.5× the mean part
    * value — the global-threshold scalar subquery over the same CTE.
    * Canonical Q11's fixed fraction is spec'd as 0.0001/SF (it shrinks
    * with scale); a mean-multiple is the SF-invariant equivalent, keeping
    * the query non-vacuous at every fixture size. The threshold re-sums
    * the already-rounded per-part values through DECIMAL so the scalar is
    * order-independent too. Region anchor, not nation: the sf0.001
    * fixture has suppliers in only 10 of the 25 nations.
    */
  private val sqlQ11 =
    s"""WITH val AS (
       |  SELECT l_partkey AS partkey, $revSum AS value
       |  FROM lineitem
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'EUROPE'
       |  GROUP BY l_partkey)
       |SELECT partkey, value FROM val
       |WHERE value > (
       |  SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) * 1.5 / COUNT(*)
       |  FROM val)
       |ORDER BY value DESC, partkey""".stripMargin

  /** Q12: high/low-priority line counts bucketed by ship lag. Lag buckets
    * use interval arithmetic (shared dialect) instead of datediff, whose
    * argument order differs between the engines.
    */
  private val sqlQ12 =
    s"""SELECT
       |  CASE WHEN l_shipdate < o_orderdate + INTERVAL 30 DAY THEN 'FAST'
       |       WHEN l_shipdate < o_orderdate + INTERVAL 60 DAY THEN 'MEDIUM'
       |       ELSE 'SLOW' END AS lag_bucket,
       |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 1 END) AS high_line_count,
       |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       |      THEN 1 END) AS low_line_count
       |FROM orders
       |JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY 1
       |ORDER BY lag_bucket""".stripMargin

  /** Q16: how many distinct suppliers serve each (brand, type, size) slice,
    * excluding blocklisted (negative-balance) suppliers via NOT IN — the
    * null-free anti-subquery shape (s_suppkey is a key, so the NOT IN
    * null trap cannot fire and both engines plan a plain anti join).
    */
  private val sqlQ16 =
    s"""SELECT p_brand, p_type, p_size,
       |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO' AND p_size <= 25
       |  AND l_suppkey NOT IN (
       |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20: suppliers that shipped a meaningful volume of PROMO-type parts
    * in 1996 — the two-level nested IN whose inner query carries its own
    * grouped HAVING (sum of integral quantities: exact in doubles).
    */
  private val sqlQ20 =
    s"""SELECT s_suppkey, s_name
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
       |  AND s_suppkey IN (
       |    SELECT l_suppkey FROM lineitem
       |    WHERE l_partkey IN (
       |        SELECT p_partkey FROM part WHERE p_type = 'PROMO')
       |      AND l_shipdate >= DATE '1996-01-01'
       |      AND l_shipdate < DATE '1997-01-01'
       |    GROUP BY l_suppkey
       |    HAVING SUM(l_quantity) > 100)
       |ORDER BY s_suppkey""".stripMargin

  private def sqlShape(name: String, sql: String, tables: Seq[String]): QueryDef =
    QueryDef(
      name,
      (s, dir) => { registerViews(s, dir, tables); s.sql(sql) },
      Some(sql))

  val all: Seq[QueryDef] = Seq(
    sqlShape("q275_sql_q1", sqlQ1, Seq("lineitem")),
    sqlShape("q276_sql_q2", sqlQ2,
      Seq("part", "lineitem", "supplier", "nation", "region")),
    sqlShape("q277_sql_q6", sqlQ6, Seq("lineitem")),
    sqlShape("q278_sql_q9", sqlQ9,
      Seq("lineitem", "part", "supplier", "orders", "nation")),
    sqlShape("q279_sql_q11", sqlQ11,
      Seq("lineitem", "supplier", "nation", "region")),
    sqlShape("q280_sql_q12", sqlQ12, Seq("orders", "lineitem")),
    sqlShape("q281_sql_q16", sqlQ16, Seq("lineitem", "part", "supplier")),
    sqlShape("q282_sql_q20", sqlQ20,
      Seq("supplier", "nation", "lineitem", "part"))
  )
}
