package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Num
import QueryDef.tbl

/** Window-function battery (target-spec §7.2-5): ranking with
  * deterministic tiebreaks, lag deltas, rolling frames — plus the
  * aggregation extensions (count-distinct, approx sketches, rollup).
  *
  * Every window is partitioned on a real key (custkey / suppkey), so at
  * scale each partition sorts independently after one hash shuffle — no
  * global sort, no single-partition windows.
  */
object Windows {

  val all: Seq[QueryDef] = Seq(
    // row_number top-N per group (deterministic tiebreak on orderkey).
    QueryDef(
      "q22_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        tbl(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("bigint").as("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""WITH r AS (
             |  SELECT o_custkey, o_orderkey,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |SELECT o_custkey, o_orderkey, rn FROM r WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)),

    // lag(): order-over-order spend delta per customer.
    QueryDef(
      "q23_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        tbl(s, dir, "orders")
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .select(
            col("o_custkey"), col("o_orderkey"),
            Num.roundTo(col("o_totalprice") - col("prev_price"), 4).as("spend_delta"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey,
              |  ${Num.roundSql(
                 "o_totalprice - lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)",
                 4)} AS spend_delta
              |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Rolling ROWS frame: 3-row moving average per supplier. The fixture
    // has duplicate (l_orderkey, l_linenumber) rows, so the frame is
    // computed over the per-key SUM (unique keys ⇒ the window order is
    // total ⇒ frame contents are engine-independent; integer-valued
    // sums keep the math exact).
    QueryDef(
      "q24_window_rolling",
      (s, dir) => {
        val base = tbl(s, dir, "lineitem")
          .groupBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
          .agg(sum(col("l_quantity")).as("qty"))
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)
          .rowsBetween(-2, 0)
        base
          .select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            Num.roundTo(avg(col("qty")).over(w), 4).as("rolling_avg_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      },
      Some(s"""WITH base AS (
              |  SELECT l_suppkey, l_orderkey, l_linenumber, sum(l_quantity) AS qty
              |  FROM lineitem GROUP BY 1, 2, 3)
              |SELECT l_suppkey, l_orderkey, l_linenumber,
              |  ${Num.roundSql(
                 "avg(qty) OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
                 4)} AS rolling_avg_qty
              |FROM base ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // Exact distinct counts per group.
    QueryDef(
      "q25_count_distinct",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // HLL sketch — the 100 TB path for distinct counts (single pass, no
    // per-key shuffle of distinct values). The estimate itself is
    // algorithm-specific, so the query carries its own verification: the
    // exact count rides along and `est_ok` asserts the estimate within
    // ±5% (rsd 0.02 ⇒ 2.5σ) IN-ROW — the oracle recomputes the exact
    // column and pins est_ok to TRUE, so a drifting sketch hash-fails.
    QueryDef(
      "q26_approx_distinct",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("__approx"),
            countDistinct(col("l_partkey")).as("n_parts_exact"))
          .select(
            col("l_returnflag"), col("n_parts_exact"),
            (abs(col("__approx") - col("n_parts_exact")).cast("double") /
              col("n_parts_exact").cast("double") <= 0.05).as("est_ok"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts_exact,
             |  TRUE AS est_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ROLLUP with subtotal rows surfaced via COALESCE (fixture columns are
    // never null, so 'ALL' marks the rollup levels unambiguously).
    QueryDef(
      "q27_rollup",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("bigint").as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n"), col("sum_qty"))
          .orderBy("returnflag", "linestatus"),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             |  COALESCE(l_linestatus, 'ALL') AS linestatus,
             |  count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin)))
}
