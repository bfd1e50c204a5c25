package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 thirteenth batch: dynamic time warping — elastic similarity
  * between time series (two shifted copies of one seasonal pattern look
  * FAR to q201's lock-step cross-correlation and CLOSE to DTW). The
  * full O(n·m) DP recurrence runs INSIDE one codegen'd nested
  * `aggregate` HOF per series pair — sequential state that no window
  * frame expresses, bounded by calendar length per entity, embarrassing
  * parallel ACROSS entities (the 100 TB shape: millions of bounded DPs,
  * one per pair, zero shuffles inside the recurrence). The oracle walks
  * the identical cell order with a step-per-cell WITH RECURSIVE.
  */
object Extended40 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** The shared cell recurrence, as SQL text with ALL floats rounded at
    * 4 dp (house iterative contract): cost = |a_i − b_j| in kilodollar
    * units (keeps every cell < 1e9, far inside Num's long-floor range);
    * D(i,j) = cost + min(up, diag, left) with the INF sentinel 1e15 for
    * out-of-grid neighbors (never selected once a real path exists —
    * and every cell has one via the j=1 left chain / i=1 up chain).
    */
  private val Inf = "CAST(1e15 AS DOUBLE)"

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q256_dtw",
      (s, dir) => {
        val q = tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag").as("flag"),
            (year(col("l_shipdate")) * 10 + quarter(col("l_shipdate"))).cast("long")
              .as("qk"))
          .agg((sum(R(col("l_extendedprice") * 100.0, 0).cast(DecimalType(18, 0)))
            .cast("double") / lit(1e8)).as("y")) // kilodollars
        val ser = q.groupBy(col("flag"))
          .agg(transform(sort_array(collect_list(struct(col("qk"), col("y")))),
            e => R(e.getField("y"), 4)).as("arr"))
        val pairs = ser.as("x")
          .join(ser.as("z"), col("x.flag") < col("z.flag"))
          .select(col("x.flag").as("flag_a"), col("z.flag").as("flag_b"),
            col("x.arr").as("a"), col("z.arr").as("b"))
        val dtw = expr(
          s"""aggregate(
             |  sequence(1, size(b)),
             |  transform(a, x -> $Inf),
             |  (prev, j) -> aggregate(
             |    sequence(1, size(a)),
             |    CAST(array() AS ARRAY<DOUBLE>),
             |    (acc, i) -> array_append(acc,
             |      ${Num.roundSql(
                      s"""abs(element_at(a, i) - element_at(b, j)) + least(
                         |        element_at(prev, i),
                         |        CASE WHEN i = 1 THEN (CASE WHEN j = 1 THEN CAST(0.0 AS DOUBLE) ELSE $Inf END)
                         |             ELSE element_at(prev, i - 1) END,
                         |        CASE WHEN i = 1 THEN $Inf ELSE element_at(acc, -1) END)""".stripMargin, 4)})),
             |  prev -> element_at(prev, size(a)))""".stripMargin)
        pairs
          .withColumn("n_a", size(col("a")).cast("long"))
          .withColumn("n_b", size(col("b")).cast("long"))
          .withColumn("dtw", dtw)
          .select(col("flag_a"), col("flag_b"), col("n_a"), col("n_b"),
            R(col("dtw"), 4).as("dtw_r"),
            R(col("dtw") / (col("n_a") + col("n_b")).cast("double"), 6)
              .as("dtw_per_step_r"))
          .orderBy("flag_a", "flag_b")
      },
      Some {
        val cell = Num.roundSql(
          s"""abs(a[i] - b[j]) + least(
             |      prev[i],
             |      CASE WHEN i = 1 THEN (CASE WHEN j = 1 THEN CAST(0.0 AS DOUBLE) ELSE $Inf END)
             |           ELSE prev[i - 1] END,
             |      CASE WHEN i = 1 THEN $Inf ELSE cur[-1] END)""".stripMargin, 4)
        s"""WITH RECURSIVE qrt AS (
           |  SELECT l_returnflag AS flag,
           |    CAST(EXTRACT(YEAR FROM l_shipdate) * 10 + EXTRACT(QUARTER FROM l_shipdate) AS BIGINT) AS qk,
           |    CAST(sum(CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT)) AS DOUBLE) / 1e8 AS y
           |  FROM lineitem GROUP BY 1, 2),
           |ser AS (
           |  SELECT flag, list(${rs("y", 4)} ORDER BY qk) AS arr FROM qrt GROUP BY 1),
           |pairs AS (
           |  SELECT x.flag AS flag_a, z.flag AS flag_b, x.arr AS a, z.arr AS b,
           |    len(x.arr) AS na, len(z.arr) AS mb
           |  FROM ser x JOIN ser z ON x.flag < z.flag),
           |-- one recursion STEP PER DP CELL, row-major (j outer, i inner):
           |-- s counts completed cells; prev is row j-1, cur the partial row j
           |dp AS (
           |  SELECT flag_a, flag_b, a, b, na, mb, 0 AS s,
           |    list_transform(a, x -> $Inf) AS prev, CAST([] AS DOUBLE[]) AS cur
           |  FROM pairs
           |  UNION ALL
           |  SELECT flag_a, flag_b, a, b, na, mb, s + 1,
           |    CASE WHEN ((s % na) + 1) = na THEN cur || [$cell] ELSE prev END,
           |    CASE WHEN ((s % na) + 1) = na THEN CAST([] AS DOUBLE[]) ELSE cur || [$cell] END
           |  FROM (
           |    SELECT *, (s % na) + 1 AS i, (s // na) + 1 AS j FROM dp
           |    WHERE s < na * mb) st)
           |SELECT flag_a, flag_b,
           |  CAST(na AS BIGINT) AS n_a, CAST(mb AS BIGINT) AS n_b,
           |  ${rs("prev[na]", 4)} AS dtw_r,
           |  ${rs("prev[na] / CAST(na + mb AS DOUBLE)", 6)} AS dtw_per_step_r
           |FROM dp WHERE s = na * mb
           |ORDER BY flag_a, flag_b""".stripMargin
      })
  )
}
