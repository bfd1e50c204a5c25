package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the "analyze" step every pipeline runs before and
  * after a transformation (null rates, cardinalities, value ranges).
  *
  * One aggregation pass produces a single wide row (Catalyst plans the
  * multi-distinct via Expand, still one scan); `stack` then pivots it to
  * one row per column. Nothing is collected to the driver and the scan
  * reads only the profiled columns, so the op scales with column count,
  * not row count. For 100 TB sweeps swap countDistinct for
  * approx_count_distinct (same shape, sketch-sized state).
  */
object Profile {

  /** (col_name, n_nonnull, n_null, n_distinct, min_s, max_s) per profiled
    * column; min/max computed in the column's native type, then rendered
    * as strings so mixed-type profiles union into one frame.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__cnt"),
        count(when(col(c).isNull, 1)).as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__ndist"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__cnt`, `${c}__nnull`, `${c}__ndist`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nonnull, n_null, n_distinct, min_s, max_s)"))
  }
}
