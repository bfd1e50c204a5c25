package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): assign events to sessions per
  * user, where a gap larger than `gapSeconds` starts a new session.
  *
  * Distributed shape: one shuffle on the user key; both windows (lag +
  * running sum) share the same partitioning and sort, so Catalyst plans a
  * single Exchange + Sort. No driver-side state. The streaming equivalent
  * is `session_window` in graft.ext.Streaming.
  */
object Sessions {

  /** Adds `session_id` (0-based per user) to an event frame.
    * `orderCols` must be a deterministic total order within a user
    * (e.g. ts then event id).
    */
  def assign(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy((col(tsCol).asc +: tieBreak.map(_.asc_nulls_first)): _*)
    // epoch seconds via truncating cast — stable across timestamp
    // precisions (ns parquet → µs Spark both floor to the same second)
    val sec = col(tsCol).cast("long")
    val isNew = when(
      lag(sec, 1).over(w).isNull || sec - lag(sec, 1).over(w) > gapSeconds, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn(
        "session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__new")
  }

  /** Per-session rollup: bounds, size, value sum. */
  def summarize(
      assigned: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String): DataFrame =
    assigned
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_sum"))
}
