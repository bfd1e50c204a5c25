package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with right.ts ≤
  * left.ts within the same key (the point-in-time join Spark lacks as a
  * built-in operator).
  *
  * Implementation follows the preference order for custom operators
  * (compose built-ins before custom plans): both sides UNION into one
  * relation tagged by origin, one window pass per key carries the last
  * non-null right payload forward, then left rows project it out. One
  * shuffle on the key, per-partition sort — the same cost shape as a
  * sort-merge join, no custom SparkPlan needed. At equal timestamps the
  * right row wins (as-of-or-equal), and among equal-ts right rows the
  * HIGHEST rightIdCol wins — both pinned by the window sort order, so
  * results are deterministic and oracle-checkable.
  */
object AsOf {

  /** @param rightValCols right columns carried to the output (as
    *                     `asof_<name>`)
    * @param rightIdCol   deterministic tiebreak among equal-ts right rows
    * @param toleranceSec if set, matches older than this are nulled out
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightValCols: Seq[String], rightIdCol: String,
      toleranceSec: Option[Long] = None): DataFrame = {
    val payload = struct((col(tsCol).as("__rts") +: rightValCols.map(col)): _*)
    val payloadType = right.select(payload.as("p")).schema("p").dataType
    val leftRow = struct(left.columns.map(col).toSeq: _*)
    val leftRowType = left.select(leftRow.as("l")).schema("l").dataType

    // tiebreak keeps the id column's NATIVE type (a cast to bigint would
    // null out string ids and silently break determinism)
    val tieType = right.schema(rightIdCol).dataType
    val lPart = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__is_r"),
      lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payloadType).as("__rv"), leftRow.as("__lrow"))
    val rPart = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__is_r"),
      col(rightIdCol).as("__tie"),
      payload.as("__rv"), lit(null).cast(leftRowType).as("__lrow"))

    // right rows sort before left at equal ts (as-of-or-equal); among
    // equal-ts right rows the highest id sorts last and wins `last()`
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__is_r").desc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = lPart.unionByName(rPart)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__is_r") === 0)

    val inTol = toleranceSec match {
      case Some(t) =>
        col("__m").isNotNull &&
          (col("__ts").cast("long") - col("__m.__rts").cast("long")) <= t
      case None => col("__m").isNotNull
    }
    val outCols =
      left.columns.map(c => col(s"__lrow.$c").as(c)).toSeq ++
        Seq(when(inTol, col("__m.__rts")).as("asof_ts")) ++
        rightValCols.map(c => when(inTol, col(s"__m.$c")).as(s"asof_$c"))
    matched.select(outCols: _*)
  }
}
