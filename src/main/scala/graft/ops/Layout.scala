package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data-layout operators for multi-dimensional pruning at scale:
  * Z-order (Morton) clustering. Sorting 100 TB of parquet by ONE key
  * gives perfect min/max pruning on that key and none on any other;
  * interleaving the bits of two keys and range-partitioning on the
  * result bounds EVERY file's range in BOTH dimensions, so filters on
  * either key (or both) skip most files from footer stats alone. This is
  * the table-format-agnostic core of what Delta/Iceberg call OPTIMIZE
  * ZORDER BY, expressed as plain deterministic integer arithmetic —
  * codegen'd, no UDFs, no shuffle beyond the final range partition.
  */
object Layout {

  /** Min-max normalize a key to [0, 2^bits): floor((v - lo) * (2^bits-1)
    * / (hi - lo)) in double arithmetic. The same IEEE ops in any engine
    * give the same result (exact int→double conversions below 2^53, one
    * multiply, one divide, one floor).
    */
  def normalize(v: Column, lo: Column, hi: Column, bits: Int): Column =
    floor((v - lo).cast("double") * lit((1L << bits) - 1).cast("double") /
      (hi - lo).cast("double")).cast("long")

  /** Morton interleave of two `bits`-bit normalized keys: bit j of `a`
    * lands at bit 2j, bit j of `b` at bit 2j+1. Unrolled to 2×bits
    * shift-mask-scale terms — a single codegen'd expression tree.
    */
  def interleave(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { j =>
      shiftright(a, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j)) +
        shiftright(b, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)

  /** The same interleave as DuckDB-compatible SQL over columns an/bn —
    * generated from the identical loop so both engines agree by
    * construction.
    */
  def interleaveSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { j =>
      s"(($a >> $j) & 1) * ${1L << (2 * j)} + (($b >> $j) & 1) * ${1L << (2 * j + 1)}"
    }.mkString(" + ")

  /** Z-value of (a, b) given their global min/max (pass as literal or
    * broadcast-scalar columns).
    */
  def zValue(a: Column, aLo: Column, aHi: Column,
      b: Column, bLo: Column, bHi: Column, bits: Int = 16): Column =
    interleave(normalize(a, aLo, aHi, bits), normalize(b, bLo, bHi, bits), bits)

  /** Write `df` as parquet clustered by the Z-order of (colA, colB):
    * range-partition on the z-value into `numFiles` files, sort within
    * each, drop the helper column. Each output file then covers a small
    * rectangle of the (colA, colB) space — its parquet footer min/max
    * prune reads on EITHER column.
    *
    * EAGER min/max pre-pass at call time (two scalars per column reach
    * the driver) — the normalization bounds must be literals in the
    * plan, same trade as Cleaning.medianImpute.
    */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val mm = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val z = zValue(
      col(colA), lit(mm.getLong(0)), lit(mm.getLong(1)),
      col(colB), lit(mm.getLong(2)), lit(mm.getLong(3)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
