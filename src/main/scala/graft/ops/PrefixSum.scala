package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running aggregates over LOW-CARDINALITY window partitions —
  * the hazard class one step past the empty partitionSpec: a window
  * `PARTITION BY source` with ~20 source values over a data-sized relation
  * funnels N/20 rows into ONE task (100 TB → 5 TB single-task sorts), and
  * Spark's planner has no countermeasure because the partition count is a
  * data property, not a plan property.
  *
  * Same machinery as [[Quantiles.exactNtile]], generalized from ranks to
  * running aggregates:
  *
  *   1. ONE `approxQuantile` pass over the (direction-normalized) ORDER BY
  *      key picks ~`coarseCells` GLOBAL boundaries (approximate — they
  *      only balance load; membership and order never depend on them);
  *   2. each row gets a coarse cell id (monotone in the sort key, so
  *      within every partition key the cells are contiguous runs of the
  *      window order);
  *   3. per-(key, cell) subtotals — an ordinary hash aggregate — feed a
  *      window over the SUBTOTAL relation (≤ coarseCells rows per key:
  *      bounded by construction) that yields each cell's exclusive
  *      offset; the offsets relation (|keys|·coarseCells rows — the
  *      low-cardinality contract keeps it broadcastable) is broadcast
  *      back;
  *   4. an in-(key, cell) window adds the within-cell running aggregate:
  *      offset + in-cell prefix = exact global-in-partition prefix. The
  *      largest task is ~N/(|keys|·coarseCells) rows; `coarseCells` is a
  *      LOAD parameter — raise it with the cluster (64 matches local[32]).
  *
  * Exactness: sums regroup additions, so they are exact for integral and
  * DECIMAL `value` types (the battery's users sum token counts — longs);
  * float sums would differ from the sequential window by summation order.
  * Ordering correctness needs no tie care across cells: equal sort keys
  * always share a cell, and rows in different cells are strictly ordered
  * by the key itself. Null sort keys raise (same fail-fast contract as
  * exactNtile). PrefixSumSpec pins row-identity against Spark's own
  * window on randomized multi-seed inputs.
  */
object PrefixSum {

  /** Monotone numeric surrogate of an ASCII-ish string's bytes `from..
    * from+n-1` (1-based, n ≤ 6 keeps the pack exact in a double):
    * codepoints clamp at 255, so the pack is monotone in the string's
    * UTF-8 byte order wherever codepoints stay < 255 and COLLAPSES (same
    * cell — always safe) beyond. Use as [[exclusiveSum]]'s `cellKey` for
    * string window orders (approxQuantile can't summarize strings).
    *
    * ADVERSARIAL COLLAPSE (pinned in PrefixSumSpec): a corpus whose
    * strings are IDENTICAL through byte `from+n-1` (shared boilerplate
    * prefix longer than the partition prefix + pack window) packs to ONE
    * value, so every row of the hot key lands in ONE coarse cell and the
    * helper degrades to exactly the plain window's single-task cost for
    * that key — still row-correct (equal surrogates only merge cells),
    * NEVER worse than the window it replaces, but no longer load-split.
    * No single-double surrogate can beat this: a double carries 53 bits
    * ≈ 6.6 bytes of resolution, so widening the pack past 6 bytes gains
    * nothing. The knob is `from`: move the pack window PAST the known
    * boilerplate depth (bytes there diverge → cells split again). Use
    * [[cellLoad]] to MEASURE max-rows-per-cell on real data before
    * trusting a layout — data-driven, not hoped.
    */
  def packAscii(c: Column, from: Int, n: Int): Column = {
    require(n >= 1 && n <= 6, s"pack width must be 1..6 bytes, got $n")
    (0 until n).map { i =>
      least(ascii(substring(c, from + i, 1)), lit(255)).cast("long") *
        lit(1L << (8 * (n - 1 - i)))
    }.reduce(_ + _)
  }

  /** Tie-splitting cell surrogate for INTEGER window-order keys with a
    * non-null LONG tie column (the caller's first `ties` entry): `order ±
    * tie/(maxTie+1)` is STRICTLY monotone in (order direction, tie asc),
    * so heavy order-key ties — token counts, char counts, integral
    * scores, where one hot value can hold a data-sized run — spread
    * across coarse cells instead of funneling one cell per value (cells
    * must otherwise co-locate equal sort keys). The fraction is +/− by
    * direction because [[exclusiveSum]] negates the surrogate for
    * descending orders while ties always order ascending. `maxTie` is a
    * driver-side scalar (one max() scan, or table stats at scale).
    * Double rounding may collapse near ties (maxTie past ~2^(53−key
    * bits)) — safe: collapse is non-strict monotone. Integer order keys
    * only: a fractional gap smaller than 1 between distinct order values
    * would break monotonicity.
    */
  def tieCell(order: Column, ascending: Boolean, tie: Column, maxTie: Long): Column = {
    val frac = tie.cast("double") / lit(maxTie.toDouble + 1.0)
    if (ascending) order.cast("double") + frac else order.cast("double") - frac
  }

  /** Preflight diagnostic for [[exclusiveSum]]/[[rank]] cell layouts: the
    * per-(key, cell) row counts the given `cellKey` surrogate would
    * produce — same approxQuantile bounds, same cell assignment, ONE
    * aggregate scan. Run it (sampled) when choosing a [[packAscii]]
    * offset for a new corpus: `max(n_rows)` is the largest single-task
    * window the layout will pay; a hot boilerplate prefix shows up here
    * as one cell carrying the whole key (see the packAscii scaladoc)
    * before it shows up as a straggler task in production.
    *
    * `ascending` must match the [[exclusiveSum]] call being sized:
    * exclusiveSum negates the surrogate for descending orders, and
    * without the same normalization the reported cell IDS would be
    * mirrored relative to the ones exclusiveSum assigns (the load
    * HISTOGRAM is direction-symmetric, but per-cell drill-down isn't).
    */
  def cellLoad(
      df: DataFrame, keys: Seq[String], cellKey: Column,
      coarseCells: Int = 64, ascending: Boolean = true): DataFrame = {
    val surrogate = if (ascending) cellKey.cast("double") else negate(cellKey.cast("double"))
    val keyed = df.withColumn("__pv", surrogate)
    val probs = (1 until coarseCells).map(_.toDouble / coarseCells).toArray
    val bounds =
      if (coarseCells <= 1) Array.empty[Double]
      else keyed.stat.approxQuantile("__pv", probs, 0.001)
        .map(_ + 0.0) // -0.0 -> 0.0 BEFORE distinct: CellBucket.search requires distinct bounds
        .distinct.sorted
    keyed
      .withColumn("__pc", Quantiles.cellOf(df.sparkSession, col("__pv"), bounds, "PrefixSum"))
      .groupBy((keys :+ "__pc").map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumnRenamed("__pc", "cell")
  }

  /** Exclusive running sum of `value` (and optionally the exact 1-based
    * `row_number` rank) over `PARTITION BY keys ORDER BY order [dir],
    * ties...` — row-identical to
    * `sum(value).over(w.rowsBetween(unboundedPreceding, -1))` (null → 0)
    * and `row_number().over(w)`, with no task ever seeing a whole
    * partition. The inclusive sum is `out + value`.
    *
    * `cellKey`: optional numeric surrogate used ONLY for coarse-cell
    * placement — it must be non-null and MONOTONE (non-strictly) in the
    * window order within every partition; equal surrogates for ordered
    * rows merely collapse them into one cell (safe). Defaults to the
    * (direction-normalized) order column itself; pass [[packAscii]] of
    * the post-partition-prefix bytes for string orders.
    *
    * `broadcastOffsets`: the offsets relation is |distinct keys|·cells
    * rows. Broadcast it (default) for low-cardinality keys; pass false
    * for HIGH-cardinality keys (q140's SNM blocks) — the offsets join
    * then shuffles on (keys, cell), which distributes at any key count.
    */
  def exclusiveSum(
      df: DataFrame, keys: Seq[String],
      order: Column, ascending: Boolean, ties: Seq[Column],
      value: Column, outSum: String, outRank: Option[String] = None,
      coarseCells: Int = 64, cellKey: Option[Column] = None,
      broadcastOffsets: Boolean = true): DataFrame = {
    require(keys.nonEmpty,
      "empty partition keys: use Quantiles.exactNtile-style global machinery")
    val qv = cellKey match {
      case Some(k) => if (ascending) k.cast("double") else negate(k.cast("double"))
      case None => if (ascending) order.cast("double") else negate(order.cast("double"))
    }
    // null values contribute 0, exactly like the window sum skipping them
    // (the twin `sum(value).over(...preceding,-1)` ignores nulls; the
    // inclusive-minus-current trick below would otherwise null the row)
    //
    // Ckpt BEFORE the eager approxQuantile pass (r16): the input lineage
    // is consumed THREE times — the boundary scan below, the subtotal
    // branch, and the celled side of the offsets join — and without a
    // materialization point each consumer recomputes the caller's whole
    // upstream plan (q283's rank rollup re-ran its lineitem scan+agg 3×
    // per call; the plan showed 5 lineitem scans for 2 rank calls).
    // One localCheckpoint (reliable checkpoint under graft.checkpoint.dir
    // — the Ckpt production switch) pays the input once.
    val keyed = Ckpt(df.withColumn("__pval", coalesce(value, lit(0)))
      .withColumn("__pv", qv))
    val probs = (1 until coarseCells).map(_.toDouble / coarseCells).toArray
    val bounds =
      if (coarseCells <= 1) Array.empty[Double]
      else keyed.stat.approxQuantile("__pv", probs, 0.001)
        .map(_ + 0.0) // -0.0 -> 0.0 BEFORE distinct: CellBucket.search requires distinct bounds
        .distinct.sorted
    val celled = keyed
      .withColumn("__pc", Quantiles.cellOf(df.sparkSession, col("__pv"), bounds, "PrefixSum"))
      .drop("__pv")
    val kc = (keys :+ "__pc").map(col)
    // per-(key, cell) subtotals: data-sized scan → |keys|·cells rows
    val sub = celled.groupBy(kc: _*)
      .agg(sum(col("__pval")).as("__psub"), count(lit(1)).as("__pn"))
    // exclusive cell offsets: a window over the SUBTOTAL relation — every
    // partition holds ≤ coarseCells rows (bounded by construction, not by
    // whitelist)
    val wOff = Window.partitionBy(keys.map(col): _*).orderBy(col("__pc").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sub.select(
      kc ++ Seq(
        coalesce(sum(col("__psub")).over(wOff), lit(0L)).as("__poff"),
        coalesce(sum(col("__pn")).over(wOff), lit(0L)).as("__proff")): _*)
    val inOrd = (if (ascending) order.asc else order.desc) +: ties.map(_.asc)
    val wIn = Window.partitionBy(kc: _*).orderBy(inOrd: _*)
    val joined = celled.join(
      if (broadcastOffsets) broadcast(offs) else offs, keys :+ "__pc")
    // inclusive-minus-current instead of an exclusive frame: the inclusive
    // frame is never null, so no type-widening coalesce enters the sum
    val incl = sum(col("__pval")).over(wIn.rowsBetween(Window.unboundedPreceding, 0))
    val summed = joined.withColumn(outSum, col("__poff") + incl - col("__pval"))
    val ranked = outRank match {
      case Some(r) =>
        summed.withColumn(r, col("__proff") + row_number().over(wIn).cast("long"))
      case None => summed
    }
    ranked.drop("__pval", "__pc", "__poff", "__proff")
  }

  /** Exact per-partition `row_number` alone (q58's rank-derived window
    * functions) — the rank half of [[exclusiveSum]] with a unit weight.
    */
  def rank(
      df: DataFrame, keys: Seq[String],
      order: Column, ascending: Boolean, ties: Seq[Column],
      out: String, coarseCells: Int = 64, cellKey: Option[Column] = None,
      broadcastOffsets: Boolean = true): DataFrame =
    exclusiveSum(df, keys, order, ascending, ties, lit(1L), "__prank_sum",
      Some(out), coarseCells, cellKey, broadcastOffsets).drop("__prank_sum")

  /** GLOBAL exclusive running max of a LONG `value` ordered by `order`
    * ascending — `max(value).over(Window.orderBy(order).rowsBetween(
    * unboundedPreceding, -1))` (null on the first row), with no global
    * window: per-cell maxes are a ≤`coarseCells`-row bounded collect (the
    * exactNtile counts pattern), scan-left'ed on the driver into exclusive
    * cell offsets and broadcast back; an in-cell window finishes the
    * prefix. q198 uses this for the cross-bucket predecessor max, where
    * the input is already the 1024×-reduced bucket relation.
    */
  def exclusiveMaxLong(
      df: DataFrame, order: Column, ties: Seq[Column],
      value: Column, out: String, coarseCells: Int = 64): DataFrame = {
    // Ckpt for the same three-consumer reason as exclusiveSum: the
    // boundary scan, the bounded cellMax collect, and the final plan
    // would each recompute the caller's upstream lineage
    val keyed = Ckpt(df.withColumn("__pval", value.cast("long"))
      .withColumn("__pv", order.cast("double")))
    val probs = (1 until coarseCells).map(_.toDouble / coarseCells).toArray
    val bounds =
      if (coarseCells <= 1) Array.empty[Double]
      else keyed.stat.approxQuantile("__pv", probs, 0.001)
        .map(_ + 0.0) // -0.0 -> 0.0 BEFORE distinct: CellBucket.search requires distinct bounds
        .distinct.sorted
    val celled = keyed
      .withColumn("__pc", Quantiles.cellOf(df.sparkSession, col("__pv"), bounds, "PrefixSum"))
      .drop("__pv")
    // ≤ coarseCells rows — the documented bounded driver-side collect
    // an all-null cell yields a null max (window max skips nulls) — it
    // must pass the prior cells' max through, not NPE on getLong
    val cellMax = celled.groupBy(col("__pc")).agg(max(col("__pval")).as("__pm"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    val offs = cellMax.map(_._1)
      .zip(cellMax.scanLeft(Option.empty[Long]) { case (acc, (_, m)) =>
        (acc.toSeq ++ m.toSeq).reduceOption((a, b) => math.max(a, b))
      })
      .map { case (cell, m) => (cell, m.map(java.lang.Long.valueOf).orNull) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offs.toSeq.toDF("__pc", "__poffm")
    val wIn = Window.partitionBy(col("__pc"))
      .orderBy((order.asc +: ties.map(_.asc)): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest skips nulls: null only when BOTH the cell offset (first
    // cell) and the in-cell prefix (first row in cell) are absent — i.e.
    // exactly the window lag/prefix-max null contract
    celled
      .join(broadcast(offDf), Seq("__pc"))
      .withColumn(out, greatest(col("__poffm"), max(col("__pval")).over(wIn)))
      .drop("__pval", "__pc", "__poffm")
  }
}
