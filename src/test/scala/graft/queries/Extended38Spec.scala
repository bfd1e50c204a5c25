package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 eleventh batch (q252–q253): silhouette's
  * definitional bounds (s ∈ [−1, 1]; b is the nearest OTHER centroid so
  * a ≤ b would force s ≥ 0 — both signs legal, the bound is the pin)
  * plus global-mean consistency with the per-cell means, and a full
  * driver-side replay of the Freedman–Diaconis histogram (width, bin
  * count, conservation, clamped upper edge).
  */
class Extended38Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q252: silhouette bounds hold; global mean = point-weighted cell means; cells partition the corpus") {
    val got = q("q252_silhouette")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getDouble(2), rw.getDouble(3),
        rw.getDouble(4), rw.getDouble(5)))
    val nVecs = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(got.map(_._2).sum == nVecs, "cells must partition the corpus")
    got.foreach { case (_, n, a, b, s, _) =>
      assert(n > 0 && a >= 0.0 && b >= 0.0)
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
    }
    // global mean is the point-weighted mean of cell means (to rounding)
    val weighted = got.map(t => t._5 * t._2).sum / nVecs
    val globals = got.map(_._6).distinct
    assert(globals.length == 1)
    assert(math.abs(globals.head - weighted) < 1e-4)
    assert(got.exists(_._5 > 0.0),
      "a trained layout must separate SOME cell (all-nonpositive would mean meaningless cells)")
  }

  test("q253: FD histogram replays — width, bin count, conservation, clamped edge") {
    val got = q("q253_fd_histogram")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getDouble(1), rw.getDouble(2), rw.getLong(3),
        rw.getLong(4), rw.getDouble(5)))
    val vs = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_totalprice").collect().map(_.getDouble(0)).sorted
    def qtl(p: Double): Double = {
      val h = p * (vs.length - 1); val i = h.toInt
      if (i + 1 < vs.length) vs(i) + (h - i) * (vs(i + 1) - vs(i)) else vs(i)
    }
    val iqr = qtl(0.75) - qtl(0.25)
    val h = 2.0 * iqr / math.cbrt(vs.length.toDouble)
    val (mn, mx) = (vs.head, vs.last)
    val nBins = math.ceil((mx - mn) / h).toLong
    assert(got.forall(_._5 == nBins))
    assert(got.forall(t => r(h, 4) == t._6))
    assert(got.map(_._4).sum == vs.length, "histogram must conserve the row count")
    val bins = vs.map(v => math.min(nBins - 1, math.floor((v - mn) / h).toLong))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (bin, lo, hi, n, _, _) =>
      assert(n == bins(bin))
      assert(lo == r(mn + bin * h, 2) && hi == r(mn + (bin + 1) * h, 2))
    }
    assert(got.map(_._1).max == nBins - 1 || bins.keySet.max < nBins - 1,
      "max value lands in the clamped last bin")
  }
}
