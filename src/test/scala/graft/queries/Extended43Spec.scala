package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for q266/q267: the Mahalanobis quadratic replays from plain Scala
  * moments (population covariance, analytic 2×2 inverse), and the
  * Nelson–Aalen curve satisfies its defining relations against q189's
  * Kaplan–Meier output over the same subjects.
  */
class Extended43Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q266: top-30 d² replays from plain Scala moments") {
    val got = q("q266_mahalanobis")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getInt(1), rw.getLong(2), rw.getLong(3),
        rw.getDouble(4), rw.getDouble(5), rw.getLong(6)))
    assert(got.length == 30)
    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .collect()
      .map(rw => (rw.getLong(0), rw.getInt(1),
        r(rw.getDouble(2), 0).toLong, r(rw.getDouble(3) * 100.0, 0).toLong))
    val n = rows.length.toDouble
    def ds(f: ((Long, Int, Long, Long)) => Long): Double =
      rows.map(t => BigInt(f(t))).sum.toDouble
    val (sx, sy) = (ds(_._3), ds(_._4))
    val sxx = rows.map(t => BigInt(t._3) * BigInt(t._3)).sum.toDouble
    val syy = rows.map(t => BigInt(t._4) * BigInt(t._4)).sum.toDouble
    val sxy = rows.map(t => BigInt(t._3) * BigInt(t._4)).sum.toDouble
    val (mx, my) = (sx / n, sy / n)
    val vxx = sxx / n - mx * mx
    val vyy = syy / n - my * my
    val vxy = sxy / n - mx * my
    val det = vxx * vyy - vxy * vxy
    def d2(qt: Long, ct: Long): Double = {
      val (dx, dy) = (qt - mx, ct - my)
      (dx * dx * vyy - 2.0 * dx * dy * vxy + dy * dy * vxx) / det
    }
    val exp = rows.map(t => (t._1, t._2, t._3, t._4, r(d2(t._3, t._4), 6)))
      .sortBy(t => (-t._5, t._1, t._2, t._3, t._4)).take(30)
    // exact interpolating median (quantile_cont semantics)
    val sorted = rows.map(t => d2(t._3, t._4)).sorted
    val h = (sorted.length - 1) * 0.5
    val med = sorted(h.toInt) +
      (h - h.toInt) * (sorted(h.toInt + 1) - sorted(h.toInt))
    val expFlagged = rows.count(t => d2(t._3, t._4) > 2.0 * med).toLong
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == exp.toSeq)
    assert(got.forall(t => t._6 == r(med, 6) && t._7 == expFlagged))
    assert(expFlagged > 0, "relative flag non-vacuous")
    // the screen is genuinely multivariate: some flagged row is NOT an
    // extreme of either marginal alone (|z| < 2 on both axes)
    val sdx = math.sqrt(vxx); val sdy = math.sqrt(vyy)
    assert(rows.exists(t => d2(t._3, t._4) > 2.0 * med &&
      math.abs((t._3 - mx) / sdx) < 2 && math.abs((t._4 - my) / sdy) < 2))
  }

  test("q267: Nelson-Aalen is consistent with q189's KM over the same subjects") {
    val na = q("q267_nelson_aalen")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getLong(3),
        rw.getDouble(4), rw.getDouble(5)))
    val km = q("q189_kaplan_meier")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getLong(3)))
    // identical event times, risk sets, and event/censor counts
    assert(na.map(t => (t._1, t._2, t._3, t._4)).toSeq == km.toSeq)
    // H is nondecreasing; increments replay as Σ d/n at 12-dp terms
    var h = BigDecimal(0); var v = BigDecimal(0)
    na.foreach { case (_, nrisk, d, _, hr, vr) =>
      h += BigDecimal(r(d.toDouble / nrisk, 12))
      v += BigDecimal(r(d.toDouble / (nrisk.toDouble * nrisk), 12))
      assert(hr == r(h.toDouble, 6) && vr == r(v.toDouble, 9))
    }
    // exp(-H) ≥ KM survival pointwise (standard inequality, strict once
    // hazard accumulates) — sanity that the two estimators cohere
    val surv = q("q189_kaplan_meier")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getDouble(4))).toMap
    na.foreach { case (dur, _, _, _, hr, _) =>
      assert(math.exp(-hr) >= surv(dur) - 1e-6)
    }
    assert(na.nonEmpty && na.last._5 > 0)
  }
}
