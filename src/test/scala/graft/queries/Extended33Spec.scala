package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 sixth batch (q235–q237): the power-grid's
  * defining monotonicity (smaller MDE ⇒ more samples, superlinearly),
  * Qini's conservation and replay (terminal Qini equals the overall
  * incremental count), and a full confusion-matrix replay of Cohen's κ
  * with its bounds (κ ≤ pₒ, κ ∈ [−1, 1], matrix sums to N).
  */
class Extended33Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q235: sample sizes replay; shrinking MDE inflates n superlinearly") {
    val got = q("q235_power_mde")(spark, sf0001).collect()
      .map(rw => (rw.getDouble(0), rw.getLong(1), rw.getLong(2), rw.getDouble(3),
        rw.getDouble(4), rw.getLong(5), rw.getLong(6)))
    val evs = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id", $"event_type", to_date($"ts").as("d")).collect()
    val nUnits = evs.length.toLong
    val nConv = evs.count(_.getString(1) == "purchase").toLong
    val nDays = evs.map(_.getDate(2)).distinct.length.toLong
    val p = nConv.toDouble / nUnits
    assert(p > 0.0 && p < 1.0, "baseline must not be saturated")
    val z2 = math.pow(1.959963984540054 + 0.8416212335729143, 2)
    got.foreach { case (mde, nu, nc, pR, deltaR, nArm, days) =>
      assert(nu == nUnits && nc == nConv)
      assert(pR == r(p, 6) && deltaR == r(p * mde, 6))
      val expArm = math.ceil(z2 * 2.0 * p * (1 - p) / math.pow(p * mde, 2)).toLong
      assert(nArm == expArm)
      assert(days == math.ceil(nArm.toDouble * 2.0 / (nUnits.toDouble / nDays)).toLong)
    }
    val byMde = got.sortBy(_._1)
    byMde.sliding(2).foreach { case Array(fine, coarse) =>
      // quartering the MDE relative step multiplies n by ≥ the ratio² × 0.9
      val ratio = coarse._1 / fine._1
      assert(fine._6.toDouble / coarse._6 > ratio * ratio * 0.9,
        "n must grow ~quadratically as MDE shrinks")
    }
  }

  test("q236: terminal Qini equals the overall incremental count; deciles partition users") {
    val got = q("q236_qini_curve")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getLong(3),
        rw.getLong(4)))
    val users = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("conv"))
      .collect().map(rw => (rw.getLong(0), rw.getLong(1)))
    assert(got.map(t => t._2 + t._4).sum == users.length,
      "deciles must partition the user population")
    assert(got.map(_._3).sum == users.filter(u => u._1 % 2 == 1 && u._2 == 1).length)
    assert(got.map(_._5).sum == users.filter(u => u._1 % 2 == 0 && u._2 == 1).length)
    val rows = q("q236_qini_curve")(spark, sf0001).collect()
    val lastQ = rows.last.getDouble(6)
    val (tN, tC) = (got.map(_._2).sum, got.map(_._3).sum)
    val (cN, cC) = (got.map(_._4).sum, got.map(_._5).sum)
    assert(lastQ == r(tC.toDouble - cC.toDouble * tN / cN, 4),
      "terminal Qini = total incremental conversions vs scaled control")
  }

  test("q237: κ replays from the exact confusion matrix; bounds hold") {
    val row = q("q237_cohens_kappa")(spark, sf0001).collect().head
    val (n, n11, n10, n01, n00) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(n11 + n10 + n01 + n00 == n, "confusion matrix must sum to N")
    // independent replay with driver-side medians
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"n_chars", $"text").collect()
      .map { rw =>
        val toks = rw.getString(2).trim.toLowerCase.split("\\s+")
        (rw.getLong(1).toDouble, toks.distinct.length.toDouble / toks.length)
      }
    def med(xs: Array[Double]): Double = {
      val s = xs.sorted; val h = 0.5 * (s.length - 1); val i = h.toInt
      if (i + 1 < s.length) s(i) + (h - i) * (s(i + 1) - s(i)) else s(i)
    }
    val (mc, mt) = (med(docs.map(_._1)), med(docs.map(_._2)))
    val lab = docs.map { case (ch, ttr) => (ch > mc, ttr < mt) }
    assert(n11 == lab.count(l => l._1 && l._2) && n00 == lab.count(l => !l._1 && !l._2))
    assert(n10 == lab.count(l => l._1 && !l._2) && n01 == lab.count(l => !l._1 && l._2))
    val nD = n.toDouble
    val po = (n11 + n00) / nD
    val pe = ((n11 + n10) / nD) * ((n11 + n01) / nD) + ((n01 + n00) / nD) * ((n10 + n00) / nD)
    val kappa = row.getDouble(7)
    assert(row.getDouble(5) == r(po, 6) && row.getDouble(6) == r(pe, 6))
    assert(kappa == r((po - pe) / (1.0 - pe), 6))
    assert(kappa >= -1.0 && kappa <= 1.0 && kappa <= po + 1e-12)
  }
}
