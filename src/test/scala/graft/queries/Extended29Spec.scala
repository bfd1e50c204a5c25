package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 second batch (q221–q224): independent replays
  * plus each query's defining invariant — the k-core peel vs a plain
  * Scala fixpoint walk (and non-vacuous kept/dropped classes), WoE/IV
  * user conservation, IPF margin-gap contraction, and diversity index
  * bounds (1 ≤ effective number ≤ source count).
  */
class Extended29Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q221: peel equals a plain Scala fixpoint walk; both classes non-empty") {
    val got = q("q221_kcore")(spark, sf0001).collect()
      .map(row => (row.getInt(0), row.getLong(1), row.getBoolean(2)))
    // independent replay: rebuild the strong graph driver-side
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_nationkey")
    val su = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select($"s_suppkey", $"s_nationkey")
    val pw = li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(su, $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .groupBy($"c_nationkey".as("u"), $"s_nationkey".as("v")).count()
      .collect().map(row => (row.getInt(0), row.getInt(1), row.getLong(2)))
    val ws = pw.map(_._3.toDouble).sorted
    // exact interpolating p90 (the percentile/quantile_cont definition)
    val h = 0.9 * (ws.length - 1)
    val t = ws(h.toInt) + (h - h.toInt) * (ws(math.min(h.toInt + 1, ws.length - 1)) - ws(h.toInt))
    var edges = pw.filter(_._3.toDouble > t)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val deg0 = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    (1 to 6).foreach { _ =>
      val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
        .groupBy(identity).view.mapValues(_.length).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val inCore = edges.flatMap(e => Seq(e._1, e._2))
    val expected = deg0.toSeq.sortBy(_._1)
      .map { case (v, d) => (v, d, inCore(v)) }
    assert(got.toSeq == expected)
    assert(got.exists(_._3) && got.exists(!_._3),
      "k-core must keep AND drop vertices at this SF")
  }

  test("q222: bins conserve users; WoE/IV replay from first principles") {
    val users = graft.Tables.load(spark, sf0001, "events")
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "view", 1L).otherwise(0L)).as("views"),
        max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("pos"))
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    val got = q("q222_woe_iv")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getDouble(4), row.getDouble(5), row.getDouble(6)))
    assert(got.map(_._2).sum == users.length.toLong, "bins must conserve users")
    assert(got.map(_._1).toSeq == (1L to 10L), "exactly deciles 1..10")
    // replay one bin's WoE from its published counts
    val pt = got.map(_._3).sum.toDouble
    val nt = got.map(_._4).sum.toDouble
    got.foreach { case (d, _, pos, neg, woeR, ivR, _) =>
      val gs = (pos + 0.5) / (pt + 5.0)
      val bs = (neg + 0.5) / (nt + 5.0)
      assert(woeR == r(math.log(gs) - math.log(bs), 6), s"decile $d woe")
      assert(ivR == r(r((gs - bs) * (math.log(gs) - math.log(bs)), 8), 6),
        s"decile $d iv")
    }
    // the total is the sum of the (unrounded-to-6) decimal terms
    val ivTot = got.map { case (_, _, pos, neg, _, _, _) =>
      val gs = (pos + 0.5) / (pt + 5.0)
      val bs = (neg + 0.5) / (nt + 5.0)
      BigDecimal(r((gs - bs) * (math.log(gs) - math.log(bs)), 8))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(got.head._7 == r(ivTot.toDouble, 6))
  }

  test("q223: IPF contracts the margin gap; fitted mass conserves") {
    val got = q("q223_ipf_raking")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDouble(3), row.getDouble(4)))
    val total = got.map(_._3).sum.toDouble
    val nEt = got.map(_._1).distinct.length
    val nDow = got.map(_._2).distinct.length
    val rowTarget = total / nEt
    // after the final COLUMN adjustment, column margins are (near-)exact
    // and row margins must sit far closer to target than the raw counts
    val rawRowGap = got.groupBy(_._1).values
      .map(g => math.abs(g.map(_._3).sum.toDouble - rowTarget)).max
    val fitRowGap = got.groupBy(_._1).values
      .map(g => math.abs(g.map(_._5).sum - rowTarget)).max
    assert(fitRowGap < rawRowGap / 5.0,
      s"IPF failed to contract row-margin gap: $fitRowGap vs raw $rawRowGap")
    val colTarget = total / nDow
    got.groupBy(_._2).values.foreach { g =>
      assert(math.abs(g.map(_._5).sum - colTarget) < 0.05 * colTarget,
        "column margins must be near-exact after the final column pass")
    }
    // raking reweights — it never creates or destroys total mass (≤1% drift
    // from the bounded row-margin residual)
    assert(math.abs(got.map(_._5).sum - total) < 0.01 * total)
  }

  test("q224: effective numbers bounded by [1, n_sources]; replay one lang") {
    val got = q("q224_diversity")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDouble(3), row.getDouble(4), row.getDouble(5), row.getDouble(6)))
    assert(got.nonEmpty)
    got.foreach { case (lang, _, nSrc, hhi, h, effS, effH) =>
      assert(hhi >= 1.0 / nSrc - 1e-9 && hhi <= 1.0 + 1e-9, s"$lang hhi out of range")
      assert(effS >= 1.0 - 1e-6 && effS <= nSrc + 1e-6, s"$lang simpson eff")
      assert(effH >= 1.0 - 1e-6 && effH <= nSrc + 1e-6, s"$lang shannon eff")
      assert(h >= 0.0)
    }
    // replay the first lang's indices from raw counts
    val (lang0, _, _, hhi0, h0, _, _) = got.head
    val counts = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"lang" === lang0).groupBy($"source").count()
      .collect().map(_.getLong(1))
    val n = counts.sum.toDouble
    def dsum(f: Double => Double) = counts.map(c =>
      BigDecimal(r(f(c / n), 12)).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(hhi0 == r(dsum(p => p * p).toDouble, 6))
    assert(h0 == r(dsum(p => -p * math.log(p)).toDouble, 6))
  }
}
