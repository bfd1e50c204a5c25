package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 tenth batch (q211–q213): independent replays plus
  * each query's defining invariant — the Wilson interval must stay inside
  * [0,1] and contain p̂ (the property the Wald CI lacks; q211), the
  * growth curve must be monotone and end at the activated population
  * (q212), and the haversine argmin must be symmetric-consistent and
  * bounded by half the Earth's circumference (q213).
  */
class Extended26Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q211: Wilson replay matches; interval stays in [0,1] and contains p-hat") {
    val rows = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", $"value").collect()
      .map(row => (row.getString(0), row.getDouble(1)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, xs) =>
      val n = xs.length.toDouble
      val x = xs.count(_._2 >= 100).toLong
      val p = x / n
      val z = 1.96; val z2 = 3.8416
      val den = 1.0 + z2 / n
      val ctr = (p + z2 / (2.0 * n)) / den
      val half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / den
      (et, xs.length.toLong, x, r(p, 6), r(ctr - half, 6), r(ctr + half, 6))
    }
    val got = graft.SparkEntry.queries("q211_wilson_ci")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDouble(3), row.getDouble(4), row.getDouble(5))).toSeq
    assert(got == expected)
    got.foreach { case (et, _, _, p, lo, hi) =>
      assert(lo >= 0.0 && hi <= 1.0, s"$et Wilson must stay in [0,1]")
      assert(lo <= p && p <= hi, s"$et interval must contain p-hat")
      assert(lo < hi)
    }
  }

  test("q212: growth curve is monotone and ends at the activated population") {
    val first = graft.Tables.load(spark, sf0001, "events")
      .filter($"event_type" === "purchase" && $"value" >= 200)
      .groupBy($"user_id").agg(min(to_date($"ts")).as("d0"))
      .collect().map(row => (row.getLong(0), row.getDate(1).toLocalDate))
    val expected = first.groupBy(_._2).toSeq.sortBy(_._1).foldLeft(
      (Seq.empty[(String, Long, Long, Double)], 0L)) {
      case ((acc, cum), (d, xs)) =>
        val c = cum + xs.size
        (acc :+ ((d.toString, xs.size.toLong, c, 0.0)), c)
    }._1
    val tot = first.length.toLong
    val withShare = expected.map(x => (x._1, x._2, x._3,
      r(x._3.toDouble / tot, 6)))
    val got = graft.SparkEntry.queries("q212_cumulative_uniques")(spark, sf0001)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDouble(3))).toSeq
    assert(got == withShare)
    assert(got.map(_._3) == got.map(_._3).sorted, "cumulative count must be monotone")
    assert(got.last._3 == tot && got.last._4 == 1.0)
    assert(got.size > 1, "fixture must spread activation over multiple days")
  }

  test("q213: haversine replay matches; distances bounded by half circumference") {
    val keys = spark.read.parquet(s"$sf0001/nation.parquet")
      .select($"n_nationkey".cast("long")).collect().map(_.getLong(0))
    def coords(k: Long) = (
      math.toRadians((k * 37 % 1000).toDouble / 1000.0 * 160.0 - 80.0),
      math.toRadians((k * 91 % 1000).toDouble / 1000.0 * 360.0 - 180.0))
    def hav(a: Long, b: Long): Double = {
      val ((la1, lo1), (la2, lo2)) = (coords(a), coords(b))
      val h = math.pow(math.sin((la2 - la1) / 2), 2) +
        math.cos(la1) * math.cos(la2) * math.pow(math.sin((lo2 - lo1) / 2), 2)
      r(2.0 * 6371.0088 * math.asin(math.sqrt(h)), 3)
    }
    val expected = keys.sorted.map { a =>
      val cands = keys.filter(_ != a)
        .map(b => (math.floor(hav(a, b) * 1000 + 0.5).toLong, b))
      val (encd, b) = cands.min
      (a, r(encd.toDouble / 1000.0, 3), b, cands.length.toLong)
    }.toSeq
    val got = graft.SparkEntry.queries("q213_haversine")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getLong(2),
        row.getLong(3))).toSeq
    assert(got == expected)
    val halfC = math.Pi * 6371.0088
    got.foreach { case (a, d, b, _) =>
      assert(d > 0 && d <= halfC + 1e-6, s"$a->$b distance $d out of range")
    }
    // nearest-neighbor relation need not be symmetric, but distances are:
    // spot-check symmetry of the metric itself on one reported pair
    val (a0, d0, b0, _) = got.head
    assert(hav(b0, a0) == d0 || math.abs(hav(b0, a0) - d0) <= 1e-3)
  }
}
