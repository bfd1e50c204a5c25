package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 fifth batch (q232–q234): a full pairwise-slope
  * replay of Theil–Sen (median slope within the pairwise-slope range;
  * robustness vs the OLS line stated where it matters), a closed-form
  * CUPED replay (θ and ρ² from raw integer moments; the adjusted means'
  * defining property — pooled adjusted mean equals pooled raw mean), and
  * a 2×2 DiD replay (did equals the explicit four-rate combination on
  * every row).
  */
class Extended32Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  private def medianOf(xs: Array[Double]): Double = {
    val s = xs.sorted
    val h = 0.5 * (s.length - 1)
    val i = h.toInt
    if (i + 1 < s.length) s(i) + (h - i) * (s(i + 1) - s(i)) else s(i)
  }

  test("q232: Theil–Sen replays from all pairwise slopes; slope robust-bounded") {
    val row = q("q232_theil_sen")(spark, sf0001).collect().head
    val base = java.time.LocalDate.parse("1995-01-01").toEpochDay
    val daily = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(to_date($"l_shipdate").as("d"), $"l_extendedprice").collect()
      .map(rw => (rw.getDate(0).toLocalDate.toEpochDay - base,
        BigInt(r(rw.getDouble(1) * 100.0, 0).toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toSeq
      .map { case (x, y) => (x, y) }.sortBy(_._1).toArray
    assert(row.getLong(0) == daily.length)
    val slopes = for {
      i <- daily.indices.toArray; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2) / (daily(j)._1 - daily(i)._1).toDouble
    assert(row.getLong(1) == slopes.length.toLong)
    val slope = medianOf(slopes)
    assert(row.getDouble(2) == r(slope, 6))
    val icpt = medianOf(daily.map { case (x, y) => y - slope * x })
    assert(row.getDouble(3) == r(icpt, 2))
    assert(slope > slopes.min && slope < slopes.max,
      "median slope must sit strictly inside the pairwise-slope range")
  }

  test("q233: CUPED θ/ρ² replay; pooled adjusted mean equals pooled raw mean") {
    val got = q("q233_cuped")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getDouble(2), rw.getDouble(3),
        rw.getDouble(4), rw.getDouble(5), rw.getDouble(6)))
    val mid = java.sql.Date.valueOf("2024-01-16")
    val users = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id", to_date($"ts").as("d"), $"event_type").collect()
      .map(rw => (rw.getLong(0), rw.getDate(1), rw.getString(2)))
      .groupBy(_._1).map { case (uid, evs) =>
        (uid % 2,
          evs.count(e => e._3 == "view" && e._2.before(mid)).toLong,
          evs.count(e => e._3 == "purchase" && !e._2.before(mid)).toLong)
      }.toSeq
    val n = users.length.toDouble
    val sx = users.map(_._2).sum.toDouble; val sy = users.map(_._3).sum.toDouble
    val sxx = users.map(u => u._2 * u._2).sum.toDouble
    val sxy = users.map(u => u._2 * u._3).sum.toDouble
    val syy = users.map(u => u._3 * u._3).sum.toDouble
    val varx = n * sxx - sx * sx; val covxy = n * sxy - sx * sy
    val vary = n * syy - sy * sy
    val theta = covxy / varx
    got.foreach { case (arm, nU, xbar, ybar, adjM, thetaR, rho2R) =>
      val au = users.filter(_._1 == arm)
      assert(nU == au.length)
      val (axb, ayb) = (au.map(_._2).sum.toDouble / au.length,
        au.map(_._3).sum.toDouble / au.length)
      assert(xbar == r(axb, 6) && ybar == r(ayb, 6))
      assert(adjM == r(ayb - theta * (axb - sx / n), 6))
      assert(thetaR == r(theta, 6))
      assert(rho2R == r(covxy * covxy / (varx * vary), 6))
      assert(rho2R >= 0.0 && rho2R <= 1.0)
    }
    // CUPED's defining conservation: the n-weighted adjusted means pool to ȳ
    val pooledAdj = got.map { case (arm, nU, _, _, _, _, _) =>
      val au = users.filter(_._1 == arm)
      val (axb, ayb) = (au.map(_._2).sum.toDouble / au.length,
        au.map(_._3).sum.toDouble / au.length)
      (ayb - theta * (axb - sx / n)) * nU
    }.sum / users.length
    assert(math.abs(pooledAdj - sy / n) < 1e-9)
  }

  test("q234: DiD equals the explicit 2×2 rate combination; all four cells real") {
    val got = q("q234_did")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getBoolean(1), rw.getLong(2), rw.getLong(3),
        rw.getDouble(4), rw.getDouble(5)))
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, false), (0L, true), (1L, false), (1L, true)))
    val mid = java.sql.Date.valueOf("2024-01-16")
    val evs = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id", to_date($"ts").as("d"), $"event_type").collect()
      .map(rw => (rw.getLong(0) % 2, !rw.getDate(1).before(mid), rw.getString(2)))
    val rates = got.map { case (arm, post, nE, nP, rateR, _) =>
      val cell = evs.filter(e => e._1 == arm && e._2 == post)
      assert(nE == cell.length && nP == cell.count(_._3 == "purchase"))
      assert(nP > 0 && nP < nE, "degenerate cell would make DiD vacuous")
      val rate = nP.toDouble / nE
      assert(rateR == r(rate, 6))
      ((arm, post), rate)
    }.toMap
    val did = (rates((1L, true)) - rates((1L, false))) -
      (rates((0L, true)) - rates((0L, false)))
    got.foreach(t => assert(t._6 == r(did, 6), "did_r must repeat on every row"))
  }
}
