package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for q214: independent replay plus the conservation law that is
  * linear attribution's reason to exist — total credit across all
  * attributed types (including '(none)') must equal the number of
  * purchases EXACTLY, because each purchase distributes one unit.
  */
class Extended27Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q214: linear attribution replays; credit conserves to the purchase count") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        $"event_type", $"value").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getString(3), row.getDouble(4)))
    val byUser = ev.groupBy(_._1)
    case class Credit(attr: String, pid: Long, credit: Double, pv: BigDecimal)
    val credits = ev.filter(_._4 == "purchase").flatMap { p =>
      val touches = byUser(p._1).filter(t =>
        t._4 != "purchase" && t._2 >= p._2 - 86400000000L && t._2 < p._2)
      val pv = BigDecimal(r(p._5, 4))
      if (touches.isEmpty) Seq(Credit("(none)", p._3, 1.0, pv))
      else touches.toSeq.map(t => Credit(t._4, p._3, 1.0 / touches.length, pv))
    }
    val expected = credits.groupBy(_.attr).toSeq.sortBy(_._1).map { case (a, xs) =>
      (a, r(xs.map(x => BigDecimal(r(x.credit, 12))).sum.toDouble, 6),
        r(xs.map(x => BigDecimal(r((x.pv * x.credit).toDouble, 8))).sum.toDouble, 4),
        xs.map(_.pid).distinct.size.toLong)
    }
    val got = graft.SparkEntry.queries("q214_linear_attribution")(spark, sf0001)
      .collect().map(row => (row.getString(0), row.getDouble(1), row.getDouble(2),
        row.getLong(3))).toSeq
    assert(got == expected)
    // conservation: Σ credit = n purchases (within the 1e-12 term rounding)
    val nPurch = ev.count(_._4 == "purchase")
    assert(math.abs(got.map(_._2).sum - nPurch) < 1e-4,
      s"credit ${got.map(_._2).sum} must conserve to $nPurch")
    // the multi-touch path must be real: some purchase split its credit
    assert(credits.exists(c => c.credit > 0 && c.credit < 1.0))
  }
}
