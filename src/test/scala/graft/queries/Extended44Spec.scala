package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** q268 pins: a plain-Scala replay of the whole pipeline — journey
  * construction, transition estimation, scenario redirects, and the
  * 24-step rounded absorption iteration — plus the model's defining
  * properties (removal never helps; shares partition the total effect).
  */
class Extended44Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  private val channels = Seq("click", "error", "signup", "view")
  private val transients = "START" +: channels

  test("q268: removal-effect attribution replays from a plain Scala chain") {
    val got = graft.SparkEntry.queries("q268_markov_attribution")(spark, sf0001)
      .collect()
      .map(rw => (rw.getString(0), rw.getDouble(1), rw.getDouble(2),
        rw.getDouble(3), rw.getDouble(4)))
    assert(got.map(_._1).toSeq == channels)

    // journeys from raw events
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .collect()
      .map(rw => (rw.getLong(0), rw.getString(1),
        (rw.get(2) match {
          case t: java.sql.Timestamp =>
            t.getTime / 1000 * 1000000L + t.getNanos / 1000
          case d: java.time.LocalDateTime =>
            val i = d.toInstant(java.time.ZoneOffset.UTC)
            i.getEpochSecond * 1000000L + i.getNano / 1000
        }, rw.getLong(3))))
      .groupBy(_._1)
    val trans = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    ev.values.foreach { rows =>
      val ordered = rows.toSeq.sortBy(_._3).map(_._2)
      val cut = ordered.indexOf("purchase")
      val path =
        if (cut >= 0) ordered.take(cut).map(identity) :+ "CONV"
        else ordered
      ("START" +: path).zip(path).foreach { case (a, b) => trans((a, b)) += 1 }
      if (cut < 0) trans((path.last, "NULL")) += 1
    }
    val tots = trans.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    def p(scen: String)(s: String, t: String): Double = {
      if (s == scen) return 0.0
      val direct = if (t == scen) 0.0
        else trans((s, t)).toDouble / tots(s)
      if (t == "NULL") direct + trans((s, scen)).toDouble / tots(s)
      else direct
    }
    def absorb(scen: String): Double = {
      var v = transients.map(_ => 0.0)
      for (_ <- 1 to 24) {
        v = transients.map { s =>
          // left-assoc add in the engines' exact textual term order
          val terms = p(scen)(s, "CONV") +:
            channels.map(t => p(scen)(s, t) * v(transients.indexOf(t)))
          r(terms.reduceLeft(_ + _), 12)
        }
      }
      v.head
    }
    val base = absorb("none")
    val effects = channels.map(c => c -> (base - absorb(c)))
    val efftot = effects.map(t => BigDecimal(r(t._2, 10))).sum
    got.foreach { case (c, baseR, remR, effR, shareR) =>
      val eff = effects.toMap.apply(c)
      assert(baseR == r(base, 6), s"$c base")
      assert(remR == r(base - eff, 6), s"$c removed")
      assert(effR == r(eff, 6), s"$c effect")
      assert(shareR == r(r(eff, 10) / efftot.toDouble, 6), s"$c share")
      // removal never increases conversion
      assert(eff >= 0.0, s"$c effect nonnegative")
    }
    // shares partition the effect mass
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-4)
    assert(base > 0.0 && got.map(_._4).sum > 0.0)
  }
}
