package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 twelfth batch (q254–q255): an exact java-md5
  * replay of the Efraimidis–Spirakis race (plus the property that the
  * weighted sample differs from BOTH the pure-weight top-k and the
  * unweighted hash order — weight and randomness both matter), and a
  * rate-outlier replay with the relative threshold's non-vacuousness.
  */
class Extended39Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  private def md5hex(s0: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("q254: E–S race replays exactly; weight AND randomness both matter") {
    val got = q("q254_weighted_reservoir")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getDouble(3),
        rw.getDouble(4)))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"n_chars").collect()
      .map(rw => (rw.getLong(0), rw.getLong(1)))
    val raced = docs.map { case (id, w) =>
      val u = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 12), 16)
        .toDouble / 2.81474976710656e14
      (id, w, u, -math.log(u) / w.toDouble)
    }.sortBy(t => (t._4, t._1)).take(20)
    assert(got.length == 20)
    got.zip(raced).foreach { case ((rank, id, w, uR, kR), (eid, ew, eu, ek)) =>
      assert(id == eid && w == ew)
      assert(uR == r(eu, 8) && kR == r(ek * 1e6, 6))
      assert(rank >= 1 && rank <= 20)
    }
    val sample = got.map(_._2).toSet
    val topByWeight = docs.sortBy(d => (-d._2, d._1)).take(20).map(_._1).toSet
    val unweighted = docs.map { case (id, _) =>
      (id, java.lang.Long.parseLong(md5hex(id.toString).substring(0, 12), 16))
    }.sortBy(t => (t._2, t._1)).take(20).map(_._1).toSet
    assert(sample != topByWeight, "the race must not degenerate to pure weight order")
    assert(sample != unweighted, "the race must not degenerate to unweighted hash order")
    // the weighted sample should skew long: mean weight above corpus mean
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(got.map(_._3).sum.toDouble / 20 > corpusMean,
      "length-weighted sampling must overselect long documents")
  }

  test("q255: rate outliers replay; relative threshold keeps the screen non-vacuous") {
    val got = q("q255_rate_outliers")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getDouble(3),
        rw.getDouble(4), rw.getLong(5)))
    assert(got.nonEmpty, "the p95 screen must always flag someone")
    val evs = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", date_trunc("minute", $"ts").as("m")).collect()
      .map(rw => (rw.getLong(0), rw.getTimestamp(1)))
    val users = evs.groupBy(_._1).map { case (uid, es) =>
      (uid, es.length.toLong, es.map(_._2).distinct.length.toLong)
    }.toSeq
    val rates = users.map(u => u._2.toDouble / u._3).toArray.sorted
    val h = 0.95 * (rates.length - 1); val i = h.toInt
    val p95 = if (i + 1 < rates.length) rates(i) + (h - i) * (rates(i + 1) - rates(i))
      else rates(i)
    val expect = users.filter(u => u._2.toDouble / u._3 > p95).map(_._1).toSet
    assert(got.map(_._1).toSet == expect)
    got.foreach { case (uid, nEv, aMin, rateR, p95R, nUsers) =>
      val u = users.find(_._1 == uid).get
      assert(nEv == u._2 && aMin == u._3)
      assert(rateR == r(nEv.toDouble / aMin, 6) && rateR > p95R)
      assert(p95R == r(p95, 6) && nUsers == users.length)
    }
  }
}
