package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 seventh batch (q238–q240): retrieval-metric
  * replays against a brute-force driver-side ranking (recall/precision/
  * MRR definitions + bounds), a full log-rank replay from raw subjects
  * (O−E sums to ~0 under no-difference-by-construction arms is NOT
  * assumed — the statistic is replayed exactly), and the split-leakage
  * audit's defining contrast: by_id leaks template groups at every SF,
  * by_content leaks ZERO by construction.
  */
class Extended34Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q238: recall/precision/MRR replay against a driver-side exact ranking") {
    val got = q("q238_retrieval_metrics")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getInt(1), rw.getLong(2), rw.getLong(3),
        rw.getDouble(4), rw.getDouble(5), rw.getDouble(6)))
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(rw => (rw.getLong(0), rw.getSeq[Float](1).toArray, rw.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until a.length).foreach { i =>
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byLabel = emb.groupBy(_._3).view.mapValues(_.length).toMap
    got.foreach { case (qid, qlabel, nClass, hits, recallR, precR, rrR) =>
      val qv = emb.find(_._1 == qid).get
      assert(qlabel == qv._3 && nClass == byLabel(qlabel))
      val ranked = emb.filter(_._1 != qid)
        .map(c => (c._1, c._3, cos(qv._2, c._2)))
        .sortBy(t => (-t._3, t._1)).take(10)
      val expHits = ranked.count(_._2 == qlabel)
      assert(hits == expHits)
      val denom = math.min(10, nClass - 1).toDouble
      assert(recallR == r(hits / denom, 6) && precR == r(hits / 10.0, 6))
      val firstIdx = ranked.indexWhere(_._2 == qlabel)
      val expRr = if (firstIdx < 0) 0.0 else 1.0 / (firstIdx + 1)
      assert(rrR == r(expRr, 6))
      assert(recallR >= 0 && recallR <= 1 && precR >= 0 && precR <= 1)
    }
    assert(got.exists(_._4 > 0), "at least one query must find a relevant hit")
  }

  test("q239: log-rank statistic replays exactly from raw subjects") {
    val row = q("q239_logrank")(spark, sf0001).collect().head
    val obsUs = 48L * 3600000000L
    val evs = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us")).collect()
      .map(rw => (rw.getLong(0), rw.getString(1), rw.getLong(2)))
    val mt = evs.map(_._3).max
    val subjects = evs.filter(_._2 == "signup").groupBy(_._1).map { case (uid, ss) =>
      val smin = ss.map(_._3).min
      val pmin = evs.filter(e => e._1 == uid && e._2 == "purchase" && e._3 >= smin)
        .map(_._3).minOption
      val oe = math.min(smin + obsUs, mt)
      val ev = pmin.exists(_ < oe)
      val dur = if (ev) (pmin.get - smin) / 3600000000L else (oe - smin) / 3600000000L
      (uid % 2, dur, if (ev) 1 else 0)
    }.toSeq
    assert(row.getLong(0) == subjects.count(_._1 == 1))
    assert(row.getLong(1) == subjects.count(_._1 == 0))
    assert(row.getLong(2) == subjects.filter(_._1 == 1).map(_._3).sum)
    assert(row.getLong(3) == subjects.filter(_._1 == 0).map(_._3).sum)
    val durs = subjects.map(_._2).distinct.sorted
    var oeSum = BigDecimal(0); var vSum = BigDecimal(0)
    durs.foreach { t =>
      val n1 = subjects.count(s => s._1 == 1 && s._2 >= t).toDouble
      val n0 = subjects.count(s => s._1 == 0 && s._2 >= t).toDouble
      val d1 = subjects.count(s => s._1 == 1 && s._2 == t && s._3 == 1).toDouble
      val d0 = subjects.count(s => s._1 == 0 && s._2 == t && s._3 == 1).toDouble
      val (d, n) = (d1 + d0, n1 + n0)
      if (d > 0) oeSum += BigDecimal(r(d1 - d * n1 / n, 10))
      if (d > 0 && n > 1)
        vSum += BigDecimal(r(d * (n1 / n) * (n0 / n) * (n - d) / (n - 1.0), 10))
    }
    assert(row.getDouble(4) == r(oeSum.toDouble, 6))
    assert(row.getDouble(5) == r(vSum.toDouble, 6))
    val chi2 = oeSum.toDouble * oeSum.toDouble / vSum.toDouble
    assert(row.getDouble(6) == r(chi2, 6) && chi2 >= 0.0)
    assert(row.getBoolean(7) == (chi2 > 3.841458820694124))
  }

  test("q240: by_id leaks template groups, by_content leaks zero; folds partition docs") {
    val got = q("q240_split_leakage")(spark, sf0001).collect()
      .map(rw => (rw.getString(0), rw.getLong(1), rw.getLong(2),
        rw.getDouble(3), rw.getLong(4)))
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    for (strategy <- Seq("by_id", "by_content")) {
      val rows = got.filter(_._1 == strategy)
      assert(rows.map(_._2).sorted.sameElements(0L to 4L), s"$strategy: 5 folds")
      assert(rows.map(_._3).sum == nDocs, s"$strategy: folds partition the corpus")
      rows.foreach(t => assert(t._4 >= 0.0 && t._4 <= 1.0))
    }
    val leakId = got.find(_._1 == "by_id").get._5
    val leakFp = got.find(_._1 == "by_content").get._5
    assert(leakId > 0, "id-keyed folding must show real template leakage at every SF")
    assert(leakFp == 0L, "content-keyed folding cannot leak by construction")
    // independent replay of the by_id leak count from raw text
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map { rw =>
        val ws = rw.getString(1).trim.toLowerCase.split("\\s+")
        (rw.getLong(0) % 5, ws.take(5).mkString(" "))
      }
    val exp = docs.groupBy(_._2).count { case (_, g) =>
      g.length > 1 && g.map(_._1).distinct.length > 1
    }
    assert(leakId == exp.toLong)
  }
}
