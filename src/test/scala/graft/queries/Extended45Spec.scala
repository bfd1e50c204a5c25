package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for q269/q270: RAKE scores replay from a plain Scala pass over
  * the tokenized corpus; the FFD plan replays from a literal first-fit-
  * decreasing walk, and packing invariants hold (no bin of more than one
  * file exceeds capacity; FFD never beats the fractional lower bound).
  */
class Extended45Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  private val stop = Set("the", "a")

  test("q269: top-25 RAKE phrases replay from a plain Scala pass") {
    val got = graft.SparkEntry.queries("q269_rake_keywords")(spark, sf0001)
      .collect()
      .map(rw => (rw.getString(0), rw.getLong(1), rw.getLong(2), rw.getDouble(3)))
    assert(got.length == 25)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(rw => (rw.getLong(0), rw.getString(1)))
    // stopword-delimited phrases per doc
    val phrases = docs.flatMap { case (_, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      toks.foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) { out += cur.toSeq; cur = cur.take(0) } }
        else cur += t
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }
    val freq = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val deg = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    phrases.foreach(p => p.foreach { w => freq(w) += 1; deg(w) += p.length })
    def wScore(w: String) = BigDecimal(r(deg(w).toDouble / freq(w), 10))
    val byPhrase = phrases.groupBy(_.mkString(" ")).map { case (txt, ps) =>
      (txt, ps.length.toLong, ps.head.length.toLong,
        r(ps.head.map(wScore).sum.toDouble, 6))
    }.toSeq
    val exp = byPhrase.sortBy(t => (-t._4, t._1)).take(25)
    assert(got.toSeq == exp)
    // non-vacuous: multi-word phrases dominate, scores positive
    assert(got.forall(_._4 > 0) && got.exists(_._3 > 1))
  }

  test("q270: bin counts replay from a literal FFD walk; packing invariants hold") {
    val got = graft.SparkEntry.queries("q270_ffd_compaction")(spark, sf0001)
      .collect()
      .map(rw => (rw.getString(0), rw.getLong(1), rw.getLong(2), rw.getLong(3),
        rw.getLong(4), rw.getLong(5), rw.getDouble(6)))
    val cap = 1200L
    val files = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(rw => (rw.getString(0), rw.getLong(1), rw.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).take(200).map(_._3)).toMap
    got.foreach { case (src, nFiles, totalChars, nBins, maxBin, minBin, utilR) =>
      val sizes = files(src)
      assert(nFiles == sizes.length && totalChars == sizes.sum)
      val bins = scala.collection.mutable.ArrayBuffer[Long]()
      sizes.foreach { x =>
        bins.indexWhere(_ + x <= cap) match {
          case -1 => bins += x
          case i  => bins(i) += x
        }
      }
      assert(nBins == bins.length.toLong, s"$src bins")
      assert(maxBin == bins.max && minBin == bins.min)
      assert(utilR == r(totalChars.toDouble / (bins.length * cap.toDouble), 6))
      // no bin overfills (every fixture file fits alone)
      assert(sizes.max <= cap && bins.forall(_ <= cap))
      // FFD respects the fractional lower bound ⌈total/cap⌉
      assert(nBins >= (totalChars + cap - 1) / cap)
      // and the classical FFD guarantee (11/9 OPT + 1) against it
      assert(nBins <= (11 * ((totalChars + cap - 1) / cap) + 9 * 4) / 9)
    }
    assert(got.length == 20, "all sources planned")
  }
}
