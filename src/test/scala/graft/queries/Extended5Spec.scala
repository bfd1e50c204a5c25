package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics pins for the round-5 curation queries (q116–q118). The
  * DuckDB oracle proves cross-engine equality; these pin the INTENDED
  * behavior on hand-computable inputs so a future refactor can't drift
  * both sides in lockstep.
  */
class Extended5Spec extends SparkSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("x5docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def q(name: String) = graft.SparkEntry.queries(name)

  test("q118 chunking: stride-24/window-32 boundaries, ragged tail, short doc") {
    val toks40 = (1 to 40).map(i => s"t$i")
    val dir = writeDocs(Seq(
      (1L, toks40.mkString(" ")), // 40 tokens → chunks [1..32], [25..40]
      (2L, "a b c"))) // 3 tokens → single short chunk
    val rows = q("q118_chunk_windows")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length == 3)
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(d1(0)._3 == 32 && d1(0)._4 == toks40.take(32).mkString(" "))
    // second window starts at token 25 (8-token overlap), ragged 16-token tail
    assert(d1(1)._3 == 16 && d1(1)._4 == toks40.drop(24).mkString(" "))
    val d2 = rows.filter(_._1 == 2L)
    assert(d2.head._2 == 0L && d2.head._3 == 3 && d2.head._4 == "a b c")
  }

  test("q118 chunking: full coverage, no token lost or duplicated beyond overlap") {
    val n = 100
    val toks = (1 to n).map(i => s"w$i")
    val dir = writeDocs(Seq((1L, toks.mkString(" "))))
    val chunks = q("q118_chunk_windows")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getString(3).split(" ").toSeq))
    // ceil(max(100-32,0)/24)+1 = ceil(68/24)+1 = 3+1 = 4 windows
    assert(chunks.length == 4)
    // union of windows covers every token; consecutive windows overlap by 8
    assert(chunks.flatMap(_._2).toSet == toks.toSet)
    chunks.sortBy(_._1).toSeq.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        assert(a.takeRight(8) == b.take(8) || b.size < 8)
      case _ => ()
    }
  }

  test("q116 gopher rules: each rule flips on its own boundary") {
    val good = (1 to 25).map(i => "the word" + ("x" * (i % 3))).mkString(" ")
    val dir = writeDocs(Seq(
      (1L, good), // passes everything: 25 tokens, mean len ~4, all alpha, stopwords
      (2L, (1 to 10).map(_ => "the ok").mkString(" ")), // 20 tokens → len_ok boundary pass
      (3L, "the of " + (1 to 30).map(_ => "#### $$$$").mkString(" ")), // symbol-heavy → sym_ok fail
      (4L, (1 to 25).map(i => s"w$i").mkString(" ")) // zero stopwords → stop_ok fail
    ))
    val m = q("q116_gopher_rules")(spark, dir)
      .select("doc_id", "len_ok", "sym_ok", "stop_ok", "keep")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(m(1L) == ((true, true, true, true)))
    assert(m(2L)._1) // exactly 20 tokens is inside the closed band
    assert(!m(3L)._2 && !m(3L)._4) // symbol fraction > 0.1 → drop
    assert(!m(4L)._3 && !m(4L)._4) // no stopwords → drop
  }

  test("q117 unigram surprisal: hand-computed corpus value; rare > common") {
    // corpus: c(a)=3, c(b)=3, c(c)=1, c(d)=1, N=8
    // doc1 = 'a a a b' → every token has p=3/8 → mean = log2(8/3)
    // doc2 = 'b b c d' → (2·log2(8/3) + 2·log2(8)) / 4
    val dir = writeDocs(Seq((1L, "a a a b"), (2L, "b b c d")))
    val m = q("q117_unigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lg = (x: Double) => math.log(x) / math.log(2.0)
    assert(m(1L)._1 == 4L && m(2L)._1 == 4L)
    assert(math.abs(m(1L)._2 - lg(8.0 / 3.0)) < 1e-3)
    assert(math.abs(m(2L)._2 - (2 * lg(8.0 / 3.0) + 2 * lg(8.0)) / 4) < 1e-3)
    assert(m(2L)._2 > m(1L)._2) // rarer tokens → higher surprisal
  }
}
