package graft

import org.apache.spark.sql.functions._

/** q321: corpus BPE encode with the q147-trained merges. */
class Extended66Spec extends SparkSuite {

  private def replayBpe(word: String, merges: Seq[(String, String)]): Seq[String] = {
    // rank-order application, each merge greedy left-to-right — the
    // plain-Scala twin of the Spark `aggregate` HOF fold
    var syms = word.split("").toSeq
    merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      syms.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b) { out.remove(out.length - 1); out += (a + b) }
        else out += x
      }
      syms = out.toSeq
    }
    syms
  }

  test("q321: the trained vocabulary's segmentations replay in plain Scala, and subwords partition each word") {
    val (mergeDfs, vocab) = graft.queries.Extended9.bpeTrainLoop(spark, sf0001)
    val merges = mergeDfs.reduce(_ unionAll _).orderBy("it").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSeq
    assert(merges.size == 4)
    vocab.cache()
    try {
      // partition property: concatenating the subwords restores the word
      val broken = vocab.filter(concat_ws("", col("syms")) =!= col("w")).count()
      assert(broken == 0L, "a segmentation does not partition its word")
      // independent replay on every vocabulary word
      val rows = vocab.select(col("w"), col("syms")).collect()
      rows.foreach { r =>
        val w = r.getAs[String]("w")
        val got = r.getSeq[String](1)
        val want = replayBpe(w, merges)
        assert(got == want, s"word '$w': engine [${got.mkString("|")}] != replay [${want.mkString("|")}]")
      }
    } finally { vocab.unpersist(); () }
  }

  test("q321: per-doc rollup is consistent (subwords >= tokens; ratio matches; encode covers every alpha token)") {
    val got = SparkEntry.queries("q321_bpe_encode")(spark, sf0001)
    got.cache()
    try {
      assert(got.filter(col("n_subwords") < col("n_alpha_tokens")).count() == 0L)
      def r6 = (x: org.apache.spark.sql.Column) =>
        signum(x) * floor(abs(x) * 1e6 + lit(0.5)) / 1e6 + lit(0.0)
      val badRatio = got.filter(col("ratio_r") =!=
        r6(col("n_subwords").cast("double") / col("n_alpha_tokens").cast("double"))).count()
      assert(badRatio == 0L)
      // coverage: per-doc alpha-token counts equal a direct recount
      val want = Tables.load(spark, sf0001, "documents")
        .select(col("doc_id"), explode(graft.ext.Text.tokensNorm(col("text"))).as("t"))
        .filter(col("t").rlike("^[a-z]+$"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("w_n"))
      val bad = got.join(want, Seq("doc_id"), "full")
        .filter(!(col("n_alpha_tokens") <=> col("w_n"))).count()
      assert(bad == 0L, "encode dropped or duplicated alpha tokens for some doc")
    } finally { got.unpersist(); () }
  }
}
