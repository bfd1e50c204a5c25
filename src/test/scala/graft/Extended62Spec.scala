package graft

import org.apache.spark.sql.functions._

/** q315 (hybrid dense+sparse RRF retrieval), q316 (verbatim shared spans). */
class Extended62Spec extends SparkSuite {

  test("q315: dense top-5 per probe; RRF recomputed from the reported arm ranks reproduces score and order") {
    val got = SparkEntry.queries("q315_hybrid_retrieval")(spark, sf0001)
    got.cache()
    try {
      val perQ = got.groupBy(col("qid"))
        .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"), min(col("rank")).as("mn"))
      assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5L || col("mn") =!= 1L).count() == 0L,
        "some probe did not produce a dense(1..5) fused list")
      // recompute rrf from the reported arm ranks with the same rounding
      val term = (r: org.apache.spark.sql.Column) =>
        coalesce(graft.ops.Num.roundTo(lit(1.0) / (lit(60) + r.cast("double")), 12)
          .cast(org.apache.spark.sql.types.DecimalType(24, 12)),
          lit(0).cast(org.apache.spark.sql.types.DecimalType(24, 12)))
      val re = got.withColumn("want_rrf",
        graft.ops.Num.roundTo((term(col("r_dense")) + term(col("r_sparse"))).cast("double"), 6))
      assert(re.filter(col("rrf_r") =!= col("want_rrf")).count() == 0L,
        "reported rrf_r diverges from the recomputed reciprocal sum")
      // within each probe, fused rank order must be (rrf desc, id asc)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("rrf_r").desc, col("id").asc)
      val reRank = got.withColumn("want_rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") =!= col("want_rank"))
      assert(reRank.count() == 0L, "fused rank is not the (rrf desc, id) order")
      // an id that tops BOTH arms must top the fusion (2/(k+1) beats any
      // other achievable sum: 1/(k+1) + 1/(k+2) is strictly smaller)
      val doubleTop = got.filter(col("r_dense") === 1L && col("r_sparse") === 1L)
      assert(doubleTop.filter(col("rank") =!= 1L).count() == 0L,
        "an id ranked 1 by both arms was not fused rank 1")
    } finally { got.unpersist(); () }
  }

  test("q315: the dense arm ranks agree with bruteForceTopK") {
    val got = SparkEntry.queries("q315_hybrid_retrieval")(spark, sf0001)
      .filter(col("r_dense").isNotNull)
      .select(col("qid"), col("id"), col("r_dense"))
    val emb = Tables.load(spark, sf0001, "embeddings")
    val want = graft.ext.Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 20)
      .select(col("qid"), col("cid").as("id"), col("rn").as("want_r"))
    val bad = got.join(want, Seq("qid", "id"), "left")
      .filter(!(col("r_dense") <=> col("want_r"))).count()
    assert(bad == 0L, "a fused row's dense rank diverges from bruteForceTopK")
  }

  test("q316: every reported span equals the token-level longest-common-substring of that pair") {
    val got = SparkEntry.queries("q316_verbatim_spans")(spark, sf0001).collect()
    assert(got.nonEmpty, "fixture contains near-dup docs; q316 must report pairs")
    val ids = got.flatMap(r => Seq(r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val toks = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"), graft.ext.Text.tokensNorm(col("text")).as("ws"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toArray)
      .toMap
    def lcs(x: Array[String], y: Array[String]): Int = {
      val prev = new Array[Int](y.length + 1)
      val cur = new Array[Int](y.length + 1)
      var best = 0
      for (i <- 1 to x.length) {
        for (j <- 1 to y.length) {
          cur(j) = if (x(i - 1) == y(j - 1)) prev(j - 1) + 1 else 0
          if (cur(j) > best) best = cur(j)
        }
        System.arraycopy(cur, 0, prev, 0, y.length + 1)
      }
      best
    }
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val want = lcs(toks(a), toks(b))
      assert(r.getAs[Long]("max_span_tokens") == want,
        s"pair ($a,$b): reported span ${r.getAs[Long]("max_span_tokens")} != LCS $want")
    }
  }

  test("q316: completeness — every q36 near-dup pair with token-LCS >= 12 is reported at exactly that span") {
    val got = SparkEntry.queries("q316_verbatim_spans")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Long]("max_span_tokens"))
      .toMap
    // independently-chosen candidate set: q36's Jaccard near-dup pairs
    val pairs = SparkEntry.queries("q36_dedup_ngram")(spark, sf0001)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has near-dup pairs; the completeness pin needs them")
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val toks = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"), graft.ext.Text.tokensNorm(col("text")).as("ws"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toArray)
      .toMap
    def lcs(x: Array[String], y: Array[String]): Int = {
      val prev = new Array[Int](y.length + 1)
      val cur = new Array[Int](y.length + 1)
      var best = 0
      for (i <- 1 to x.length) {
        for (j <- 1 to y.length) {
          cur(j) = if (x(i - 1) == y(j - 1)) prev(j - 1) + 1 else 0
          if (cur(j) > best) best = cur(j)
        }
        System.arraycopy(cur, 0, prev, 0, y.length + 1)
      }
      best
    }
    var exercised = 0
    pairs.foreach { case (a, b) =>
      val want = lcs(toks(a), toks(b))
      if (want >= 12) {
        exercised += 1
        assert(got.get((a, b)).contains(want.toLong),
          s"near-dup pair ($a,$b) with LCS $want missing or misreported: ${got.get((a, b))}")
      }
    }
    assert(exercised > 0, "no q36 pair had a >=12-token verbatim span; pin is vacuous")
  }
}
