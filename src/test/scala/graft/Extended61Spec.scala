package graft

import org.apache.spark.sql.functions._

/** q310 (IVF+PQ ADC), q311 (stream-static join), q312 (span scrub),
  * q313 (epoch schedule), q314 (balanced shards).
  */
class Extended61Spec extends SparkSuite {

  test("q310: every query returns rn 1..5 and the rerank cosine equals the brute-force cosine") {
    val got = SparkEntry.queries("q310_ivfpq_adc")(spark, sf0001)
    got.cache()
    try {
      val perQ = got.groupBy(col("qid"))
        .agg(count(lit(1)).as("n"), max(col("rn")).as("mx"), min(col("rn")).as("mn"))
      assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5L || col("mn") =!= 1L).count() == 0L,
        "some query did not produce a dense top-5")
      // the reranked cosine must be the TRUE cosine of that (qid, cid)
      // pair — recompute from raw vectors via the brute-force scorer
      val emb = Tables.load(spark, sf0001, "embeddings")
      val exact = graft.ext.Similarity
        .bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = Int.MaxValue)
        .select(col("qid"), col("cid"), graft.ops.Num.roundTo(col("cos"), 4).as("want"))
      val bad = got.join(exact, Seq("qid", "cid"))
        .filter(col("cos_r") =!= col("want")).count()
      assert(bad == 0L, "reranked cosine diverges from the exact pair cosine")
    } finally { got.unpersist(); () }
  }

  test("q310: with every vector its own codeword (codeStride=1), ADC == exact dot ordering inside probed cells") {
    // stride-1 PQ reconstructs exactly, so the ADC score is the exact
    // inner product (up to the decimal re-bracketing of 4 subspace
    // partials) and the ADC ranking must equal the dot ranking
    val emb = Tables.load(spark, sf0001, "embeddings").filter(col("vec_id") < 120)
    val adc = graft.ext.Similarity.ivfPqTopK(
      emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, cellStride = 11, codeStride = 1, nSub = 4, subDim = 16, nProbe = 100)
    // exhaustive probes → candidate set is the whole corpus; exact dot
    // ranking via brute force (cos ranking != dot ranking in general,
    // so rank by the un-normalized dot directly)
    val v = emb.select(col("vec_id"), graft.ext.Similarity.toDouble(col("embedding")).as("e"))
    val q = v.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val dots = v.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        graft.ext.Similarity.dot(col("qe"), col("e")).as("dt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dt").desc, col("cid").asc)
    val want = dots.withColumn("wrn", row_number().over(w).cast("bigint"))
      .filter(col("wrn") <= 5).select(col("qid"), col("cid"), col("wrn"))
    val diverged = adc.select(col("qid"), col("cid"), col("rn"))
      .join(want, Seq("qid", "cid"), "full")
      .filter(!(col("rn") <=> col("wrn"))).count()
    assert(diverged == 0L, "stride-1 ADC ranking diverged from the exact dot ranking")
  }

  test("q311: replayed stream-static join equals the batch join+agg twin") {
    val got = SparkEntry.queries("q311_stream_static_join")(spark, sf0001)
    val dim = Tables.load(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val want = Tables.load(spark, sf0001, "events")
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("wn"),
        graft.ops.Num.roundTo(sum(col("value")), 4).as("ws"))
    val bad = got.join(want, Seq("c_mktsegment"), "full")
      .filter(!(col("n_events") <=> col("wn")) || !(col("value_sum_r") <=> col("ws")))
      .count()
    assert(bad == 0L)
  }

  test("q312: exact-duplicate docs scrub to empty; clean docs keep their full normalized text") {
    val got = SparkEntry.queries("q312_span_scrub")(spark, sf0001)
    got.cache()
    try {
      val docs = Tables.load(spark, sf0001, "documents")
      // any doc whose normalized text appears in ≥2 docs has EVERY
      // segment shared → all segments drop → md5 of the empty string
      val norm = graft.ext.Text.normalize(col("text"))
      val dupDocs = docs.select(col("doc_id"), norm.as("nt"))
        .withColumn("nd", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("nt"))))
        .filter(col("nd") >= 2).select("doc_id")
      val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
      val notScrubbed = got.join(dupDocs, "doc_id")
        .filter(col("scrubbed_fp") =!= emptyMd5 || col("n_dup_segs") =!= col("n_segs"))
        .count()
      assert(notScrubbed == 0L, "an exact-duplicate doc kept some segment")
      // docs with zero dropped segments must reassemble to exactly the
      // normalized token stream (segments partition the tokens)
      val wantFp = docs.select(col("doc_id"),
        md5(concat_ws(" ", graft.ext.Text.tokensNorm(col("text")))).as("want"))
      val broken = got.filter(col("n_dup_segs") === 0L)
        .join(wantFp, "doc_id")
        .filter(col("scrubbed_fp") =!= col("want")).count()
      assert(broken == 0L, "a clean doc's reassembly diverged from its normalized text")
    } finally { got.unpersist(); () }
  }

  test("q313: targets sum to the budget, epochs cap at 4, capped flag consistent") {
    val rows = SparkEntry.queries("q313_epoch_schedule")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val t = rows.map(_.getAs[Long]("t")).sum
    val targetSum = rows.map(_.getAs[Double]("target_tokens_r")).sum
    assert(math.abs(targetSum - 0.5 * t) / (0.5 * t) < 1e-6,
      s"targets sum $targetSum != half the corpus ${0.5 * t}")
    rows.foreach { r =>
      val e = r.getAs[Double]("epochs_r")
      assert(e > 0.0 && e <= 4.0)
      assert(r.getAs[Boolean]("capped") == (e == 4.0))
    }
  }

  test("q314: shard assignment matches the native per-source window rank mod 8") {
    val got = SparkEntry.queries("q314_balanced_shards")(spark, sf0001)
    val d = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        size(graft.ext.Text.tokensNorm(col("text"))).cast("long").as("n_tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_tok").desc, col("doc_id").asc)
    val want = d.withColumn("wshard",
      ((row_number().over(w).cast("long") - 1) % 8).cast("int"))
    val diverged = got.join(want.select(col("doc_id"), col("wshard")), "doc_id")
      .filter(col("shard") =!= col("wshard")).count()
    assert(diverged == 0L, "PrefixSum shard diverged from the window shard")
    // rollup columns must agree with a direct recount
    val bad = got.groupBy(col("shard"), col("shard_docs"), col("shard_tokens"))
      .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("tk"))
      .filter(col("n") =!= col("shard_docs") || col("tk") =!= col("shard_tokens"))
      .count()
    assert(bad == 0L, "shard rollup columns inconsistent with member rows")
  }
}
