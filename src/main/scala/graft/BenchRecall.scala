package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builder-side recall curve for the persisted IVF index: recall@5 of
  * [[graft.ext.IvfIndex.serveTopK]] against the brute-force exact anchor,
  * per nProbe — the production recall/latency dial, measured on the same
  * persisted artifact q324 serves (q123 hash-gates the lazy trained index
  * at nProbe=3; this sweeps the knob). Exhaustive probing must land at
  * recall 1.0 (the losslessness identity Extended68Spec pins).
  *
  * ADC quality (round 15, re-budgeted round 16 per ADVICE — the full
  * matrix ran at EVERY nProbe point and blew the bench session budget):
  * the per-nProbe loop now measures only the cheap IVF-Flat recall; the
  * ADC matrix — strided vs per-subspace-TRAINED codebooks
  * ([[graft.ext.Similarity.trainSubCodebooks]]), pre-rerank (top-5 by raw
  * ADC) vs post-rerank (exact-cosine top-5 of a shortlist) at both the
  * fixed-20 and cell-load shortlist — runs ONCE at a representative
  * nProbe. The trained codebook's reconstruction error is also printed
  * (k-means monotonicity says trained ≤ strided; RecallSpec pins it).
  *
  * CODEBOOK-SIZE AXIS (round 16, verdict item 4): at the production
  * 64-codeword × nSub=4 config raw ADC cannot rank within a cluster
  * (pre-rerank recall 0.012 — code-tied candidates break by cid); the
  * resolution lever is more/finer codes. The axis sweep builds one index
  * per geometry — (64,4,16) the battery's, (256,8,8) q334's FAISS
  * standard, (1024,8,8) — and reports pre-/post-rerank ADC recall at the
  * representative nProbe, showing recall climb as codes gain resolution.
  *
  * Usage: runMain graft.BenchRecall <sfDir> <nProbe1,nProbe2,...> [nQueries]
  */
object BenchRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val probes = args(1).split(",").map(_.toInt)
    val nQ = if (args.length > 2) args(2).toInt else 100
    val spark = BenchSession.build()
    val host0 = Host.sample()
    // refuse a stale clustered fixture (ADVICE r15): pre-v2 dirs measure
    // the collapsed 2-plane geometry, not 64-dim cluster recovery
    GenClustered.requireCurrentVersion(dir)
    val ix = graft.ext.IvfIndex.Cache.indexFor(spark, dir)
    val ixT = graft.ext.IvfIndex.Cache.trainedIndexFor(spark, dir)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < nQ)
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(
      graft.ext.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5))
    def recallOf(got: Set[(Long, Long)]): Double =
      (exact intersect got).size.toDouble / exact.size
    // reconstruction error (sum of squared PQ quantization error over the
    // corpus) per codebook — the quality the training buys, printed once
    def reconOf(index: String, nSub: Int, subDim: Int): Double = {
      val cb = spark.read.parquet(s"$index/codebook")
      graft.ext.Similarity
        .pqEncodeWith(emb, "vec_id", "embedding", cb, nSub, subDim)
        .agg(sum(col("recon"))).head().getDouble(0)
    }
    val (reconS, reconT) = (
      reconOf(ix, graft.ext.IvfIndex.Cache.nSub, graft.ext.IvfIndex.Cache.subDim),
      reconOf(ixT, graft.ext.IvfIndex.Cache.nSub, graft.ext.IvfIndex.Cache.subDim))
    println(f"""{"pq_recon":"strided","sum_sq_err":$reconS%.2f}""")
    println(f"""{"pq_recon":"trained","sum_sq_err":$reconT%.2f,"vs_strided":${reconT / reconS}%.4f}""")
    // ADC shortlist = avg cell load: PQ code resolution bounds the ADC
    // ranking (candidates sharing the query's codes are TIED, broken by
    // cid), so the exact rerank must see the whole code-tied set — on
    // clustered data that set is the cell load. An under-sized shortlist
    // (the fixed 20 also reported) covers only shortlist/load of the tie
    // set; RecallSpec pins both ends of that dial.
    val nVec = emb.count()
    val nCells = spark.read.parquet(s"$ix/centroids").count()
    val load = math.max(20L, nVec / math.max(1L, nCells)).toInt

    // pre-rerank = top-5 by raw ADC score; post = exact-cosine top-5 of a
    // `shortlist`-deep ADC shortlist (the two-stage serve)
    def adcRecalls(index: String, nSub: Int, subDim: Int, nProbe: Int,
        shortlist: Int, residual: Boolean = false): (Double, Double) = {
      val served0 =
        if (residual) graft.ext.IvfIndex
          .servePqResidualTopK(spark, index, q, "vec_id", "embedding", k = shortlist,
            nSub = nSub, subDim = subDim, nProbe = nProbe)
        else graft.ext.IvfIndex
          .servePqTopK(spark, index, q, "vec_id", "embedding", k = shortlist,
            nSub = nSub, subDim = subDim, nProbe = nProbe)
      val served = served0.localCheckpoint(true)
      val pre = recallOf(pairSet(served.filter(col("rn") <= 5)))
      val wCos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
      val post = recallOf(pairSet(
        served.withColumn("cr", row_number().over(wCos)).filter(col("cr") <= 5)))
      (pre, post)
    }

    for (nProbe <- probes) {
      val t0 = System.nanoTime()
      val got = pairSet(graft.ext.IvfIndex
        .serveTopK(spark, ix, q, "vec_id", "embedding", k = 5, nProbe = nProbe))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = recallOf(got)
      println(f"""{"recall_curve":"ivf_persisted","dir":"$dir","n_probe":$nProbe,"recall_at_5":$recall%.4f,"sec":$sec%.2f}""")
    }

    // ADC matrix at ONE representative nProbe (the middle of the sweep)
    val rep = probes(probes.length / 2)
    val (ns, sd) = (graft.ext.IvfIndex.Cache.nSub, graft.ext.IvfIndex.Cache.subDim)
    val (_, post20S) = adcRecalls(ix, ns, sd, rep, 20)
    val (preS, postS) = adcRecalls(ix, ns, sd, rep, load)
    val (_, post20T) = adcRecalls(ixT, ns, sd, rep, 20)
    val (preT, postT) = adcRecalls(ixT, ns, sd, rep, load)
    println(f"""{"adc_matrix":"$dir","n_probe":$rep,"adc_shortlist":$load,"adc_pre_strided":$preS%.4f,"adc_post_strided":$postS%.4f,"adc_post20_strided":$post20S%.4f,"adc_pre_trained":$preT%.4f,"adc_post_trained":$postT%.4f,"adc_post20_trained":$post20T%.4f}""")

    // Codebook-size axis at the same representative nProbe: one ad-hoc
    // index per geometry (coarse quantizer recipe unchanged), pre/post
    // ADC recall at the cell-load shortlist.
    val stride = graft.ext.Similarity.sqrtStride(nVec)
    val trainStride = math.max(1L, nVec / (4L * stride))
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_cb_axis")
    try {
      val configs = Seq( // (codewords, nSub, subDim, residual?)
        (64, 4, 16, false), (256, 8, 8, false), (1024, 8, 8, false),
        (256, 8, 8, true))
      for ((cw, cns, csd, residual) <- configs) {
        val out = java.nio.file.Files.createTempDirectory(tmpRoot, "cb").toString
        val trainOn = Some(emb.filter(pmod(col("vec_id"), lit(trainStride)) === 0))
        if (residual)
          graft.ext.IvfIndex.buildResidual(emb, "vec_id", "embedding",
            stride = stride, trainIters = 1, trainOn = trainOn,
            nSub = cns, subDim = csd,
            codeStride = math.max(1L, nVec / cw), outDir = out)
        else
          graft.ext.IvfIndex.build(emb, "vec_id", "embedding",
            stride = stride, trainIters = 1, trainOn = trainOn,
            nSub = cns, subDim = csd,
            codeStride = math.max(1L, nVec / cw), outDir = out)
        val t0 = System.nanoTime()
        val (pre, post) = adcRecalls(out, cns, csd, rep, load, residual)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"adc_codebook_axis":"$dir","n_probe":$rep,"n_codewords":$cw,"n_sub":$cns,"sub_dim":$csd,"residual":$residual,"adc_shortlist":$load,"adc_pre":$pre%.4f,"adc_post":$post%.4f,"sec":$sec%.2f}""")
      }
    } finally graft.queries.QueryDef.rmTree(tmpRoot)
    println(Host.line("recall_sweep", host0, Host.sample()))
    spark.stop()
  }
}
