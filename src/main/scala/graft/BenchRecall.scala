package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side recall curve for the persisted IVF index: recall@5 of
  * [[graft.ext.IvfIndex.serveTopK]] against the brute-force exact anchor,
  * per nProbe — the production recall/latency dial, measured on the same
  * persisted artifact q324 serves (q123 hash-gates the lazy trained index
  * at nProbe=3; this sweeps the knob). Exhaustive probing must land at
  * recall 1.0 (the losslessness identity Extended68Spec pins).
  *
  * Round 15 adds the ADC columns ([[graft.ext.IvfIndex.servePqTopK]]) —
  * the one serve path whose recall was previously unmeasured — for BOTH
  * codebooks: the strided-sample codewords (q326's) and the per-subspace
  * Lloyd-TRAINED codewords (q332's, [[graft.ext.Similarity.trainSubCodebooks]]).
  * `adc_pre` is recall@5 of the raw ADC ranking (top-5 by code-lookup
  * score); `adc_post` re-ranks a k=20 ADC shortlist with the exact cosine
  * and takes its top-5 — the production two-stage serve. The trained
  * codebook's reconstruction error is also printed (sum of squared PQ
  * error over the corpus, trained vs strided): k-means monotonicity says
  * trained ≤ strided, and RecallSpec pins it.
  *
  * Usage: runMain graft.BenchRecall <sfDir> <nProbe1,nProbe2,...> [nQueries]
  */
object BenchRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val probes = args(1).split(",").map(_.toInt)
    val nQ = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    def reconOf(index: String): Double = {
      val cb = spark.read.parquet(s"$index/codebook")
      graft.ext.Similarity
        .pqEncodeWith(emb, "vec_id", "embedding", cb,
          graft.ext.IvfIndex.Cache.nSub, graft.ext.IvfIndex.Cache.subDim)
        .agg(sum(col("recon"))).head().getDouble(0)
    }
    val (reconS, reconT) = (reconOf(ix), reconOf(ixT))
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
    for (nProbe <- probes) {
      val t0 = System.nanoTime()
      val got = pairSet(graft.ext.IvfIndex
        .serveTopK(spark, ix, q, "vec_id", "embedding", k = 5, nProbe = nProbe))
      val sec = (System.nanoTime() - t0) / 1e9
      // pre-rerank = top-5 by raw ADC score; post = exact-cosine top-5 of
      // a k-deep ADC shortlist (the two-stage serve)
      def adcRecalls(index: String, shortlist: Int): (Double, Double) = {
        val served = graft.ext.IvfIndex
          .servePqTopK(spark, index, q, "vec_id", "embedding", k = shortlist,
            nSub = graft.ext.IvfIndex.Cache.nSub,
            subDim = graft.ext.IvfIndex.Cache.subDim, nProbe = nProbe)
          .localCheckpoint(true)
        val pre = recallOf(pairSet(served.filter(col("rn") <= 5)))
        val wCos = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
        val post = recallOf(pairSet(
          served.withColumn("cr", row_number().over(wCos)).filter(col("cr") <= 5)))
        (pre, post)
      }
      val (_, post20S) = adcRecalls(ix, 20)
      val (preS, postS) = adcRecalls(ix, load)
      val (_, post20T) = adcRecalls(ixT, 20)
      val (preT, postT) = adcRecalls(ixT, load)
      val recall = recallOf(got)
      println(f"""{"recall_curve":"ivf_persisted","dir":"$dir","n_probe":$nProbe,"recall_at_5":$recall%.4f,"adc_shortlist":$load,"adc_pre_strided":$preS%.4f,"adc_post_strided":$postS%.4f,"adc_post20_strided":$post20S%.4f,"adc_pre_trained":$preT%.4f,"adc_post_trained":$postT%.4f,"adc_post20_trained":$post20T%.4f,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
