package graft

import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Similarity}

/** q332/q333 mechanics the relation-level hash gate can't see: the
  * trained codebook's shape contract, and that STREAMED refresh (micro-
  * batches via foreachBatch) leaves the index file-for-file equivalent to
  * a single batch refresh — invfile rows, codes, AND the maintained pair
  * artifact.
  */
class Extended70Spec extends SparkSuite {

  private val nSub = IvfIndex.Cache.nSub
  private val subDim = IvfIndex.Cache.subDim

  private def smallSplit(bound: Int) = {
    val emb = Tables.load(spark, sf0001, "embeddings").filter(col("vec_id") < bound)
    val old = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
    (emb, old, delta)
  }

  private def buildOld(old: org.apache.spark.sql.DataFrame, nOld: Long, dir: String): Unit =
    IvfIndex.build(old, "vec_id", "embedding",
      stride = Similarity.sqrtStride(nOld), trainIters = 1, trainOn = Some(old),
      nSub = nSub, subDim = subDim,
      codeStride = math.max(1L, nOld / 64), outDir = dir)

  test("streamed refresh ≡ batch refresh: inverted file (codes included) and pair artifact identical") {
    val (_, old, delta) = smallSplit(400)
    val batchDir = java.nio.file.Files.createTempDirectory("graft_sx_batch")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sx_stream")
    try {
      val nOld = old.count()
      for (d <- Seq(batchDir, streamDir)) {
        buildOld(old, nOld, d.toString)
        IvfIndex.buildPairs(spark, d.toString, threshold = -1.0)
      }
      IvfIndex.refresh(spark, batchDir.toString, delta, "vec_id", "embedding",
        nSub, subDim, pairThreshold = Some(-1.0))
      IvfIndex.refreshStream(spark, streamDir.toString, delta, "vec_id", "embedding",
        nSub, subDim, pairThreshold = Some(-1.0))
      def rows(d: java.nio.file.Path) = spark.read.parquet(s"$d/invfile")
        .select(Seq(col("cid"), col("cent_id")) ++ (0 until nSub).map(i => col(s"code_$i")): _*)
        .collect().map(_.toSeq).toSet
      assert(rows(streamDir) == rows(batchDir),
        "streamed micro-batch refresh produced a different inverted file than one batch refresh")
      def pairSet(d: java.nio.file.Path) = spark.read.parquet(s"$d/pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val (sp, bp) = (pairSet(streamDir), pairSet(batchDir))
      assert(sp.size == sp.distinct.size,
        "streamed pair maintenance wrote a duplicate pair (a micro-batch was processed twice?)")
      assert(sp.toSet == bp.toSet,
        "streamed pair maintenance diverges from the single-batch artifact")
      // and the serve identity the q333 oracle gates, locally
      val emb = Tables.load(spark, sf0001, "embeddings").filter(col("vec_id") < 400)
      val q = emb.filter(col("vec_id") < 10)
      def served(d: java.nio.file.Path) = IvfIndex
        .serveTopK(spark, d.toString, q, "vec_id", "embedding", k = 5, nProbe = 3)
        .select("qid", "cid", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(served(streamDir) == served(batchDir),
        "serving the streamed-refresh index diverges from the batch-refresh index")
    } finally {
      graft.queries.QueryDef.rmTree(batchDir)
      graft.queries.QueryDef.rmTree(streamDir)
    }
  }

  test("trained codebook: full-width reassembly, fixed code domain, encode self-consistency") {
    val (emb, _, _) = smallSplit(400)
    val sample = emb.filter(pmod(col("vec_id"), lit(4)) === 0)
    val seed = emb.filter(pmod(col("vec_id"), lit(16)) === 0)
      .select(col("vec_id").as("code_id"),
        transform(col("embedding"), x => x.cast("double")).as("cbe"))
    val trained = Similarity.trainSubCodebooks(
      sample.select(col("vec_id").as("vid"),
        transform(col("embedding"), x => x.cast("double")).as("ve")),
      seed, nSub, subDim).localCheckpoint(true)
    // the code DOMAIN is frozen: training refines codeword content, never
    // adds/drops ids (inverted-list code columns index into it)
    val seedIds = seed.select("code_id").collect().map(_.getLong(0)).toSet
    val trainedIds = trained.select("code_id").collect().map(_.getLong(0)).toSet
    assert(trainedIds == seedIds, "training changed the codeword id domain")
    // full-width arrays (nSub × subDim), no position dropped by the
    // empty-cell fallback path
    val widths = trained.select(size(col("cbe"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(widths == Set(nSub * subDim), s"trained codeword widths: $widths")
    // encoding the training sample against the trained codebook must beat
    // (or tie) the seed codebook on reconstruction error — on the SAME
    // rows Lloyd optimized, monotonicity is an identity, not a tendency
    def recon(cb: org.apache.spark.sql.DataFrame): Double = Similarity
      .pqEncodeWith(sample, "vec_id", "embedding",
        cb.select(col("code_id"), col("cbe")), nSub, subDim)
      .agg(sum(col("recon"))).head().getDouble(0)
    val (rSeed, rTrained) = (recon(seed), recon(trained))
    assert(rTrained <= rSeed + 1e-9,
      f"one Lloyd iteration increased sample reconstruction error: $rTrained%.4f > $rSeed%.4f")
  }
}
