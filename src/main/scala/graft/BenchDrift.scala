package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Similarity}

/** Builder-side drift → rebuild demonstration: the measured other half of
  * q330's monitor. The refresh contract freezes the coarse quantizer at
  * build time, so ingest batches whose distribution departs from the
  * training sample degrade the index — this main MEASURES that, then
  * measures a rebuild restoring it, turning the "schedule a rebuild when
  * imbalance_r crosses a threshold" policy from prose into numbers.
  *
  * Protocol: a clustered base corpus (GenClustered, √N planted clusters)
  * builds the index exactly like [[IvfIndex.Cache]] (√N cells, 1 Lloyd
  * iteration on a ~4√N sample, N/64 codebook). Then `nBatches` DRIFTED
  * deltas arrive (GenClustered with a fresh centerSalt per batch: new
  * clusters around centers ~orthogonal to anything the quantizer
  * trained on), each refreshed in. After every refresh:
  *   - `imbalance_r` / `max_load` from [[IvfIndex.cellStats]] — what the
  *     monitor alerts on (drifted clusters collapse onto whichever old
  *     cells happen to be nearest, bloating them), plus compact's
  *     `max_files_per_cell`;
  *   - recall@5 at nProbe=3 for queries drawn from the LATEST delta,
  *     against brute force over the accumulated union — what the user
  *     experiences (a drifted cluster's members spray across old cells
  *     chosen by near-tied ~0 cosines, so nProbe=3 misses them);
  *   - recall@5 for the original base queries (the old data keeps
  *     serving fine — drift hurts the NEW data's queries first).
  * Then a REBUILD (retrain on a union sample, √N_union cells) and the
  * same measurements: delta-query recall must recover to the clustered
  * baseline, pricing the rebuild against the degradation it cures.
  *
  * Usage: runMain graft.BenchDrift <workDir> <nBase> [nBatches] [batchFrac] [driftNoise]
  */
object BenchDrift {
  def main(args: Array[String]): Unit = {
    val work = args(0)
    val nBase = args(1).toLong
    val nBatches = if (args.length > 2) args(2).toInt else 3
    val batchFrac = if (args.length > 3) args(3).toDouble else 0.1
    val driftNoise = if (args.length > 4) args(4).toDouble else 0.05
    val spark = BenchSession.build()
    val host0 = Host.sample()

    val nDelta = math.max(1L, (nBase * batchFrac).toLong)
    val kBase = Similarity.sqrtStride(nBase)
    GenClustered.run(spark, s"$work/base", nBase, kBase, 64, 0.05)
    def rel(path: String): DataFrame = spark.read.parquet(path)
    val base = rel(s"$work/base/embeddings.parquet")

    def buildOn(corpus: DataFrame, n: Long, out: String): Unit = {
      val stride = Similarity.sqrtStride(n)
      val trainStride = math.max(1L, n / (4L * stride))
      IvfIndex.build(corpus, "vec_id", "embedding",
        stride = stride, trainIters = 1,
        trainOn = Some(corpus.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
        nSub = IvfIndex.Cache.nSub, subDim = IvfIndex.Cache.subDim,
        codeStride = math.max(1L, n / 64), outDir = out)
    }

    def recallAt5(ix: String, union: DataFrame, queries: DataFrame): Double = {
      val exact = Similarity.bruteForceTopK(union, queries, "vec_id", "embedding", 5)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = IvfIndex.serveTopK(spark, ix, queries, "vec_id", "embedding",
          k = 5, nProbe = 3)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }

    def report(stage: String, ix: String, union: DataFrame,
        deltaQ: Option[DataFrame]): Unit = {
      val s = IvfIndex.cellStats(spark, ix).collect().head
      val baseQ = base.filter(col("vec_id") < 50)
      val rBase = recallAt5(ix, union, baseQ)
      val rDelta = deltaQ.map(q => recallAt5(ix, union, q))
      val rd = rDelta.map(r => f"$r%.4f").getOrElse("null")
      println(f"""{"drift":"$stage","n_cells":${s.getAs[Long]("n_cells")},"max_load":${s.getAs[Long]("max_load")},"imbalance_r":${s.getAs[Double]("imbalance_r")}%.2f,"max_files_per_cell":${s.getAs[Long]("max_files_per_cell")},"recall_base_q":$rBase%.4f,"recall_delta_q":$rd}""")
    }

    val ix = s"$work/ix"
    buildOn(base, nBase, ix)
    report("build", ix, base, None)

    var union = base
    var lastDelta: DataFrame = null
    for (b <- 1 to nBatches) {
      // fresh centers per batch: a new hash salt per b (base uses salt 1)
      val salt = 1000L + b
      val kD = Similarity.sqrtStride(nDelta)
      GenClustered.run(spark, s"$work/delta$b", nDelta, kD, 64, driftNoise,
        centerSalt = salt, idOffset = nBase + (b - 1) * nDelta)
      lastDelta = rel(s"$work/delta$b/embeddings.parquet")
      IvfIndex.refresh(spark, ix, lastDelta, "vec_id", "embedding",
        IvfIndex.Cache.nSub, IvfIndex.Cache.subDim)
      union = union.union(lastDelta)
      report(s"refresh_$b", ix, union,
        Some(lastDelta.orderBy("vec_id").limit(50)))
    }

    // the policy response: retrain + reassign on the union
    val nUnion = nBase + nBatches.toLong * nDelta
    val ix2 = s"$work/ix_rebuilt"
    buildOn(union, nUnion, ix2)
    report("rebuild", ix2, union, Some(lastDelta.orderBy("vec_id").limit(50)))
    println(Host.line("drift", host0, Host.sample()))
    spark.stop()
  }
}
