package graft

import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Similarity}

/** The recall dial, measured on data that HAS clusters. The round-13
  * recall curve ran on the driver's random 64-dim fixture, which clusters
  * poorly by construction — recall@5 at nProbe=3 was 0.31 and said
  * nothing about the index. On a clustered fixture (the regime embedding
  * models actually produce, and the one an IVF recall claim is about) the
  * trained quantizer must recover the structure: this pins the threshold
  * a user can rely on. BenchRecall on a larger clustered fixture records
  * the full curve in BENCH_SF1.md.
  */
class RecallSpec extends SparkSuite {

  test("clustered fixture: persisted-index recall@5 ≥ 0.9 at nProbe=3 of 64 cells; exhaustive probe = 1.0") {
    val root = java.nio.file.Files.createTempDirectory("graft_recall")
    try {
      // 4096 vectors in 64 ground-truth clusters = the √N cell-count rule
      // exactly; noise 0.05 ≪ 1 keeps neighbors unambiguous
      GenClustered.run(spark, root.toString, 4096, 64, 64, 0.05)
      val emb = spark.read.parquet(s"$root/embeddings.parquet")
      val stride = Similarity.sqrtStride(4096) // 64
      val trainStride = math.max(1L, 4096L / (4L * stride))
      val ix = root.resolve("ix").toString
      IvfIndex.build(emb, "vec_id", "embedding",
        stride = stride, trainIters = 1,
        trainOn = Some(emb.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
        nSub = IvfIndex.Cache.nSub, subDim = IvfIndex.Cache.subDim,
        codeStride = 64L, outDir = ix)
      val q = emb.filter(col("vec_id") < 50)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallAt(nProbe: Int): Double = {
        val got = IvfIndex
          .serveTopK(spark, ix, q, "vec_id", "embedding", k = 5, nProbe = nProbe)
          .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact intersect got).size.toDouble / exact.size
      }
      val r3 = recallAt(3)
      info(f"clustered recall@5: nProbe=3 -> $r3%.3f")
      assert(r3 >= 0.9,
        f"recall@5 at nProbe=3 on clustered data is $r3%.3f < 0.9 — the quantizer failed to recover planted structure")
      val nCells = spark.read.parquet(s"$ix/centroids").count().toInt
      assert(recallAt(nCells) == 1.0, "exhaustive probing must be lossless")
    } finally graft.queries.QueryDef.rmTree(root)
  }
}
