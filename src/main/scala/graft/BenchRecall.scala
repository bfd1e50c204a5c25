package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side recall curve for the persisted IVF index: recall@5 of
  * [[graft.ext.IvfIndex.serveTopK]] against the brute-force exact anchor,
  * per nProbe — the production recall/latency dial, measured on the same
  * persisted artifact q324 serves (q123 hash-gates the lazy trained index
  * at nProbe=3; this sweeps the knob). Exhaustive probing must land at
  * recall 1.0 (the losslessness identity Extended68Spec pins).
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
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < nQ)
    val exact = graft.ext.Similarity
      .bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nProbe <- probes) {
      val t0 = System.nanoTime()
      val got = graft.ext.IvfIndex
        .serveTopK(spark, ix, q, "vec_id", "embedding", k = 5, nProbe = nProbe)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (exact intersect got).size.toDouble / exact.size
      println(f"""{"recall_curve":"ivf_persisted","dir":"$dir","n_probe":$nProbe,"recall_at_5":$recall%.4f,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
