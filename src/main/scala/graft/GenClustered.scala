package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side CLUSTERED embeddings fixture: nVec vectors planted around
  * kClusters ground-truth centers. The driver's fixture is RANDOM 64-dim
  * data, which clusters poorly — the round-13 recall curve bottomed at
  * 0.31 @ nProbe=3 on it (BENCH_SF1), so the one number a user asks of an
  * ANN index ("what recall at nProbe ≪ cells?") was fixture noise, not an
  * index property. This fixture has real cluster structure: BenchRecall
  * runs on it measure the index, and RecallSpec pins a threshold.
  *
  * Geometry: cluster = contiguous vec_id block (`vec_id·k / n`, integer
  * division); center components are pseudo-uniform in [−1,1] (sin of a
  * per-(cluster, dim) integer — hash-like, stateless, so generation is
  * fully distributed and bit-reproducible); each point = center + noise ·
  * per-(vec_id, dim) pseudo-uniform. With noise ≪ 1, same-cluster cosine
  * ≈ 1 − O(noise²) while cross-cluster cosine ≈ 0 (independent 64-dim
  * directions) — unambiguous nearest neighbors, the regime real embedding
  * models produce and the one an IVF recall claim is ABOUT. Defaults:
  * kClusters = √nVec (matches the index's cell count rule, so a
  * well-trained quantizer can recover one cell ≈ one cluster), dim 64
  * (the driver fixture's), noise 0.05.
  *
  * Layout contract matches the driver fixture: ONE `embeddings.parquet`
  * file (vec_id long, embedding float[dim]) under dst, 8 MB row groups.
  *
  * Usage: runMain graft.GenClustered <dstDir> <nVec> [kClusters] [dim] [noise]
  */
object GenClustered {
  def main(args: Array[String]): Unit = {
    val dst = args(0)
    val nVec = args(1).toLong
    val k = if (args.length > 2) args(2).toInt
            else graft.ext.Similarity.sqrtStride(nVec)
    val dim = if (args.length > 3) args(3).toInt else 64
    val noise = if (args.length > 4) args(4).toDouble else 0.05
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, dst, nVec, k, dim, noise)
    spark.stop()
  }

  /** Session-borrowing body, callable from tests (RecallSpec generates a
    * small clustered fixture on demand — same pattern as GenScale.run).
    */
  def run(spark: SparkSession, dst: String, nVec: Long, kClusters: Int,
      dim: Int, noise: Double): Unit = {
    require(kClusters >= 1 && kClusters <= nVec,
      s"kClusters=$kClusters out of range for nVec=$nVec")
    val embs: DataFrame = spark.range(nVec).toDF("vec_id")
      .withColumn("cl", col("vec_id") * kClusters / nVec) // long division: block id
      .withColumn("embedding", expr(
        s"""transform(sequence(1, $dim), i ->
           |  CAST(sin(cl * 1000003.0d + i * 7919.0d) +
           |       $noise * sin(vec_id * 2654435761.0d + i * 97.0d) AS FLOAT))""".stripMargin))
      .drop("cl")
    val tmp = s"$dst/__tmp_embeddings"
    embs.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 8 * 1024 * 1024)
      .parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dst/embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(tmp).listFiles().foreach(_.delete())
    new java.io.File(tmp).delete()
    println(s"""{"gen":"$dst","n_vec":$nVec,"k_clusters":$kClusters,"dim":$dim,"noise":$noise}""")
  }
}
