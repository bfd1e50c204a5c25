package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side measurement of the persisted-index serve cost as a
  * function of QUERY BATCH SIZE (the production axis q324's fixed
  * 10-query battery form cannot show): the index is built once
  * (untimed — IvfIndex.Cache, the steady-state premise), then
  * [[graft.ext.IvfIndex.serveTopK]] is timed per batch size. Expected
  * shape: cost ≈ fixed session overhead + nQueries × nProbe × (N/√N)
  * candidate rows — linear in the batch, NOT in the corpus.
  *
  * Usage: runMain graft.BenchServe <sfDir> <nQ1,nQ2,...> [reps]
  */
object BenchServe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batches = args(1).split(",").map(_.toInt)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = BenchSession.build()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val host0 = Host.sample()
    val ix = graft.ext.IvfIndex.Cache.indexFor(spark, dir) // untimed build
    for (nQ <- batches) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.ext.IvfIndex
          .serveTopK(spark, ix,
            Tables.load(spark, dir, "embeddings").filter(col("vec_id") < nQ),
            "vec_id", "embedding", k = 5, nProbe = 3)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"serve":"ivf_persisted","dir":"$dir","n_queries":$nQ,"sec":${times.min}%.2f}""")
    }
    println(Host.line("serve_sweep", host0, Host.sample()))
    spark.stop()
  }
}
