package graft

import org.apache.spark.sql.SparkSession

/** Builder-side scale-smoke driver: run a comma-separated list of battery
  * queries against one or more fixture dirs in a SINGLE session (the
  * per-query JVM+session cost of looping BenchOne dominates a 30-query
  * sweep). Same measurement contract as Bench: noop sink, min over reps.
  *
  * Usage: runMain graft.BenchSet q1,q2,... dir1[,dir2,...] [reps]
  */
object BenchSet {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dirs = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = BenchSession.build()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val host0 = Host.sample()
    // A failed rep must NOT contribute its elapsed-until-failure time as a
    // small, passing-looking measurement (the BENCH_SF1 ratio tables are
    // derived from these lines) — record it as None and summarize FAILED.
    var anyFailed = false
    for (dir <- dirs; name <- names) {
      val fn = SparkEntry.queries(name)
      val secs: Seq[Option[Double]] = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            println(s"[benchset] $name $dir rep FAILED: ${e.getMessage}")
            None
        }
      }
      val ok = secs.flatten
      if (ok.size < reps) {
        anyFailed = true
        println(s"[benchset] $name $dir FAILED (${reps - ok.size}/$reps reps errored)")
      } else println(f"[benchset] $name $dir ${ok.min}%.2f s (min of $reps)")
    }
    println(Host.line("sweep", host0, Host.sample()))
    spark.stop()
    if (anyFailed) sys.exit(1)
  }
}
