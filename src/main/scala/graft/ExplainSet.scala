package graft

import java.nio.file.{Files, Paths}

/** Batch plan capture for the r16 plan artifacts: writes
  * `<outDir>/<query>_<suffix>.txt` containing `.explain("formatted")` of
  * each named query, one JVM for the whole list.
  *
  * `runMain graft.ExplainSet <outDir> <suffix> <sfDir> <q1> [q2 ...]`
  *
  * Note: queries with eager phases (streaming replays, bounded collects,
  * approxQuantile passes) EXECUTE those phases during plan construction;
  * the captured physical plan is the final readout's, which is the part
  * the driver's noop sink times last.
  */
object ExplainSet {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    Files.createDirectories(Paths.get(outDir))
    val spark = BenchSession.build()
    names.foreach { name =>
      try {
        val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
        val txt = qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        println(s"[explainset] wrote ${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[explainset] $name failed: ${String.valueOf(e).take(200)}")
      }
    }
    spark.stop()
  }
}
