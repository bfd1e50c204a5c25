package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side measurement for the coarseCells LOAD-parameter claim
  * (BatteryPlanSpec.latticeDocDecadeBounded whitelists seven PrefixSum/
  * exactNtile queries on "the in-cell task bound is N/(keys·coarseCells);
  * coarseCells is the cluster-parallelism knob"): runs q309's exact
  * pipeline re-parameterized over a list of coarseCells values and
  * reports, per value, the measured MAX in-cell window input (the
  * largest single-task sort the layout pays — via [[graft.ops.PrefixSum
  * .cellLoad]], the same approxQuantile bounds and cell rule
  * exclusiveSum uses) and the wall time (min over reps, noop sink — the
  * Bench contract).
  *
  * Usage: runMain graft.BenchKnob <sfDir> <cells1,cells2,...> [reps]
  */
object BenchKnob {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cellsList = args(1).split(",").map(_.toInt)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = BenchSession.build()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val host0 = Host.sample()

    val pri = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("bigint")
    def base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("__pri", pri)

    for (cells <- cellsList) {
      // the q309 plan, coarseCells re-parameterized
      def q309 = {
        val d = base
        val sizes = d.groupBy(col("source")).agg(count(lit(1)).as("__n"))
        graft.ops.PrefixSum.rank(
            d, Seq("source"), col("__pri"), ascending = true,
            Seq(col("doc_id")), "sel_rank", coarseCells = cells)
          .join(broadcast(sizes), Seq("source"))
          .select(col("doc_id"), col("source"), col("sel_rank"),
            (col("sel_rank") <= expr("__n DIV 5L")).as("selected"))
          .orderBy("doc_id")
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q309.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val maxRows = graft.ops.PrefixSum
        .cellLoad(base, Seq("source"), col("__pri"), cells)
        .agg(max(col("n_rows"))).head().getLong(0)
      println(f"""{"knob":"coarseCells","dir":"$dir","cells":$cells,"sec":${times.min}%.2f,"max_rows_per_cell":$maxRows}""")
    }
    println(Host.line("knob_sweep", host0, Host.sample()))
    spark.stop()
  }
}
