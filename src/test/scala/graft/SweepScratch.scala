package graft

/** Builder-side scratch: execute flagged queries at two SFs and print
  * (a) per-global-window input row counts (boundedness = sub-linear
  * growth between SFs) and (b) BNLJ build-side structure, to seed the
  * battery-wide PlanSpec invariant whitelist. Not a test.
  */
object SweepScratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec, CollectLimitExec, LocalTableScanExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    def hasBound(p: SparkPlan): Boolean = nodes(p).exists {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case _: LocalTableScanExec => true
      case _ => false
    }
    val names = args(0).split(",").toSeq
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (name <- names; dir <- dirs) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        // execute THIS df's QueryExecution (df.write would build a new
        // one, leaving these metrics untouched)
        df.queryExecution.toRdd.count()
        val all = nodes(df.queryExecution.executedPlan)
        val sf = dir.split("/").last
        all.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
          .zipWithIndex.foreach { case (w, i) =>
            val n = nodes(w.child).collectFirst {
              case c if c.metrics.contains("numOutputRows") =>
                c.metrics("numOutputRows").value
            }.getOrElse(-1L)
            println(s"WIN $name $sf #$i rows=$n bound=${hasBound(w.child)}")
          }
        if (dir.endsWith("0.001"))
          all.collect { case j: BroadcastNestedLoopJoinExec => j }
            .zipWithIndex.foreach { case (j, i) =>
              val build = j.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
                case _ => j.right
              }
              val rows = nodes(build).collectFirst {
                case n if n.metrics.contains("numOutputRows") =>
                  n.metrics("numOutputRows").value
              }.getOrElse(-1L)
              println(s"BNLJ $name #$i bound=${hasBound(build)} buildRows~$rows " +
                s"top=${build.getClass.getSimpleName}")
            }
      } catch {
        case e: Throwable =>
          println(s"ERR $name $dir ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(150)}")
      }
    }
    println("SWEEP2 done")
    spark.stop()
  }
}
