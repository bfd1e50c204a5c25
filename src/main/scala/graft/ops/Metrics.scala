package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.collection.mutable.ArrayBuffer

/** Per-query execution metrics via QueryExecutionListener — the
  * observability hook a pipeline wires into its scheduler (the
  * reference's Airflow task logs are the analog). Metrics come from the
  * EXECUTED plan's SQL metric registry (exact task-aggregated counts,
  * not estimates), collected driver-side after each action: scan output
  * rows, shuffle records, sink/root output rows, wall duration.
  *
  * Scale note: the listener only reads already-aggregated metric values
  * (a few longs per operator) — zero overhead on the data path.
  */
object Metrics {

  final case class QueryMetrics(
      action: String,
      durationNs: Long,
      scanOutputRows: Long,
      shuffleRecordsWritten: Long,
      rootOutputRows: Long)

  /** Attach a recorder to the session; returns (fetch, detach). */
  def attach(spark: SparkSession): (() => Seq[QueryMetrics], () => Unit) = {
    val buf = ArrayBuffer.empty[QueryMetrics]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        // AQE nests the real operators: AdaptiveSparkPlanExec holds the
        // final plan, whose leaves are QueryStageExec wrappers holding
        // the materialized stages — plain collect() stops at both, so
        // flatten through them explicitly
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
          case qs: QueryStageExec => p +: flatten(qs.plan)
          case _ => p +: p.children.flatMap(flatten)
        }
        val nodes = flatten(qe.executedPlan)
        def sum(metricName: String): Long =
          nodes.flatMap(_.metrics.collect {
            case (n, m) if n == metricName => m.value
          }).sum
        val scans = nodes.collect {
          case l: org.apache.spark.sql.execution.LeafExecNode
              if !l.isInstanceOf[QueryStageExec] &&
                !l.isInstanceOf[AdaptiveSparkPlanExec] =>
            l.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
        }.sum
        val root = nodes.head.metrics.get("numOutputRows").map(_.value)
          .getOrElse(-1L)
        buf.synchronized {
          buf += QueryMetrics(funcName, durationNs, scans,
            sum("shuffleRecordsWritten"), root)
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    (() => buf.synchronized(buf.toSeq),
      () => spark.listenerManager.unregister(listener))
  }
}
