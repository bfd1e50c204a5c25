package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncation point for iterative plans (PageRank q144, BPE q147,
  * connected components), with a durability switch.
  *
  * Default: `localCheckpoint` — blocks live on executor local dirs. Fast,
  * and correct on local[n], but on a real cluster an executor loss
  * mid-iteration destroys the truncated lineage AND the job.
  *
  * Production: set `graft.checkpoint.dir` on the session (an HDFS/S3 path)
  * and every iterative query routes through reliable `checkpoint()`
  * storage instead — iteration state survives executor loss. Same plan
  * either way; only the storage tier changes. This is a session conf (not
  * a parameter) because the driver contract fixes query signatures to
  * `(SparkSession, dir)`.
  */
object Ckpt {

  val ConfKey = "graft.checkpoint.dir"

  /** TEST-ONLY capture hook (r17, BatteryPlanSpec): while set on the
    * constructing thread, every Ckpt call appends its child's ANALYZED
    * logical plan. Motivation (r16 verdict item 7): each materialization
    * point hides its child from the battery-wide structural boundedness
    * gate, so "Ckpt hides the agg" whitelist entries were drifting into
    * unchecked prose — the gate now asserts the hidden aggregate really
    * sits beneath the Ckpt. Null outside tests; zero cost on the query
    * path (one ThreadLocal read).
    */
  private[graft] val captureTo =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]()

  def apply(df: DataFrame): DataFrame = {
    val buf = captureTo.get()
    if (buf != null) buf += df.queryExecution.analyzed
    val s = df.sparkSession
    s.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // idempotent; cheap relative to the checkpoint write itself
        s.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** Materialize at a BOUNDED block count: `coalesce(width)` before the
    * checkpoint (narrow — merges partitions without a shuffle, so the
    * upstream stage still runs at its own parallelism... fused into the
    * coalesced tasks; use only where the relation is known to be far
    * smaller than its partition count suggests). WHY (r16 verdict item 2):
    * localCheckpoint writes one block per partition and every consumer
    * stage schedules one task per block — a dimension-small relation
    * materialized at the session width (32 here) pays 32 block
    * writes + 32-task consumer rounds for kilobytes of data, which is
    * how the Ckpt-heavy queries measured FASTER at 8 cores than 32.
    * Block count should scale with the RELATION (callers pass a width
    * matched to its size), not with the cluster.
    */
  def apply(df: DataFrame, width: Int): DataFrame = apply(df.coalesce(width))
}
