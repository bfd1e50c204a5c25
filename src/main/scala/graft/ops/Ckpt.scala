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

  def apply(df: DataFrame): DataFrame = {
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
