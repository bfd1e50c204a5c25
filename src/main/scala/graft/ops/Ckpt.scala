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
}
