package graft.ops

import graft.SparkSuite
import java.nio.file.{Files, Paths}

/** The reliable-checkpoint switch for iterative queries (q144 PageRank,
  * q147 BPE): with `graft.checkpoint.dir` set, iteration state goes through
  * `checkpoint()` to the configured directory (HDFS/S3 on a real cluster —
  * survives executor loss) instead of executor-local blocks, and results
  * are bit-identical either way.
  */
class CkptSpec extends SparkSuite {

  test("graft.checkpoint.dir routes q144/q147 through reliable checkpoints, same results") {
    val q144 = graft.SparkEntry.queries("q144_pagerank")
    val q147 = graft.SparkEntry.queries("q147_bpe_merges")
    val base144 = q144(spark, sf0001).collect().toSeq
    val base147 = q147(spark, sf0001).collect().toSeq
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Ckpt.ConfKey, dir)
    try {
      assert(q144(spark, sf0001).collect().toSeq == base144)
      assert(q147(spark, sf0001).collect().toSeq == base147)
      // proof the reliable tier was actually used: checkpoint part files
      // landed under the configured dir
      val files = Files.walk(Paths.get(dir)).filter(p => Files.isRegularFile(p)).count()
      assert(files > 0, s"no checkpoint files under $dir — reliable path not taken")
    } finally spark.conf.unset(Ckpt.ConfKey)
  }
}
