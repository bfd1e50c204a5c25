package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType
import scala.jdk.CollectionConverters._
import graft.ext.Streaming
import graft.ops.Num

/** Round-11 batch 7: q322 — CHAINED STATEFUL streaming: a stream-stream
  * interval join feeding a tumbling event-time aggregation inside ONE
  * StreamingQuery (two state stores back to back). Spark supports
  * multiple stateful operators per query since 3.4/4.x; the battery ran
  * each stateful shape alone (q271 join, q151 window agg) but never the
  * production composition — conversion volume per hour, computed AS a
  * stream. Correctness is the interesting part: the join's matched rows
  * carry the purchase event time through to the window operator, and a
  * window emits only when the propagated watermark proves it complete.
  *
  * Replay mechanics are q317's: two far-future sentinel files (rows on
  * both join sides) drive the watermark forward so buffered windows
  * flush. Sentinel 1's own (2027) window itself flushes when sentinel
  * 2's later watermark passes it, so the readout filters hr to the
  * fixture's 2024 span — the oracle (batch join + hour bucket) never
  * contains the sentinels.
  */
object Extended67 {

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q322_stream_join_agg",
      (s, dir) => {
        val src = java.nio.file.Files.createTempDirectory("graft_q322_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          src.resolve("events.parquet"))
        val out = java.nio.file.Files.createTempDirectory("graft_q322_out").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft_q322_ck").toString
        val raw = s.read.parquet(s"$dir/events.parquet")
        val tsIsLong = raw.schema("ts").dataType == LongType
        def sentinelTs(us: Long): Column =
          if (tsIsLong) lit(us * 1000L) else timestamp_micros(lit(us)).cast(raw.schema("ts").dataType)
        def writeSentinel(k: Int, us: Long): Unit = {
          val types = s.createDataFrame(
            java.util.Arrays.asList(org.apache.spark.sql.Row("signup", -200L * k),
              org.apache.spark.sql.Row("purchase", -200L * k - 1L)),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("__t", org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("__id", LongType))))
          val sent = raw.limit(1).crossJoin(types)
            .select(col("__id").as("event_id"), sentinelTs(us).as("ts"),
              lit(-1L).as("user_id"), col("__t").as("event_type"),
              lit(0.0).as("value"), lit("{}").as("props"))
          val scratch = java.nio.file.Files.createTempDirectory(s"graft_q322_s$k")
          sent.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
          val ls = java.nio.file.Files.list(scratch)
          val part =
            try ls.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
            finally ls.close()
          val dest = src.resolve(f"zz_sentinel_$k.parquet")
          java.nio.file.Files.copy(part, dest)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + k * 20000L))
          QueryDef.rmTree(scratch)
        }
        writeSentinel(1, 1798761600000000L) // 2027-01-01
        writeSentinel(2, 1798848000000000L) // 2027-01-02
        val es = Streaming.eventsFileStream(s, src.toString)
        val signups = es.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("s_ts"))
          .withWatermark("s_ts", "2 hours")
        val purchases = es.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"), col("ts").as("p_ts"), col("value").as("p_value"))
          .withWatermark("p_ts", "2 hours")
        val joined = signups.join(purchases,
          col("p_uid") === col("user_id") &&
            col("p_ts") >= col("s_ts") &&
            col("p_ts") <= col("s_ts") + expr("INTERVAL 2 HOURS"))
        // second stateful operator IN THE SAME QUERY: tumbling window on
        // the joined stream's purchase event time
        val agg = joined
          .groupBy(window(col("p_ts"), "1 hour").as("w"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("p_value")).as("v"))
        val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
        try {
          s.conf.set("spark.sql.shuffle.partitions", "4")
          val q = agg
            .select(unix_micros(col("w.start")).as("wstart_us"),
              col("n_pairs"), col("v"))
            .writeStream
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              b.write.mode("append").parquet(out)
              ()
            }
            .start()
          q.awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        val result = s.read.parquet(out)
          .withColumn("hr", (col("wstart_us") / lit(3600000000L)).cast("long"))
          .filter(col("hr") < 490000L) // fixture span only (2024 ≈ hr 473k; 2027 sentinels = hr 499656+)
          .select(col("hr"), col("n_pairs"), Num.roundTo(col("v"), 4).as("value_sum_r"))
          .orderBy("hr")
          .localCheckpoint(true)
        Seq(src, java.nio.file.Paths.get(out), java.nio.file.Paths.get(ckpt))
          .foreach(QueryDef.rmTree)
        result
      },
      Some(s"""WITH su AS (
              |  SELECT user_id, epoch_us(ts) AS st FROM events
              |  WHERE event_type = 'signup'),
              |pu AS (
              |  SELECT user_id, epoch_us(ts) AS pt, value FROM events
              |  WHERE event_type = 'purchase'),
              |pairs AS (
              |  SELECT pu.pt, pu.value
              |  FROM su JOIN pu ON pu.user_id = su.user_id
              |   AND pu.pt >= su.st AND pu.pt <= su.st + 7200000000)
              |SELECT pt // 3600000000 AS hr,
              |  count(*) AS n_pairs,
              |  ${Num.roundSql("sum(value)", 4)} AS value_sum_r
              |FROM pairs GROUP BY 1 ORDER BY hr""".stripMargin))
  )
}
