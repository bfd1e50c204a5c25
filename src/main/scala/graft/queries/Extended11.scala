package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType
import graft.ext.Streaming
import graft.ops.Num

/** Round-7 batch: a driver-visible STREAMING entry. Every other battery
  * query is a batch plan; `ext/Streaming.scala` was spec-tested only. q151
  * closes that gap: its Spark side runs an actual `StreamingQuery`
  * (file-source replay → stateful window agg → idempotent foreachBatch
  * parquet sink, `Trigger.AvailableNow`), so the oracle hash-match certifies
  * the streaming execution path end-to-end, not a batch twin.
  */
object Extended11 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // Streaming hourly event rollup, the stream-executed twin of q28.
    // Shape: file-source stream (AvailableNow replay of the fixture —
    // on a real deployment this is the landing directory or Kafka via
    // Streaming.kafkaEvents; the downstream plan is identical) →
    // tumbling 1h window agg → COMPLETE-mode foreachBatch that
    // idempotently overwrites a parquet target each micro-batch.
    // Complete mode (not append+watermark) because a bounded replay must
    // emit EVERY window including the open tail, or the result could not
    // equal the batch oracle. Money-ish sums enter state as
    // DECIMAL(18,4) of the pre-rounded value, so accumulation is exact
    // and order-free across micro-batch boundaries — the hash survives
    // any file/batch interleaving. At 100 TB/day the same plan runs
    // append-mode with a watermark bounding state; complete mode is the
    // replay/backfill configuration.
    QueryDef(
      "q151_stream_hourly",
      (s, dir) => {
        // file streams need a directory source: stage the fixture file
        // (driver-side copy of ONE file — the real source is already a
        // directory; this adapts the sandbox's single-file layout)
        val src = java.nio.file.Files.createTempDirectory("graft_q151_src")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          src.resolve("events.parquet"))
        val out = java.nio.file.Files.createTempDirectory("graft_q151_out").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft_q151_ck").toString
        val agg = Streaming.eventsFileStream(s, src.toString)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(R(col("value"), 4).cast(DecimalType(18, 4))).as("__vs"))
        val q = agg.writeStream
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("overwrite").parquet(out)
            ()
          }
          .start()
        q.awaitTermination()
        s.read.parquet(out)
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
            col("event_type"), col("n"),
            R(col("__vs").cast("double"), 4).as("value_sum_r"))
          .orderBy("hour_start", "event_type")
      },
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
              |  event_type, count(*) AS n,
              |  ${rs("CAST(sum(CAST(" + rs("value", 4) + " AS DECIMAL(18,4))) AS DOUBLE)", 4)}
              |    AS value_sum_r
              |FROM events GROUP BY 1, 2
              |ORDER BY hour_start, event_type""".stripMargin)))
}
