package graft

import org.apache.spark.sql.functions._

/** q322: chained stateful streaming — stream-stream join feeding a
  * tumbling window aggregation in one StreamingQuery.
  */
class Extended67Spec extends SparkSuite {

  test("q322: the chained streamed plan equals the batch join+window twin, and is non-vacuous") {
    val got = SparkEntry.queries("q322_stream_join_agg")(spark, sf0001)
    got.cache()
    try {
      assert(got.count() > 0L, "no windows emitted — watermark flushing failed")
      val ev = Tables.load(spark, sf0001, "events")
      val su = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("s_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"), col("value").as("p_value"))
      val want = su.join(pu,
          col("p_uid") === col("user_id") &&
            col("p_ts") >= col("s_ts") &&
            col("p_ts") <= col("s_ts") + expr("INTERVAL 2 HOURS"))
        .withColumn("hr", (unix_micros(col("p_ts")) / lit(3600000000L)).cast("long"))
        .groupBy(col("hr"))
        .agg(count(lit(1)).as("w_pairs"),
          graft.ops.Num.roundTo(sum(col("p_value")), 4).as("w_sum"))
      val bad = got.join(want, Seq("hr"), "full")
        .filter(!(col("n_pairs") <=> col("w_pairs")) || !(col("value_sum_r") <=> col("w_sum")))
        .count()
      assert(bad == 0L, "streamed join→window rollup diverges from the batch twin")
      // no sentinel leakage: every emitted hour predates the sentinel epoch
      val sentinelHr = graft.ext.Streaming.SentinelEpochUs / 3600000000L
      assert(got.filter(col("hr") >= sentinelHr).count() == 0L)
    } finally { got.unpersist(); () }
  }
}
