package graft

import org.apache.spark.sql.functions._

/** q317: LEFT OUTER stream-stream join — watermark-driven eviction of
  * unmatched signups, replayed AvailableNow with sentinel flush batches.
  */
class Extended63Spec extends SparkSuite {

  test("q317: streamed outer join equals the batch left-join twin, and abandonment is non-vacuous") {
    val got = SparkEntry.queries("q317_stream_outer_join")(spark, sf0001)
    got.cache()
    try {
      // the outer semantics must actually be exercised: some user has an
      // unmatched signup AND no user is lost relative to the signup set
      assert(got.agg(sum(col("n_abandoned"))).head.getLong(0) > 0L,
        "no abandoned signup emitted — the eviction path was not exercised")
      val ev = Tables.load(spark, sf0001, "events")
      val su = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("s_id"), col("ts").as("s_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
      val want = su.join(pu,
          col("p_uid") === col("user_id") &&
            col("p_ts") >= col("s_ts") &&
            col("p_ts") <= col("s_ts") + expr("INTERVAL 2 HOURS"),
          "left_outer")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("w_rows"),
          countDistinct(col("s_id")).as("w_signups"),
          count(col("p_ts")).as("w_matched"),
          count(when(col("p_ts").isNull, lit(1))).as("w_abandoned"))
      val bad = got.join(want, Seq("user_id"), "full")
        .filter(!(col("n_rows") <=> col("w_rows")) ||
          !(col("n_signups") <=> col("w_signups")) ||
          !(col("n_matched") <=> col("w_matched")) ||
          !(col("n_abandoned") <=> col("w_abandoned")))
        .count()
      assert(bad == 0L, "streamed outer-join rollup diverges from the batch twin")
      // row accounting: every signup contributes max(1, matches) rows
      val broken = got.filter(col("n_rows") =!= col("n_matched") + col("n_abandoned")).count()
      assert(broken == 0L, "n_rows != n_matched + n_abandoned for some user")
    } finally { got.unpersist(); () }
  }
}
