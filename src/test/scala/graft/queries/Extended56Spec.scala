package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-computed pin for sequential episode mining (q301): window
  * inclusion at exactly one hour, exclusion past it, the
  * adjacent-hour-bucket probe (a pair spanning the bucket boundary),
  * and the support/confidence denominators.
  */
class Extended56Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def round6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6 + 0.0

  test("q301: one episode type with boundary pair; far pair excluded") {
    // u1: click@0 → view@600 s (in window); signup@7200 s is outside
    //     BOTH click's and view's windows.
    // u2: click@0 → view@3600 s — exactly the window bound (included),
    //     and the pair SPANS the hour-bucket boundary (bucket probe pin).
    // u3: view only (denominator: 3 total users, 2 click users).
    val dir = java.nio.file.Files.createTempDirectory("x56ep").toString
    Seq(
      (1L, 1L, "click", 0L), (2L, 1L, "view", 600L), (3L, 1L, "signup", 7200L),
      (4L, 2L, "click", 0L), (5L, 2L, "view", 3600L),
      (6L, 3L, "view", 50L))
      .toDF("event_id", "user_id", "event_type", "sec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = q("q301_episode_mining")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got.toSeq == Seq(
      ("click", "view", 2L, 2L, 2L, round6(2.0 / 3.0), 1.0, 2100.0)))
  }
}
