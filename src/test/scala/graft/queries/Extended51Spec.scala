package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-computed pins for the Shapley/CV/Kendall/bounce batch
  * (q289–q292): planted fixtures small enough to verify every number by
  * hand, covering the contracts the sf oracles can't isolate (the
  * pre-purchase touch filter and converting-only universe, exact
  * Shapley weights and the efficiency axiom, zero-MSE recovery of a
  * noiseless linear fit, ±1 tau on monotone series, and session
  * boundary/bounce classification).
  */
class Extended51Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  test("q289: exact Shapley on a 3-journey lattice, efficiency axiom") {
    // user 1: click → purchase            (mask {click})
    // user 2: purchase, no prior touch    (mask ∅)
    // user 3: click, view → purchase; a click AFTER purchase must not
    //         count; user 4 signup but never converts — excluded.
    // Hand-computed 24·φ: click 36 (φ=1.5), view 12 (φ=0.5),
    // error = signup = 0; Σφ = 2 = v(full) − v(∅) = 3 − 1.
    val dir = java.nio.file.Files.createTempDirectory("x51ev").toString
    Seq(
      (1L, 1L, "click", 50L), (2L, 1L, "purchase", 100L),
      (3L, 2L, "purchase", 100L),
      (4L, 3L, "click", 10L), (5L, 3L, "view", 20L),
      (6L, 3L, "purchase", 100L), (7L, 3L, "click", 200L),
      (8L, 4L, "signup", 10L))
      .toDF("event_id", "user_id", "event_type", "sec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = q("q289_shapley_attribution")(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("click", 1.5, 36L, 3L, 1L),
      ("error", 0.0, 0L, 3L, 1L),
      ("signup", 0.0, 0L, 3L, 1L),
      ("view", 0.5, 12L, 3L, 1L)))
  }

  test("q290: noiseless linear data recovers slope 2 / intercept 0 / MSE 0 in every fold") {
    // y = 2x dollars exactly; folds from (l_orderkey*7 + l_linenumber) % 5.
    // 25 rows spread over all folds with ≥2 distinct x per train split.
    val dir = java.nio.file.Files.createTempDirectory("x51li").toString
    (1 to 25).map { i =>
      val x = (i % 7 + 1).toDouble
      (i.toLong, i, "A", x, 2.0 * x)
    }.toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = q("q290_cv_mse")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.length == 5)
    got.foreach { case (flag, _, slope, icept, mse, cv) =>
      assert(flag == "A" && slope == 2.0 && icept == 0.0 && mse == 0.0 && cv == 0.0, got.toSeq)
    }
  }

  test("q291: tau-b is +1 / -1 on monotone monthly series") {
    // flag A: q and r both increase month over month → tau 1
    // flag N: q increases, r decreases → tau −1
    val dir = java.nio.file.Files.createTempDirectory("x51kt").toString
    val rows = (1 to 4).flatMap { m =>
      Seq(("A", f"2000-0$m-15", m.toDouble, 10.0 * m),
        ("N", f"2000-0$m-15", m.toDouble, 10.0 * (5 - m)))
    }
    rows.toDF("l_returnflag", "d", "l_quantity", "l_extendedprice")
      .select(col("l_returnflag"), to_timestamp(col("d")).as("l_shipdate"),
        col("l_quantity"), col("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = q("q291_kendall_tau")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(6)))
    assert(got.toSeq == Seq(("A", 4L, 6L, 0L, 1.0), ("N", 4L, 0L, 6L, -1.0)))
  }

  test("q292: session boundaries at 30 min; bounce and depth per entry type") {
    // user 1: view,view,click at 0/10/20 s (one session, entry view,
    // depth 3, 20 s) + click at 4000 s (own session, bounce);
    // user 2: single click (bounce).
    val dir = java.nio.file.Files.createTempDirectory("x51bs").toString
    Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "view", 10L), (3L, 1L, "click", 20L),
      (4L, 1L, "click", 4000L), (5L, 2L, "click", 7L))
      .toDF("event_id", "user_id", "event_type", "sec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = q("q292_bounce_sessions")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("click", 2L, 2L, 1.0, 1.0, 0.0),
      ("view", 1L, 0L, 0.0, 3.0, 20.0)))
  }
}
