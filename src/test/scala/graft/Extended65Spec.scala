package graft

import org.apache.spark.sql.functions._

/** q320: declarative data-quality suite over orders. */
class Extended65Spec extends SparkSuite {

  test("q320: one row per rule; every metric replays from a direct computation; passed <=> threshold semantics") {
    val got = SparkEntry.queries("q320_quality_suite")(spark, sf0001).collect()
      .map(r => r.getAs[String]("rule_id") ->
        (r.getAs[Double]("metric_r"), r.getAs[Double]("threshold"), r.getAs[Boolean]("passed")))
      .toMap
    assert(got.size == 7, s"expected 7 rules, got ${got.keySet}")
    val o = Tables.load(spark, sf0001, "orders")
    val n = o.count().toDouble
    // direct replays
    val nnCust = o.filter(col("o_custkey").isNotNull).count()
    val ndKey = o.select(col("o_orderkey")).distinct().count()
    val mx = o.agg(max(col("o_totalprice"))).head.getDouble(0)
    val orphs = o.join(Tables.load(spark, sf0001, "customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    def r6(x: Double): Double = math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6 + 0.0
    assert(got("completeness_custkey")._1 == r6(nnCust / n))
    assert(got("unique_orderkey")._1 == r6(ndKey / n))
    assert(got("range_totalprice_max")._1 == r6(mx))
    assert(got("fk_custkey_resolves")._1 == orphs.toDouble)
    assert(got("fk_custkey_resolves")._3 == (orphs == 0L))
    // the clean fixture passes the whole suite; pass flags must be
    // consistent with their own metric/threshold readouts
    assert(got("completeness_custkey")._3 == (nnCust.toDouble == n))
    assert(got("range_totalprice_max")._3 == (mx <= got("range_totalprice_max")._2))
  }

  test("q320: the suite's metric formulas catch planted violations (completeness, uniqueness, range)") {
    // perturb orders in-memory: duplicate a key, null a custkey, blow a
    // price past the cap — the same single-pass aggregate the query runs
    // must see all three (guards against vacuous always-pass formulas)
    val o = Tables.load(spark, sf0001, "orders")
    val poisoned = o
      .unionAll(o.limit(1)) // duplicate orderkey
      .unionAll(o.limit(1)
        .withColumn("o_custkey", lit(null).cast("long"))
        .withColumn("o_orderkey", lit(-1L))
        .withColumn("o_totalprice", lit(700000.0)))
    val m = poisoned.agg(
      count(lit(1)).as("n"), count(col("o_custkey")).as("nn"),
      countDistinct(col("o_orderkey")).as("nd"), max(col("o_totalprice")).as("mx")).head
    assert(m.getAs[Long]("nn") < m.getAs[Long]("n"), "completeness rule missed the planted null")
    assert(m.getAs[Long]("nd") < m.getAs[Long]("n"), "uniqueness rule missed the planted duplicate")
    assert(m.getAs[Double]("mx") > 600000.0, "range rule missed the planted outlier")
  }
}
