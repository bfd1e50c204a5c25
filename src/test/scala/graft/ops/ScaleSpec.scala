package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join") {
    val large = graft.Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val small = graft.Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = large.join(small, "l_orderkey")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Scale.saltedJoin(large, small, "l_orderkey", 8)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin spreads a manufactured hot key across reducers") {
    // 20k rows on ONE key: unsalted, every row meets on a single join
    // key (= one reducer's task); salted with n=8, the hot key's rows
    // split over 8 (key, salt) reducer groups of ~2.5k each
    val n = 8
    val hot = spark.range(20000)
      .select(lit(42L).as("k"), col("id").as("payload"))
    val dim = Seq((42L, "dim42"), (7L, "dim7")).toDF("k", "attr")
    val salted = hot.withColumn(
      "__salt", pmod(xxhash64(hot.columns.map(col).toSeq: _*), lit(n)))
    val spread = salted.groupBy("k", "__salt").count()
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // all n salt values materialize, and no (key,salt) group holds more
    // than 2× its fair share — the reducer-level bound AQE cannot give
    // an aggregation-style hot key
    assert(spread.map(_._1).toSet == (0L until n).toSet)
    assert(spread.map(_._2).max <= 2 * 20000 / n,
      s"salt skewed: ${spread.toSeq.sorted}")
    // and the salted join still returns exactly the plain join's rows
    val plain = hot.join(dim, "k").agg(count(lit(1)), sum("payload"))
      .head()
    val viaSalt = Scale.saltedJoin(hot, dim, "k", n).agg(count(lit(1)), sum("payload"))
      .head()
    assert(viaSalt == plain)
  }

  test("bloomSemiJoin is row-identical to the plain semi join") {
    val large = graft.Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val keys = graft.Tables.load(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val plain = large.join(keys, Seq("l_orderkey"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val bloomed = Scale.bloomSemiJoin(large, keys, "l_orderkey", 10000L, 0.01)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("bloomSemiJoin derived sizing keeps the requested fpp on a 10M-key side") {
    // The old fixed expectedItems=1M default silently degraded to fpp≈1
    // when the key side outgrew the guess — the filter stopped
    // discarding anything and the full shuffle came back. Derived
    // sizing (expectedItems = -1 → approx_count_distinct pass) must
    // hold the requested fpp no matter the key-side size: build over
    // 10M distinct keys, probe 100k DISJOINT keys, and require the
    // measured false-positive rate to stay within 3× the requested 1%
    // (3σ on 100k Bernoulli trials is ±0.1pp; 3× also absorbs the
    // sketch's rsd and Spark's power-of-two bit rounding).
    val keys = spark.range(10000000L).select(col("id").as("k"))
    val bf = Scale.buildBloom(keys, "k", expectedItems = -1L, fpp = 0.01).get
    val probes = spark.range(10000000L, 10100000L).select(col("id").as("k"))
    val fps = probes.filter(Scale.mightContain(spark, bf, col("k")))
      .count()
    val rate = fps.toDouble / 100000
    assert(rate <= 0.03, f"measured fp rate $rate%.4f exceeds 3×fpp")
  }

  test("saltedMeans matches plain grouped mean") {
    val df = Seq(("hot", 1.0), ("hot", 3.0), ("hot", 5.0), ("cold", 10.0)).toDF("k", "v")
    val out = Scale.saltedMeans(df, "k", "v", 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("hot" -> 3.0, "cold" -> 10.0))
  }

  test("bucketed tables join without a shuffle (Exchange only for non-bucketed plans)") {
    val orders = graft.Tables.load(spark, sf0001, "orders")
    val customer = graft.Tables.load(spark, sf0001, "customer")
    Scale.writeBucketed(orders, "orders_b", Seq("o_custkey"), 4)
    Scale.writeBucketed(customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", Seq("o_custkey"), 4)
    val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"))
    // the bucketed join must not reshuffle either side
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }

  test("partitioned sink + partition pruning: filter becomes a PartitionFilter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/li"
    Sinks.parquet(
      graft.Tables.load(spark, sf0001, "lineitem"), dir, partitionBy = Seq("l_returnflag"))
    val df = spark.read.parquet(dir).filter(col("l_returnflag") === "A").select("l_quantity")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    assert(plan.contains("(l_returnflag#") || plan.contains("l_returnflag = A"), plan)
  }

  test("Observation-based checks ride the consuming action (no extra scan)") {
    val df = Seq((1.0, "a"), (200.0, "b"), (3.0, "c")).toDF("x", "s")
    val (out, fetch) = Validate.observed(df, Seq(Validate.inRange("x", 0, 100)))
    out.collect() // the consuming action
    val failures = fetch()
    assert(failures.map(f => f.name -> f.violations) == Seq("range(x,0.0,100.0)" -> 1L))
  }
}
