package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** q274 pins: the HITS iteration replays from a plain Scala walk over
  * the same weighted trade graph, and the fixpoint's defining structure
  * holds (L1-normalized vectors; buyers with no supplier role score
  * zero authority).
  */
class Extended48Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q274: hubs/authorities replay from a plain Scala HITS walk") {
    val got = graft.SparkEntry.queries("q274_hits")(spark, sf0001).collect()
      .map(rw => (rw.getInt(0), rw.getString(1), rw.getDouble(2), rw.getDouble(3)))
    assert(got.length == 25)
    // rebuild the weighted nation trade graph
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_nationkey")
    val sup = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select($"s_suppkey", $"s_nationkey")
    val edges = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey".as("u"), $"s_nationkey".as("v"))
      .agg(count(lit(1)).as("w"))
      .collect().map(rw => ((rw.getInt(0), rw.getInt(1)), rw.getLong(2).toDouble))
      .toMap
    val nodes = (0 until 25).toArray
    var h = nodes.map(_ => 0.04)
    var a = nodes.map(_ => 0.0)
    def l1(x: Array[Double]): Array[Double] = {
      val t = x.map(v => BigDecimal(r(v, 12))).sum.toDouble
      x.map(v => r(v / t, 12))
    }
    for (_ <- 1 to 8) {
      a = l1(nodes.map(v => nodes.map(u =>
        BigDecimal(r(h(u) * edges.getOrElse((u, v), 0.0), 12)))
        .sum.toDouble))
      h = l1(nodes.map(u => nodes.map(v =>
        BigDecimal(r(a(v) * edges.getOrElse((u, v), 0.0), 12)))
        .sum.toDouble))
    }
    got.foreach { case (v, _, authR, hubR) =>
      assert(authR == r(a(v), 6), s"auth nation $v")
      assert(hubR == r(h(v), 6), s"hub nation $v")
    }
    // L1 normalization: both vectors sum to ~1
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4)
    // sf0.001 has 10 suppliers over 25 nations: supplierless nations
    // must have exactly zero authority, yet can still be positive hubs
    val supplierNations = edges.keySet.map(_._2)
    got.filterNot(t => supplierNations(t._1)).foreach { t =>
      assert(t._3 == 0.0, s"nation ${t._1} has no suppliers")
    }
    assert(got.exists(t => !supplierNations(t._1) && t._4 > 0))
  }
}
