package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 tenth batch (q247–q251): SRM χ² replay from raw
  * arm counts, the Bennet decomposition identity (rate effect + mix
  * effect = total delta, exact at midpoint weights) with all three
  * segments real, and independent DataFrame-API replays of the three
  * SQL-surface shapes (Q7 both-directions symmetry, Q8 share bounds,
  * Q22's anti-join against a driver-side urgent-customer set).
  */
class Extended37Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q247: SRM χ² replays from raw arm counts") {
    val row = q("q247_srm_check")(spark, sf0001).collect().head
    val users = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"user_id").distinct().collect().map(_.getLong(0))
    val n0 = users.count(_ % 2 == 0).toLong
    val n1 = users.count(_ % 2 == 1).toLong
    assert(row.getLong(0) == n0 && row.getLong(1) == n1)
    val e = (n0 + n1) / 2.0
    val chi2 = (n0 - e) * (n0 - e) / e + (n1 - e) * (n1 - e) / e
    assert(row.getDouble(2) == r(n1.toDouble / (n0 + n1), 6))
    assert(row.getDouble(3) == r(chi2, 6))
    assert(row.getBoolean(4) == (chi2 > 3.841458820694124))
  }

  test("q248: Bennet identity holds; all three segments present in both periods") {
    val got = q("q248_mix_decomposition")(spark, sf0001).collect()
    assert(got.map(_.getString(0)).sorted.sameElements(Array("high", "low", "mid")),
      "all three activity segments must be real at every SF")
    assert(got.forall(_.getBoolean(8)), "rate effect + mix effect must equal ΔR exactly")
    got.foreach { rw =>
      for (i <- 1 to 4) { val v = rw.getDouble(i); assert(v >= 0.0 && v <= 1.0) }
    }
    // weights are shares: each period's weights sum to ~1
    assert(math.abs(got.map(_.getDouble(1)).sum - 1.0) < 1e-5)
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-5)
  }

  test("q249: Q7 volume replays via the DataFrame API; both directions present") {
    val got = q("q249_sql_q7")(spark, sf0001).collect()
      .map(rw => ((rw.getString(0), rw.getString(1), rw.getLong(2)), rw.getDouble(3)))
    val dirs = got.map(_._1).map(t => (t._1, t._2)).distinct
    assert(dirs.contains(("NATION_13", "NATION_19")) && dirs.contains(("NATION_19", "NATION_13")),
      "trade must flow in both directions")
    // independent API-side replay
    val li = graft.Tables.load(spark, sf0001, "lineitem")
    val o = graft.Tables.load(spark, sf0001, "orders")
    val c = graft.Tables.load(spark, sf0001, "customer")
    val su = graft.Tables.load(spark, sf0001, "supplier")
    val n = graft.Tables.load(spark, sf0001, "nation")
    val rep = su.join(li, $"s_suppkey" === $"l_suppkey")
      .join(o, $"o_orderkey" === $"l_orderkey")
      .join(c, $"c_custkey" === $"o_custkey")
      .join(n.select($"n_nationkey".as("nk1"), $"n_name".as("supp_nation")), $"s_nationkey" === $"nk1")
      .join(n.select($"n_nationkey".as("nk2"), $"n_name".as("cust_nation")), $"c_nationkey" === $"nk2")
      .filter(($"supp_nation" === "NATION_13" && $"cust_nation" === "NATION_19") ||
        ($"supp_nation" === "NATION_19" && $"cust_nation" === "NATION_13"))
      .filter($"l_shipdate" >= "1995-01-01" && $"l_shipdate" < "1999-01-01")
      .select($"supp_nation", $"cust_nation", year($"l_shipdate").cast("long").as("y"),
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .collect()
      .map(rw => ((rw.getString(0), rw.getString(1), rw.getLong(2)),
        BigDecimal(r(rw.getDouble(3), 4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
    got.foreach { case (key, rev) => assert(rev == rep(key)) }
    assert(got.map(_._1).toSet == rep.keySet)
  }

  test("q250: Q8 market share bounded and consistent with its own volumes") {
    val got = q("q250_sql_q8")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getDouble(1), rw.getDouble(2), rw.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, natVol, totVol, share) =>
      assert(natVol >= 0.0 && natVol <= totVol)
      assert(share == r(natVol / totVol, 6))
      assert(share >= 0.0 && share <= 1.0)
    }
    assert(got.exists(_._2 > 0.0), "the measured nation must have volume somewhere")
  }

  test("q251: Q22 anti-join replays against a driver-side urgent-customer set") {
    val got = q("q251_sql_q22")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getDouble(2)))
    assert(got.nonEmpty && got.map(_._2).sum > 0)
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_acctbal").collect()
      .map(rw => (rw.getLong(0), rw.getDouble(1)))
      .filter(c => (1L to 5L).contains(c._1 % 10))
    val urgent = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val pos = cust.filter(_._2 > 0.0)
    val avg = pos.map(c => BigDecimal(r(c._2, 2))).sum.toDouble / pos.length
    val expect = cust.filter(c => c._2 > avg && !urgent.contains(c._1))
      .groupBy(_._1 % 10).view.mapValues { g =>
        (g.length.toLong, g.map(c => BigDecimal(r(c._2, 4))).sum.toDouble)
      }.toMap
    assert(got.length == expect.size)
    got.foreach { case (code, numcust, tot) =>
      val (en, et) = expect(code)
      assert(numcust == en && tot == et)
    }
    assert(cust.exists(c => c._2 > avg && urgent.contains(c._1)),
      "the NOT EXISTS must exclude someone — otherwise the anti-join is vacuous")
  }
}
