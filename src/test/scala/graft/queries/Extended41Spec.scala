package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Independent replays for the q257–q262 TPC-H shapes: each SQL result is
  * recomputed with plain DataFrame ops (different plan path) or a plain
  * Scala fold over collected rows, plus the structural property each
  * shape exists to test (Q13's zero-order customers survive; Q19 stays an
  * equi-join; Q21's blame set is sole-late by construction).
  */
class Extended41Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  private def li = spark.read.parquet(s"$sf0001/lineitem.parquet")
  private def ord = spark.read.parquet(s"$sf0001/orders.parquet")
  private def cust = spark.read.parquet(s"$sf0001/customer.parquet")

  test("q257: Q10 top-20 replays from a DataFrame plan; ordered by revenue") {
    val got = q("q257_sql_q10")(spark, sf0001).collect()
    assert(got.nonEmpty && got.length <= 20)
    val revs = got.map(_.getDouble(2))
    assert(revs.sameElements(revs.sortBy(-_)), "descending revenue")
    // replay the top row's revenue with an independent DataFrame plan
    val topKey = got.head.getLong(0)
    val exp = cust.filter($"c_custkey" === topKey)
      .join(ord, $"c_custkey" === $"o_custkey")
      .join(li, $"l_orderkey" === $"o_orderkey")
      .filter($"l_returnflag" === "R" &&
        $"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-04-01")
      .select($"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .collect().map(rw => BigDecimal(r(rw.getDouble(0), 4))).sum
    assert(got.head.getDouble(2) == exp.toDouble)
  }

  test("q258: Q13 keeps zero-order customers; distribution sums to all customers") {
    val got = q("q258_sql_q13")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1)))
    val nCust = cust.count()
    assert(got.map(_._2).sum == nCust, "every customer lands in one bucket")
    // independent replay: count per customer with the filter in the join
    val counts = ord.filter($"o_orderpriority" =!= "1-URGENT")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
    val withZero = cust.join(counts, $"c_custkey" === $"o_custkey", "left")
      .select(coalesce($"n", lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toMap
    assert(got.toMap == withZero)
    // the shape's raison d'être — zero-order customers survive the
    // ON-clause filter — pinned on a synthetic fixture (the sf0.001
    // fixture happens to give every customer a non-urgent order):
    // customer 1 has ONLY an urgent order and must land in bucket 0
    Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
      .createOrReplaceTempView("customer")
    Seq((10L, 1L, "1-URGENT"), (11L, 2L, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .createOrReplaceTempView("orders")
    val synth = spark.sql(Extended41.sqlQ13).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1))).toMap
    assert(synth == Map(0L -> 1L, 1L -> 1L),
      "urgent-only customer lands in the 0 bucket (ON, not WHERE, semantics)")
  }

  test("q259: Q14 promo share replays from independent sums") {
    val row = q("q259_sql_q14")(spark, sf0001).collect().head
    val joined = li.join(spark.read.parquet(s"$sf0001/part.parquet"),
        $"p_partkey" === $"l_partkey")
      .filter($"l_shipdate" >= "1996-03-01" && $"l_shipdate" < "1996-04-01")
      .select($"p_type", ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .collect()
    val promo = joined.filter(_.getString(0) == "PROMO")
      .map(rw => BigDecimal(r(rw.getDouble(1), 4))).sum.toDouble
    val total = joined.map(rw => BigDecimal(r(rw.getDouble(1), 4))).sum.toDouble
    assert(row.getDouble(1) == promo && row.getDouble(2) == total)
    assert(row.getDouble(0) == r(100.0 * promo / total, 6))
    assert(row.getLong(3) == joined.length)
  }

  test("q260: Q15 returns exactly the argmax supplier(s) of the revenue view") {
    val got = q("q260_sql_q15")(spark, sf0001).collect()
    val byVal = li
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .select($"l_suppkey", ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .collect().map(rw => (rw.getLong(0), BigDecimal(r(rw.getDouble(1), 4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
    val mx = byVal.values.max
    val winners = byVal.filter(_._2 == mx).keySet
    assert(got.map(_.getLong(0)).toSet == winners)
    got.foreach(rw => assert(rw.getDouble(2) == mx))
  }

  test("q261: Q19 revenue replays from a row-level disjunction filter") {
    val row = q("q261_sql_q19")(spark, sf0001).collect().head
    val rows = li.join(spark.read.parquet(s"$sf0001/part.parquet"),
        $"p_partkey" === $"l_partkey")
      .select($"p_brand", $"p_size", $"l_quantity",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .collect()
      .filter { rw =>
        val (b, sz, qt) = (rw.getString(0), rw.getInt(1), rw.getDouble(2))
        (b == "Brand#12" && sz >= 1 && sz <= 15 && qt >= 1 && qt <= 20) ||
        (b == "Brand#23" && sz >= 1 && sz <= 25 && qt >= 10 && qt <= 30) ||
        (b == "Brand#3" && sz >= 1 && sz <= 35 && qt >= 20 && qt <= 40)
      }
    val exp = rows.map(rw => BigDecimal(r(rw.getDouble(3), 4))).sum.toDouble
    assert(row.getDouble(0) == exp && row.getLong(1) == rows.length && rows.nonEmpty)
  }

  test("q262: Q21 counts exactly the sole-late lineitems on finished multi-supplier orders") {
    val got = q("q262_sql_q21")(spark, sf0001).collect()
      .map(rw => (rw.getString(0), rw.getLong(1))).toMap
    // plain Scala replay of the EXISTS / NOT EXISTS semantics
    def inst(v: Any): java.time.Instant = v match {
      case t: java.sql.Timestamp => t.toInstant
      case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC)
      case i: java.time.Instant => i
    }
    val orders = ord.filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate").collect()
      .map(rw => rw.getLong(0) -> inst(rw.get(1))).toMap
    val lis = li.select($"l_orderkey", $"l_suppkey", $"l_shipdate").collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), inst(rw.get(2))))
      .filter(t => orders.contains(t._1))
    val byOrder = lis.groupBy(_._1)
    val late = (ok: Long, ship: java.time.Instant) =>
      ship.isAfter(orders(ok).plus(java.time.Duration.ofDays(60)))
    val sup = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select($"s_suppkey", $"s_name").collect()
      .map(rw => rw.getLong(0) -> rw.getString(1)).toMap
    val waiting = lis.filter { case (ok, sk, ship) =>
      late(ok, ship) &&
        byOrder(ok).exists(o => o._2 != sk) &&
        !byOrder(ok).exists(o => o._2 != sk && late(ok, o._3))
    }.groupBy(t => sup(t._2)).view.mapValues(_.length.toLong).toMap
    assert(got == waiting && got.nonEmpty)
  }
}
