package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 ninth batch (q244–q246): Neyman's defining
  * optimality (allocation totals conserve the budget; variance ratio ≤ 1
  * with equality iff all strata share one S), the bloom advisor's closed
  * forms (FPR replay + monotone-in-bits + recommendation minimality),
  * and consistent hashing's contract — ONLY the removed node's keys
  * move, replayed key-by-key from the raw ring.
  */
class Extended36Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q244: allocations conserve the budget; Neyman variance ratio ≤ 1; replay") {
    val got = q("q244_neyman_allocation")(spark, sf0001).collect()
      .map(rw => (rw.getString(0), rw.getLong(1), rw.getDouble(2), rw.getDouble(3),
        rw.getDouble(4), rw.getDouble(5), rw.getDouble(6)))
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/part.parquet"),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_extendedprice").collect()
      .map(rw => (rw.getString(0), BigInt(r(rw.getDouble(1) * 100.0, 0).toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nAll = li.values.map(_.length).sum.toDouble
    val sds = li.map { case (b, cents) =>
      val n = cents.length.toDouble
      val sy = cents.sum.toDouble; val syy = cents.map(c => c * c).sum.toDouble
      b -> math.sqrt((n * syy - sy * sy) / (n * (n - 1.0))) / 100.0
    }
    got.foreach { case (stratum, nh, meanR, sdR, _, propR, ratioR) =>
      assert(nh == li(stratum).length)
      assert(sdR == r(sds(stratum), 4))
      assert(meanR == r(li(stratum).sum.toDouble / nh / 100.0, 4))
      assert(propR == r(nh / nAll * 10000.0, 2))
      assert(ratioR > 0.0 && ratioR <= 1.0 + 1e-9,
        "Neyman can only reduce variance vs proportional")
    }
    // budget conservation: both designs sum to ~10000 (2-dp rounding slack)
    assert(math.abs(got.map(_._5).sum - 10000.0) < 0.5)
    assert(math.abs(got.map(_._6).sum - 10000.0) < 0.5)
  }

  test("q245: FPR closed form replays; monotone in bits; recommendation minimal") {
    val got = q("q245_bloom_fpr")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getLong(3),
        rw.getDouble(4), rw.getBoolean(5), rw.getBoolean(6)))
    val nKeys = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey").distinct().count()
    got.foreach { case (bits, nk, mBits, kOpt, fprR, meets, _) =>
      assert(nk == nKeys && mBits == bits * nKeys)
      assert(kOpt == math.floor(math.log(2.0) * bits + 0.5).toLong)
      val fpr = math.pow(1.0 - math.exp(-kOpt.toDouble / bits), kOpt.toDouble)
      assert(fprR == r(fpr, 8))
      assert(meets == (fpr <= 0.01))
    }
    val fprs = got.sortBy(_._1).map(_._5)
    assert(fprs.sliding(2).forall { case Array(a, b) => b < a },
      "more bits per key must strictly lower the FPR")
    val recommended = got.filter(_._7)
    assert(recommended.length == 1 && recommended.head._6,
      "exactly one recommended budget, and it meets the target")
    assert(got.filter(_._6).map(_._1).min == recommended.head._1,
      "recommendation is the SMALLEST budget meeting 1%")
  }

  test("q246: only the removed node's keys move — replayed key-by-key from the ring") {
    val got = q("q246_consistent_hashing")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getDouble(2), rw.getLong(3),
        rw.getBoolean(4)))
    assert(got.map(_._1).sorted.sameElements(0L to 7L))
    assert(got.forall(_._5), "the only_removed_moves contract must hold on every node")
    // independent replay with java md5
    def h32(s0: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val ring = for (node <- 0 until 8; rep <- 0 until 32)
      yield (node.toLong, h32(s"node$node#$rep"))
    def owner(kh: Long, pts: Seq[(Long, Long)]): Long = {
      val cand = pts.filter(_._2 >= kh)
      val pick = if (cand.nonEmpty) cand.minBy(p => p._2 * 100 + p._1)
      else pts.minBy(p => p._2 * 100 + p._1)
      pick._1
    }
    val keys = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey").collect().map(_.getLong(0))
    val ring2 = ring.filter(_._1 != 7)
    val before = keys.map(k => (k, owner(h32(k.toString), ring)))
    val after = keys.map(k => (k, owner(h32(k.toString), ring2))).toMap
    val byNode = before.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    got.foreach { case (node, nBefore, shareR, moved, _) =>
      val ks = byNode.getOrElse(node, Array.empty[Long]).toSeq
      assert(nBefore == ks.length)
      assert(shareR == r(ks.length.toDouble / keys.length, 6))
      assert(moved == ks.count(k => after(k) != node))
    }
    val n7 = got.find(_._1 == 7L).get
    assert(n7._2 > 0 && n7._4 == n7._2, "node 7 owns keys and all of them move")
  }
}
