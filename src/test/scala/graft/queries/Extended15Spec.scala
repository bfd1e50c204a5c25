package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-7 fifth batch (q173–q174): BigDecimal replays plus
  * the exact-sum invariants that are each query's reason to exist — the
  * Hamilton allocation must sum to the budget EXACTLY, and the
  * ratio-to-report shares must sum to 1 within rounding width.
  */
class Extended15Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q173: Hamilton allocation equals a BigDecimal replay and sums exactly to the budget") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderpriority", $"o_totalprice").collect()
      .map(row => (row.getString(0), BigDecimal(r(row.getDouble(1), 2))))
    val m = rows.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val mt = m.values.sum
    val quotas = m.map { case (p, v) =>
      p -> (v * 10000 / mt).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val fl = quotas.map { case (p, q) => p -> q.toBigInt.toLong }
    val used = fl.values.sum
    val extra = 10000L - used
    val ranked = quotas.toSeq
      .map { case (p, q) => (p, q - BigDecimal(fl(p))) }
      .sortBy { case (p, rem) => (-rem, p) }
    val bump = ranked.take(extra.toInt).map(_._1).toSet
    val expected = m.keys.toSeq.sorted.map { p =>
      (p, m(p).toDouble, fl(p), r((quotas(p) - BigDecimal(fl(p))).toDouble, 6),
        fl(p) + (if (bump(p)) 1L else 0L))
    }
    val got = graft.SparkEntry.queries("q173_largest_remainder")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getDouble(1), row.getLong(2), row.getDouble(3),
        row.getLong(4)))
    assert(got.toSeq == expected)
    // the exact-sum invariant — THE point of largest remainder
    assert(got.map(_._5).sum == 10000L)
    // floors alone must NOT have summed to the budget (else the method is vacuous)
    assert(used != 10000L, s"fixture must leave a remainder to distribute (used=$used)")
  }

  test("q174: contribution shares equal a BigDecimal replay; shares sum to 1") {
    val rev = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/customer.parquet"),
        $"o_custkey" === $"c_custkey")
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        $"c_nationkey" === $"n_nationkey")
      .join(spark.read.parquet(s"$sf0001/region.parquet"),
        $"n_regionkey" === $"r_regionkey")
      .select($"r_name", $"n_name", $"o_totalprice").collect()
      .map(row => (row.getString(0), row.getString(1), BigDecimal(r(row.getDouble(2), 2))))
    val byNation = rev.groupBy(x => (x._1, x._2)).map { case (k, xs) => k -> xs.map(_._3).sum }
    val byRegion = byNation.groupBy(_._1._1).map { case (rn, m) => rn -> m.values.sum }
    val grand = byRegion.values.sum
    val expected = byNation.toSeq.sortBy(_._1).map { case ((rn, nn), v) =>
      (rn, nn, v.toDouble,
        r(v.toDouble / byRegion(rn).toDouble, 6),
        r(byRegion(rn).toDouble / grand.toDouble, 6))
    }
    val got = graft.SparkEntry.queries("q174_ratio_to_report")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getString(1), row.getDouble(2), row.getDouble(3),
        row.getDouble(4)))
    assert(got.toSeq == expected)
    // within-region shares sum to 1 (up to rounding width per member)
    for ((rn, members) <- got.groupBy(_._1)) {
      val s = members.map(_._4).sum
      assert(math.abs(s - 1.0) <= members.length * 5e-7 + 1e-9, s"$rn shares sum $s")
    }
  }

  test("q175: TWAP equals a BigDecimal segment replay and differs from the plain mean") {
    val events = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("t"), $"value").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3)))
    val expected = events.groupBy(_._1).toSeq.map { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val segs = sorted.zip(sorted.tail).map { case (a, b) =>
        (BigDecimal(r(a._4, 4)) * BigDecimal(b._3 - a._3), b._3 - a._3)
      }
      val num = segs.map(_._1).sum
      val den = segs.map(_._2).sum
      (u, segs.size.toLong, r(num.toDouble / den.toDouble, 6))
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("q175_twap")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2)))
    assert(got.toSeq == expected)
    // duration weighting must matter: TWAP != unweighted mean for some user
    val plain = events.groupBy(_._1).map { case (u, es) =>
      val s = es.sortBy(e => (e._3, e._2)).dropRight(1)
      u -> r(s.map(e => r(e._4, 4)).sum / s.length, 6)
    }
    assert(expected.exists { case (u, _, tw) => plain(u) != tw })
  }

  test("q176: graph profile equals an exact Scala replay; assortativity well-formed") {
    // rebuild the strong-edge nation graph driver-side from the raw pairs
    val raw = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey")
      .join(spark.read.parquet(s"$sf0001/orders.parquet")
        .select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .join(spark.read.parquet(s"$sf0001/customer.parquet")
        .select($"c_custkey", $"c_nationkey".as("u")), $"o_custkey" === $"c_custkey")
      .join(spark.read.parquet(s"$sf0001/supplier.parquet")
        .select($"s_suppkey", $"s_nationkey".as("w")), $"l_suppkey" === $"s_suppkey")
      .filter($"u" =!= $"w").select($"u", $"w").collect()
      .map(row => (row.getInt(0), row.getInt(1)))
    val wgt = raw.groupBy { case (u, w) => (math.min(u, w), math.max(u, w)) }
      .map { case (k, xs) => k -> xs.length.toLong }
    // exact median with even-count interpolation — Spark median() semantics
    val ws = wgt.values.toSeq.sorted
    val md =
      if (ws.size % 2 == 1) ws(ws.size / 2).toDouble
      else (ws(ws.size / 2 - 1) + ws(ws.size / 2)) / 2.0
    val und = wgt.filter(_._2 > md).keys.toSeq
    assert(und.nonEmpty && und.size < wgt.size, "threshold must bite at sf0.001")
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val xy = und.flatMap { case (a, b) => Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = xy.size.toLong
    val sx = xy.map(_._1).sum
    val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val varTerm = (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
      (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble)
    assert(varTerm != 0.0, "fixture graph must have degree variance")
    val assort = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      math.sqrt(varTerm)
    val dsum = deg.values.sum
    val expected = (deg.size.toLong, und.size.toLong, deg.values.min, deg.values.max,
      r(dsum.toDouble / deg.size.toDouble, 4), r(assort, 6))
    val got = graft.SparkEntry.queries("q176_graph_profile")(spark, sf0001).collect()
    assert(got.length == 1)
    val row = got.head
    val gt = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getDouble(4), row.getDouble(5))
    assert(gt == expected, s"got $gt expected $expected")
    // structural invariants: handshake lemma + correlation bounds
    assert(dsum == 2L * und.size)
    assert(gt._6 >= -1.0 - 1e-9 && gt._6 <= 1.0 + 1e-9)
  }
}
