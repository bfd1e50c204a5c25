package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 eighth batch (q207–q208): independent replays plus
  * each query's defining invariant — the bucketed interval join must find
  * exactly the pairs a direct range scan finds, including intervals that
  * straddle bucket boundaries (q207), and the waterfall must close: the
  * final position equals the end-period total and the shares sum to ±1
  * (q208).
  */
class Extended24Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q207: bucketed join equals a direct range-scan replay; straddlers exist") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", unix_micros($"ts").as("us")).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val day = 86400000000L
    val acts = ev.groupBy(x => (x._1, x._2 / day)).toSeq.flatMap { case ((u, _), xs) =>
      val (a0, a1) = (xs.map(_._2).min, xs.map(_._2).max)
      if (a1 > a0) Some((u, a0, a1)) else None
    }
    val t0 = ev.map(_._2).min
    val promos = (0 until 5).map { w =>
      val p0 = t0 + w * 7L * day + 30L * 3600000000L
      (w.toLong, p0, p0 + 60L * 3600000000L)
    }
    val pairs = for {
      (u, a0, a1) <- acts; (pid, p0, p1) <- promos
      if a0 < p1 && p0 < a1
    } yield (pid, u, math.min(a1, p1) - math.max(a0, p0))
    val expected = pairs.groupBy(_._1).toSeq.sortBy(_._1).map { case (pid, xs) =>
      (pid, xs.size.toLong, xs.map(_._2).distinct.size.toLong,
        r(xs.map(_._3).sum.toDouble / 3600000000.0, 4))
    }
    val got = graft.SparkEntry.queries("q207_interval_join")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getDouble(3))).toSeq
    assert(got == expected)
    // promos straddle day boundaries by construction (60 h windows), so the
    // multi-cell path is exercised; check an overlap crosses a day line
    assert(pairs.nonEmpty)
    assert(promos.forall { case (_, p0, p1) => p1 / day > p0 / day },
      "every promo must straddle at least one day boundary")
  }

  test("q208: waterfall closes — final position equals end total; shares sum to ±1") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderpriority",
        date_format($"o_orderdate", "yyyy-MM").as("m"), $"o_totalprice")
      .collect().map(row => (row.getString(0), row.getString(1),
        math.floor(row.getDouble(2) * 100 + 0.5).toLong))
    val (m1, m2) = (orders.map(_._2).min, orders.map(_._2).max)
    assert(m1 != m2, "fixture must span at least two months")
    val pris = orders.map(_._1).distinct.sorted
    val c1 = pris.map(p => p -> orders.filter(x => x._1 == p && x._2 == m1)
      .map(_._3).sum).toMap
    val c2 = pris.map(p => p -> orders.filter(x => x._1 == p && x._2 == m2)
      .map(_._3).sum).toMap
    val t1 = c1.values.sum; val td = c2.values.sum - t1
    var cum = 0L
    val expected = pris.map { p =>
      val d = c2(p) - c1(p); cum += d
      (p, r(c1(p) / 100.0, 2), r(c2(p) / 100.0, 2), r(d / 100.0, 2),
        r(d.toDouble / math.abs(td), 6), r((t1 + cum) / 100.0, 2),
        if (c1(p) == 0L) null
        else java.lang.Double.valueOf(r(d.toDouble / c1(p), 6)))
    }
    val got = graft.SparkEntry.queries("q208_waterfall")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getDouble(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4), row.getDouble(5),
        if (row.isNullAt(6)) null else java.lang.Double.valueOf(row.getDouble(6))))
      .toSeq
    assert(got == expected.toSeq)
    // every priority appears — including ones absent from both boundary months
    assert(got.map(_._1) == pris.toSeq)
    // the bridge must CLOSE on the end-period total
    assert(got.last._6 == r(c2.values.sum / 100.0, 2))
    // signed shares sum to ±1 within rounding width
    assert(math.abs(got.map(_._5).sum.abs - 1.0) < 1e-4)
  }
}
