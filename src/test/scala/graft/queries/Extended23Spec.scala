package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 seventh batch (q204–q206): independent replays
  * plus each query's defining invariant — hotspot neighborhoods must be
  * edge-correct (border cells carry W < 9) and z-ranked hotspots must
  * really exceed their expectation (q204), the P/R sweep must be monotone
  * in the threshold with all rows present (q205), and the SPRT must walk
  * a replayed LLR path and stop at the first boundary crossing (q206).
  */
class Extended23Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q204: G* replay matches; edge neighborhoods are smaller; hotspots exceed expectation") {
    val counts = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey").collect().map(_.getLong(0))
      .groupBy(k => ((k * 37 % 1000) / 25, (k * 91 % 1000) / 25))
      .view.mapValues(_.length.toLong).toMap
    val lattice = for { x <- 0L until 40L; y <- 0L until 40L } yield (x, y)
    val c = lattice.map(p => p -> counts.getOrElse(p, 0L)).toMap
    val n = 1600.0
    val sc = c.values.sum.toDouble
    val sc2 = c.values.map(v => v * v).sum.toDouble
    val mu = sc / n
    val sd = math.sqrt(sc2 / n - mu * mu)
    val stats = lattice.map { case (x, y) =>
      val nb = for { dx <- -1 to 1; dy <- -1 to 1
        if x + dx >= 0 && x + dx < 40 && y + dy >= 0 && y + dy < 40 }
        yield c((x + dx, y + dy))
      val w = nb.length.toDouble
      val si = nb.sum.toDouble
      val z = (si - w * mu) / (sd * math.sqrt((n * w - w * w) / (n - 1)))
      ((x, y), c((x, y)), si.toLong, w.toLong, r(z, 6))
    }
    val expected = stats.sortBy(s =>
        (-math.floor((s._5 + 100) * 1e6 + 0.5), s._1._1 * 40 + s._1._2))
      .take(10).zipWithIndex.map { case ((p, cc, si, w, z), i) =>
        (i + 1L, p._1, p._2, cc, si, w, z)
      }
    val got = graft.SparkEntry.queries("q204_hotspots")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getDouble(6))).toSeq
    assert(got == expected)
    // corner/edge cells really carry W < 9 (edge-correctness is testable)
    assert(stats.exists(_._4 == 4L) && stats.exists(_._4 == 6L))
    // every reported hotspot's neighborhood exceeds its expectation
    got.foreach { case (_, _, _, _, si, w, z) =>
      if (z > 0) assert(si.toDouble > w * mu)
    }
  }

  test("q205: P/R sweep is monotone in threshold; all rows present; replay matches") {
    val got = graft.SparkEntry.queries("q205_er_prf")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4),
        if (row.isNullAt(5)) null else java.lang.Double.valueOf(row.getDouble(5)),
        row.getDouble(6), row.getDouble(7))).toSeq
    assert(got.map(_._1) == Seq("0.80", "0.85", "0.90", "0.95"),
      "every threshold row must be present even with zero matches")
    // raising the threshold can only shrink matches and TP (monotone)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    // recall = tp / n_var and conservation tp + fn = n_var
    got.foreach { case (_, _, tp, _, fn, _, rec, _) =>
      assert(tp + fn == got.head._3 + got.head._5)
      assert(rec == r(tp.toDouble / (tp + fn), 6))
    }
    // the sweep must be non-degenerate: some threshold separates P from R
    assert(got.exists(x => x._6 != null && x._6.doubleValue < 1.0) ||
      got.exists(_._7 < 1.0))
  }

  test("q206: SPRT walks a replayed LLR path; decision at first crossing only") {
    val daily = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", to_date($"ts").as("day"), $"value").collect()
      .map(row => (row.getString(0), row.getDate(1).toLocalDate, row.getDouble(2)))
      .groupBy(x => (x._1, x._2)).view
      .mapValues(xs => (xs.length.toLong, xs.count(_._3 >= 100).toLong)).toSeq
      .map { case ((et, d), (nn, xx)) => (et, d, nn, xx) }
    val l1 = math.log(0.22 / 0.18); val l0 = math.log(0.78 / 0.82)
    val bound = math.log(19.0)
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, xs) =>
      val series = xs.sortBy(_._2)
      var llr = BigDecimal(0)
      var first: Option[(String, String)] = None
      val path = series.map { case (_, d, nn, xx) =>
        llr += BigDecimal(r(xx * l1 + (nn - xx) * l0, 12))
        val cross =
          if (llr.toDouble >= bound) Some("accept_h1")
          else if (llr.toDouble <= -bound) Some("accept_h0") else None
        if (first.isEmpty && cross.isDefined) first = Some((d.toString, cross.get))
        llr
      }
      (et, series.length.toLong, series.map(_._4).sum, series.map(_._3).sum,
        r(path.max.toDouble, 6), r(path.min.toDouble, 6),
        first.map(_._2).getOrElse("continue"), first.map(_._1).orNull)
    }
    val got = graft.SparkEntry.queries("q206_sprt")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getDouble(4), row.getDouble(5), row.getString(6),
        if (row.isNullAt(7)) null else row.getString(7))).toSeq
    assert(got == expected)
    // the test must DECIDE somewhere on the fixture (else boundaries are vacuous)
    assert(got.exists(_._7 != "continue"), "at least one type must cross a boundary")
  }
}
