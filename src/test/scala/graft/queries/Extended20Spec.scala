package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 fourth batch (q192–q195): independent replays plus
  * each query's defining invariant — the χ² grid must cover every
  * (type, dow) cell including empty ones (q192), the rank-sum AUC must
  * equal the O(n²) pair-counting definition with half-credit ties (q193),
  * the backtest split must be exactly 7 test days scored against
  * in-sample naive error (q194), and triangle corner counts must sum to
  * 3× the triangle total (q195).
  */
class Extended20Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q192: chi-square equals a full-grid replay; dow arithmetic is engine-neutral") {
    val rows = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", to_date($"ts").as("day")).collect()
      .map(row => (row.getString(0), row.getDate(1).toLocalDate))
    val cells = rows.map { case (et, d) => (et, ((d.toEpochDay + 4) % 7)) }
    val types = cells.map(_._1).distinct.sorted
    val dows = cells.map(_._2).distinct.sorted
    val n = cells.length.toDouble
    val cnt = cells.groupBy(identity).view.mapValues(_.length).toMap
    val rowT = types.map(t => t -> cells.count(_._1 == t)).toMap
    val colT = dows.map(d => d -> cells.count(_._2 == d)).toMap
    val chi2 = (for { t <- types; d <- dows } yield {
      val o = cnt.getOrElse((t, d), 0).toDouble
      val e = rowT(t) * colT(d) / n
      BigDecimal(r((o - e) * (o - e) / e, 8))
    }).sum.toDouble
    val got = graft.SparkEntry.queries("q192_chi2_independence")(spark, sf0001)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getDouble(4), row.getBoolean(5))).toSeq
    assert(got == Seq((cells.length.toLong, types.length.toLong, dows.length.toLong,
      (types.length - 1).toLong * (dows.length - 1), r(chi2, 4), chi2 > 36.415)))
    // the grid covered all cells: 5 types × 7 dows at the spec scale
    assert(got.head._2 == 5L && got.head._3 == 7L && got.head._4 == 24L)
  }

  test("q193: rank-sum AUC equals the O(n^2) pair-counting definition") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"source", $"n_chars", $"lang").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getString(2) == "en"))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
      val pos = xs.filter(_._3).map(_._2)
      val neg = xs.filterNot(_._3).map(_._2)
      // pair counting: P(score_pos > score_neg) + 0.5·P(tie)
      val wins = (for { p <- pos; q <- neg } yield
        if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
      (src, pos.length.toLong, neg.length.toLong,
        r(wins / (pos.length.toDouble * neg.length), 6))
    }
    val got = graft.SparkEntry.queries("q193_auc_rank")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDouble(3))).toSeq
    assert(got == expected)
    // ties must actually occur (the tie path is the point of the design)
    val tied = docs.groupBy(x => (x._1, x._2)).exists { case (_, xs) =>
      xs.exists(_._3) && xs.exists(!_._3)
    }
    assert(tied, "fixture must contain cross-class score ties")
  }

  test("q194: backtest replays; exactly 7 scored test days per type") {
    val daily = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", to_date($"ts").as("day"), $"value").collect()
      .map(row => (row.getString(0), row.getDate(1).toLocalDate, row.getDouble(2)))
      .groupBy(x => (x._1, x._2)).view
      .mapValues(xs => xs.map(x => BigDecimal(r(x._3, 4))).sum).toMap
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.map { et =>
      val series = daily.filter(_._1._1 == et).map { case ((_, d), a) => d -> a }
      val paired = series.toSeq.flatMap { case (d, a) =>
        series.get(d.minusDays(7)).map(f => (d, a, f))
      }.sortBy(_._1)(Ordering.fromLessThan[java.time.LocalDate](_ isAfter _))
      val test = paired.take(7)
      val train = paired.drop(7)
      val mape = test.map(x => BigDecimal(r(((x._2 - x._3).abs / x._2).toDouble, 12))).sum
      val smape = test.map(x =>
        BigDecimal(r(((x._2 - x._3).abs * 2 / (x._2 + x._3)).toDouble, 12))).sum
      val testAe = test.map(x => (x._2 - x._3).abs).sum
      val trainAe = train.map(x => (x._2 - x._3).abs).sum
      (et, test.length.toLong, train.length.toLong,
        r((mape / test.length).toDouble, 6),
        r((smape / test.length).toDouble, 6),
        r((testAe.toDouble / test.length) / (trainAe.toDouble / train.length), 6))
    }
    val got = graft.SparkEntry.queries("q194_forecast_backtest")(spark, sf0001)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDouble(3), row.getDouble(4), row.getDouble(5))).toSeq
    assert(got == expected)
    assert(got.forall(_._2 == 7L), "every type must score a full 7-day horizon")
    assert(got.forall(_._3 > 0L), "in-sample MASE denominator must be non-vacuous")
  }

  test("q195: corner counts sum to 3x triangles; clustering replay matches") {
    val got = graft.SparkEntry.queries("q195_triangles")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        if (row.isNullAt(3)) null else java.lang.Double.valueOf(row.getDouble(3))))
      .toSeq
    // independent replay from the raw tables
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey")
    val ed = li
      .join(spark.read.parquet(s"$sf0001/orders.parquet")
        .select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .join(spark.read.parquet(s"$sf0001/customer.parquet")
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
      .join(spark.read.parquet(s"$sf0001/supplier.parquet")
        .select($"s_suppkey", $"s_nationkey"), $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .select(least($"c_nationkey", $"s_nationkey").cast("long").as("u"),
        greatest($"c_nationkey", $"s_nationkey").cast("long").as("v"))
      .distinct().collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    val nodes = ed.flatMap(e => Seq(e._1, e._2))
    val tris = for {
      a <- nodes; b <- nodes; c <- nodes
      if a < b && b < c && ed((a, b)) && ed((b, c)) && ed((a, c))
    } yield (a, b, c)
    val triOf = nodes.map(n => n -> tris.count(t => t._1 == n || t._2 == n || t._3 == n).toLong).toMap
    val degOf = nodes.map(n => n -> ed.count(e => e._1 == n || e._2 == n).toLong).toMap
    val expected = nodes.toSeq.sorted.map { n =>
      val (d, t) = (degOf(n), triOf(n))
      (n, d, t, if (d >= 2) java.lang.Double.valueOf(
        r(2.0 * t / (d.toDouble * (d - 1)), 6)) else null)
    }
    assert(got == expected)
    // each triangle contributes exactly 3 corners
    assert(got.map(_._3).sum == 3L * tris.size)
    assert(tris.nonEmpty, "trade graph must contain triangles")
  }
}
