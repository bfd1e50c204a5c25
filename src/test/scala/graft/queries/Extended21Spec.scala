package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 fifth batch (q196–q199): independent replays plus
  * each query's defining invariant — MI must obey its information-theory
  * bounds against the replayed entropies (q196), the clean FK arms must
  * report EXACT zeros while the partial-extract arm must produce real
  * orphans (q197), the gap report must reconstruct exactly the deleted id
  * runs (q198), and the control limits must straddle the center with
  * excursions consistent with a replay (q199).
  */
class Extended21Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q196: MI replays and satisfies 0 <= MI <= min(H); NMI in [0,1]") {
    val cells = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", to_date($"ts").as("day")).collect()
      .map(row => (row.getString(0), (row.getDate(1).toLocalDate.toEpochDay + 4) % 7))
    val n = cells.length.toDouble
    val pj = cells.groupBy(identity).view.mapValues(_.length / n).toMap
    val pt = cells.groupBy(_._1).view.mapValues(_.length / n).toMap
    val pd = cells.groupBy(_._2).view.mapValues(_.length / n).toMap
    val mi = pj.map { case ((t, d), p) =>
      BigDecimal(r(p * math.log(p / (pt(t) * pd(d))), 12))
    }.sum.toDouble
    val het = pt.values.map(p => BigDecimal(r(-p * math.log(p), 12))).sum.toDouble
    val hdow = pd.values.map(p => BigDecimal(r(-p * math.log(p), 12))).sum.toDouble
    val got = graft.SparkEntry.queries("q196_mutual_info")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4))).head
    assert(got == ((cells.length.toLong, r(het, 6), r(hdow, 6), r(mi, 6),
      r(mi / math.sqrt(het * hdow), 6))))
    assert(got._4 >= -1e-9 && got._4 <= math.min(got._2, got._3) + 1e-9,
      "MI must sit in [0, min(H)]")
    assert(got._5 >= -1e-9 && got._5 <= 1 + 1e-9)
  }

  test("q197: clean FK arms report exact zeros; partial extract produces orphans") {
    val got = graft.SparkEntry.queries("q197_fk_audit")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6), row.getDouble(7)))
      .map(x => x._1 -> x).toMap
    // the fixture's real FKs are clean BY CONSTRUCTION — zeros are the finding
    for (rel <- Seq("lineitem->orders", "lineitem->part", "orders->customer")) {
      assert(got(rel)._3 == 0L, s"$rel must have no orphans")
    }
    // childless-parent replay: orders that no lineitem references
    val okeys = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val lkeys = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey").collect().map(_.getLong(0)).toSet
    assert(got("lineitem->orders")._6 == (okeys -- lkeys).size.toLong)
    assert(got("lineitem->orders")._6 > 0L,
      "fixture has childless orders — the metric must be non-vacuous")
    // the partial-extract arm must create REAL orphans (the scenario the
    // audit exists to catch) and drop ~1/16 of parents
    val ex = got("orders->customer_extract")
    val full = got("orders->customer")
    assert(ex._3 > 0L, "extract arm must produce orphans")
    assert(ex._4 < full._4, "extract must have fewer parents")
    // conservation: orphaned + referenced child rows = all child rows
    assert(ex._2 == full._2)
    // replay the orphan count from Scala MD5
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_custkey").collect().map(_.getLong(0))
    val custs = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey").collect().map(_.getLong(0))
      .filter(k => md5hex(k.toString).head != '0').toSet
    assert(ex._3 == orders.count(k => !custs(k)).toLong)
    // fan-out replay on the clean orders->customer arm
    val fan = orders.groupBy(identity).view.mapValues(_.length).toMap
    assert(full._7 == fan.values.max.toLong)
    assert(full._8 == r(orders.length.toDouble / fan.size, 4))
  }

  test("q198: gap report reconstructs exactly the deleted id runs") {
    val ids = graft.Tables.load(spark, sf0001, "events")
      .select($"event_id").collect().map(_.getLong(0)).sorted
    val kept = ids.filter(k => md5hex(k.toString).head != '0')
    val deleted = ids.toSet -- kept.toSet
    // expected gaps: maximal runs of deleted ids strictly inside the kept range
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    kept.sliding(2).foreach { case Array(a, b) =>
      if (b - a > 1) runs += ((a + 1, b - 1))
      case _ =>
    }
    val expected = runs.toSeq
      .map { case (s, e) => (s, e, e - s + 1) }
      .sortBy(x => (-x._3, x._1)).take(10).zipWithIndex
      .map { case ((s, e, l), i) => (i + 1L, s, e, l) }
    val got = graft.SparkEntry.queries("q198_id_gaps")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)))
      .toSeq
    assert(got == expected)
    // every reported gap consists solely of deleted ids
    got.foreach { case (_, s, e, _) =>
      (s to e).foreach(id => assert(deleted(id), s"id $id in gap was not deleted"))
    }
    assert(got.nonEmpty, "the ~1/16 delete must open gaps at the spec scale")
  }

  test("q199: I-MR limits replay; excursion counts match a direct scan") {
    val daily = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", to_date($"ts").as("day"), $"value").collect()
      .map(row => (row.getString(0), row.getDate(1).toLocalDate, row.getDouble(2)))
      .groupBy(x => (x._1, x._2)).view
      .mapValues(xs => xs.map(x => BigDecimal(r(x._3, 4))).sum).toSeq
      .map { case ((et, d), x) => (et, d, x) }
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, xs) =>
      val series = xs.sortBy(_._2).map(_._3)
      val n = series.length
      val center = (series.sum / n).toDouble
      val mrs = series.sliding(2).map { case Seq(a, b) => (b - a).abs }.toSeq
      val mrbar = (mrs.sum / mrs.length).toDouble
      val (ucl, lcl) = (center + 2.66 * mrbar, center - 2.66 * mrbar)
      (et, n.toLong, r(center, 4), r(ucl, 4), r(lcl, 4),
        series.count(_.toDouble > ucl).toLong, series.count(_.toDouble < lcl).toLong)
    }
    val got = graft.SparkEntry.queries("q199_control_chart")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2), row.getDouble(3),
        row.getDouble(4), row.getLong(5), row.getLong(6))).toSeq
    assert(got == expected)
    got.foreach { case (et, _, c, u, l, _, _) =>
      assert(l < c && c < u, s"$et limits must straddle the center")
    }
  }
}
