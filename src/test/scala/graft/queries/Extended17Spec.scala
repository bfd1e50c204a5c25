package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 first batch (q179–q183): independent Scala replays
  * plus the invariant that is each query's reason to exist — the grid
  * neighborhood must be EXHAUSTIVE vs all-pairs (q179), the cumulative
  * deviation must return to zero at the series end (q180), postings must
  * honor the cap while df counts everything (q181), paths must partition
  * the user population (q182), and the two-sample moments must re-pool to
  * the grand totals (q183).
  */
class Extended17Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q179: grid-bucketed join equals an all-pairs replay (neighborhood exhaustive)") {
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey").collect().map(_.getLong(0))
    val supp = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select($"s_suppkey").collect().map(_.getLong(0))
    val expected = cust.flatMap { c =>
      val (cx, cy) = (c * 37 % 1000, c * 91 % 1000)
      val near = supp.flatMap { sid =>
        val (sx, sy) = (sid * 53 % 1000, sid * 17 % 1000)
        val d2 = (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
        if (d2 <= 625) Some((d2, sid)) else None
      }
      if (near.isEmpty) None
      else {
        val (d2, sid) = near.min
        Some((c, near.length.toLong, d2, sid, r(math.sqrt(d2.toDouble), 4)))
      }
    }.sortBy(_._1).toSeq
    val got = graft.SparkEntry.queries("q179_spatial_join")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getDouble(4))).toSeq
    assert(got == expected)
    // non-vacuous at the spec scale, and at least one MULTI-cell pair
    // (distance > cell diagonal within a single cell would not cross cells;
    // a pair with d2 > 2·12² must span cells, so the neighborhood probe
    // did real work)
    assert(got.nonEmpty, "sf0.001 must produce matches")
    assert(expected.exists(_._3 > 0), "a nonzero distance pair must exist")
  }

  test("q180: cumulative deviation replays exactly and returns to zero at series end") {
    val rows = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"), $"value")
      .collect().map(row => (row.getString(0), row.getString(1), row.getDouble(2)))
    val daily = rows.groupBy(t => (t._1, t._2)).map { case ((et, day), xs) =>
      (et, day, xs.map(x => BigDecimal(r(x._3, 4))).sum.*(BigDecimal(10000)).toLongExact)
    }.toSeq
    val expected = daily.groupBy(_._1).toSeq.map { case (et, ds) =>
      val series = ds.sortBy(_._2).map(x => (x._2, x._3))
      val n = series.length.toLong
      val t = series.map(_._2).sum
      val devs = series.zipWithIndex.map { case ((day, _), idx) =>
        val i = idx + 1L
        val p = series.take(idx + 1).map(_._2).sum
        (day, math.abs(n * p - i * t))
      }
      // the invariant: at i = n, n·P − n·T = 0 by construction
      assert(devs.last._2 == 0L, s"$et deviation must vanish at the series end")
      val maxd = devs.map(_._2).max
      val peak = devs.filter(_._2 == maxd).map(_._1).max
      val nEx = devs.count { case (_, d) => d * 10 > n * math.abs(t) }
      (et, n, r(maxd.toDouble / (n.toDouble * 10000.0), 4), peak, nEx.toLong)
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("q180_cusum_drift")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getString(3), row.getLong(4))).toSeq
    assert(got == expected)
    assert(got.forall(_._2 == 30L), "fixture spans 30 event days per type")
  }

  test("q181: postings capped at 50 while df counts all; zero-pad keeps numeric order") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(row => (row.getLong(0), row.getString(1)))
    val tf = docs.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map(tok => (tok, id))
    }.groupBy(identity).map { case ((tok, id), xs) => (tok, id, xs.length.toLong) }
    val byTok = tf.groupBy(_._1).filter(_._2.size >= 10)
    val expected = byTok.toSeq.sortBy { case (tok, xs) => (-xs.size, tok) }
      .take(200).map { case (tok, xs) =>
        val sorted = xs.toSeq.sortBy(_._2)
        (tok, xs.size.toLong, xs.map(_._3).sum,
          math.min(xs.size, 50).toLong,
          sorted.take(50).map(x => f"${x._2}%012d:${x._3}").mkString(","))
      }.sortBy(_._1)
    val got = graft.SparkEntry.queries("q181_inverted_index")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getString(4))).toSeq
    assert(got == expected)
    // the cap must BIND at the spec scale (else the bounded-output claim
    // is untested) and postings must be sorted numerically
    assert(got.exists(x => x._2 > 50 && x._4 == 50L), "a capped token must exist")
    got.foreach { case (_, _, _, _, postings) =>
      val ids = postings.split(",").map(_.split(":")(0).toLong)
      assert(ids.sameElements(ids.sorted), "postings must be doc_id-ordered")
    }
  }

  test("q182: paths partition the user population; replay matches") {
    val rows = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
      .collect().map(row => (row.getLong(0), row.getTimestamp(1).getTime * 1000 +
        row.getTimestamp(1).getNanos / 1000 % 1000, row.getLong(2),
        row.getString(3), row.getDouble(4)))
    val perUser = rows.groupBy(_._1).map { case (u, xs) =>
      val first = xs.sortBy(x => (x._2, x._3)).take(5)
      (u, first.map(_._4).mkString(">"), first.length.toLong,
        first.map(x => BigDecimal(r(x._5, 4))).sum)
    }
    val expected = perUser.groupBy(x => (x._2, x._3)).toSeq.map {
      case ((path, len), xs) =>
        (path, len, xs.size.toLong,
          r((xs.map(_._4).sum / xs.size).toDouble, 4))
    }.sortBy(x => (-x._3, x._1))
    val got = graft.SparkEntry.queries("q182_event_paths")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDouble(3))).toSeq
    assert(got == expected)
    // paths partition users: every user appears in exactly one path group
    assert(got.map(_._3).sum == perUser.size.toLong)
  }

  test("q183: Welch moments re-pool to grand totals; replay matches") {
    val rows = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", $"value").collect()
      .map(row => (row.getString(0), BigDecimal(r(row.getDouble(1), 4))))
    val byT = rows.groupBy(_._1)
    val nn = rows.length.toLong
    val ss = rows.map(_._2).sum
    val qq = rows.map(x => x._2 * x._2).sum
    val expected = byT.toSeq.sortBy(_._1).map { case (et, xs) =>
      val n1 = xs.length.toLong
      val s1 = xs.map(_._2).sum
      val q1 = xs.map(x => x._2 * x._2).sum
      val n2 = nn - n1
      val (s1d, q1d) = (s1.toDouble, q1.toDouble)
      val (s2d, q2d) = ((ss - s1).toDouble, (qq - q1).toDouble)
      val m1 = s1d / n1
      val m2 = s2d / n2
      val v1 = (q1d - s1d * s1d / n1) / (n1 - 1)
      val v2 = (q2d - s2d * s2d / n2) / (n2 - 1)
      val (se1, se2) = (v1 / n1, v2 / n2)
      val t = (m1 - m2) / math.sqrt(se1 + se2)
      val df = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
      (et, n1, n2, r(m1, 4), r(m2, 4), r(t, 4), r(df, 2), math.abs(t) > 1.96)
    }
    val got = graft.SparkEntry.queries("q183_welch_ttest")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getDouble(3),
        row.getDouble(4), row.getDouble(5), row.getDouble(6), row.getBoolean(7))).toSeq
    assert(got == expected)
    // Welch df must land strictly between min(n1,n2)−1 and n1+n2−2
    got.foreach { case (et, n1, n2, _, _, _, df, _) =>
      assert(df > math.min(n1, n2) - 1 - 1e-9 && df < n1 + n2 - 2 + 1e-9, s"$et df=$df")
    }
  }
}
