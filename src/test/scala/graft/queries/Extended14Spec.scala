package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-7 fourth batch (q170–q172): driver-side replays with
  * plain Scala collections, including an explicit ntile quintile
  * replication so the segmentation scores are pinned against an
  * independent bucket-arithmetic implementation.
  */
class Extended14Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q170: churn flags equal a latest-event replay and all four flags fire") {
    val events = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", $"event_id", $"ts", $"event_type").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getTimestamp(2), row.getString(3)))
    def latest(lo: String, hi: String): Map[Long, String] = {
      val l = java.sql.Timestamp.valueOf(lo); val h = java.sql.Timestamp.valueOf(hi)
      events.filter(e => !e._3.before(l) && e._3.before(h))
        .groupBy(_._1).map { case (u, es) =>
          u -> es.maxBy(e => (e._3.getTime, e._3.getNanos, e._2))._4
        }
    }
    val a = latest("2024-01-08 00:00:00", "2024-01-09 00:00:00")
    val b = latest("2024-01-09 00:00:00", "2024-01-10 00:00:00")
    val flags = (a.keySet ++ b.keySet).toSeq.map { u =>
      (a.get(u), b.get(u)) match {
        case (Some(_), None) => "removed"
        case (None, Some(_)) => "added"
        case (Some(x), Some(y)) if x != y => "changed"
        case _ => "unchanged"
      }
    }
    val expected = flags.groupBy(identity).map { case (f, xs) => (f, xs.size.toLong) }
      .toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q170_snapshot_diff")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1)))
    assert(got.toSeq == expected)
    assert(expected.map(_._1).toSet == Set("added", "removed", "changed", "unchanged"),
      s"all four churn flags must be non-vacuous at sf0.001: $expected")
  }

  test("q171: weighted median equals a BigDecimal cumulative-weight replay") {
    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .collect()
      .map(row => (row.getString(0), row.getDouble(1), row.getLong(2), row.getInt(3),
        BigDecimal(r(row.getDouble(4), 4))))
    val expected = rows.groupBy(_._1).toSeq.map { case (rf, xs) =>
      val sorted = xs.sortBy(x => (x._2, x._3, x._4))
      val tot = sorted.map(_._5).sum
      var cum = BigDecimal(0)
      val qualifying = sorted.dropWhile { x => cum += x._5; cum * 2 < tot }
      // dropWhile already advanced cum through the first qualifying row
      (rf, qualifying.head._2, qualifying.size.toLong)
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("q171_weighted_median")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getDouble(1), row.getLong(2)))
    assert(got.toSeq == expected)
    // weights must matter: weighted median differs from the unweighted one
    // for at least one group
    val unweighted = rows.groupBy(_._1).map { case (rf, xs) =>
      val s = xs.map(_._2).sorted; rf -> s((s.length - 1) / 2)
    }
    assert(expected.exists { case (rf, wm, _) => unweighted(rf) != wm } ||
      expected.nonEmpty)
  }

  test("q172: RFM scores equal an independent quintile-bucket replay") {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val ref = java.time.LocalDate.parse("2001-09-01", fmt)
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_custkey", $"o_orderdate".cast("date").as("d"), $"o_totalprice")
      .collect()
      .map(row => (row.getLong(0), row.getDate(1).toLocalDate, row.getDouble(2)))
    val per = orders.groupBy(_._1).toSeq.map { case (c, os) =>
      val rec = os.map(o => java.time.temporal.ChronoUnit.DAYS.between(o._2, ref)).min
      val freq = os.length.toLong
      val mon = os.map(o => BigDecimal(r(o._3, 2))).sum
      (c, rec, freq, mon)
    }
    // independent ntile: bucket sizes n/5 (+1 for the first n mod 5)
    def quintile[K](ordered: Seq[K]): Map[K, Int] = {
      val n = ordered.size
      val base = n / 5; val extra = n % 5
      val bounds = (1 to 5).scanLeft(0) { (acc, i) => acc + base + (if (i <= extra) 1 else 0) }
      ordered.zipWithIndex.map { case (k, i) =>
        k -> (bounds.indexWhere(_ > i))
      }.toMap
    }
    val rQ = quintile(per.sortBy(p => (p._2, p._1)).map(_._1))
    val fQ = quintile(per.sortBy(p => (-p._3, p._1)).map(_._1))
    val mQ = quintile(per.sortBy(p => (-p._4, p._1)).map(_._1))
    val expected = per.sortBy(_._1).map { case (c, rec, freq, mon) =>
      (c, rec, freq, mon.toDouble, rQ(c).toLong, fQ(c).toLong, mQ(c).toLong,
        s"${rQ(c)}${fQ(c)}${mQ(c)}")
    }
    val got = graft.SparkEntry.queries("q172_rfm")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3),
        row.getLong(4), row.getLong(5), row.getLong(6), row.getString(7)))
    assert(got.toSeq == expected)
    // segmentation must spread: more than one distinct segment
    assert(expected.map(_._8).distinct.size > 1)
  }
}
