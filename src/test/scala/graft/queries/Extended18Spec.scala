package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 second batch (q184–q187): independent replays plus
  * each query's defining invariant — Benford terms must cover all 9 digits
  * even at zero observed count (q184), attribution must partition the
  * purchase population (q185), autocorrelation must be calendar-aligned
  * and bounded by [−1, 1] (q186), and RRF must fuse the two rankings it
  * claims to (q187).
  */
class Extended18Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q184: chi-square equals a replay over the FULL 9-digit grid") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderpriority", $"o_totalprice").collect()
      .map(row => (row.getString(0), row.getDouble(1)))
    val byPri = rows.groupBy(_._1)
    val expected = byPri.toSeq.sortBy(_._1).map { case (pri, xs) =>
      val digits = xs.map(x => math.floor(x._2).toLong.toString.head.asDigit)
      val n = digits.length.toLong
      val terms = (1 to 9).map { d =>
        val o = digits.count(_ == d).toDouble
        val e = n.toDouble * math.log10(1 + 1.0 / d)
        BigDecimal(r((o - e) * (o - e) / e, 8))
      }
      val chi2 = terms.sum.toDouble
      val d1 = digits.count(_ == 1).toDouble / n
      (pri, n, r(chi2, 4), r(d1, 6), chi2 > 15.507)
    }
    val got = graft.SparkEntry.queries("q184_benford")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3), row.getBoolean(4))).toSeq
    assert(got == expected)
    // the fixture's uniform-ish price distribution must FAIL Benford —
    // otherwise the reject flag is vacuous
    assert(got.forall(_._5), "synthetic prices should reject Benford")
  }

  test("q185: attribution partitions purchases; replay matches") {
    val rows = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        $"event_type", $"value")
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getString(3), row.getDouble(4)))
    val attributed = rows.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ordered = xs.sortBy(x => (x._2, x._3))
      ordered.zipWithIndex.filter(_._1._4 == "purchase").map { case (p, i) =>
        val prior = ordered.take(i).filter(_._4 != "purchase")
        val attr = prior.lastOption match {
          case Some(e) if p._2 - e._2 <= 86400000000L => e._4
          case _ => "(none)"
        }
        (attr, BigDecimal(r(p._5, 4)))
      }
    }
    val tot = attributed.size.toLong
    val expected = attributed.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (attr, xs) =>
        (attr, xs.size.toLong, r(xs.map(_._2).sum.toDouble, 4),
          r(xs.size.toDouble / tot, 6))
    }
    val got = graft.SparkEntry.queries("q185_attribution")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3))).toSeq
    assert(got == expected)
    // every purchase got exactly one credit (the partition invariant)
    assert(got.map(_._2).sum == rows.count(_._4 == "purchase").toLong)
    // non-vacuous: both a real attribution and real purchases exist
    assert(got.exists(_._1 != "(none)") && tot > 0)
  }

  test("q186: autocorrelation replays calendar-aligned and lands in [-1, 1]") {
    val daily = graft.Tables.load(spark, sf0001, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(row => (row.getString(0), row.getDate(1).toLocalDate,
        row.getLong(2)))
    val byT = daily.groupBy(_._1)
    val expected = byT.toSeq.flatMap { case (et, xs) =>
      val m = xs.map(x => x._2 -> x._3).toMap
      Seq(1, 7).flatMap { k =>
        val pairs = xs.flatMap(x => m.get(x._2.minusDays(k.toLong)).map(cy => (x._3, cy)))
        if (pairs.isEmpty) None
        else {
          val n = pairs.length.toLong
          val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
          val sxy = pairs.map(p => p._1 * p._2).sum
          val sxx = pairs.map(p => p._1 * p._1).sum
          val syy = pairs.map(p => p._2 * p._2).sum
          val acf = (n * sxy - sx * sy).toDouble /
            math.sqrt(((n * sxx - sx * sx) * (n * syy - sy * sy)).toDouble)
          Some((et, k, n, r(acf, 6)))
        }
      }
    }.sortBy(x => (x._1, x._2))
    val got = graft.SparkEntry.queries("q186_autocorr")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getInt(1), row.getLong(2),
        row.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.forall(x => x._4 >= -1.0 && x._4 <= 1.0))
    // 30 contiguous fixture days: lag-1 yields 29 pairs, lag-7 yields 23
    assert(got.filter(_._2 == 1).forall(_._3 == 29L))
    assert(got.filter(_._2 == 7).forall(_._3 == 23L))
  }

  test("q187: fused top-5 equals an RRF replay over both rankings") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"source", $"doc_id", $"n_chars", $"text").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getString(3).trim.toLowerCase.split("\\s+").length.toLong))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      val r1 = xs.sortBy(x => (-x._3, x._2)).zipWithIndex
        .map { case (x, i) => x._2 -> (i + 1L) }.toMap
      val r2 = xs.sortBy(x => (-x._4, x._2)).zipWithIndex
        .map { case (x, i) => x._2 -> (i + 1L) }.toMap
      val rrf = xs.map(x => (x._2, 1.0 / (60 + r1(x._2)) + 1.0 / (60 + r2(x._2))))
      rrf.sortBy(x => (-x._2, x._1)).take(5).zipWithIndex.map { case ((id, sc), i) =>
        (src, i + 1L, id, r1(id), r2(id), r(sc, 6))
      }
    }.sortBy(x => (x._1, x._2))
    val got = graft.SparkEntry.queries("q187_rrf_fusion")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getDouble(5))).toSeq
    assert(got == expected)
    // fusion must matter: some fused winner is NOT the r1 winner
    assert(got.exists(x => x._2 == 1L && x._4 != 1L),
      "RRF must reorder at least one source's top pick")
  }
}
