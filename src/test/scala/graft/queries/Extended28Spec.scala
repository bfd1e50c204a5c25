package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 batch (q215–q220): independent replays plus each
  * query's defining invariant — the skew advisor's salt arithmetic, the
  * moment profile vs a direct two-pass replay, Mann–Kendall vs an O(n²)
  * pair walk, the join-cardinality exact identity (predicted ==
  * actual), feature-hash occupancy conservation, and position-based
  * attribution's credit-conservation law.
  */
class Extended28Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q215: salt recommendation replays; hottest key leads; salt covers the key") {
    val cnts = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_custkey").count().collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val total = cnts.map(_._2).sum
    val nKeys = cnts.length.toLong
    val target = math.max(1L, 4L * total / nKeys)
    val expectedTop = cnts.sortBy(t => (-t._2, t._1)).take(5).map {
      case (k, rows) => (k, rows, (rows + target - 1) / target)
    }
    val got = q("q215_skew_advisor")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    assert(got.toSeq == expectedTop.toSeq)
    // the recommendation must actually bound the per-reducer share:
    // rows / n_salt <= target for every advised key
    got.foreach { case (k, rows, salt) =>
      assert(rows <= salt * target, s"key $k: salt $salt leaves > target rows")
    }
  }

  test("q216: moments equal a direct replay; variance matches var_pop") {
    val vals = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"event_type", $"value").collect()
      .map(row => (row.getString(0), r(row.getDouble(1), 4)))
    val expected = vals.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, vs) =>
      // replay through the SAME rounded-term decimal sums the query uses
      def dsum(f: Double => Double, n: Int) =
        vs.map(t => BigDecimal(r(f(t._2), n)).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val n = vs.length.toDouble
      val s1 = dsum(identity, 6).toDouble; val s2 = dsum(v => v * v, 6).toDouble
      val s3 = dsum(v => v * v * v, 4).toDouble
      val s4 = dsum(v => v * v * v * v, 2).toDouble
      val mean = s1 / n
      val m2 = s2 / n - mean * mean
      val m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean
      val m4 = s4 / n - 4.0 * mean * (s3 / n) + 6.0 * mean * mean * (s2 / n) -
        3.0 * mean * mean * mean * mean
      (et, vs.length.toLong, r(mean, 6), r(m2, 6),
        r(m3 / (m2 * math.sqrt(m2)), 6), r(m4 / (m2 * m2) - 3.0, 6))
    }
    val got = q("q216_higher_moments")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4), row.getDouble(5)))
    assert(got.toSeq == expected)
    // sanity vs the unrounded population variance: within rounding slack
    val popVar = vals.groupBy(_._1).view.mapValues { vs =>
      val m = vs.map(_._2).sum / vs.length
      vs.map(t => (t._2 - m) * (t._2 - m)).sum / vs.length
    }.toMap
    got.foreach { case (et, _, _, varR, _, _) =>
      assert(math.abs(varR - popVar(et)) < 1e-2, s"$et variance drifted")
    }
  }

  test("q217: S, variance and z equal a brute-force pair walk") {
    val daily = graft.Tables.load(spark, sf0001, "events")
      .groupBy($"event_type",
        (unix_micros($"ts") / lit(86400000000L)).cast("long").as("d"))
      .count().collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, ds) =>
      val sorted = ds.sortBy(_._2).map(_._3)
      val n = sorted.length.toLong
      val sStat = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
      } yield java.lang.Long.signum(sorted(j) - sorted(i)).toLong).sum
      val tieTerm = sorted.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val varNum = n * (n - 1) * (2 * n + 5) - tieTerm
      val z =
        if (sStat > 0) (sStat - 1).toDouble / math.sqrt(varNum.toDouble / 18.0)
        else if (sStat < 0) (sStat + 1).toDouble / math.sqrt(varNum.toDouble / 18.0)
        else 0.0
      (et, n, sStat, varNum, r(z, 6))
    }
    val got = q("q217_mann_kendall")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getDouble(4)))
    assert(got.toSeq == expected)
  }

  test("q218: the Σ c_l·c_r identity holds — predicted equals actual on both joins") {
    val got = q("q218_join_cardinality")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(4), row.getLong(5), row.getLong(6)))
    assert(got.length == 2)
    got.foreach { case (name, predicted, actual, est) =>
      assert(predicted == actual, s"$name: identity broken")
      assert(est >= 0, s"$name: sampled estimate negative")
    }
    // the sampled estimator must be non-degenerate on at least one join
    assert(got.exists(_._4 > 0), "1/16 key sample hit nothing — fixture too small?")
  }

  test("q219: bucket occupancy conserves the token count; top token replays") {
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(graft.ext.Text.tokensNorm($"text")).as("t"))
      .filter($"t" =!= "").as[String].collect()
    val got = q("q219_feature_hash")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getString(3)))
    assert(got.map(_._2).sum == toks.length.toLong, "occupancy must conserve tokens")
    // replay one bucket end-to-end (argmax count desc, token desc)
    val bucketOf = toks.groupBy(identity).view.mapValues(_.length).toSeq
      .map { case (t, c) =>
        val h = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(t).substring(0, 8), 16)
        (h % 64, t, c.toLong)
      }
    val byBucket = bucketOf.groupBy(_._1)
    got.foreach { case (b, nTok, nTypes, top) =>
      val g = byBucket(b)
      assert(g.map(_._3).sum == nTok)
      assert(g.length.toLong == nTypes)
      val expTop = g.maxBy(x => (x._3, x._2))._2
      assert(top == expTop, s"bucket $b top token mismatch")
    }
  }

  test("q220: position credits conserve to the purchase count; U-shape replays") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getString(3)))
    val byUser = ev.groupBy(_._1)
    val purchases = ev.filter(_._4 == "purchase")
    val credits = purchases.flatMap { p =>
      val touches = byUser(p._1)
        .filter(t => t._4 != "purchase" && t._2 >= p._2 - 86400000000L && t._2 < p._2)
        .sortBy(t => (t._2, t._3))
      val k = touches.length
      if (k == 0) Seq(("(none)", 1.0))
      else touches.zipWithIndex.toSeq.map { case (t, i) =>
        val c =
          if (k == 1) 1.0
          else if (k == 2) 0.5
          else if (i == 0 || i == k - 1) 0.4
          else 0.2 / (k - 2)
        (t._4, c)
      }
    }
    val expected = credits.groupBy(_._1).toSeq.sortBy(_._1).map { case (attr, cs) =>
      val sum = cs.map(c =>
        BigDecimal(r(c._2, 12)).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      (attr, r(sum.toDouble, 6), cs.length.toLong)
    }
    val got = q("q220_position_attribution")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getDouble(1), row.getLong(2)))
    assert(got.toSeq == expected)
    // conservation: each purchase hands out exactly one unit of credit
    val totalCredit = got.map(_._2).sum
    assert(math.abs(totalCredit - purchases.length) < 1e-6,
      s"credit $totalCredit != purchases ${purchases.length}")
  }
}
