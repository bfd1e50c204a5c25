package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-7 third batch (q164–q168): independent driver-side
  * replays with plain Scala collections — brute-force where the plan is
  * clever (O(n²) dominance for the sort-based skyline, per-basket
  * combinations for the a-priori-pruned pair join) so shared bugs are
  * structurally impossible.
  */
class Extended13Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q164: brand pair support/lift equal a per-basket combinations replay") {
    val b = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/part.parquet"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
      .collect().map(row => (row.getLong(0), row.getString(1)))
    val baskets = b.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val n = baskets.size.toLong
    val sup = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cab = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for (bs <- baskets) {
      bs.foreach(sup(_) += 1)
      for (x <- bs; y <- bs if x < y) cab((x, y)) += 1
    }
    val expected = cab.toSeq.filter(_._2 >= 5).map { case ((a, c), k) =>
      (a, c, k, sup(a), sup(c),
        r(k.toDouble / n, 6), r(k.toDouble * n / (sup(a).toDouble * sup(c).toDouble), 6))
    }.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("q164_brand_pairs")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getDouble(5), row.getDouble(6)))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty)
    // lift must discriminate — some pair above and some below independence
    assert(expected.exists(_._7 > 1.0) && expected.exists(_._7 < 1.0))
  }

  test("q165: skyline equals the O(n²) dominance replay, incl. tie semantics") {
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_retailprice", $"p_size").collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getInt(2)))
    val expected = parts.filter { p =>
      !parts.exists(q => q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    }.map(p => (p._1, p._2, p._3)).sortBy(_._1).toSeq
    val got = graft.SparkEntry.queries("q165_skyline")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getInt(2)))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty && expected.size < parts.length,
      "frontier must prune but not vanish")
  }

  test("q165 tie semantics: duplicate (price,size) points both stay on the frontier") {
    val df = Seq((1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 4), (4L, 9.0, 5), (5L, 11.0, 9))
      .toDF("p_partkey", "price", "size")
    // replicate the plan inline on a synthetic frame (queries are fixed to
    // fixture dirs): per-price max + running max over cheaper prices
    val g = df.groupBy($"price").agg(max($"size").as("gmax"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"price")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val gg = g.withColumn("runmax", max($"gmax").over(w))
    val got = df.join(gg, "price")
      .filter($"size" === $"gmax" && ($"runmax".isNull || $"runmax" < $"size"))
      .select($"p_partkey").as[Long].collect().sorted.toSeq
    // 4 dominates 1,2 (same size, cheaper); 3 dominated by 1/2/4; 5 survives
    assert(got == Seq(4L, 5L), got.toString)
  }

  test("q166: decomposition equals an hourly BigDecimal replay") {
    val events = graft.Tables.load(spark, sf0001, "events")
      .select(date_trunc("hour", $"ts").as("hb"), $"value").collect()
      .map(row => (row.getTimestamp(0), row.getDouble(1)))
    val hourly = events.groupBy(_._1).map { case (hb, xs) =>
      val vs = xs.map(x => BigDecimal(r(x._2, 4))).sum
      (hb, xs.length.toLong, vs)
    }.toSeq.sortBy(_._1.getTime)
    val trend = hourly.indices.map { i =>
      val lo = math.max(0, i - 12); val hi = math.min(hourly.size - 1, i + 12)
      val win = hourly.slice(lo, hi + 1)
      val tnum = win.map(_._3).sum
      val tden = win.map(_._2).sum
      r(tnum.toDouble / tden.toDouble, 6)
    }
    val vr = hourly.map(h => r(h._3.toDouble / h._2.toDouble, 6))
    val det = hourly.indices.map(i => r(vr(i) - trend(i), 6))
    val cal = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
    def hod(t: java.sql.Timestamp): Int = { cal.setTime(t); cal.get(java.util.Calendar.HOUR_OF_DAY) }
    val seas = hourly.indices.groupBy(i => hod(hourly(i)._1)).map { case (h, is) =>
      h -> r(is.map(i => BigDecimal(det(i))).sum.toDouble / is.size, 6)
    }
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val expected = hourly.indices.map { i =>
      val h = hourly(i)
      val sr = seas(hod(h._1))
      (fmt.format(h._1), h._2, vr(i), trend(i), sr, r(det(i) - sr, 6))
    }
    val got = graft.SparkEntry.queries("q166_seasonal_decomp")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2), row.getDouble(3),
        row.getDouble(4), row.getDouble(5)))
    assert(got.toSeq == expected)
    // seasonality must be non-trivial: profile varies across hours
    assert(seas.values.toSet.size > 1)
  }

  test("q167: transition matrix equals a sorted-sequence replay") {
    val events = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", $"event_type", $"ts", $"event_id").collect()
      .map(row => (row.getLong(0), row.getString(1), row.getTimestamp(2), row.getLong(3)))
    val nv = events.map(_._2).distinct.length
    val pairs = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for ((_, es) <- events.groupBy(_._1)) {
      val seq = es.sortBy(e => (e._3.getTime, e._3.getNanos, e._4)).map(_._2)
      seq.sliding(2).foreach {
        case Array(p, c) => pairs((p, c)) += 1
        case _ =>
      }
    }
    val totals = pairs.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val expected = pairs.toSeq.map { case ((p, c), k) =>
      (p, c, k, totals(p), r((k + 1.0) / (totals(p) + nv.toDouble), 6))
    }.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("q167_markov_transitions")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2), row.getLong(3),
        row.getDouble(4)))
    assert(got.toSeq == expected)
    assert(expected.map(_._5).distinct.size > 1, "transitions must not be uniform")
  }

  test("q168: merged intervals equal a per-user sweep replay") {
    val events = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("t0"), $"value").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3)))
    val expected = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val spans = es
        .map(e => (e._3, e._3 + math.max(0.0, math.floor(e._4 * 60)).toLong * 1000000L, e._2))
        .sortBy(s => (s._1, s._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var (st, en, cnt) = (spans.head._1, spans.head._2, 1L)
      for (sp <- spans.tail) {
        if (sp._1 > en) { out += ((u, st, en, cnt)); st = sp._1; en = sp._2; cnt = 1L }
        else { en = math.max(en, sp._2); cnt += 1L }
      }
      out += ((u, st, en, cnt))
      out
    }.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("q168_interval_merge")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)))
    assert(got.toSeq == expected)
    // merging must actually fire: fewer islands than events
    assert(expected.size < events.length)
    assert(expected.exists(_._4 > 1))
  }

  test("q169: sliding distinct equals a per-window brute-force replay") {
    val eh = graft.Tables.load(spark, sf0001, "events")
      .select(expr("unix_micros(ts) div 3600000000").as("h"), $"user_id")
      .distinct().collect().map(row => (row.getLong(0), row.getLong(1)))
    val hours = eh.map(_._1).distinct.sorted
    val expected = hours.map { wh =>
      wh -> eh.filter(e => e._1 >= wh - 23 && e._1 <= wh).map(_._2).distinct.length.toLong
    }.toSeq
    val got = graft.SparkEntry.queries("q169_sliding_distinct")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(got.toSeq == expected)
    // the window must matter: some hour's trailing count exceeds its own-hour count
    val own = eh.groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).distinct.length.toLong }
    assert(expected.exists { case (h, c) => c > own(h) })
  }
}
