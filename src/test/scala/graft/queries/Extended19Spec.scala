package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 third batch (q188–q191): independent replays plus
  * the invariant that is each query's reason to exist — a PIT join must
  * match at most one dimension version per fact and must not silently
  * drop pre-history facts (q188), a KM curve must be non-increasing with
  * a shrinking risk set and real censoring (q189), quantile normalization
  * must preserve per-source populations and map monotonically (q190), and
  * the bootstrap CI must bracket the point estimate with positive width
  * (q191).
  */
class Extended19Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  private def events: Seq[(Long, Long, Long, String, Double)] =
    graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        $"event_type", $"value")
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getString(3), row.getDouble(4))).toSeq

  test("q188: PIT join replays; at most one version per fact; pre-history reported") {
    val ev = events
    val dims = ev.filter(_._4 == "signup").groupBy(_._1).map { case (u, xs) =>
      val s = xs.sortBy(x => (x._2, x._3))
      u -> s.zip(s.drop(1).map(x => Some(x._2)) :+ None).map {
        case (a, end) => (a._2, end, BigDecimal(r(a._5, 4)))
      }
    }
    val expected = ev.filter(_._4 == "purchase").groupBy(_._1).toSeq
      .map { case (u, ps) =>
        val matches = ps.map { p =>
          val hits = dims.getOrElse(u, Seq.empty)
            .filter(d => p._2 >= d._1 && d._2.forall(p._2 < _))
          assert(hits.size <= 1, s"purchase matched ${hits.size} versions")
          (BigDecimal(r(p._5, 4)), hits.headOption)
        }
        val m = matches.filter(_._2.isDefined)
        (u, ps.size.toLong, m.size.toLong,
          r(m.map(_._1).sum.toDouble, 4),
          if (m.isEmpty) null
          else java.lang.Double.valueOf(r(m.map(_._2.get._3).sum.toDouble / m.size, 4)))
      }.sortBy(_._1)
    val got = graft.SparkEntry.queries("q188_pit_join")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3),
        if (row.isNullAt(4)) null else java.lang.Double.valueOf(row.getDouble(4)))).toSeq
    assert(got == expected)
    // pre-history purchases exist and are REPORTED, not dropped
    assert(got.map(_._2).sum > got.map(_._3).sum,
      "fixture must contain purchases before the first signup")
    assert(got.map(_._2).sum == ev.count(_._4 == "purchase").toLong)
  }

  test("q189: KM curve is non-increasing, risk set shrinks, censoring is real") {
    val ev = events
    val smin = ev.filter(_._4 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).min }
    val mt = ev.map(_._2).max
    val subj = smin.toSeq.map { case (u, s) =>
      val pmin = ev.filter(x => x._1 == u && x._4 == "purchase" && x._2 >= s)
        .map(_._2).minOption
      val oe = math.min(s + 48L * 3600000000L, mt)
      val isEv = pmin.exists(_ < oe)
      val dur = if (isEv) (pmin.get - s) / 3600000000L else (oe - s) / 3600000000L
      (dur, isEv)
    }
    val km = subj.groupBy(_._1).toSeq.sortBy(_._1).map { case (dur, xs) =>
      (dur, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }
    var atRisk = subj.size.toLong
    var lnsum = BigDecimal(0)
    var zero = false
    val expected = km.flatMap { case (dur, d, c) =>
      val nrisk = atRisk
      if (d < nrisk)
        lnsum += BigDecimal(r(math.log(1.0 - d.toDouble / nrisk), 12))
      else zero = true
      atRisk -= (d + c)
      if (d > 0)
        Some((dur, nrisk, d, c, if (zero) 0.0 else r(math.exp(lnsum.toDouble), 6)))
      else None
    }
    val got = graft.SparkEntry.queries("q189_kaplan_meier")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getDouble(4))).toSeq
    assert(got == expected)
    // the estimator's shape invariants + non-vacuous censoring
    assert(got.map(_._5) == got.map(_._5).sorted.reverse, "S(t) must be non-increasing")
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, "risk set must shrink")
    assert(subj.count(!_._2) > 0, "censored arm must be non-vacuous")
    assert(subj.count(_._2) > 0, "event arm must be non-vacuous")
  }

  test("q190: quantile map preserves populations and is monotone per source") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2)))
    val got = graft.SparkEntry.queries("q190_quantile_normalize")(spark, sf0001)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getDouble(5))).toSeq
    // per-source doc counts are preserved by the cell partition
    val bySrc = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._3).sum == bySrc(src), s"$src loses docs")
    }
    // cells in range; mapped value and src ranges monotone in cell
    assert(got.forall(x => x._2 >= 1 && x._2 <= 100))
    got.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._6) == ordered.map(_._6).sorted, s"$src mapped not monotone")
      assert(ordered.map(_._4) == ordered.map(_._4).sorted, s"$src src_min not monotone")
    }
    // replay one source end-to-end against the pooled interpolated grid
    val pooled = docs.map(_._3.toDouble).sorted
    def qcont(f: Double): Double = {
      val h = (pooled.length - 1) * f
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      pooled(lo) + (h - lo) * (pooled(hi) - pooled(lo))
    }
    val src0 = docs.filter(_._1 == got.head._1).sortBy(x => (x._3, x._2))
    val cells0 = src0.zipWithIndex.groupBy { case (_, i) =>
      ((i + 1).toLong * 100 + src0.length - 1) / src0.length
    }
    val expect0 = cells0.toSeq.sortBy(_._1).map { case (cell, xs) =>
      (got.head._1, cell, xs.size.toLong, xs.map(_._1._3).min, xs.map(_._1._3).max,
        r(qcont(cell / 100.0), 4))
    }
    assert(got.filter(_._1 == got.head._1).sortBy(_._2) == expect0)
  }

  test("q191: bootstrap CI brackets the point estimate with positive width") {
    val got = graft.SparkEntry.queries("q191_bootstrap_ci")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2), row.getDouble(3),
        row.getDouble(4), row.getDouble(5), row.getBoolean(6))).toSeq
    assert(got.nonEmpty)
    got.foreach { case (pri, n, mean, lo, hi, width, covered) =>
      assert(lo < hi, s"$pri degenerate CI")
      // width is rounded from the EXACT difference; recomputing from the
      // rounded endpoints can differ by one 1e-4 quantum
      assert(math.abs(r(hi - lo, 4) - width) <= 1.001e-4)
      assert(covered && mean >= lo && mean <= hi,
        s"$pri point $mean outside [$lo, $hi] — bootstrap is biased or broken")
      assert(n > 0)
    }
    // replay one replicate mean exactly (md5-keyed weights are engine-free)
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val cdf = {
      val probs = Iterator.iterate((math.exp(-1.0), 0)) { case (p, k) =>
        (p / (k + 1), k + 1)
      }.take(6).map(_._1).toSeq
      probs.scanLeft(0.0)(_ + _).tail.map(f => f"${(f * (1L << 48)).toLong}%012x")
    }
    val pri0 = got.head._1
    val xs = orders.filter(_._1 == pri0).map { case (_, k, v) =>
      val h = md.digest(s"$k|1".getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 12)
      val w = cdf.count(_ <= h).toLong
      (w, BigDecimal(r(v, 2)))
    }
    val mb = (xs.map(x => x._2 * x._1).sum / xs.map(_._1).sum).toDouble
    // the replicate mean must sit inside the reported CI's neighborhood
    assert(mb > got.head._4 - (got.head._6) && mb < got.head._5 + (got.head._6),
      s"replicate-1 mean $mb far outside CI [${got.head._4}, ${got.head._5}]")
  }
}
