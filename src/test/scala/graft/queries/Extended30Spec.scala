package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 third batch (q225–q228): independent driver-side
  * replays plus each query's defining invariant — association-rule count
  * consistency and lift discrimination, JS divergence bounds (0 ≤ JSD ≤
  * ln 2) with an exact per-pair replay, the Murphy decomposition identity
  * (brier = unc + rel − res, exact because the forecaster is
  * discrete-valued), and an exact-BigInt OLS replay with R² bounds.
  */
class Extended30Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q225: rules replay from raw baskets; lift discriminates; counts conserve") {
    val got = q("q225_assoc_rules")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getDouble(5), row.getDouble(6),
        row.getDouble(7), row.getDouble(8)))
    // independent replay: distinct (order, brand) sets in plain Scala
    val ob = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/part.parquet"), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
      .collect().map(row => (row.getLong(0), row.getString(1)))
    val baskets = ob.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val itemN = ob.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = baskets.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.length == pairN.size)
    got.foreach { case (a, b, nab, na, nb, supp, cab, cba, lift) =>
      assert(pairN((a, b)) == nab)
      assert(itemN(a) == na && itemN(b) == nb)
      assert(nab <= math.min(na, nb), "pair support cannot exceed item support")
      assert(supp == r(nab.toDouble / n, 6))
      assert(cab == r(nab.toDouble / na, 6) && cba == r(nab.toDouble / nb, 6))
      assert(lift == r(n.toDouble * nab / (na.toDouble * nb), 6))
    }
    assert(got.exists(_._9 > 1.0) && got.exists(_._9 < 1.0),
      "lift must discriminate: some pairs over-, some under-represented")
  }

  test("q226: JSD replay per pair; bounds 0 ≤ JSD ≤ ln 2; distance is sqrt") {
    val got = q("q226_js_divergence")(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getDouble(4), row.getDouble(5)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"lang").collect()
      .map(row => (row.getLong(0) % 3, row.getString(1)))
    val langs = docs.map(_._2).distinct.sorted
    val byFeed = docs.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    got.foreach { case (fa, fb, da, db, jsd, dist) =>
      assert(da == byFeed(fa).values.sum && db == byFeed(fb).values.sum)
      // exact replay with the query's own rounded-term accumulation
      def terms(x: Map[String, Long], nx: Long, y: Map[String, Long], ny: Long) =
        langs.map { l =>
          val p = x.getOrElse(l, 0L).toDouble / nx
          val q_ = y.getOrElse(l, 0L).toDouble / ny
          if (p > 0) BigDecimal(r(0.5 * p * math.log(2.0 * p / (p + q_)), 12))
          else BigDecimal(0)
        }.sum
      val kla = terms(byFeed(fa), da, byFeed(fb), db).toDouble
      val klb = terms(byFeed(fb), db, byFeed(fa), da).toDouble
      assert(jsd == r(kla + klb, 6))
      assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-12,
        "JSD (nats) lives in [0, ln 2]")
      assert(dist == r(math.sqrt(kla + klb), 6))
    }
  }

  test("q227: Murphy decomposition holds; binned brier equals per-user mean") {
    val rows = q("q227_brier_calibration")(spark, sf0001).collect()
    val users = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "view", 1L).otherwise(0L)).as("views"),
        max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(row => (row.getLong(1), row.getLong(2)))
    val scored = users.map { case (v, y) =>
      val k = math.min(9L, v / 2); (k, 0.05 + 0.1 * k, y)
    }
    // per-user (unbinned) Brier — the quantity the binned expansion must equal
    val naive = scored.map { case (_, f, y) => (f - y) * (f - y) }.sum / scored.length
    val brierR = rows.head.getDouble(5)
    assert(math.abs(brierR - naive) < 1e-6,
      s"binned Brier $brierR must match per-user mean $naive")
    // decomposition identity asserted in-row on both engines
    assert(rows.forall(_.getBoolean(9)), "Murphy identity must hold exactly")
    val (unc, rel, res) =
      (rows.head.getDouble(6), rows.head.getDouble(7), rows.head.getDouble(8))
    assert(math.abs(brierR - (unc + rel - res)) < 3e-6)
    // bin structure: k ascending, f = 0.05 + 0.1k, bin counts cover all users
    val ks = rows.map(_.getLong(0))
    assert(ks.sorted.sameElements(ks) && ks.distinct.length == ks.length)
    rows.foreach(row => assert(row.getDouble(3) == r(0.05 + 0.1 * row.getLong(0), 2)))
    assert(rows.map(_.getLong(1)).sum == scored.length)
  }

  test("q228: OLS replay with exact BigInt moments; R² in [0,1]; slope signs real") {
    val got = q("q228_ols_trend")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4)))
    val base = java.time.LocalDate.parse("1995-01-01").toEpochDay
    val daily = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag", to_date($"l_shipdate").as("d"), $"l_extendedprice")
      .collect()
      .map(row => ((row.getString(0), row.getDate(1).toLocalDate.toEpochDay - base),
        BigInt(r(row.getDouble(2) * 100.0, 0).toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byFlag = daily.toSeq.map { case ((f, x), y) => (f, BigInt(x), y) }.groupBy(_._1)
    got.foreach { case (flag, nDays, slopeR, icptR, r2R) =>
      val pts = byFlag(flag)
      assert(nDays == pts.length)
      val n = BigInt(pts.length)
      val sx = pts.map(_._2).sum; val sy = pts.map(_._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val syy = pts.map(p => p._3 * p._3).sum
      // the query's double hand-off point: exact moments → double → shapes
      val (nD, sxD, syD) = (n.toDouble, sx.toDouble, sy.toDouble)
      val bsxx = nD * sxx.toDouble - sxD * sxD
      val bsxy = nD * sxy.toDouble - sxD * syD
      val bsyy = nD * syy.toDouble - syD * syD
      assert(slopeR == r(bsxy / bsxx, 6))
      assert(icptR == r((syD - (bsxy / bsxx) * sxD) / nD, 2))
      assert(r2R == r(bsxy * bsxy / (bsxx * bsyy), 6))
      assert(r2R >= 0.0 && r2R <= 1.0)
    }
    assert(got.map(_._1).sorted.sameElements(got.map(_._1)), "total order by flag")
  }
}
