package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-9 fourth batch (q229–q231): a Scala token-count
  * replay of the Zipf fit (negative slope, R² bounds, head-share ≤ 1),
  * an exact sequential replay of the Holt recurrence (the fold result
  * must equal a plain left-to-right walk — the property a wrong window
  * rewrite would break), and an NDCG replay with its defining bounds
  * (0 ≤ NDCG ≤ 1, = 1 iff predicted top-10 gains match ideal).
  */
class Extended31Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q229: Zipf fit replays from raw token counts; slope negative, R² in [0,1]") {
    val row = q("q229_zipf_fit")(spark, sf0001).collect().head
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
    val vocab = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(row.getLong(0) == vocab.size && row.getLong(1) == toks.length)
    val top = vocab.toSeq.sortBy { case (t, c) => (-c, t) }.take(200)
    assert(row.getLong(2) == top.length)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    }
    // the query's rounded-term accumulation, replayed exactly
    def S(f: ((Double, Double)) => Double) =
      pts.map(p => BigDecimal(r(f(p), 12))).sum.toDouble
    val n = pts.length.toDouble
    val (sx, sy) = (S(_._1), S(_._2))
    val (sxx, sxy, syy) = (S(p => p._1 * p._1), S(p => p._1 * p._2), S(p => p._2 * p._2))
    val (bsxx, bsxy, bsyy) =
      (n * sxx - sx * sx, n * sxy - sx * sy, n * syy - sy * sy)
    assert(row.getDouble(3) == r(bsxy / bsxx, 6))
    assert(row.getDouble(3) < 0.0, "Zipf slope must be negative")
    val r2 = row.getDouble(5)
    assert(r2 == r(bsxy * bsxy / (bsxx * bsyy), 6) && r2 >= 0.0 && r2 <= 1.0)
    val hs = row.getDouble(6)
    assert(hs == r(top.map(_._2).sum.toDouble / toks.length, 6) && hs > 0.0 && hs <= 1.0)
  }

  test("q230: HOF fold equals a plain left-to-right Holt walk; forecasts extrapolate linearly") {
    val got = q("q230_holt_smoothing")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4), row.getDouble(5), row.getDouble(6)))
    val monthly = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag", date_format($"l_shipdate", "yyyy-MM").as("m"),
        $"l_extendedprice")
      .collect()
      .map(row => ((row.getString(0), row.getString(1)),
        BigInt(r(row.getDouble(2) * 100.0, 0).toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    got.foreach { case (flag, nMonths, level, trend, fc1, fc2, fc3) =>
      val series = monthly.collect { case ((f, m), y) if f == flag => (m, y.toDouble) }
        .toSeq.sortBy(_._1)
      assert(nMonths == series.length)
      var (l, b) = (0.0, 0.0)
      series.zipWithIndex.foreach { case ((_, y), i) =>
        if (i == 0) { l = y; b = 0.0 }
        else {
          val ln = r(0.3 * y + 0.7 * (l + b), 4)
          b = r(0.1 * (ln - l) + 0.9 * b, 4)
          l = ln
        }
      }
      assert(level == r(l, 4) && trend == r(b, 4))
      assert(fc1 == r(l + 1.0 * b, 4) && fc2 == r(l + 2.0 * b, 4) && fc3 == r(l + 3.0 * b, 4))
    }
    assert(got.exists(_._4 != 0.0), "at least one series must show a nonzero trend")
  }

  test("q231: NDCG replays from raw demand counts; bounds hold; ranking imperfect somewhere") {
    val got = q("q231_ndcg")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4)))
    val rel = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy($"l_partkey").count().collect()
      .map(row => (row.getLong(0), row.getLong(1))).toMap
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_partkey", $"p_brand", $"p_retailprice").collect()
      .map(row => (row.getLong(0), row.getString(1), row.getDouble(2),
        rel.getOrElse(row.getLong(0), 0L)))
    got.foreach { case (brand, nParts, dcg, idcg, ndcg) =>
      val bp = parts.filter(_._2 == brand)
      assert(nParts == bp.length)
      def dcgOf(ranked: Seq[Long]): Double =
        ranked.take(10).zipWithIndex.map { case (rv, i) =>
          BigDecimal(r(rv.toDouble / (math.log(i + 2.0) / math.log(2.0)), 10))
        }.sum.toDouble
      val pred = bp.sortBy(p => (-p._3, p._1)).map(_._4)
      val ideal = bp.sortBy(p => (-p._4, p._1)).map(_._4)
      assert(dcg == r(dcgOf(pred), 6) && idcg == r(dcgOf(ideal), 6))
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12)
      assert(dcg <= idcg + 1e-9, "ideal ordering maximizes DCG")
    }
    assert(got.exists(_._5 < 1.0),
      "price ranking must disagree with demand somewhere — a vacuous all-1 column proves nothing")
  }
}
