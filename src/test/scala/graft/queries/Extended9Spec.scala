package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics pins for the round-5 batch-2 queries (q144–q147). */
class Extended9Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def round12(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e12 + 0.5) / 1e12 + 0.0

  test("q144: matches an independent driver-side PageRank replay exactly") {
    // Rebuild the trade graph with plain collects, then replay the damped
    // iteration in local Scala with the same rounding contract
    // (round12 each contribution, exact-decimal sum, damp, re-round) —
    // a second implementation the distributed loop must agree with
    // bit-for-bit.
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_nationkey")
    val supp = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select($"s_suppkey", $"s_nationkey")
    val edges = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey".as("u"), $"s_nationkey".as("v")).count()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val vertices = spark.read.parquet(s"$sf0001/nation.parquet")
      .select($"n_nationkey").as[Int].collect().sorted
    val outw = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    val frac = edges.map { case (u, v, w) => (u, v, w.toDouble / outw(u).toDouble) }
    var r = vertices.map(_ -> 0.04).toMap
    (1 to 6).foreach { _ =>
      val sums = frac
        .groupBy(_._2)
        .map { case (v, es) =>
          // exact-decimal sum of round12 terms, like the DECIMAL(24,12) agg
          val s = es.map { case (u, _, f) =>
            BigDecimal(round12(r(u) * f)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
          }.sum
          v -> s.toDouble
        }
      r = vertices.map(v => v -> round12(0.006 + 0.85 * sums.getOrElse(v, 0.0))).toMap
    }
    val got = q("q144_pagerank")(spark, sf0001).collect()
      .map(row => row.getInt(0) -> row.getDouble(2)).toMap
    assert(got.keySet == r.keySet)
    r.foreach { case (v, expect) =>
      assert(got(v) == expect, s"nation $v: distributed ${got(v)} != replay $expect")
    }
    // structural: total mass ≤ 1 (dangling leak), every rank ≥ the base
    val total = got.values.sum
    assert(total <= 1.0 + 1e-9 && total >= 0.15)
    assert(got.values.forall(_ >= 0.006))
  }

  test("q145: candidate recall on true pairs is 1.0 — every variant matches its canon") {
    val out = q("q145_er_pipeline")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val variantIds = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"doc_id" % 5 === 0).select($"doc_id").as[Long].collect().toSet
    val truePairs = out.filter(_._4).map(_._1).toSet
    assert(truePairs == variantIds,
      s"missing true matches for: ${(variantIds diff truePairs).toSeq.sorted.take(5)}")
    out.filter(_._4).foreach { case (v, c, jw, _) =>
      assert(v == c && jw >= 0.75)
    }
  }

  test("q147: replays the classic BPE example by hand") {
    // vocab: low×3 lower×2 newest×4 widest×1 (Sennrich-style fixture)
    // round 1: (w,e)=2+4=6 wins → 'we'
    // round 2: (l,o)=5 ties (s,t)=5 → lexicographic, 'l'<'s' → (l,o)
    // round 3: (s,t)=5
    // round 4: (e,we)=4 ties (n,e)=4, (we,st)=4 → 'e'<'n'<'we' → (e,we)
    val dir = java.nio.file.Files.createTempDirectory("x9bpe").toString
    Seq((1L, ("low " * 3 + "lower " * 2 + "newest " * 4 + "widest").trim, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = q("q147_bpe_merges")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "w", "e", 6L), (2, "l", "o", 5L), (3, "s", "t", 5L), (4, "e", "we", 4L)))
  }

  test("q146: hand-computed linear interpolation, with edge-policy labels") {
    val dir = java.nio.file.Files.createTempDirectory("x9ev").toString
    def ns(hour: Int) =
      java.time.Instant.parse(f"2024-03-01T$hour%02d:00:00Z").getEpochSecond * 1000000000L
    // user 1: observations at 00:00 (1.0) and 03:00 (4.0) — gap hours
    // 01:00/02:00 must interpolate to 2.0/3.0
    Seq((ns(0), 1L, 1.0), (ns(3), 1L, 4.0))
      .toDF("ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = q("q146_linear_interp")(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getDouble(2), r.getString(3))).toMap
    assert(out("2024-03-01 00:00:00") == ((1.0, "obs")))
    assert(out("2024-03-01 01:00:00") == ((2.0, "interp")))
    assert(out("2024-03-01 02:00:00") == ((3.0, "interp")))
    assert(out("2024-03-01 03:00:00") == ((4.0, "obs")))
  }

  test("q146: interpolated values sit between their bracketing observations (sf0.001)") {
    val rows = q("q146_linear_interp")(spark, sf0001)
      .filter($"method" === "interp").collect()
    assert(rows.nonEmpty)
    // re-derive brackets per user from the obs rows
    val obs = q("q146_linear_interp")(spark, sf0001)
      .filter($"method" === "obs")
      .select($"user_id", $"hour", $"v_interp").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(r => r.getString(1) -> r.getDouble(2)).sortBy(_._1) }
    rows.foreach { r =>
      val (u, h, v) = (r.getLong(0), r.getString(1), r.getDouble(2))
      val series = obs(u)
      val before = series.filter(_._1 < h).map(_._2)
      val after = series.filter(_._1 > h).map(_._2)
      assert(before.nonEmpty && after.nonEmpty, s"interp row ($u,$h) lacks brackets")
      val (lo, hi) = (math.min(before.last, after.head), math.max(before.last, after.head))
      assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"($u,$h): $v outside [$lo,$hi]")
    }
  }
}
