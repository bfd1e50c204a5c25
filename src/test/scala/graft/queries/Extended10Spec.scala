package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics pins for the compliance/lakehouse batch (q148–q150).
  *
  * q149 keys the overlap matrix over three OVERLAPPING pseudo-feeds
  * (doc_id % 3 picks two of {feed_a, feed_b, feed_c}), so the battery row
  * is non-vacuous at every SF. The fixture here plants controlled doc_ids
  * and duplicate content so the matrix is pinned on hand-computed rows,
  * including the normalize (lower/trim/whitespace-collapse) contract and
  * the distinct-(fp, feed) collapse.
  */
class Extended10Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def round4(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e4 + 0.5) / 1e4 + 0.0

  private def round6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6 + 0.0

  test("q149: overlap matrix over overlapping pseudo-feeds, hand-computed") {
    // Feed membership by doc_id % 3: 0→{a,c}, 1→{a,b}, 2→{b,c}.
    // Content (fingerprints compare AFTER normalize):
    //   alpha: docs 1 (m=1 → a,b) and 2 (m=2 → b,c); doc 2's copy differs
    //          by case + extra whitespace, so a match proves the normalize
    //          step feeds the fingerprint
    //   beta : docs 3 and 6 (both m=0 → a,c) — identical (fp, feed) pairs,
    //          so distinct(fp, source) must collapse them
    //   gamma: doc 7 (m=1 → a,b); delta: doc 8 (m=2 → b,c)
    // Distinct fps per feed: a={α,β,γ}=3, b={α,γ,δ}=3, c={α,β,δ}=3.
    // Shared: (a,b)={α,γ}, (a,c)={α,β}, (b,c)={α,δ} — all 2, J=2/(3+3-2).
    val dir = java.nio.file.Files.createTempDirectory("x10docs").toString
    Seq(
      (1L, "Alpha doc text", "en", "s1"),
      (2L, "  alpha   DOC text ", "en", "s2"),
      (3L, "beta doc", "en", "s1"),
      (6L, "beta doc", "en", "s3"),
      (7L, "gamma only", "en", "s1"),
      (8L, "delta only", "en", "s3"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = q("q149_overlap_matrix")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("feed_a", "feed_b", 2L, 0.5),
      ("feed_a", "feed_c", 2L, 0.5),
      ("feed_b", "feed_c", 2L, 0.5)))
  }

  test("q149: battery fixture is NON-vacuous (rows exist at sf0.001)") {
    // the driver-level gate must compare real rows at every SF — pin it
    assert(q("q149_overlap_matrix")(spark, sf0001).count() > 0)
  }

  test("q148: cascade counts match an isin-based replay; zero orphans") {
    // Independent derivation: collect the tiny purge sets and re-count with
    // isin filters (no joins), so the semi/anti-join plan is cross-checked
    // against a structurally different implementation.
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val delKeys = cust.filter($"c_custkey" % 97 === 0)
      .select($"c_custkey").as[Long].collect().toSeq
    assert(delKeys.nonEmpty, "fixture must exercise a non-empty purge set")
    val ordKeys = ord.filter($"o_custkey".isin(delKeys: _*))
      .select($"o_orderkey").as[Long].collect().toSeq
    val expected = Seq(
      ("customer", cust.count(), delKeys.size.toLong),
      ("lineitem", li.count(), li.filter($"l_orderkey".isin(ordKeys: _*)).count()),
      ("orders", ord.count(), ordKeys.size.toLong))
    val got = q("q148_cascade_delete")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == expected)
    got.foreach { case (tbl, before, purged, after, orphans) =>
      assert(after == before - purged, s"$tbl: n_after mismatch")
      assert(orphans == 0L, s"$tbl: cascade left $orphans orphans")
    }
  }

  test("q150: merged state equals full recompute; avg matches a BigDecimal replay") {
    val split = java.time.LocalDate.parse("1995-06-17")
    // session tz is UTC, so ts→date here agrees with the query's
    // timestamp-vs-date comparison (both cut at 1995-06-17T00:00Z)
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderpriority", $"o_orderdate".cast("date"), $"o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    // replay the round2→DECIMAL(18,2) partial-state merge in plain Scala,
    // with the query's own half-away-from-zero double formula so the pin
    // is bit-exact rather than approximately-equal
    def round2(x: Double): Double =
      math.signum(x) * math.floor(math.abs(x) * 1e2 + 0.5) / 1e2 + 0.0
    val byPri = rows.groupBy(_._1)
    val expected = byPri.toSeq.sortBy(_._1).map { case (pri, rs) =>
      val cents = rs.map(t =>
        BigDecimal(round2(t._3)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val nBase = rs.count(_._2.isBefore(split)).toLong
      val nDelta = rs.size.toLong - nBase
      val avg = round4(cents.sum.toDouble / rs.size.toDouble)
      (pri, nBase, nDelta, rs.size.toLong, avg, true)
    }
    val got = q("q150_incremental_agg")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == expected)
    // both halves genuinely populated — the merge is exercised, not degenerate
    assert(got.exists(_._2 > 0) && got.exists(_._3 > 0))
  }
}
