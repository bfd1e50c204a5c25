package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics pins for the round-5 ER/statistics batch (q135–q143). */
class Extended8Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("x8docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q135: every adjacent-transposition variant matches its own canon at ≥0.9") {
    val out = q("q135_jaro_winkler")(spark, sf0001)
      .filter($"kind" === "swap").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(2), r.getString(3), r.getDouble(4)))
    val canon = spark.read.parquet(s"$sf0001/nation.parquet")
      .select($"n_nationkey".cast("long"), lower($"n_name").as("nm"))
      .as[(Long, String)].collect().toMap
    canon.foreach { case (k, nm) =>
      val self = out.find(r => r._1 == k && r._3 == nm)
      assert(self.isDefined, s"swap variant of '$nm' missing its own canon")
      // one adjacent transposition: m = n, t = 1 → jaro = (2 + (n-1)/n)/3
      // ≥ 0.9167 for n ≥ 4 (shortest nation name)
      assert(self.get._4 >= 0.9, s"'$nm' self-match scored ${self.get._4}")
    }
  }

  test("q136: hand-computed add-one bigram NLL on a 2-doc corpus") {
    // corpus bigrams: d1 = (x y)(y x)(x y), d2 = (x y)
    // c(x,y)=3, c(y,x)=1, prefix counts cp(x)=3, cp(y)=1, V=2
    // d2's single bigram: P = (3+1)/(3+2) = 0.8 → NLL = -log2(0.8)
    val dir = writeDocs(Seq(
      (1L, "x y x y", "en", "s0"),
      (2L, "x y", "en", "s0")))
    val out = q("q136_bigram_lm")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(2L)._1 == 1L)
    val expected = -math.log(0.8) / math.log(2.0)
    assert(math.abs(out(2L)._2 - expected) < 1e-4)
    // d1: (x,y) twice at P=0.8, (y,x) once at P=(1+1)/(1+2)
    val d1 = (2 * (-math.log(4.0 / 5.0) / math.log(2.0)) +
      (-math.log(2.0 / 3.0) / math.log(2.0))) / 3.0
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - d1) < 1e-4)
  }

  test("q137: a single gross outlier against constant data is flagged, nothing else") {
    val dir = java.nio.file.Files.createTempDirectory("x8li").toString
    val rows = (1 to 40).map(i => ("A", 100.0)) :+ (("A", 1e9))
    rows.toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = q("q137_mad_outliers")(spark, dir).head()
    // med = 100, MAD = 0 → threshold 0; only the 1e9 point has dev > 0
    assert(r.getAs[Long]("n") == 41L)
    assert(r.getAs[Long]("n_out") == 1L)
    assert(r.getAs[Double]("med_r") == 100.0)
    assert(r.getAs[Double]("mad_r") == 0.0)
  }

  test("q138: a perfectly independent contingency table gives chi2 = 0") {
    val dir = java.nio.file.Files.createTempDirectory("x8ev").toString
    // 2 event types × 4 buckets × 10 rows each — observed ≡ expected.
    // ts is nanos-since-epoch (the fixture's TIMESTAMP(NANOS) contract
    // that Tables.load rebuilds from).
    val rows = for {
      et <- Seq("a", "b"); h <- Seq(0, 6, 12, 18); i <- 1 to 10
    } yield (java.time.Instant.parse(f"2024-01-01T$h%02d:30:00Z")
      .getEpochSecond * 1000000000L + i, et)
    rows.toDF("ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = q("q138_chi2_test")(spark, dir).head()
    assert(r.getAs[Double]("chi2_r") == 0.0)
    assert(r.getAs[Long]("dof") == 3L)
    assert(r.getAs[Long]("n_events") == 80L)
  }

  test("q139: winsorized mean sits inside the clamp band; constant data is a fixpoint") {
    q("q139_winsorize")(spark, sf0001).collect().foreach { r =>
      val (m, lo, hi) = (r.getAs[Double]("mean_wins"),
        r.getAs[Double]("p05_r"), r.getAs[Double]("p95_r"))
      assert(m >= lo - 0.01 && m <= hi + 0.01, s"mean $m outside [$lo, $hi]")
    }
    val dir = java.nio.file.Files.createTempDirectory("x8li2").toString
    (1 to 30).map(_ => ("B", 55.5)).toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = q("q139_winsorize")(spark, dir).head()
    assert(r.getAs[Double]("mean_wins") == 55.5)
  }

  test("q140: exact duplicates land in one block and pair at distance 0") {
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s0"),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "s0"),
      (3L, "zzz completely different text here now", "en", "s0")))
    val pairs = q("q140_sorted_neighborhood")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)), s"dup pair missing: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "distinct-prefix doc must not pair within the window")
  }

  test("q141: tokens exclusive to the target slice score positive, others negative") {
    val dir = writeDocs(
      (1L to 5L).map(i => (i, "aa bb aa bb", "en", "s0")) ++
        (6L to 10L).map(i => (i, "zz yy zz yy", "fr", "s0")))
    val out = q("q141_dsir_weights")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("mean_logratio")).toMap
    (1L to 5L).foreach(i => assert(out(i) > 0.0, s"en doc $i not positive: ${out(i)}"))
    (6L to 10L).foreach(i => assert(out(i) < 0.0, s"fr doc $i not negative: ${out(i)}"))
  }

  test("q142: every source keeps ≥80% of token mass, minimally") {
    val rows = q("q142_topp_nucleus")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, nk, tk, tt) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("tok_kept"), r.getAs[Long]("tok_total"))
      assert(nk >= 1 && nk <= nd)
      assert(tk * 5 >= tt * 4, s"kept mass below 80%: $tk of $tt")
      assert(tk <= tt)
    }
  }

  test("q143: three identical copies collapse to one effective doc") {
    val dir = writeDocs(Seq(
      (1L, "same text", "en", "s0"),
      (2L, "same text", "en", "s0"),
      (3L, "same  text", "en", "s0"), // whitespace collapses → same fp
      (4L, "unique text", "en", "s0")))
    val r = q("q143_dedup_weights")(spark, dir).head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_clusters") == 2L)
    assert(r.getAs[Double]("effective_docs") == 2.0) // 3·(1/3) + 1
  }
}
