package graft.queries

import graft.SparkSuite
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Semantics pins for the round-5 batch-2 queries (q119–q125). The DuckDB
  * oracle proves cross-engine equality; these pin the INTENDED behavior on
  * hand-computable inputs so a refactor can't drift both sides in
  * lockstep.
  */
class Extended6Spec extends SparkSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("x6docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def q(name: String) = graft.SparkEntry.queries(name)

  test("q119 blocklist: hit count, sorted distinct terms, scrub rebuild, keep") {
    val dir = writeDocs(Seq(
      (1L, "THE big cat sat on the mat"), // 'the'×2 + 'big' → 3 hits
      (2L, "clean words only here")))
    val rows = q("q119_blocklist_scrub")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getBoolean(4)))
    assert(rows(0) == ((1L, 3L, "big,the", "cat sat on mat", false)))
    assert(rows(1) == ((2L, 0L, "", "clean words only here", true)))
  }

  test("q120 vocab coverage: ranks, cumulative share, exact 90% boundary") {
    // 'a'×9 + 'b'×1: b's preceding cumulative coverage is exactly 90%,
    // so b is OUT of the 90% vocabulary ((cum-cnt)*10 < total*9 is strict)
    val dir = writeDocs(Seq((1L, ("a " * 9).trim + " b")))
    val rows = q("q120_vocab_coverage")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(rows.toSeq == Seq(
      (1L, "a", 9L, 9L, 0.9, true),
      (2L, "b", 1L, 10L, 1.0, false)))
  }

  test("q121 lateral: equals the DataFrame groupBy+join twin") {
    val got = q("q121_lateral_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), Option(r.get(3))))
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy($"l_partkey")
      .agg(count(lit(1)).as("n_li"), max($"l_extendedprice").as("max_price"))
    val want = spark.read.parquet(s"$sf0001/part.parquet")
      .filter($"p_partkey" <= 25)
      .join(li, $"p_partkey" === $"l_partkey", "left")
      .select($"p_partkey", coalesce($"n_li", lit(0L)).as("n_li"), $"max_price")
      .orderBy($"p_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    assert(got.toSeq == want.toSeq)
  }

  test("q122 recursive walk: depth = floor(log2(node)), exact ancestor checksum") {
    val rows = q("q122_recursive_walk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (node, depth, keysum) =>
      // replay the walk in plain Scala
      var (anc, chain) = (node, List(node))
      while (anc > 1) { anc = anc / 2; chain = anc :: chain }
      val wantDepth = chain.length - 1
      assert(depth == wantDepth, s"node $node: depth $depth != $wantDepth")
      assert(keysum == chain.sum, s"node $node: keysum $keysum != ${chain.sum}")
      if (node >= 1)
        assert(depth == (63 - java.lang.Long.numberOfLeadingZeros(node)),
          s"node $node: depth != floor(log2)")
    }
  }

  test("q124 regr battery: slope/intercept match the closed form from exact moments") {
    val r = q("q124_regr_battery")(spark, sf0001).collect()
    val m = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"), sum($"l_quantity").as("sx"),
        sum($"l_extendedprice").as("sy"),
        sum($"l_quantity" * $"l_quantity").as("sxx"),
        sum($"l_quantity" * $"l_extendedprice").as("sxy"))
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))).toMap
    r.foreach { row =>
      val (n, sx, sy, sxx, sxy) = m(row.getString(0))
      val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      val icept = sy / n - slope * sx / n
      assert(math.abs(row.getDouble(2) - slope) < 1e-4, s"slope ${row.getDouble(2)} vs $slope")
      assert(math.abs(row.getDouble(3) - icept) < 1e-4)
      assert(row.getLong(1) > 0)
      val r2 = row.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("q123 ann recall: bounded in [0,1]; exhaustive probe gives recall 1.0") {
    val rows = q("q123_ann_recall")(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0 && rec == r.getLong(1) / 10.0)
    }
    // probing EVERY cell makes IVF exhaustive → recall exactly 1.0
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qs = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select($"qid", $"cid")
    val appr = Similarity.ivfTopK(emb, qs, "vec_id", "embedding",
        k = 10, stride = 50, nProbe = 1000000, trainIters = 0)
      .select($"qid", $"cid")
    assert(exact.exceptAll(appr).isEmpty && appr.exceptAll(exact).isEmpty)
  }

  test("q125 pq encode: codebook vectors encode to themselves with zero error") {
    val out = q("q125_pq_encode")(spark, sf0001).collect()
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // q125's production sizing: stride = N div 64 (fixed ~64-codeword
    // codebook) — mirror it to recover the codeword id set
    val stride = math.max(1L, emb.count() / 64)
    val cbIds = emb.filter($"vec_id" % stride === 0).select($"vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.length == emb.count())
    out.foreach { r =>
      val (vid, codes, recon) =
        (r.getLong(0), (1 to 4).map(r.getLong(_)), r.getDouble(5))
      codes.foreach(c => assert(cbIds.contains(c), s"code $c not a codeword id"))
      assert(recon >= 0.0)
      if (cbIds.contains(vid)) {
        assert(codes.forall(_ == vid), s"codeword $vid not self-coded: $codes")
        assert(recon == 0.0)
      }
    }
  }

  test("q126 dup-ngram chars: hand-computed repetition fractions") {
    val dir = writeDocs(Seq(
      (1L, "a b a b c"), // bigrams: "a b"×2, "b a", "b c" → num=2*3=6, denom=3+3+3+3=12
      (2L, "x y z w"))) // all bigrams unique → frac 0
    val rows = q("q126_dup_ngram_chars")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows(0) == ((1L, 4L, 1L, 0.5)))
    assert(rows(1) == ((2L, 3L, 0L, 0.0)))
  }

  test("q127 psi: baseline source scores exactly 0; PSI is non-negative") {
    val all = q("q127_psi_drift")(spark, sf0001).collect()
    val bySrc = all.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(bySrc("src0") == 0.0, s"PSI(src0||src0) must be 0, got ${bySrc("src0")}")
    // PSI is a sum of (p-q)ln(p/q) terms, each ≥ 0 up to term rounding
    all.foreach(r => assert(r.getDouble(2) > -1e-9, r.toString))
    assert(all.length == 20) // every fixture source present
  }

  test("q128 exact decontam: probes hit themselves; verbatim embeds are caught") {
    val rows = q("q128_exact_decontam")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L to 4L).foreach(id =>
      assert(rows(id) >= 1L, s"probe doc $id must contain its own prefix"))
    // synthetic corpus: docs 0,1 share one text (duplicate probes); doc 3
    // embeds that prefix mid-text; docs 2,4 hit only their own prefixes
    val d0 = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"doc_id" === 0).select($"text").head().getString(0)
    val prefix8 = d0.toLowerCase.trim.split("\\s+").take(8).mkString(" ")
    val dir = writeDocs(Seq(
      (0L, d0),
      (1L, d0),
      (2L, "totally unrelated words here that hit nothing at all"),
      (3L, s"leading context $prefix8 trailing context"),
      (4L, "another benchmark probe document entirely different from the rest")))
    val got = q("q128_exact_decontam")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toList
    assert(got(0) == ((0L, 2L, Some(0L)))) // own prefix ≡ probe 0 and 1
    assert(got(1) == ((1L, 2L, Some(0L))))
    assert(got(2) == ((2L, 1L, Some(2L)))) // only its own prefix
    assert(got(3) == ((3L, 3L, Some(0L)))) // embedded copy + probes 0,1
    assert(got(4) == ((4L, 1L, Some(4L))))
  }

  private def writeDocsSrc(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("x6src").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q129 gini: perfectly balanced sources score 0; known skew matches closed form") {
    val even = writeDocsSrc(Seq(
      (1L, "a b c", "s1"), (2L, "d e f", "s2"), (3L, "g h i", "s3")))
    val r0 = q("q129_source_gini")(spark, even).head()
    assert(r0.getLong(0) == 3 && r0.getLong(1) == 9 && r0.getDouble(2) == 0.0)
    // masses 1,2,3: G = (2*(1*1+2*2+3*3) - 4*6) / (3*6) = (28-24)/18 = 2/9
    val skew = writeDocsSrc(Seq(
      (1L, "a", "s1"), (2L, "b c", "s2"), (3L, "d e f", "s3")))
    val r1 = q("q129_source_gini")(spark, skew).head()
    assert(math.abs(r1.getDouble(2) - 2.0 / 9.0) < 1e-6)
  }

  test("q130 dataset card: counts, mean tokens, exact-dup fraction") {
    val dir = writeDocsSrc(Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "  ALPHA   beta GAMMA ", "s1"), // normalizes to doc 1's fingerprint
      (3L, "delta epsilon", "s2"),
      (4L, "zeta", "s2")))
    val r = q("q130_dataset_card")(spark, dir).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 2 && r.getLong(2) == 1)
    assert(r.getLong(3) == 9) // 3+3+2+1 tokens
    assert(r.getDouble(4) == 2.25)
    assert(r.getDouble(5) == 0.25) // one duplicate of four
  }

  test("q125 pq encode: hand-computed 2-subspace example") {
    val dir = java.nio.file.Files.createTempDirectory("x6pq").toString
    // dim 4, 2 subspaces of 2; codewords = ids 0 and 50
    Seq(
      (0L, Array(0f, 0f, 10f, 10f), 0),
      (50L, Array(4f, 4f, 0f, 0f), 0),
      (1L, Array(1f, 1f, 1f, 1f), 0), // sub0 → cw0 (d²=2 < 18); sub1 → cw50 (d²=2 < 162)
      (2L, Array(3f, 3f, 9f, 9f), 0)) // sub0 → cw50 (d²=2 < 18); sub1 → cw0 (d²=2 < 162)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.pqEncode(emb, "vec_id", "embedding", nSub = 2, subDim = 2, stride = 50)
      .orderBy($"vid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (0L, 0L, 0L, 0.0), (1L, 0L, 50L, 4.0), (2L, 50L, 0L, 4.0), (50L, 50L, 50L, 0.0)))
  }
}
