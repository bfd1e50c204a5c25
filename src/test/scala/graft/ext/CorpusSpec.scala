package graft.ext

import graft.SparkSuite
import graft.ops.Scale
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat", "bench"),
    (2L, "the cat sat on the hat", "web"), // shares 3 of its 4 shingles with doc 1
    (3L, "dogs bark loudly at night", "web"), // disjoint from the benchmark
    (4L, "a a a a b", "web"), // repetitive
    (5L, "xy", "web") // 1 token → no shingles
  ).toDF("doc_id", "text", "source")

  test("tokenRel explodes 0-based positions and drops empty tokens") {
    val rows = Corpus.tokenRel(docs.filter($"doc_id" === 1L), "doc_id", "text")
      .orderBy("pos").as[(Long, Int, String)].collect()
    assert(rows.map(_._3).toSeq == Seq("the", "cat", "sat", "on", "the", "mat"))
    assert(rows.map(_._2).toSeq == (0 until 6))
  }

  test("passageRel: non-overlapping k-token spans, ragged tail dropped, short docs none") {
    val rel = Corpus.passageRel(docs, "doc_id", "text", 4)
      .as[(Long, Int, String)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.sortBy(_._2).map(_._3).toSeq }
    // 6 tokens → one full 4-token passage, tail of 2 dropped
    assert(rel(1L) == Seq("the cat sat on"))
    assert(rel(4L) == Seq("a a a a")) // 5 tokens → 1 passage
    assert(!rel.contains(5L)) // 1 token < k → no passages
  }

  test("passageDupStats: shared span counts as duplicated on BOTH docs; keep thresholds") {
    val d = Seq(
      (1L, "one two three four x y z w"), // passages: "one two three four", "x y z w"
      (2L, "one two three four q r s t"), // shares passage 1 with doc 1
      (3L, "alpha beta gamma delta"), // unique single passage
      (4L, "hi") // too short: 0 passages
    ).toDF("doc_id", "text")
    val out = Corpus.passageDupStats(d, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5, false))) // half duplicated → dropped at <0.5
    assert(out(2L) == ((2L, 1L, 0.5, false)))
    assert(out(3L) == ((1L, 0L, 0.0, true)))
    assert(out(4L) == ((0L, 0L, 0.0, true))) // no passages → trivially kept
  }

  test("passageDedupText drops only duplicated spans; order + ragged tail survive") {
    val d = Seq(
      (1L, "one two three four x y z w tail1"), // shared span + unique span + tail
      (2L, "one two three four q r s t"), // shares span 1 with doc 1, no tail
      (3L, "hi") // shorter than k: passes through normalized-whole
    ).toDF("doc_id", "text")
    val out = Corpus.passageDedupText(d, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "x y z w tail1",
      2L -> "q r s t",
      3L -> "hi"))
  }

  test("repetitionStats flags the stuffed doc and not normal prose") {
    val m = Corpus.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("top_tok_n"), r.getAs[Long]("n_tokens"))).toMap
    assert(m(4L) == (4L, 5L)) // "a" ×4 of 5
    assert(m(1L) == (2L, 6L)) // "the" ×2 of 6
  }

  test("tfidf ranks by (tf desc, tok asc) and stop-like corpus terms score low") {
    val top = Corpus.tfidfTopK(docs, "doc_id", "text", 2)
      .filter($"doc_id" === 4L).orderBy("rnk")
      .select("tok", "tf").as[(String, Long)].collect()
    assert(top.toSeq == Seq(("a", 4L), ("b", 1L)))
    // per-occurrence, the common 'the' (df=2) scores below the rare 'mat' (df=1)
    val d1 = Corpus.tfidfTopK(docs, "doc_id", "text", 5)
      .filter($"doc_id" === 1L)
      .select("tok", "score").as[(String, Double)].collect().toMap
    assert(d1("the") > 0 && d1("the") / 2 < d1("mat"))
  }

  test("contaminationRates scores only non-benchmark docs with shingles, exact overlap") {
    val m = Corpus.contaminationRates(docs, "doc_id", "text", $"source" === "bench", 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_contam"))).toMap
    assert(!m.contains(1L)) // benchmark doc not scored
    assert(!m.contains(5L)) // too short for shingles
    assert(m(2L) == (4L, 3L)) // "the cat sat","cat sat on","sat on the" hit; "on the hat" miss
    assert(m(3L)._2 == 0L) // disjoint
  }

  test("connectedComponents collapses chains and keeps disjoint clusters apart") {
    // chain 1-2-3-4 (no direct 1-4 edge) + island 7-9 + untouched 5 (absent)
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (9L, 7L)).toDF("a_id", "b_id")
    val m = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents matches union-find on random graphs (pinned seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    for (seed <- Seq(1L, 2L, 3L)) {
      val edges = Gen.listOfN(60,
        Gen.zip(Gen.choose(0L, 29L), Gen.choose(0L, 29L)))
        .apply(Gen.Parameters.default, Seed(seed)).get
        .filter { case (a, b) => a != b }
      val pairs = edges.toDF("a_id", "b_id")
      val got = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find with min-label normalization
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(n => n -> find(n)).toMap
        .map { case (n, r) => n -> parent.keys.filter(find(_) == find(n)).min }
      assert(got == expected, s"seed $seed")
    }
  }

  test("salted join is row-identical to the plain join") {
    val orders = spark.range(0, 1000)
      .select($"id".as("o_id"), pmod($"id", lit(7)).as("o_custkey"))
    val cust = spark.range(0, 7).select($"id".as("o_custkey"), ($"id" * 10).as("score"))
    val plain = orders.join(cust, "o_custkey")
    val salted = Scale.saltedJoin(orders, cust, "o_custkey", 4)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
