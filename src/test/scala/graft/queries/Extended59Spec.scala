package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the leakage-safe split (q306): a hand-built corpus with one
  * near-dup cluster proves (a) the cluster lands in ONE split
  * atomically, (b) the leakage counter is zero, and (c) the naive
  * per-doc content hash (q66's rule) WOULD have split that same
  * cluster — i.e. the query fixes a real leak, not a vacuous one.
  */
class Extended59Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  test("q306: near-dup clusters split atomically; leakage counter is zero; naive hash would leak") {
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq(
      (1L, dup),
      (2L, dup + " extra"), // jaccard vs 1 well above 0.5 → same cluster
      (3L, "completely different words about ships and harbors tonight"),
      (4L, "yet another unrelated document mentioning mountains and rivers"))
    val dir = java.nio.file.Files.createTempDirectory("x59").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = q("q306_leakage_safe_split")(spark, dir).collect()
    // corpus-wide counters repeat on every row
    rows.foreach { r =>
      assert(r.getLong(4) == 1L, s"expected exactly one dup pair: $r") // (1,2)
      assert(r.getLong(5) == 0L, s"leakage must be zero by construction: $r")
    }
    assert(rows.map(_.getLong(1)).sum == 4L, "every doc gets a split")
    // docs 1 and 2 share cluster 1 → exactly one split holds BOTH its
    // members (n_clustered_docs = 2 on that row, 0 elsewhere)
    assert(rows.map(_.getLong(3)).sorted.toSeq.reverse.head == 2L)
    assert(rows.map(_.getLong(3)).sum == 2L)

    // the naive per-doc rule on the same corpus: docs 1 and 2 hash to
    // DIFFERENT md5 prefixes (their texts differ), so nothing stops the
    // boundary from separating them — verify their doc-level hashes
    // differ, which is the precondition for the leak q306 prevents
    val h = corpus.toDF("doc_id", "text")
      .select($"doc_id", md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h(1L) != h(2L), "near-dup twins have distinct content hashes — doc-level hashing can split them")
  }

  test("q307: within- vs cross-source pairs land on the right matrix cells with exact shares") {
    val dupA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dupB = "one two three four five six seven eight nine ten eleven"
    val corpus = Seq(
      (1L, dupA, "crawlX"), (2L, dupA + " tail", "crawlX"), // within-X pair
      (3L, dupB, "crawlX"), (4L, dupB + " tail", "crawlY"), // cross X/Y pair
      (5L, "totally unrelated filler text about gardens and weather", "crawlY"))
    val dir = java.nio.file.Files.createTempDirectory("x59b").toString
    corpus.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = q("q307_source_dup_matrix")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      ("crawlX", "crawlX", 1L, false, 0.5),
      ("crawlX", "crawlY", 1L, true, 0.5)))
  }
}
