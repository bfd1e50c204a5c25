package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-computed pins for the blocking-quality / containment /
  * label-noise batch (q298–q300).
  */
class Extended55Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def round6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6 + 0.0

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("x55d").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q298: reduction ratio from block sizes; completeness misses the off-block dup") {
    // docs 1,2 identical (same block, Jaccard 1 — blocked true pair);
    // docs 3,4 near-dups differing in the FIRST token (Jaccard 5/7 but
    // DIFFERENT first-5-token blocks — the true pair blocking loses).
    val dir = docsDir(Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight"),
      (4L, "uno two three four five six seven eight")))
    val r = q("q298_blocking_quality")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 3L, 1L, 6L)))
    assert(r.getDouble(4) == round6(1.0 - 1.0 / 6.0))
    assert((r.getLong(5), r.getLong(6)) == ((2L, 1L)))
    assert(r.getDouble(7) == 0.5)
  }

  test("q299: containment is directed — the excerpt scores 1.0, the container is excluded") {
    // A's 3 shingles all inside B (6 shingles) → C(A→B)=1.0; the reverse
    // direction C(B→A)=0.5 is below threshold AND blocked by the
    // smaller-into-larger rule; unrelated C emits nothing.
    val dir = docsDir(Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f g h"),
      (3L, "z y x w v")))
    val got = q("q299_containment")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq((1L, 2L, 3L, 6L, 3L, 1.0)))
  }

  test("q300: mislabeled cluster member flagged by 5-NN majority; clean member not") {
    // ids 0-5 at (0,1,0): id 0 labeled 0 (wrong), 1-5 labeled 1;
    // ids 6-8 at (1,0,0) labeled 0. Anchor 0's five nearest are 1-5
    // (cos 1) → majority 1, suspect. Anchor 1's five nearest are
    // {0,2,3,4,5} → 4 votes label 1 vs 1 vote label 0 → clean.
    val dir = java.nio.file.Files.createTempDirectory("x55e").toString
    val rows =
      (0L to 5L).map(i => (i, Array(0f, 1f, 0f), if (i == 0) 0 else 1)) ++
        (6L to 8L).map(i => (i, Array(1f, 0f, 0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val byId = q("q300_label_noise")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(byId(0L) == ((0, 1, 5L, 1)))
    assert(byId(1L) == ((1, 1, 4L, 0)))
    assert(byId.size == 9)
  }
}
