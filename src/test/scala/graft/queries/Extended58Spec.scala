package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-built pins for the embedding-QA batch: q304's truncation overlap
  * on a fixture where the 16-dim prefix collapses the ranking (so the
  * full/truncated top-5 provably differ in exactly one slot), and
  * q305's per-dimension stats + anisotropy against an independent
  * brute-force pairwise-cosine replay.
  */
class Extended58Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def vec17(x1: Float, x17: Float): Array[Float] = {
    val a = Array.fill(17)(0f); a(0) = x1; a(16) = x17; a
  }

  test("q304: prefix truncation loses exactly the out-of-prefix neighbor") {
    // anchor (1,…,1): full cosine ranks candidates (1,…,y) by
    // (1+y)/√(2(1+y²)); the 16-dim prefix of EVERY candidate is the
    // same direction (1,0,…), so truncated cosine is exactly 1.0 for
    // all of them and the truncated top-5 falls back to the cid
    // tie-break. Full top-5 = {10,11,12,13,15}; truncated = {10..14};
    // overlap 4/5.
    val dir = java.nio.file.Files.createTempDirectory("x58a").toString
    Seq(
      (0L, vec17(1f, 1f)),
      (10L, vec17(1f, 1f)),    // y=1.0  f=1.0
      (11L, vec17(1f, 0.8f)),  // f≈0.9939
      (12L, vec17(1f, 0.6f)),  // f≈0.9701
      (13L, vec17(1f, 0.4f)),  // f≈0.9191
      (14L, vec17(1f, -1f)),   // f=0 — dead last on full, 5th by cid on trunc
      (15L, vec17(1f, 0.2f)),  // f≈0.8321
      (16L, vec17(1f, -0.5f))) // f≈0.3162
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = q("q304_matryoshka_overlap")(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 0L)
    assert(rows(0).getLong(1) == 4L, rows(0).toString)
    assert(rows(0).getDouble(2) == 0.8)
  }

  test("q305: per-dim stats, the dead-dimension flag, and anisotropy ≡ brute-force mean pairwise cosine") {
    val dir = java.nio.file.Files.createTempDirectory("x58b").toString
    val vecs = Seq(
      (0L, Array(1f, 0f, 0.5f, 0.2f)),
      (1L, Array(0f, 1f, 0.5f, 0.4f)),
      (2L, Array(1f, 1f, 0.5f, 0.8f)))
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = q("q305_embedding_health")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val byDim = rows.map(r => r.getLong(0) -> r).toMap
    // dim 3 is constant 0.5 → std 0 → dead; the others live
    assert(byDim(3L).getDouble(3) == 0.0 && byDim(3L).getBoolean(5))
    assert(!byDim(1L).getBoolean(5) && !byDim(2L).getBoolean(5) && !byDim(4L).getBoolean(5))
    assert(math.abs(byDim(3L).getDouble(2) - 0.5) < 1e-9) // mean of the constant dim
    assert(rows.forall(_.getLong(1) == 3L))
    // anisotropy: independent brute-force replay — mean cosine over the
    // N(N−1) ordered cross pairs of normalized vectors
    def nrm(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum); v.map(_ / n)
    }
    val nv = vecs.map { case (_, v) => nrm(v) }
    val pairs = for {
      i <- nv.indices; j <- nv.indices if i != j
    } yield nv(i).zip(nv(j)).map { case (a, b) => a * b }.sum
    val expected = pairs.sum / pairs.size
    val got = rows.head.getDouble(4)
    assert(math.abs(got - expected) < 1e-4, s"anisotropy $got vs brute-force $expected")
  }
}
