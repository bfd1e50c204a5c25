package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.ops.Num
import QueryDef.tbl

/** Similarity search over the `embeddings` fixture (Array[Float], dim 64).
  * Brute-force and blocked near-dup are oracle-checked (double math is
  * pinned identically on both engines); IVF is the approximate scale path
  * (rows-only; recall vs brute force asserted in SimilaritySpec).
  */
object EmbeddingQueries {

  // DuckDB per-dimension cosine fragments (dim = 64, 1-based slots)
  private def dotSql(a: String, b: String) =
    s"sum(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))"

  val all: Seq[QueryDef] = Seq(
    // Brute-force cosine top-5 for 10 query vectors: corpus streams once,
    // queries broadcast, per-query heap via row_number.
    QueryDef(
      "q39_embed_topk",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        Similarity
          .bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
          .select(col("qid"), col("cid"), col("rn"), Num.roundTo(col("cos"), 4).as("cos_r"))
          .orderBy("qid", "rn")
      },
      Some(s"""WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 10),
              |c AS (SELECT vec_id cid, embedding ce FROM embeddings),
              |d AS (SELECT qid, cid,
              |        ${dotSql("qe", "ce")} AS dp,
              |        sqrt(${dotSql("qe", "qe")}) AS nq,
              |        sqrt(${dotSql("ce", "ce")}) AS nc
              |      FROM q CROSS JOIN c CROSS JOIN range(1, 65) t(i)
              |      WHERE qid != cid GROUP BY qid, cid),
              |r AS (SELECT qid, cid, dp / (nq * nc) AS cos,
              |        row_number() OVER (PARTITION BY qid
              |                           ORDER BY dp / (nq * nc) DESC, cid) AS rn
              |      FROM d)
              |SELECT qid, cid, rn, ${Num.roundSql("cos", 4)} AS cos_r
              |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // IVF approximate top-5 (deterministic centroid sample, 3-probe) —
    // the 100 TB path: candidates shrink by ~nCells/nProbe. Rows-only.
    QueryDef(
      "q40_embed_ivf",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        Similarity
          .ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, stride = 50, nProbe = 3)
          .select(col("qid"), col("cid"), col("rn"), Num.roundTo(col("cos"), 4).as("cos_r"))
          .orderBy("qid", "rn")
      },
      None),

    // Embedding near-dup pairs blocked by label, cosine ≥ 0.4.
    QueryDef(
      "q41_embed_neardup",
      (s, dir) =>
        Similarity
          .nearDupPairs(tbl(s, dir, "embeddings"), "vec_id", "embedding", "label", 0.4)
          .select(col("a_id"), col("b_id"), Num.roundTo(col("cos"), 4).as("cos_r"))
          .orderBy("a_id", "b_id"),
      Some(s"""WITH p AS (
              |  SELECT a.vec_id a_id, b.vec_id b_id, a.embedding ae, b.embedding be
              |  FROM embeddings a JOIN embeddings b
              |    ON a.label = b.label AND a.vec_id < b.vec_id),
              |d AS (SELECT a_id, b_id,
              |        ${dotSql("ae", "be")} AS dp,
              |        sqrt(${dotSql("ae", "ae")}) AS na,
              |        sqrt(${dotSql("be", "be")}) AS nb
              |      FROM p CROSS JOIN range(1, 65) t(i) GROUP BY a_id, b_id)
              |SELECT a_id, b_id, ${Num.roundSql("dp / (na * nb)", 4)} AS cos_r
              |FROM d WHERE dp / (na * nb) >= 0.4 ORDER BY a_id, b_id""".stripMargin)))
}
