package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.{Similarity, Text}
import graft.ops.Num
import QueryDef.tbl

/** Round-11 batch 2: the two retrieval-curation operators the battery's
  * search family still lacked.
  *
  * q315 is HYBRID retrieval — the standard RAG-corpus ranking recipe:
  * a dense arm (embedding cosine, q39's machinery) and a sparse arm
  * (query-by-example BM25 over the probe document's own terms, q133's
  * scoring) fused by reciprocal-rank fusion. Neither signal alone is the
  * production ranker; the FUSION is, and it sits under the hash gate end
  * to end. Scale shape: the dense arm is the documented small-scale
  * anchor (brute-force; q302/q310 carry the IVF/ADC production rule);
  * the sparse arm is a posting-list equi-join bounded by the probe term
  * set (candidates = Σ df(t) over ~5 docs' distinct terms — keyed
  * shuffle, linear worst case); the fuse joins two ≤20-row-per-query
  * rank lists.
  *
  * q316 is exact-substring span detection (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better"): stride-1
  * rolling 8-token fingerprints, cross-document matches grouped into
  * maximal runs along (docA, docB, posA−posB) diagonals — a run of L
  * consecutive matching 8-grams is a verbatim shared span of L+7 tokens.
  * Unlike q312's stride-5 TILING (alignment-dependent, segment-quantized),
  * this finds arbitrary-alignment verbatim overlap and reports its exact
  * token length. The hot-fingerprint guard (df ≤ 1000) is mirrored in
  * the oracle — the r10 ADVICE lesson: a guard only one engine applies
  * is a latent hash split.
  */
object Extended62 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** RRF smoothing constant (the standard k=60) shared by both engines. */
  private val RrfK = 60

  val all: Seq[QueryDef] = Seq(
    // ----- q315: hybrid dense+sparse retrieval via RRF ------------------
    QueryDef(
      "q315_hybrid_retrieval",
      (s, dir) => {
        // dense arm: cosine top-20 per probe (probe set = ids < 5;
        // doc_id and vec_id are the same id space in the fixture)
        val emb = tbl(s, dir, "embeddings")
        val dense = Similarity
          .bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 20)
          .select(col("qid"), col("cid").as("id"), col("rn").as("r_dense"))
        // sparse arm: query-by-example BM25 — the probe doc's distinct
        // terms score the corpus through the full posting relation
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), Text.tokensNorm(col("text")).as("__ws"))
          .select(col("doc_id"), col("__ws"), size(col("__ws")).cast("bigint").as("dl"))
        val stats = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
        val qt = d.filter(col("doc_id") < 5)
          .select(col("doc_id").as("qid"), explode(array_distinct(col("__ws"))).as("t"))
        val tf = d.select(col("doc_id"), col("dl"), explode(col("__ws")).as("t"))
          .groupBy(col("doc_id"), col("dl"), col("t")).agg(count(lit(1)).as("tf"))
        val dfT = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
          .join(broadcast(qt.select(col("t")).distinct()), Seq("t"))
        val scored = tf.join(broadcast(qt), Seq("t"))
          .filter(col("doc_id") =!= col("qid"))
          .join(broadcast(dfT), Seq("t")).crossJoin(broadcast(stats))
          .select(col("qid"), col("doc_id"), // identical term formula to q133
            (log(lit(1.0) +
              (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
                (col("df").cast("double") + lit(0.5))) *
              (col("tf").cast("double") * lit(2.2)) /
              (col("tf").cast("double") + lit(1.2) *
                (lit(0.25) + lit(0.75) * col("dl").cast("double") /
                  (col("tot_dl").cast("double") / col("n_docs").cast("double")))))
              .as("term_score"))
          .groupBy(col("qid"), col("doc_id"))
          .agg(sum(R(col("term_score"), 12).cast(DecimalType(24, 12))).as("__score"))
        val wS = Window.partitionBy(col("qid"))
          .orderBy(col("__score").desc, col("doc_id").asc)
        val sparse = scored
          .withColumn("r_sparse", row_number().over(wS).cast("bigint"))
          .filter(col("r_sparse") <= 20)
          .select(col("qid"), col("doc_id").as("id"), col("r_sparse"))
        // RRF fuse over the union of both top-20 lists; reciprocal terms
        // rounded to 12 dp DECIMAL so the 2-term sum is order-free
        val rrfTerm = (r: Column) =>
          coalesce(R(lit(1.0) / (lit(RrfK) + r.cast("double")), 12)
            .cast(DecimalType(24, 12)), lit(0).cast(DecimalType(24, 12)))
        val wF = Window.partitionBy(col("qid")).orderBy(col("__rrf").desc, col("id").asc)
        dense.join(sparse, Seq("qid", "id"), "full")
          .withColumn("__rrf", rrfTerm(col("r_dense")) + rrfTerm(col("r_sparse")))
          .withColumn("rank", row_number().over(wF).cast("bigint"))
          .filter(col("rank") <= 5)
          .select(col("qid"), col("rank"), col("id"),
            col("r_dense"), col("r_sparse"),
            R(col("__rrf").cast("double"), 6).as("rrf_r"))
          .orderBy("qid", "rank")
      },
      Some(s"""WITH ${EmbeddingQueries.normCte},
              |eq AS (SELECT e.vec_id qid, e.embedding qe, n.nrm qn
              |       FROM embeddings e JOIN n ON n.vec_id = e.vec_id WHERE e.vec_id < 5),
              |ec AS (SELECT e.vec_id cid, e.embedding ce, n.nrm cn
              |       FROM embeddings e JOIN n ON n.vec_id = e.vec_id),
              |dd AS (SELECT qid, cid,
              |         sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) / (qn * cn) AS cos
              |       FROM eq CROSS JOIN ec CROSS JOIN range(1, 65) t(i)
              |       WHERE qid != cid GROUP BY qid, cid, qn, cn),
              |dense AS (SELECT qid, cid AS id, rn AS r_dense FROM (
              |            SELECT qid, cid,
              |              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
              |            FROM dd) WHERE rn <= 20),
              |docs AS (SELECT doc_id, ${TextQueries.wsSql} AS ws FROM documents),
              |dl AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM docs),
              |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |         CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl),
              |qt AS (SELECT DISTINCT qid, t FROM (
              |         SELECT doc_id AS qid, unnest(ws) AS t FROM dl WHERE doc_id < 5)),
              |tf AS (SELECT doc_id, dl, t, count(*) AS tf
              |       FROM (SELECT doc_id, dl, unnest(ws) AS t FROM dl)
              |       GROUP BY doc_id, dl, t),
              |dft AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
              |sc AS (SELECT qt.qid, tf.doc_id,
              |         ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(dft.df AS DOUBLE) + 0.5) /
              |                  (CAST(dft.df AS DOUBLE) + 0.5)) *
              |         (CAST(tf AS DOUBLE) * 2.2) /
              |         (CAST(tf AS DOUBLE) + 1.2 *
              |          (0.25 + 0.75 * CAST(dl AS DOUBLE) /
              |           (CAST(tot_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS term_score
              |       FROM tf JOIN qt USING (t) JOIN dft USING (t) CROSS JOIN st
              |       WHERE tf.doc_id != qt.qid),
              |ag AS (SELECT qid, doc_id,
              |         sum(CAST(${rs("term_score", 12)} AS DECIMAL(24,12))) AS score
              |       FROM sc GROUP BY qid, doc_id),
              |sparse AS (SELECT qid, doc_id AS id, rn AS r_sparse FROM (
              |             SELECT qid, doc_id,
              |               CAST(row_number() OVER (PARTITION BY qid
              |                 ORDER BY score DESC, doc_id) AS BIGINT) AS rn
              |             FROM ag) WHERE rn <= 20),
              |fused AS (SELECT coalesce(dense.qid, sparse.qid) AS qid,
              |            coalesce(dense.id, sparse.id) AS id,
              |            dense.r_dense, sparse.r_sparse,
              |            coalesce(CAST(${rs(s"1.0 / ($RrfK + CAST(r_dense AS DOUBLE))", 12)}
              |              AS DECIMAL(24,12)), 0) +
              |            coalesce(CAST(${rs(s"1.0 / ($RrfK + CAST(r_sparse AS DOUBLE))", 12)}
              |              AS DECIMAL(24,12)), 0) AS rrf
              |          FROM dense FULL JOIN sparse
              |            ON dense.qid = sparse.qid AND dense.id = sparse.id),
              |rk AS (SELECT qid, id, r_dense, r_sparse, rrf,
              |         CAST(row_number() OVER (PARTITION BY qid
              |           ORDER BY rrf DESC, id) AS BIGINT) AS rank
              |       FROM fused)
              |SELECT qid, rank, id, r_dense, r_sparse,
              |  ${rs("CAST(rrf AS DOUBLE)", 6)} AS rrf_r
              |FROM rk WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // ----- q316: verbatim shared-span detection (stride-1 8-grams) ------
    QueryDef(
      "q316_verbatim_spans",
      (s, dir) => {
        val toks = Text.tokensNorm(col("text"))
        val w8 = tbl(s, dir, "documents")
          .select(col("doc_id"), toks.as("ws"))
          .filter(size(col("ws")) >= 8)
        val g = w8
          .withColumn("j", explode(sequence(lit(0), size(col("ws")) - 8)))
          .select(col("doc_id"), col("j").as("pos"),
            md5(concat_ws(" ", slice(col("ws"), col("j") + 1, lit(8)))).as("fp"))
        // cross-doc fingerprints only, hot-span guard (df ≤ 1000) —
        // mirrored in the oracle SQL below so the gate can't split
        val keep = g.groupBy(col("fp"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2 && col("nd") <= 1000)
          .select("fp")
        val gg = g.join(keep, Seq("fp"))
        val pairs = gg.select(col("fp"), col("doc_id").as("a"), col("pos").as("pa"))
          .join(gg.select(col("fp"), col("doc_id").as("b"), col("pos").as("pb")), Seq("fp"))
          .filter(col("a") < col("b"))
          .select(col("a"), col("b"), col("pa"), col("pb"),
            (col("pa") - col("pb")).as("d"))
        // maximal runs along each (a, b, diagonal): consecutive pa values
        // collapse to one island. Partition key cardinality grows with the
        // corpus; per-key rows are bounded by DOC length (SF-invariant).
        val wDiag = Window.partitionBy(col("a"), col("b"), col("d")).orderBy(col("pa"))
        val runs = pairs
          .withColumn("isl", col("pa") - row_number().over(wDiag))
          .groupBy(col("a"), col("b"), col("d"), col("isl"))
          .agg(count(lit(1)).as("run_len"))
        runs.groupBy(col("a"), col("b"))
          .agg(
            (max(col("run_len")) + lit(7)).as("max_span_tokens"),
            count(when(col("run_len") >= 5, lit(1))).as("n_runs_ge12"),
            sum(col("run_len")).as("n_window_hits"))
          .filter(col("max_span_tokens") >= 12)
          .orderBy("a", "b")
      },
      Some(s"""WITH docs AS (SELECT doc_id, ${TextQueries.wsSql} AS ws FROM documents),
              |w8 AS (SELECT doc_id, ws FROM docs WHERE len(ws) >= 8),
              |wj AS (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 8)) AS j
              |       FROM w8),
              |g AS (SELECT doc_id, j AS pos,
              |        md5(array_to_string(list_slice(ws, j + 1, j + 8), ' ')) AS fp
              |      FROM wj),
              |keep AS (SELECT fp FROM g GROUP BY fp
              |         HAVING count(DISTINCT doc_id) BETWEEN 2 AND 1000),
              |gg AS (SELECT g.* FROM g JOIN keep USING (fp)),
              |p AS (SELECT x.doc_id a, y.doc_id b, x.pos pa, y.pos pb,
              |        x.pos - y.pos AS d
              |      FROM gg x JOIN gg y ON x.fp = y.fp AND x.doc_id < y.doc_id),
              |r AS (SELECT a, b, d, pa,
              |        pa - row_number() OVER (PARTITION BY a, b, d ORDER BY pa) AS isl
              |      FROM p),
              |runs AS (SELECT a, b, d, isl, count(*) AS run_len FROM r GROUP BY 1, 2, 3, 4),
              |agg AS (SELECT a, b,
              |          CAST(max(run_len) + 7 AS BIGINT) AS max_span_tokens,
              |          count(CASE WHEN run_len >= 5 THEN 1 END) AS n_runs_ge12,
              |          CAST(sum(run_len) AS BIGINT) AS n_window_hits
              |        FROM runs GROUP BY 1, 2)
              |SELECT a, b, max_span_tokens, n_runs_ge12, n_window_hits
              |FROM agg WHERE max_span_tokens >= 12 ORDER BY a, b""".stripMargin))
  )
}
