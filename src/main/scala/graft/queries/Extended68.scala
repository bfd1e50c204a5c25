package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Similarity}
import graft.ops.Num
import QueryDef.tbl

/** Round-13 batch: the persisted-index SERVE paths and sampled-train
  * SemDeDup — the three artifacts that turn the round-12 weak-list
  * justification ("production amortizes the N^1.5 index build") from
  * prose into measured, hash-gated queries.
  *
  * q324 serves IVF-Flat top-k from a PERSISTED index (q323's
  * sampled-train recipe, built once per fixture per JVM by
  * [[IvfIndex.Cache]] and written to parquet): probe → partition-pruned
  * candidate scan → exact top-k. No training, no corpus-wide assignment,
  * no full-corpus scan in the plan — the steady-state cost a 100 TB
  * deployment pays per query batch. Bench takes the min over reps, so
  * rep 1 absorbs the memoized build and the recorded time is the pure
  * serve path.
  *
  * q325 is SemDeDup with SAMPLED k-means training (`semanticDedup`'s
  * `trainOn`, mirroring q323's recipe for the IVF family): training cost
  * drops from the full-corpus O(N^1.5) Lloyd to O(N) on a ~4√N sample,
  * leaving exactly the two terms that are the EXACT-SemDeDup optimum
  * (one N×√N assignment pass + within-cell pairs). Decision table
  * hash-gated end to end like q111.
  *
  * q326 serves IVF+PQ ADC top-k from the SAME persisted index (inverted
  * lists carry PQ codes inline; codebook persisted alongside): probe →
  * LUT → code-only candidate scoring → exact rerank of the short list.
  * The candidate scan touches nSub bytes per vector, never floats — the
  * billion-vector serving plan (q310) with the build actually excluded.
  *
  * q327 isolates SemDeDup's RECURRING term — within-cell pairs + CC +
  * min-id keeper over the persisted inverted file alone — completing the
  * measured decomposition (BENCH_SF1, sf10: 343 s full-corpus-trained →
  * 151 s sampled-train → 16 s persisted-assignment).
  */
object Extended68 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** The SemDeDup pair/CC/keeper tail — within-cell pairs over
    * `assignRel` (a (cid, cent_id) assignment CTE), threshold 0.4, the
    * recursive-CTE components, min-id keeper over the full id universe —
    * shared by q325/q327 (`a_f`, the sampled-train assignment) and the
    * refreshed-index q331 (`a3`, the union assigned against the
    * old-trained quantizer). Assumes `c` (cid, ce, cn) defined and the
    * surrounding WITH declared RECURSIVE.
    */
  private[queries] def semDedupTailSql(assignRel: String): String =
    s"""pr AS (SELECT x.cid a_id, y.cid b_id,
       |         sum(CAST(cx.ce[i] AS DOUBLE) * CAST(cy.ce[i] AS DOUBLE)) / (cx.cn * cy.cn) AS cos
       |       FROM $assignRel x JOIN $assignRel y ON x.cent_id = y.cent_id AND x.cid < y.cid
       |       JOIN c cx ON cx.cid = x.cid
       |       JOIN c cy ON cy.cid = y.cid
       |       CROSS JOIN range(1, 65) t(i)
       |       GROUP BY x.cid, y.cid, cx.cn, cy.cn),
       |p AS (SELECT a_id, b_id FROM pr WHERE cos >= 0.4),
       |e AS (SELECT a_id AS src, b_id AS dst FROM p
       |      UNION SELECT b_id, a_id FROM p),
       |r AS (SELECT src AS node, dst AS reach FROM e
       |      UNION
       |      SELECT r.node, e.dst AS reach FROM r JOIN e ON r.reach = e.src),
       |cl AS (SELECT node, least(node, min(reach)) AS cluster_id FROM r GROUP BY node)
       |SELECT em.vec_id AS id,
       |       coalesce(cl.cluster_id, em.vec_id) AS cluster_id,
       |       em.vec_id = coalesce(cl.cluster_id, em.vec_id) AS keep
       |FROM embeddings em LEFT JOIN cl ON cl.node = em.vec_id
       |ORDER BY id""".stripMargin

  /** q325's full oracle — and q327's, verbatim: the persisted inverted
    * file IS the sampled-train assignment written to parquet (exact IEEE
    * round-trip), and the pair/CC/keeper stages are identical, so the
    * served decision table equals the lazy one by construction.
    */
  private[queries] val sampledSemDedupOracleSql: String =
    s"""WITH RECURSIVE ${EmbeddingQueries.normCte},
       |c AS (SELECT e.vec_id cid, e.embedding ce, n.nrm cn
       |      FROM embeddings e JOIN n ON n.vec_id = e.vec_id),
       |st AS (SELECT greatest(1, CAST(round(sqrt(count(*))) AS BIGINT)) AS sv,
       |         greatest(1, count(*) //
       |           (4 * greatest(1, CAST(round(sqrt(count(*))) AS BIGINT)))) AS tv
       |       FROM embeddings),
       |cs AS (SELECT * FROM c WHERE cid % (SELECT tv FROM st) = 0),
       |cent0 AS (SELECT cid AS cent_id, CAST(ce AS DOUBLE[]) AS cent_e, cn AS cent_n
       |          FROM c WHERE cid % (SELECT sv FROM st) = 0),
       |${EmbeddingQueries.lloydIter("cent0", "a1", "m1", "cent1", rel = "cs")},
       |d_f AS (SELECT cid, cent_id,
       |          sum(CAST(ce[i] AS DOUBLE) * cent_e[i]) / (cn * cent_n) AS d
       |        FROM c CROSS JOIN cent1 CROSS JOIN range(1, 65) t(i)
       |        GROUP BY cid, cent_id, cn, cent_n),
       |a_f AS (SELECT cid, cent_id FROM (
       |          SELECT cid, cent_id,
       |            row_number() OVER (PARTITION BY cid ORDER BY d DESC, cent_id) rnk
       |          FROM d_f) WHERE rnk = 1),
       |${semDedupTailSql("a_f")}""".stripMargin

  /** The IVF+PQ ADC serve tail (probe `cent1` → per-query LUT over the
    * codebook → code-only candidate scoring over `a3` → exact rerank of
    * the top-5), shared by q326 and the refreshed-index q329 — they
    * differ ONLY in `codebookPred`, the sub-corpus the persisted codebook
    * was derived from (q326: the whole corpus, TRUE; q329: the pre-delta
    * 90%, whose N also sizes the N/64 code stride). Assumes the build
    * CTEs already defined (c, q, cent1, a3).
    */
  private[queries] def pqAdcServeTailSql(codebookPred: String): String =
    pqAdcServeTailSqlFor(codebookPred, nSub = 4, subDim = 16, nCodewords = 64)

  /** [[pqAdcServeTailSql]] with the PQ geometry as parameters — the
    * resolution lever q334 sweeps (256 codewords × nSub=8: finer codes,
    * real within-cluster ADC rank resolution). nSub × subDim must equal
    * the embedding dim (64).
    */
  private[queries] def pqAdcServeTailSqlFor(
      codebookPred: String, nSub: Int, subDim: Int, nCodewords: Int): String =
    s"""${adcProbeCtes},
       |cst AS (SELECT greatest(1, count(*) // $nCodewords) AS sv FROM embeddings
       |        WHERE $codebookPred),
       |cb AS (SELECT vec_id AS code_id, embedding AS cbe
       |       FROM embeddings
       |       WHERE ($codebookPred) AND vec_id % (SELECT sv FROM cst) = 0),
       |${adcScoreTailSqlFor(nSub, subDim)}""".stripMargin

  /** The ADC probe stage (nProbe=3 over `cent1`) — split out so the
    * codebook CTE between probe and scoring is pluggable: q326/q329 read
    * strided-sample codewords; q332 plugs per-subspace-TRAINED codewords
    * ([[Extended70.trainedCbCtes]]) into the same scoring tail.
    */
  private[queries] val adcProbeCtes: String =
    s"""dp AS (SELECT qid, cent_id,
       |         sum(CAST(qe[i] AS DOUBLE) * cent_e[i]) / (qn * cent_n) AS d
       |       FROM q CROSS JOIN cent1 CROSS JOIN range(1, 65) t(i)
       |       GROUP BY qid, cent_id, qn, cent_n),
       |probe AS (SELECT qid, cent_id FROM (
       |            SELECT qid, cent_id,
       |              row_number() OVER (PARTITION BY qid ORDER BY d DESC, cent_id) rnk
       |            FROM dp) WHERE rnk <= 3)""".stripMargin

  /** Encode + LUT + ADC + rerank against whatever `cb` (code_id, cbe) the
    * caller's CTEs defined — [[pqAdcServeTailSql]]'s scoring stages,
    * verbatim.
    */
  private[queries] val adcScoreTailSql: String = adcScoreTailSqlFor(4, 16)

  private[queries] def adcScoreTailSqlFor(nSub: Int, subDim: Int): String =
    s"""pd AS (SELECT v.vec_id, sp.s, cb.code_id,
       |         sum((CAST(v.embedding[sp.s*$subDim + i] AS DOUBLE) -
       |              CAST(cb.cbe[sp.s*$subDim + i] AS DOUBLE)) *
       |             (CAST(v.embedding[sp.s*$subDim + i] AS DOUBLE) -
       |              CAST(cb.cbe[sp.s*$subDim + i] AS DOUBLE))) AS d2
       |       FROM embeddings v
       |       CROSS JOIN range(0, $nSub) sp(s)
       |       CROSS JOIN cb
       |       CROSS JOIN range(1, ${subDim + 1}) t(i)
       |       GROUP BY v.vec_id, sp.s, cb.code_id),
       |codes AS (SELECT vec_id, s, code_id FROM (
       |            SELECT vec_id, s, code_id,
       |              row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code_id) rnk
       |            FROM pd) WHERE rnk = 1),
       |lut AS (SELECT q.qid, sp.s, cb.code_id,
       |          sum(CAST(q.qe[sp.s*$subDim + i] AS DOUBLE) *
       |              CAST(cb.cbe[sp.s*$subDim + i] AS DOUBLE)) AS v
       |        FROM q CROSS JOIN range(0, $nSub) sp(s) CROSS JOIN cb
       |        CROSS JOIN range(1, ${subDim + 1}) t(i)
       |        GROUP BY q.qid, sp.s, cb.code_id),
       |cand AS (SELECT p.qid, a.cid
       |         FROM probe p JOIN a3 a USING (cent_id) WHERE a.cid != p.qid),
       |adc AS (SELECT cd.qid, cd.cid,
       |          CAST(sum(CAST(l.v AS DECIMAL(38,18))) AS DOUBLE) AS adc
       |        FROM cand cd
       |        JOIN codes co ON co.vec_id = cd.cid
       |        JOIN lut l ON l.qid = cd.qid AND l.s = co.s AND l.code_id = co.code_id
       |        GROUP BY cd.qid, cd.cid),
       |r AS (SELECT qid, cid, adc,
       |        row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS rn
       |      FROM adc),
       |x AS (SELECT r.qid, r.cid, r.rn, r.adc,
       |        sum(CAST(q.qe[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)) / (q.qn * c.cn) AS cos
       |      FROM r JOIN q USING (qid) JOIN c ON c.cid = r.cid
       |      CROSS JOIN range(1, 65) t(i)
       |      WHERE r.rn <= 5
       |      GROUP BY r.qid, r.cid, r.rn, r.adc, q.qn, c.cn)
       |SELECT qid, cid, rn, ${rs("adc", 4)} AS adc_r, ${rs("cos", 4)} AS cos_r
       |FROM x ORDER BY qid, rn""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // ----- q324: persisted-index IVF-Flat serve -------------------------
    // Oracle = q323's, verbatim: the persisted artifacts are the SAME
    // deterministic pipeline written to parquet (exact IEEE round-trip),
    // so serve-from-disk must return the identical relation — any
    // divergence between the persisted and the lazy index is a hash
    // mismatch here.
    QueryDef(
      "q324_ivf_persisted_serve",
      (s, dir) => {
        val ix = IvfIndex.Cache.indexFor(s, dir)
        val emb = tbl(s, dir, "embeddings")
        IvfIndex
          .serveTopK(s, ix, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, nProbe = 3)
          .select(col("qid"), col("cid"), col("rn"), R(col("cos"), 4).as("cos_r"))
          .orderBy("qid", "rn")
      },
      Some(EmbeddingQueries.sampledTrainIvfOracleSql)),

    // ----- q325: SemDeDup with sampled k-means training -----------------
    // q111 re-parameterized onto the production training recipe: same √N
    // cells, same threshold, same CC resolution, but Lloyd runs on a
    // deterministic ~4√N sample (vec_id % (N div 4√N) = 0) — training is
    // O(N) instead of O(N^1.5). The oracle substitutes the sample
    // relation into the shared Lloyd CTE exactly as q323's does; sample
    // choice, degenerate-cell drops, means, assignment, pairing, and the
    // recursive-CTE components all sit under the hash gate at every SF.
    QueryDef(
      "q325_semdedup_sampled",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        val n = graft.Tables.cachedCount(s, dir, "embeddings")
        val stride = Similarity.sqrtStride(n)
        val trainStride = math.max(1L, n / (4L * stride))
        Similarity
          .semanticDedup(emb, "vec_id", "embedding",
            stride = stride, trainIters = 1, threshold = 0.4,
            trainOn = Some(emb.filter(pmod(col("vec_id"), lit(trainStride)) === 0)))
          .orderBy("id")
      },
      Some(sampledSemDedupOracleSql)),

    // ----- q326: persisted-index IVF+PQ ADC serve -----------------------
    // q310's serving composition against the PERSISTED index: same ADC
    // math (nSub=4 × subDim=16 LUT lookups, DECIMAL-accumulated sum, id
    // tie-breaks, exact rerank of the top-5), but the coarse quantizer is
    // the sampled-TRAINED cent1 (q323's build — q310 probes raw seeds)
    // and every artifact the plan reads is parquet written once by the
    // build. The oracle unrolls build + encode + probe + LUT + ADC +
    // rerank in SQL; the doubles match bit-for-bit.
    QueryDef(
      "q326_ivfpq_persisted_serve",
      (s, dir) => {
        val ix = IvfIndex.Cache.indexFor(s, dir)
        val emb = tbl(s, dir, "embeddings")
        IvfIndex
          .servePqTopK(s, ix, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, nSub = IvfIndex.Cache.nSub, subDim = IvfIndex.Cache.subDim,
            nProbe = 3)
          .select(col("qid"), col("cid"), col("rn"),
            R(col("adc"), 4).as("adc_r"), R(col("cos"), 4).as("cos_r"))
          .orderBy("qid", "rn")
      },
      Some(s"""${EmbeddingQueries.sampledTrainBuildCtes},
              |${pqAdcServeTailSql("TRUE")}""".stripMargin)),

    // ----- q327: SemDeDup pair term served from the persisted assignment
    // The last piece of the SemDeDup cost decomposition, each now a
    // hash-gated query: TRAIN is O(N) on a sample (q325), ASSIGN is one
    // N x sqrtN pass paid at index build (q324's persisted artifact), and
    // THIS is the recurring term — within-cell exact pairs + connected
    // components + min-id keeper over the inverted file alone, the N^1.5
    // floor any exact SemDeDup re-pays per corpus refresh. No training
    // and no assignment anywhere in the plan; the corpus table is read
    // only as an id-column scan for the decision-table universe. Oracle =
    // q325's verbatim (the persisted inverted file IS the sampled-train
    // assignment, parquet round-trips IEEE doubles exactly).
    QueryDef(
      "q327_semdedup_persisted_serve",
      (s, dir) => {
        val ix = IvfIndex.Cache.indexFor(s, dir)
        IvfIndex
          .serveSemDedup(s, ix, tbl(s, dir, "embeddings"), "vec_id", threshold = 0.4)
          .orderBy("id")
      },
      Some(sampledSemDedupOracleSql))
  )
}
