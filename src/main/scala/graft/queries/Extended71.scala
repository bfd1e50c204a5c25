package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ext.IvfIndex
import graft.ops.Num
import QueryDef.tbl

/** Round-16 batch: the two lifecycle levers the round-15 verdict ranked —
  * the PQ RESOLUTION axis (q334) and REBUILD as a first-class operator
  * (q335/q336).
  *
  * q334: the battery's production PQ config (64 codewords × nSub=4,
  * q125's oracle-pinned rule) demonstrates compression but not ranking —
  * raw ADC tie-saturates within a cluster (pre-rerank recall 0.012,
  * BENCH_SF1 r15). The standard FAISS geometry (256 codewords × nSub=8 ×
  * subDim=8, i.e. 8-bit codes) is the lever that buys within-cluster
  * rank resolution; q334 hash-gates the whole hi-res path (build, encode,
  * LUT, ADC, rerank) and BenchRecall sweeps the axis.
  *
  * q335/q336: the monitor's rebuild trigger (q330's imbalance_r) finally
  * has a callable target — [[graft.ext.IvfIndex.rebuild]] retrains on the
  * accumulated corpus read from the index's own inverted file, rebuilds
  * the pairs artifact at its baked threshold, and swaps everything in
  * under the crash-recovery marker. The gate is an IDENTITY: build(90%) →
  * refresh(10%) → rebuild must serve exactly like a FRESH build on the
  * full corpus (rebuild re-derives √N'/4√N'/N'/64 from the union count,
  * and the invfile round-trips every vector bit-exactly), so q335 reuses
  * q324's oracle verbatim and q336 reuses q327's — any rebuild defect
  * (stale parameterization, re-encoded codes against the wrong codebook,
  * a pairs set carried over instead of rebuilt) is a hash mismatch.
  */
object Extended71 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)

  /** q334's oracle: the sampled-train build (coarse quantizer unchanged)
    * + the ADC tail at the hi-res geometry.
    */
  private val hiResOracleSql: String = {
    val tail = Extended68.pqAdcServeTailSqlFor("TRUE",
      nSub = IvfIndex.Cache.nSubHi, subDim = IvfIndex.Cache.subDimHi,
      nCodewords = IvfIndex.Cache.nCodewordsHi)
    s"""${EmbeddingQueries.sampledTrainBuildCtes},
       |$tail""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    // ----- q334: hi-resolution PQ ADC serve (256 codewords × nSub=8) ----
    // Same persisted ADC serve plan as q326; only the PQ geometry
    // changes. The oracle re-derives the strided codebook at N/256 and
    // replays encode + LUT + ADC + rerank at the 8×8 geometry — the
    // parameterized twin of q326's CTE tail.
    QueryDef(
      "q334_pq_hires_adc_serve",
      (s, dir) => {
        val ix = IvfIndex.Cache.hiResIndexFor(s, dir)
        val emb = tbl(s, dir, "embeddings")
        IvfIndex
          .servePqTopK(s, ix, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, nSub = IvfIndex.Cache.nSubHi, subDim = IvfIndex.Cache.subDimHi,
            nProbe = 3)
          .select(col("qid"), col("cid"), col("rn"),
            R(col("adc"), 4).as("adc_r"), R(col("cos"), 4).as("cos_r"))
          .orderBy("qid", "rn")
      },
      Some(hiResOracleSql)),

    // ----- q335: IVF-Flat serve after a full REBUILD ---------------------
    // The lifecycle's close: the rebuilt index must be indistinguishable
    // from a fresh build on the accumulated corpus — q324's oracle,
    // verbatim. The serve plan reads ONLY post-swap artifacts, so a swap
    // that left any component stale (old centroids with new lists, old
    // codebook, leftover staging) mismatches here.
    QueryDef(
      "q335_rebuild_serve",
      (s, dir) => {
        val ix = IvfIndex.Cache.rebuiltIndexFor(s, dir)
        val emb = tbl(s, dir, "embeddings")
        IvfIndex
          .serveTopK(s, ix, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 5, nProbe = 3)
          .select(col("qid"), col("cid"), col("rn"), R(col("cos"), 4).as("cos_r"))
          .orderBy("qid", "rn")
      },
      Some(EmbeddingQueries.sampledTrainIvfOracleSql)),

    // ----- q336: SemDeDup pairs artifact after a full REBUILD -----------
    // rebuild must also RE-DERIVE the pairs artifact (the old set's cells
    // no longer exist; carrying it over would mix quantizer generations).
    // Serving the decision table from the rebuilt pairs/ alone must equal
    // from-scratch SemDeDup on the full corpus at the baked threshold —
    // q327's oracle, verbatim.
    QueryDef(
      "q336_rebuild_pairs_serve",
      (s, dir) => {
        val ix = IvfIndex.Cache.rebuiltIndexFor(s, dir)
        IvfIndex
          .serveSemDedupFromPairs(s, ix, tbl(s, dir, "embeddings"), "vec_id")
          .orderBy("id")
      },
      Some(Extended68.sampledSemDedupOracleSql))
  )
}
