package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Similarity
import graft.ops.Num
import QueryDef.tbl

/** Round-10 second batch: embedding-index QA — the two readouts run
  * BEFORE an embedding store is trusted for ANN/dedup at scale:
  *
  *  - q304 Matryoshka truncation quality: how much of the full-dimension
  *    top-5 neighborhood survives when vectors are truncated to their
  *    first 16 of 64 dimensions (MRL-style prefix truncation,
  *    arXiv:2205.13147) — the acceptance gate for serving shortened
  *    embeddings (4× memory/bandwidth cut) from the same index. Both
  *    arms are exact brute-force ranks over ONE shared pair relation
  *    (corpus streams once, anchors broadcast — q39's shape with two
  *    windows instead of one); overlap is an integer set intersection,
  *    so the whole readout is exact with no rounding anywhere.
  *  - q305 embedding health: per-dimension mean/std (dead-dimension
  *    screen) plus corpus anisotropy — the mean pairwise cosine of
  *    normalized vectors, computed WITHOUT any pair join via the
  *    mean-vector identity Σ_d (Σ_i x̂_id)² = Σ_ij cos(x_i, x_j): one
  *    posexplode + one 64-row rollup, O(N·d) total. High anisotropy
  *    (all vectors pointing the same way) is the classic symptom that
  *    makes raw-cosine ANN thresholds meaningless (Ethayarajh 2019).
  *
  * Determinism: per-dimension sums accumulate 12-dp-rounded terms as
  * DECIMAL (order-free, the battery's rounded-term recipe); pair
  * cosines use the ascending-index dot fold both engines share; the
  * anisotropy identity holds to rounding (documented: self-pair term
  * subtracted as exactly N), and every emitted double is Num-rounded.
  */
object Extended58 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** Truncation prefix length for q304 (first 16 of 64 dims). */
  private val TruncDim = 16

  private val normCte = EmbeddingQueries.normCte

  val all: Seq[QueryDef] = Seq(

    // ----- q304: Matryoshka truncation quality (overlap@5) -----------
    QueryDef(
      "q304_matryoshka_overlap",
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("e"))
          .withColumn("en", sqrt(Similarity.dot(col("e"), col("e"))))
          .withColumn("t", slice(col("e"), 1, TruncDim))
          .withColumn("tn", sqrt(Similarity.dot(col("t"), col("t"))))
        val q = e.filter(col("vec_id") < 10).select(
          col("vec_id").as("qid"), col("e").as("qe"), col("en").as("qen"),
          col("t").as("qt"), col("tn").as("qtn"))
        val pairs = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("cid"),
            (Similarity.dot(col("qe"), col("e")) / (col("qen") * col("en"))).as("cosf"),
            (Similarity.dot(col("qt"), col("t")) / (col("qtn") * col("tn"))).as("cost"))
        // TWO windows in one projection would defeat InferWindowGroupLimit
        // (the filter must sit directly on a single rank), leaving each
        // qid's task to SORT the whole corpus (measured: max rows per key
        // = N−1, growing 10× per decade in the doc-axis lattice sweep).
        // Ranked separately, each window carries a WindowGroupLimit that
        // keeps a 5-row heap per partition instead of a full sort; the
        // two ≤5-per-qid lists then join on (qid, cid) — identical
        // semantics (rf ≤ 5 AND rt ≤ 5), bounded plan.
        val wf = Window.partitionBy(col("qid")).orderBy(col("cosf").desc, col("cid"))
        val wt = Window.partitionBy(col("qid")).orderBy(col("cost").desc, col("cid"))
        val topF = pairs.withColumn("rf", row_number().over(wf))
          .filter(col("rf") <= 5).select(col("qid"), col("cid"))
        val topT = pairs.withColumn("rt", row_number().over(wt))
          .filter(col("rt") <= 5).select(col("qid"), col("cid"))
        val ov = topF.join(topT, Seq("qid", "cid"))
          .groupBy(col("qid")).agg(count(lit(1)).as("n_overlap"))
        q.select(col("qid"))
          .join(ov, Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
            (coalesce(col("n_overlap"), lit(0L)).cast("double") / 5.0).as("overlap_r"))
          .orderBy("qid")
      },
      Some(s"""WITH $normCte,
              |nt AS (SELECT vec_id,
              |         sqrt(sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS nrm
              |       FROM embeddings CROSS JOIN range(1, ${TruncDim + 1}) t(i) GROUP BY vec_id),
              |q AS (SELECT e.vec_id qid, e.embedding qe, n.nrm qn, nt.nrm qtn
              |      FROM embeddings e JOIN n ON n.vec_id = e.vec_id
              |      JOIN nt ON nt.vec_id = e.vec_id WHERE e.vec_id < 10),
              |c AS (SELECT e.vec_id cid, e.embedding ce, n.nrm cn, nt.nrm ctn
              |      FROM embeddings e JOIN n ON n.vec_id = e.vec_id
              |      JOIN nt ON nt.vec_id = e.vec_id),
              |d AS (SELECT qid, cid,
              |        sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) / (qn * cn) AS cosf,
              |        sum(CASE WHEN i <= $TruncDim
              |              THEN CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) ELSE 0 END)
              |          / (qtn * ctn) AS cost
              |      FROM q CROSS JOIN c CROSS JOIN range(1, 65) t(i)
              |      WHERE qid != cid GROUP BY qid, cid, qn, cn, qtn, ctn),
              |r AS (SELECT qid, cid,
              |        row_number() OVER (PARTITION BY qid ORDER BY cosf DESC, cid) AS rf,
              |        row_number() OVER (PARTITION BY qid ORDER BY cost DESC, cid) AS rt
              |      FROM d),
              |ov AS (SELECT qid, count(*) AS n_overlap FROM r
              |       WHERE rf <= 5 AND rt <= 5 GROUP BY qid)
              |SELECT q.qid,
              |  CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
              |  CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / 5.0 AS overlap_r
              |FROM q LEFT JOIN ov ON ov.qid = q.qid ORDER BY q.qid""".stripMargin)),

    // ----- q305: embedding health (per-dim stats + anisotropy) -------
    QueryDef(
      "q305_embedding_health",
      (s, dir) => {
        val dec = DecimalType(38, 12)
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("e"))
          .withColumn("en", sqrt(Similarity.dot(col("e"), col("e"))))
        val comp = e.select(col("vec_id"), col("en"),
            posexplode(col("e")).as(Seq("p0", "v")))
          .select((col("p0") + 1).as("dim"), col("v"), col("en"))
        val dims = comp.groupBy(col("dim")).agg(
          count(lit(1)).as("n"),
          sum(R(col("v"), 12).cast(dec)).as("sv"),
          sum(R(col("v") * col("v"), 12).cast(dec)).as("svv"),
          sum(R(col("v") / col("en"), 12).cast(dec)).as("su"))
        // anisotropy via the mean-vector identity: Σ_d S_d² sums cos over
        // ALL ordered pairs incl. self; subtract the N self-pairs (=N to
        // rounding) and divide by the N(N−1) cross pairs. 64-row rollup —
        // no pair join at any scale. The identity assumes a RECTANGULAR
        // embedding matrix (every dim has the same row count) — enforced:
        // ragged input raises instead of silently multiplying the
        // crossJoin below with inconsistent per-n values (ADVICE r10).
        val nn0 = col("n").cast("double")
        val aniso = dims.select(col("n"),
            R(col("su").cast("double") * col("su").cast("double"), 6)
              .cast(DecimalType(38, 6)).as("s2"))
          .agg(sum(col("s2")).cast("double").as("ssum"),
            max(col("n")).as("n"), countDistinct(col("n")).as("__nd"))
          .select(
            when(col("__nd") === 1,
              R((col("ssum") - nn0) / (nn0 * nn0 - nn0), 6))
              .otherwise(raise_error(lit(
                "q305: ragged embeddings — per-dim row counts differ")).cast("double"))
              .as("anisotropy_r"))
        val nn = col("n").cast("double")
        val mean = col("sv").cast("double") / nn
        val variance = col("svv").cast("double") / nn - mean * mean
        dims
          .crossJoin(broadcast(aniso.select(col("anisotropy_r"))))
          .select(col("dim").cast("long").as("dim"), col("n"),
            R(mean, 6).as("mean_r"),
            R(sqrt(greatest(variance, lit(0.0))), 6).as("std_r"),
            col("anisotropy_r"))
          .withColumn("dead", col("std_r") === 0.0)
          .orderBy("dim")
      },
      Some(s"""WITH $normCte,
              |comp AS (
              |  SELECT i AS dim, CAST(e.embedding[i] AS DOUBLE) AS v, n.nrm AS en
              |  FROM embeddings e JOIN n ON n.vec_id = e.vec_id
              |  CROSS JOIN range(1, 65) t(i)),
              |dims AS (
              |  SELECT dim, count(*) AS n,
              |    sum(CAST(${rs("v", 12)} AS DECIMAL(38,12))) AS sv,
              |    sum(CAST(${rs("v * v", 12)} AS DECIMAL(38,12))) AS svv,
              |    sum(CAST(${rs("v / en", 12)} AS DECIMAL(38,12))) AS su
              |  FROM comp GROUP BY dim),
              |an AS (
              |  SELECT n,
              |    CAST(sum(CAST(${rs("CAST(su AS DOUBLE) * CAST(su AS DOUBLE)", 6)} AS DECIMAL(38,6))) AS DOUBLE) AS ssum
              |  FROM dims GROUP BY n),
              |av AS (
              |  SELECT ${rs("(ssum - CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))", 6)} AS anisotropy_r
              |  FROM an)
              |SELECT CAST(dim AS BIGINT) AS dim, n,
              |  ${rs("CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS mean_r,
              |  ${rs("sqrt(greatest(CAST(svv AS DOUBLE) / CAST(n AS DOUBLE) - (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))", 6)} AS std_r,
              |  av.anisotropy_r,
              |  ${rs("sqrt(greatest(CAST(svv AS DOUBLE) / CAST(n AS DOUBLE) - (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))", 6)} = 0.0 AS dead
              |FROM dims CROSS JOIN av ORDER BY dim""".stripMargin))
  )
}
