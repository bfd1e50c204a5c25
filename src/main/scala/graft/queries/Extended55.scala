package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num
import graft.ext.{Dedup, Similarity, Text}
import QueryDef.tbl

/** Round-9 twenty-first batch: entity-resolution blocking evaluation,
  * asymmetric containment dedup, and label-noise screening —
  *
  *  - q298 blocking quality: reduction ratio (how many candidate pairs
  *    the blocking scheme prunes) and pairs completeness (how many TRUE
  *    near-dup pairs it keeps) for the first-5-token blocking key.
  *    Candidate counts come from block SIZES (Σ n·(n−1)/2 — no pair
  *    materialization), truth is q36's exact shingle-Jaccard relation;
  *    the metric pair is the standard pre-flight readout before any
  *    blocked ER run (q140/q145 USE blocking; this GRADES it).
  *  - q299 shingle containment: directed near-dup C(A→B) = |A∩B|/|A| —
  *    catches a short document contained in a longer one (quotes,
  *    excerpts, boilerplate wrappers), which symmetric Jaccard (q36)
  *    scores near 0 at large size skew. Same shared-shingle equi-join
  *    with the hot-shingle guard; direction = smaller-into-larger.
  *  - q300 label-noise screen: an embedding whose 5 nearest neighbors
  *    majority-vote a DIFFERENT label is a mislabeling suspect (the
  *    k-NN disagreement core of confident-learning pipelines). Bounded
  *    anchor batch; majority with deterministic tie-break (count desc,
  *    label asc).
  *
  * Counts are exact integers everywhere; the only divisions are final
  * ratio readouts.
  */
object Extended55 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** Containment threshold: A is "contained" when ≥ 80% of its shingles
    * appear in B.
    */
  private val ContainT = 0.8

  private val MaxAnchor = 50

  val all: Seq[QueryDef] = Seq(

    // ----- q298: blocking quality (reduction ratio / completeness) ---
    QueryDef(
      "q298_blocking_quality",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        // Ckpt (r16): keyed feeds four consumers (total, block stats, both
        // truth lookup sides) — pay the tokenize+md5 pass once
        val keyed = graft.ops.Ckpt(docs.select(col("doc_id"),
          md5(concat_ws(" ", slice(Text.tokensNorm(col("text")), 1, 5))).as("bk")))
        val tot = keyed.agg(count(lit(1)).as("n_docs"))
        val bstats = keyed.groupBy(col("bk")).agg(count(lit(1)).as("nb"))
          .agg(count(lit(1)).as("n_blocks"),
            sum(col("nb") * (col("nb") - 1) / 2).cast("long").as("n_cand_pairs"))
        val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
            maxDf = Dedup.BatteryMaxDf)
          .select(col("a_id"), col("b_id"))
        val tstats = truth
          .join(keyed.select(col("doc_id").as("a_id"), col("bk").as("ka")), "a_id")
          .join(keyed.select(col("doc_id").as("b_id"), col("bk").as("kb")), "b_id")
          .agg(count(lit(1)).as("n_true"),
            count(when(col("ka") === col("kb"), 1)).as("n_true_blocked"))
        val allPairs = col("n_docs") * (col("n_docs") - 1) / 2
        tot.crossJoin(broadcast(bstats)).crossJoin(broadcast(tstats))
          .select(col("n_docs"), col("n_blocks"), col("n_cand_pairs"),
            allPairs.cast("long").as("n_all_pairs"),
            R(lit(1.0) - col("n_cand_pairs").cast("double") /
              allPairs.cast("double"), 6).as("reduction_ratio_r"),
            col("n_true"), col("n_true_blocked"),
            R(col("n_true_blocked").cast("double") /
              col("n_true").cast("double"), 6).as("pairs_completeness_r"))
      },
      Some(s"""WITH ${TextQueries.shingleCte},
              |inter AS (
              |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS n_inter
              |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              |  GROUP BY 1, 2),
              |tp AS (
              |  SELECT a_id, b_id FROM inter
              |  JOIN sizes sa ON sa.doc_id = a_id
              |  JOIN sizes sb ON sb.doc_id = b_id
              |  WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
              |k AS (
              |  SELECT doc_id, md5(array_to_string(ws[1:5], ' ')) AS bk FROM w),
              |tot AS (SELECT count(*) AS n_docs FROM k),
              |bs AS (
              |  SELECT count(*) AS n_blocks,
              |    CAST(sum(nb * (nb - 1) / 2) AS BIGINT) AS n_cand_pairs
              |  FROM (SELECT bk, count(*) AS nb FROM k GROUP BY bk)),
              |ts AS (
              |  SELECT count(*) AS n_true,
              |    count(CASE WHEN ka.bk = kb.bk THEN 1 END) AS n_true_blocked
              |  FROM tp
              |  JOIN k ka ON ka.doc_id = tp.a_id
              |  JOIN k kb ON kb.doc_id = tp.b_id)
              |SELECT n_docs, n_blocks, n_cand_pairs,
              |  CAST(n_docs * (n_docs - 1) / 2 AS BIGINT) AS n_all_pairs,
              |  ${rs("1.0 - CAST(n_cand_pairs AS DOUBLE) / CAST(n_docs * (n_docs - 1) / 2 AS DOUBLE)", 6)} AS reduction_ratio_r,
              |  n_true, n_true_blocked,
              |  ${rs("CAST(n_true_blocked AS DOUBLE) / CAST(n_true AS DOUBLE)", 6)} AS pairs_completeness_r
              |FROM tot CROSS JOIN bs CROSS JOIN ts""".stripMargin)),

    // ----- q299: directed shingle containment ------------------------
    QueryDef(
      "q299_containment",
      (s, dir) => {
        // Hot-shingle guard, q36-style (Dedup.ngramJaccardPairs): the
        // direct self-join only runs over COLD shingles (df ≤ maxDf, so
        // O(maxDf²) pair rows per key), then candidate pairs rejoin
        // against the hot-only occurrence relation to RE-ADD hot
        // intersections — every emitted containment value is exact (the
        // oracle applies no guard), the guard only bounds recall to pairs
        // sharing at least one cold shingle.
        // Ckpt (r16): the distinct shingle relation feeds six consumers
        // (sizes, hotKeys, both cold sides, both hot sides) — pay the
        // text pass once
        val sh = graft.ops.Ckpt(
          Dedup.shingleRel(tbl(s, dir, "documents"), "doc_id", "text", 3)
            .distinct())
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val hotKeys = sh.groupBy(col("shingle")).agg(count(lit(1)).as("sdf"))
          .filter(col("sdf") > Dedup.BatteryMaxDf).select(col("shingle"))
        val cold = sh.join(hotKeys, Seq("shingle"), "left_anti")
        val hot = sh.join(hotKeys, Seq("shingle"))
        val coldPairs = cold.select(col("shingle"), col("doc_id").as("a_id"))
          .join(cold.select(col("shingle"), col("doc_id").as("b_id")), Seq("shingle"))
          .filter(col("a_id") =!= col("b_id"))
          .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_cold"))
        val hotInter = coldPairs.select(col("a_id"), col("b_id"))
          .join(hot.as("ha"), col("a_id") === col("ha.doc_id"))
          .join(hot.as("hb"),
            col("b_id") === col("hb.doc_id") && col("ha.shingle") === col("hb.shingle"))
          .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_hot"))
        val inter = coldPairs.join(hotInter, Seq("a_id", "b_id"), "left")
          .withColumn("n_inter", col("n_cold") + coalesce(col("n_hot"), lit(0L)))
          .drop("n_cold", "n_hot")
        inter
          .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("n_a")), "a_id")
          .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("n_b")), "b_id")
          .withColumn("containment",
            col("n_inter").cast("double") / col("n_a").cast("double"))
          .filter(col("containment") >= ContainT &&
            (col("n_a") < col("n_b") ||
              (col("n_a") === col("n_b") && col("a_id") < col("b_id"))))
          .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"),
            col("n_inter"), R(col("containment"), 6).as("containment_r"))
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH ${TextQueries.shingleCte},
              |inter AS (
              |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS n_inter
              |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
              |  GROUP BY 1, 2)
              |SELECT a_id, b_id, sa.n_sh AS n_a, sb.n_sh AS n_b, n_inter,
              |  ${rs("CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE)", 6)} AS containment_r
              |FROM inter
              |JOIN sizes sa ON sa.doc_id = a_id
              |JOIN sizes sb ON sb.doc_id = b_id
              |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) >= $ContainT
              |  AND (sa.n_sh < sb.n_sh OR (sa.n_sh = sb.n_sh AND a_id < b_id))
              |ORDER BY a_id, b_id""".stripMargin)),

    // ----- q300: k-NN label-noise screen -----------------------------
    QueryDef(
      "q300_label_noise",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        val nrm = emb.select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"), col("label"))
          .withColumn("nn",
            sqrt(Similarity.dot(col("embedding"), col("embedding"))))
        val q = nrm.filter(col("vec_id") < MaxAnchor).select(
          col("vec_id").as("qid"), col("embedding").as("qe"),
          col("label").as("ql"), col("nn").as("qn"))
        val c = nrm.select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("label").as("cl"), col("nn").as("cn"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("cid"))
        val knn = c.crossJoin(broadcast(q))
          .filter(col("cid") =!= col("qid"))
          .select(col("qid"), col("ql"), col("cid"), col("cl"),
            (Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
              .as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
        val votes = knn.groupBy(col("qid"), col("ql"), col("cl"))
          .agg(count(lit(1)).as("n_votes"))
        val wv = Window.partitionBy(col("qid"))
          .orderBy(col("n_votes").desc, col("cl"))
        votes.withColumn("vr", row_number().over(wv))
          .filter(col("vr") === 1)
          .select(col("qid").as("anchor_id"), col("ql").as("own_label"),
            col("cl").as("majority_label"), col("n_votes"),
            (col("ql") =!= col("cl")).cast("int").as("suspect"))
          .orderBy("anchor_id")
      },
      Some(s"""WITH n AS (
              |  SELECT vec_id,
              |    sqrt(sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS nrm
              |  FROM embeddings CROSS JOIN range(1, 65) t(i) GROUP BY vec_id),
              |q AS (
              |  SELECT e.vec_id AS qid, e.embedding AS qe, e.label AS ql, n.nrm AS qn
              |  FROM embeddings e JOIN n ON n.vec_id = e.vec_id
              |  WHERE e.vec_id < $MaxAnchor),
              |c AS (
              |  SELECT e.vec_id AS cid, e.embedding AS ce, e.label AS cl, n.nrm AS cn
              |  FROM embeddings e JOIN n ON n.vec_id = e.vec_id),
              |d AS (
              |  SELECT qid, ql, cid, cl,
              |    sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) / (qn * cn) AS cos
              |  FROM q CROSS JOIN c CROSS JOIN range(1, 65) t(i)
              |  WHERE qid != cid GROUP BY qid, ql, cid, cl, qn, cn),
              |knn AS (
              |  SELECT * FROM (
              |    SELECT qid, ql, cid, cl,
              |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
              |    FROM d) WHERE rn <= 5),
              |votes AS (
              |  SELECT qid, ql, cl, count(*) AS n_votes
              |  FROM knn GROUP BY qid, ql, cl),
              |maj AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY qid ORDER BY n_votes DESC, cl) AS vr
              |  FROM votes)
              |SELECT qid AS anchor_id, ql AS own_label, cl AS majority_label,
              |  n_votes, CASE WHEN ql <> cl THEN 1 ELSE 0 END AS suspect
              |FROM maj WHERE vr = 1
              |ORDER BY anchor_id""".stripMargin))
  )
}
