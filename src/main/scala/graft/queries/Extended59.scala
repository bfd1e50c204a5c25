package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.ops.Num
import QueryDef.tbl

/** Round-10 third batch: leakage-safe dataset splitting — q306 assigns
  * train/val/test by hashing the NEAR-DUP CLUSTER id, not the document
  * (q66's per-doc content hash can put two near-verbatim copies of one
  * document on both sides of the train/eval boundary, which is exactly
  * the contamination that inflates eval numbers). Pipeline: exact
  * shingle-Jaccard pairs (q36's guarded join) → connected components
  * (q70's label propagation) → singletons keep their own id → split =
  * first hex byte of md5(cluster id) at ~80/10/10 ('cc'=204/256,
  * 'e6'=230/256). The readout reports, per split, docs / clusters /
  * clustered docs, plus the corpus-wide leakage counter — near-dup
  * pairs whose endpoints landed in DIFFERENT splits — which is ZERO BY
  * CONSTRUCTION and sits in-row under the hash gate, so the invariant
  * is oracle-verified, not just asserted.
  *
  * Scale shape: everything is q36/q70's bounded machinery plus one
  * broadcast scalar; the split hash is map-side. Counts are exact
  * integers — no rounding anywhere.
  */
object Extended59 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q306_leakage_safe_split",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        // materialize the (expensive) pair plan ONCE — both the
        // component build and the leakage audit read it
        val pairs = graft.ops.Ckpt(Dedup.ngramJaccardPairs(
          docs, "doc_id", "text", 3, 0.5, maxDf = Dedup.BatteryMaxDf)
          .select(col("a_id"), col("b_id")))
        val comp = Dedup.connectedComponents(pairs)
        val assigned = docs.select(col("doc_id"))
          .join(comp.withColumnRenamed("cluster_id", "cl"), Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cl"), col("doc_id")))
          .drop("cl")
        val h = md5(col("cluster_id").cast("string"))
        // Ckpt (r16): out feeds FOUR consumers (both leak lookup sides,
        // the cluster-size rollup, the final per-split rollup) — each
        // would replay the docs⋈components join otherwise
        val out = graft.ops.Ckpt(assigned.withColumn("split",
          when(h < "cc", "train").when(h < "e6", "val").otherwise("test")))
        val leak = pairs
          .join(out.select(col("doc_id").as("a_id"), col("split").as("sa")), "a_id")
          .join(out.select(col("doc_id").as("b_id"), col("split").as("sb")), "b_id")
          .agg(count(lit(1)).as("n_dup_pairs"),
            count(when(col("sa") =!= col("sb"), 1)).as("n_leaked_pairs"))
        // a doc "is clustered" when its cluster has ≥2 members (the
        // representative keeps cluster_id = its own id, so id≠cluster
        // would undercount by one per cluster)
        val csize = out.groupBy(col("cluster_id")).agg(count(lit(1)).as("csz"))
        out.join(csize, "cluster_id")
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("cluster_id")).as("n_clusters"),
            count(when(col("csz") >= 2, 1)).as("n_clustered_docs"))
          .crossJoin(broadcast(leak))
          .orderBy("split")
      },
      Some(s"""WITH RECURSIVE ${TextQueries.shingleCte},
              |inter AS (
              |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS n_inter
              |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              |  GROUP BY 1, 2),
              |p AS (SELECT a_id, b_id FROM inter
              |      JOIN sizes sa ON sa.doc_id = a_id
              |      JOIN sizes sb ON sb.doc_id = b_id
              |      WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
              |e AS (SELECT a_id AS src, b_id AS dst FROM p
              |      UNION SELECT b_id, a_id FROM p),
              |r AS (SELECT src AS node, dst AS reach FROM e
              |      UNION
              |      SELECT r.node, e.dst AS reach FROM r JOIN e ON r.reach = e.src),
              |comp AS (SELECT node AS doc_id, least(node, min(reach)) AS cluster_id
              |         FROM r GROUP BY node),
              |asg AS (
              |  SELECT d.doc_id, coalesce(comp.cluster_id, d.doc_id) AS cluster_id
              |  FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id),
              |spl AS (
              |  SELECT doc_id, cluster_id,
              |    CASE WHEN md5(CAST(cluster_id AS VARCHAR)) < 'cc' THEN 'train'
              |         WHEN md5(CAST(cluster_id AS VARCHAR)) < 'e6' THEN 'val'
              |         ELSE 'test' END AS split
              |  FROM asg),
              |leak AS (
              |  SELECT count(*) AS n_dup_pairs,
              |    count(CASE WHEN a.split <> b.split THEN 1 END) AS n_leaked_pairs
              |  FROM p JOIN spl a ON a.doc_id = p.a_id
              |         JOIN spl b ON b.doc_id = p.b_id),
              |cs AS (SELECT cluster_id, count(*) AS csz FROM spl GROUP BY cluster_id)
              |SELECT split, count(*) AS n_docs,
              |  count(DISTINCT spl.cluster_id) AS n_clusters,
              |  count(CASE WHEN cs.csz >= 2 THEN 1 END) AS n_clustered_docs,
              |  leak.n_dup_pairs, leak.n_leaked_pairs
              |FROM spl JOIN cs ON cs.cluster_id = spl.cluster_id CROSS JOIN leak
              |GROUP BY split, leak.n_dup_pairs, leak.n_leaked_pairs
              |ORDER BY split""".stripMargin)),

    // ----- q307: cross-source duplication matrix ---------------------
    // WHERE duplication comes from: near-dup pairs rolled up by
    // (source_a, source_b) — the provenance readout that separates
    // within-crawl boilerplate (diagonal) from one feed mirroring
    // another (off-diagonal), which decides whether to drop a SOURCE
    // rather than dedup document-by-document. Same guarded q36 pair
    // machinery + two source lookups; unordered source pairs are
    // canonicalized least/greatest so the matrix is upper-triangular.
    // Exact integer counts; share_r is one final rounded division
    // against the broadcast pair total.
    QueryDef(
      "q307_source_dup_matrix",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val pairs = Dedup.ngramJaccardPairs(
          docs, "doc_id", "text", 3, 0.5, maxDf = Dedup.BatteryMaxDf)
          .select(col("a_id"), col("b_id"))
        val src = docs.select(col("doc_id"), col("source"))
        // Ckpt (r16): keyed feeds the total agg AND the matrix rollup —
        // without it the whole guarded pair generation ran twice
        val keyed = graft.ops.Ckpt(pairs
          .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), "a_id")
          .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), "b_id")
          .select(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b")))
        val tot = keyed.agg(count(lit(1)).as("n_total"))
        keyed.groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .crossJoin(broadcast(tot))
          .select(col("source_a"), col("source_b"), col("n_pairs"),
            (col("source_a") =!= col("source_b")).as("is_cross"),
            R(col("n_pairs").cast("double") / col("n_total").cast("double"), 6)
              .as("share_r"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH ${TextQueries.shingleCte},
              |inter AS (
              |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS n_inter
              |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              |  GROUP BY 1, 2),
              |p AS (SELECT a_id, b_id FROM inter
              |      JOIN sizes sa ON sa.doc_id = a_id
              |      JOIN sizes sb ON sb.doc_id = b_id
              |      WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
              |keyed AS (
              |  SELECT least(da.source, db.source) AS source_a,
              |         greatest(da.source, db.source) AS source_b
              |  FROM p JOIN documents da ON da.doc_id = p.a_id
              |         JOIN documents db ON db.doc_id = p.b_id),
              |tot AS (SELECT count(*) AS n_total FROM keyed)
              |SELECT source_a, source_b, count(*) AS n_pairs,
              |  source_a <> source_b AS is_cross,
              |  ${rs("CAST(count(*) AS DOUBLE) / CAST(tot.n_total AS DOUBLE)", 6)} AS share_r
              |FROM keyed CROSS JOIN tot
              |GROUP BY source_a, source_b, tot.n_total
              |ORDER BY source_a, source_b""".stripMargin))
  )
}
