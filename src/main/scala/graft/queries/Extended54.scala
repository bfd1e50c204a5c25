package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num
import graft.ext.Similarity
import QueryDef.tbl

/** Round-9 twentieth batch: contrastive triplet mining — the
  * training-data op behind embedding-model fine-tuning (anchor,
  * positive, HARD negative). The positive is the nearest same-label
  * vector; the hard negative is the nearest DIFFERENT-label vector —
  * the near-boundary sample that makes contrastive losses learn
  * (random negatives are trivially separated and contribute ~zero
  * gradient). The margin pos−neg is the per-anchor difficulty readout.
  *
  * Shape: one corpus×anchors broadcast pass (anchors bounded, q39's
  * contract), ONE window partitioned by (anchor, same-label?) so both
  * ranks come from a single evaluation of the cosine relation, then a
  * conditional pivot to one row per anchor. An anchor whose label has
  * no second member keeps a NULL positive (deterministic on both
  * engines). Cosines use the battery's ascending-index dot/norm shape
  * (q39/q40/q41's hash-stable recipe).
  */
object Extended54 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** Anchor bound — the mining batch (production mines in batches too;
    * the corpus side streams whole).
    */
  private val MaxAnchor = 20

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q297_triplet_mining",
      (s, dir) => {
        val emb = tbl(s, dir, "embeddings")
        // float→double cast FIRST: vec_dot (codegen) takes array<double>,
        // and the per-element double cast is the same shape the oracle's
        // CAST(embedding[i] AS DOUBLE) applies
        val nrm = emb.select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"),
            col("label"))
          .withColumn("nn",
            sqrt(Similarity.dot(col("embedding"), col("embedding"))))
        val q = nrm.filter(col("vec_id") < MaxAnchor).select(
          col("vec_id").as("qid"), col("embedding").as("qe"),
          col("label").as("ql"), col("nn").as("qn"))
        val c = nrm.select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("label").as("cl"), col("nn").as("cn"))
        val cos = c.crossJoin(broadcast(q))
          .filter(col("cid") =!= col("qid"))
          .select(col("qid"), col("ql"), col("cid"), col("cl"),
            (col("cl") === col("ql")).cast("int").as("same"),
            (Similarity.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
              .as("cos"))
        val w = Window.partitionBy(col("qid"), col("same"))
          .orderBy(col("cos").desc, col("cid"))
        val top = cos.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val posCos = max(when(col("same") === 1, col("cos")))
        val negCos = max(when(col("same") === 0, col("cos")))
        top.groupBy(col("qid"), col("ql")).agg(
            max(when(col("same") === 1, col("cid"))).as("pos_id"),
            R(posCos, 4).as("pos_cos_r"),
            max(when(col("same") === 0, col("cid"))).as("neg_id"),
            max(when(col("same") === 0, col("cl"))).as("neg_label"),
            R(negCos, 4).as("neg_cos_r"),
            R(posCos - negCos, 4).as("margin_r"))
          .select(col("qid").as("anchor_id"), col("ql").as("anchor_label"),
            col("pos_id"), col("pos_cos_r"), col("neg_id"), col("neg_label"),
            col("neg_cos_r"), col("margin_r"))
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
              |    CASE WHEN cl = ql THEN 1 ELSE 0 END AS same,
              |    sum(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)) / (qn * cn) AS cos
              |  FROM q CROSS JOIN c CROSS JOIN range(1, 65) t(i)
              |  WHERE qid != cid GROUP BY qid, ql, cid, cl, qn, cn),
              |r AS (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY qid, same ORDER BY cos DESC, cid) AS rn
              |  FROM d)
              |SELECT qid AS anchor_id, ql AS anchor_label,
              |  MAX(CASE WHEN same = 1 THEN cid END) AS pos_id,
              |  ${rs("MAX(CASE WHEN same = 1 THEN cos END)", 4)} AS pos_cos_r,
              |  MAX(CASE WHEN same = 0 THEN cid END) AS neg_id,
              |  MAX(CASE WHEN same = 0 THEN cl END) AS neg_label,
              |  ${rs("MAX(CASE WHEN same = 0 THEN cos END)", 4)} AS neg_cos_r,
              |  ${rs("MAX(CASE WHEN same = 1 THEN cos END) - MAX(CASE WHEN same = 0 THEN cos END)", 4)} AS margin_r
              |FROM r WHERE rn = 1
              |GROUP BY qid, ql
              |ORDER BY anchor_id""".stripMargin))
  )
}
