package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-11 batch 6: q321 — BPE ENCODE of the corpus with the trained
  * merges. q52 counts BPE-ish regex tokens and q147 TRAINS merges; the
  * missing tokenizer half is applying a learned merge table to every
  * document — the op that turns a corpus into model input. Correctness
  * rests on the rank-order theorem: merge k's output symbol can only
  * participate in merges learned AFTER k, so applying the merge list in
  * rank order (each greedily left-to-right, q147's fold) reproduces the
  * iterative lowest-rank-present encode exactly.
  *
  * The per-doc readout carries md5 of the full encoded subword stream in
  * token order, so the ENTIRE encoding — segmentation, order, subword
  * boundaries — sits under the hash gate, not just compression counts.
  *
  * Scale shape: training runs on the vocabulary relation (Heaps-
  * sublinear, Ckpt'd once — q147's plan); the encode is ONE keyed
  * equi-join token→vocabulary (NOT broadcast: word types grow with the
  * corpus) followed by a doc-keyed rollup. No stage is quadratic.
  */
object Extended66 {

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q321_bpe_encode",
      (s, dir) => {
        val (_, vocab) = Extended9.bpeTrainLoop(s, dir)
        val toks = tbl(s, dir, "documents")
          .select(col("doc_id"), posexplode(Text.tokensNorm(col("text"))).as(Seq("j", "t")))
          .filter(col("t").rlike("^[a-z]+$"))
        val enc = toks.join(vocab.select(col("w"), col("syms")), col("t") === col("w"))
        enc.groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_alpha_tokens"),
            sum(size(col("syms"))).as("n_subwords"),
            md5(concat_ws(" ", flatten(transform(
              array_sort(collect_list(struct(col("j"), col("syms")))),
              x => x.getField("syms"))))).as("encoded_fp"))
          .withColumn("ratio_r", Num.roundTo(
            col("n_subwords").cast("double") / col("n_alpha_tokens").cast("double"), 6))
          .select(col("doc_id"), col("n_alpha_tokens"), col("n_subwords"),
            col("ratio_r"), col("encoded_fp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${Extended9.bpeCtes},
              |docs AS (SELECT doc_id, ${TextQueries.wsSql} AS ws FROM documents),
              |tp AS (SELECT doc_id, j, ws[j] AS t
              |       FROM docs, unnest(generate_series(1, len(ws))) u(j)),
              |ta AS (SELECT doc_id, j, t FROM tp WHERE regexp_full_match(t, '[a-z]+')),
              |enc AS (SELECT a.doc_id, a.j, sf.syms
              |        FROM ta a JOIN s${Extended9.BpeIters} sf ON sf.w = a.t),
              |agg AS (SELECT doc_id,
              |          count(*) AS n_alpha_tokens,
              |          CAST(sum(len(syms)) AS BIGINT) AS n_subwords,
              |          md5(string_agg(array_to_string(syms, ' '), ' ' ORDER BY j))
              |            AS encoded_fp
              |        FROM enc GROUP BY doc_id)
              |SELECT doc_id, n_alpha_tokens, n_subwords,
              |  ${Num.roundSql("CAST(n_subwords AS DOUBLE) / CAST(n_alpha_tokens AS DOUBLE)", 6)}
              |    AS ratio_r,
              |  encoded_fp
              |FROM agg ORDER BY doc_id""".stripMargin))
  )
}
