package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-5 curation additions: rule-based quality filtering (the
  * Gopher-style heuristic battery), corpus-calibrated unigram-LM
  * surprisal scoring (the scalable stand-in for perplexity filters), and
  * context-window chunking (the doc → training-sequence materialization).
  * All three are per-doc or one-aggregate-pass shapes that hold at 100 TB;
  * every output is hash-oracled.
  */
object Extended5 {

  import TextQueries.wsSql

  val all: Seq[QueryDef] = Seq(
    // Gopher-style rule battery (Rae et al. 2021 §A1.1, thresholds
    // adapted to the fixture's 20-120-token docs): token-count band,
    // mean-token-length band, alphabetic-token fraction, symbol-char
    // fraction, stopword floor. Every signal is exact integer arithmetic
    // or a single IEEE division — bit-identical across engines, so the
    // whole decision table (unlike real perplexity filters) hash-matches.
    // One projection pass over the corpus: no shuffle, no join — the
    // 100 TB cost is the scan itself.
    QueryDef(
      "q116_gopher_rules",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .withColumn("__t", Text.tokensNorm(col("text")))
        val n = size(col("__t")).cast("bigint")
        val sumLen = aggregate(col("__t"), lit(0L), (a, t) => a + length(t))
        val meanLen = sumLen.cast("double") / n.cast("double")
        val alphaFrac = size(filter(col("__t"), t => t.rlike("[a-z]")))
          .cast("double") / n.cast("double")
        val symFrac = length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", ""))
          .cast("double") / length(col("text")).cast("double")
        val nStop = Text.wordCount(col("__t"), Text.stopwordsEn)
        val lenOk = n.between(20, 100)
        val meanLenOk = meanLen >= 3.0 && meanLen <= 10.0
        val alphaOk = alphaFrac >= 0.7
        val symOk = symFrac <= 0.1
        val stopOk = nStop >= 2
        d.select(
          col("doc_id"), n.as("n_tokens"),
          Num.roundTo(meanLen, 6).as("mean_tok_len"),
          Num.roundTo(alphaFrac, 6).as("alpha_frac"),
          Num.roundTo(symFrac, 6).as("sym_frac"),
          nStop.as("n_stop"),
          lenOk.as("len_ok"), meanLenOk.as("mean_len_ok"),
          alphaOk.as("alpha_ok"), symOk.as("sym_ok"), stopOk.as("stop_ok"),
          (lenOk && meanLenOk && alphaOk && symOk && stopOk).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id, $wsSql AS ws,
              |    length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS n_sym,
              |    length(text) AS n_chars,
              |    ${TextQueries.scoreSql(Text.stopwordsEn)} AS n_stop
              |  FROM documents),
              |f AS (
              |  SELECT doc_id, len(ws) AS n,
              |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              |           list_transform(ws, x -> CAST(length(x) AS BIGINT))),
              |         (a, b) -> a + b) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS mean_len,
              |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
              |      / CAST(len(ws) AS DOUBLE) AS alpha_frac,
              |    CAST(n_sym AS DOUBLE) / CAST(n_chars AS DOUBLE) AS sym_frac,
              |    n_stop
              |  FROM m)
              |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
              |  ${Num.roundSql("mean_len", 6)} AS mean_tok_len,
              |  ${Num.roundSql("alpha_frac", 6)} AS alpha_frac,
              |  ${Num.roundSql("sym_frac", 6)} AS sym_frac,
              |  n_stop,
              |  n BETWEEN 20 AND 100 AS len_ok,
              |  mean_len >= 3.0 AND mean_len <= 10.0 AS mean_len_ok,
              |  alpha_frac >= 0.7 AS alpha_ok,
              |  sym_frac <= 0.1 AS sym_ok,
              |  n_stop >= 2 AS stop_ok,
              |  (n BETWEEN 20 AND 100) AND (mean_len >= 3.0 AND mean_len <= 10.0)
              |    AND alpha_frac >= 0.7 AND sym_frac <= 0.1 AND n_stop >= 2 AS keep
              |FROM f ORDER BY doc_id""".stripMargin)),

    // Corpus unigram-LM surprisal: train token frequencies over the whole
    // corpus in one hash aggregate, then score each doc by its mean token
    // surprisal -log2 c(t)/N — the scalable skeleton of CCNet-style
    // perplexity filtering (a real KenLM swaps in via the same join).
    // High surprisal = rare/garbled tokens; low = boilerplate. Per-token
    // terms are rounded then DECIMAL-summed (order-independent, the
    // q65/q108 pattern — ln itself is bit-identical across engines), so
    // the score hash-matches. Scale shape: ONE exploded pass over the
    // corpus — c(t) comes from a whole-partition window over the
    // (doc,token) aggregate (the same token-keyed shuffle a vocab join
    // needs, without re-evaluating the scan lineage for the vocab side),
    // and the N normalizer is a map-only scalar off a column-pruned
    // second scan (no explode, no shuffle). The naive vocab-join
    // formulation evaluates the explode+aggregate lineage three times.
    QueryDef(
      "q117_unigram_surprisal",
      (s, dir) => {
        val perDoc = tbl(s, dir, "documents")
          .select(col("doc_id"), explode(Text.tokensNorm(col("text"))).as("t"))
          .filter(col("t") =!= "")
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("w"))
        val withC = perDoc.withColumn(
          "c",
          sum(col("w")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("t"))))
        val totals = tbl(s, dir, "documents")
          .select(size(filter(Text.tokensNorm(col("text")), t => t =!= ""))
            .cast("long").as("n"))
          .agg(sum(col("n")).as("n_total"))
        val surprisal =
          (log(col("c").cast("double") / col("n_total").cast("double")) /
            log(lit(2.0))) * lit(-1.0)
        withC.crossJoin(broadcast(totals))
          .groupBy(col("doc_id"))
          .agg(
            sum(col("w")).as("n_toks"),
            sum(Num.roundTo(col("w").cast("double") * surprisal, 12)
              .cast(DecimalType(24, 12))).cast("double").as("__s"))
          .select(
            col("doc_id"), col("n_toks"),
            Num.roundTo(col("__s") / col("n_toks").cast("double"), 4)
              .as("mean_surprisal"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, t
              |             FROM (SELECT doc_id, unnest($wsSql) AS t FROM documents)
              |             WHERE t <> ''),
              |pd AS (SELECT doc_id, t, count(*) AS w FROM tok GROUP BY 1, 2),
              |v AS (SELECT t, CAST(sum(w) AS BIGINT) AS c FROM pd GROUP BY 1),
              |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM v),
              |j AS (SELECT doc_id, w,
              |        (ln(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)) / ln(2.0)) * -1.0 AS s
              |      FROM pd JOIN v USING (t) CROSS JOIN tot),
              |a AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS n_toks,
              |        CAST(sum(CAST(${Num.roundSql("CAST(w AS DOUBLE) * s", 12)}
              |                      AS DECIMAL(24,12))) AS DOUBLE) AS s
              |      FROM j GROUP BY 1)
              |SELECT doc_id, n_toks,
              |  ${Num.roundSql("s / CAST(n_toks AS DOUBLE)", 4)} AS mean_surprisal
              |FROM a ORDER BY doc_id""".stripMargin)),

    // Context-window chunking: every doc's token stream → 32-token
    // training windows with stride 24 (8-token overlap carries context
    // across boundaries), ragged final window kept. THE doc→sequence
    // materialization step before packing (q77 packs these). Pure per-doc
    // array arithmetic — explode fan-out is bounded by ceil(n/stride), no
    // shuffle before the output sort; at 100 TB this is a map-only stage.
    QueryDef(
      "q118_chunk_windows",
      (s, dir) => {
        val (win, stride) = (32, 24)
        val d = tbl(s, dir, "documents")
          .withColumn("__ws", Text.tokensNorm(col("text")))
        val n = size(col("__ws"))
        val jmax = ((greatest(n - lit(win), lit(0)) + lit(stride - 1)) /
          lit(stride)).cast("int")
        val chunk = slice(col("__ws"), (col("j") * stride + 1).cast("int"), lit(win))
        d.select(col("doc_id"), col("__ws"), explode(sequence(lit(0), jmax)).as("j"))
          .select(
            col("doc_id"), col("j").cast("bigint").as("chunk_idx"),
            size(chunk).cast("bigint").as("n_toks"),
            array_join(chunk, " ").as("chunk_text"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
              |c AS (SELECT doc_id, j, ws[(j*24+1):(j*24+32)] AS chunk
              |      FROM w CROSS JOIN range(0, 1000) t(j)
              |      WHERE j <= (greatest(len(ws) - 32, 0) + 23) // 24)
              |SELECT doc_id, CAST(j AS BIGINT) AS chunk_idx,
              |  CAST(len(chunk) AS BIGINT) AS n_toks,
              |  array_to_string(chunk, ' ') AS chunk_text
              |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)))
}
