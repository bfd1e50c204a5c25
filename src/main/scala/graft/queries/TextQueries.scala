package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Text}
import graft.ops.Num
import QueryDef.tbl

/** Text-analysis + dedup battery over the `documents` fixture: stats,
  * quality scoring, language ID, fingerprints, exact dedup, n-gram
  * Jaccard near-dup (oracled), MinHash-LSH (oracled via the exact-pair
  * SQL — exact verification + recall-1.0 candidates make its output
  * equal the exact pair set), SimHash and the rolling-hash fingerprint
  * (both hash-oracled end to end: their token hashes are md5-derived, so
  * the DuckDB SQL rebuilds the identical sketches from hex digits).
  */
object TextQueries {

  // shared DuckDB fragments (must mirror graft.ext.Text exactly)
  private[queries] val wsSql = "string_split_regex(trim(lower(text)), '\\s+')"
  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString("(", ",", ")")
  private[queries] def scoreSql(words: Seq[String]) =
    s"len(list_filter($wsSql, x -> x IN ${inList(words)}))"

  // shingle relation CTE (3-grams, distinct per doc); range bound 1000
  // covers any fixture doc (≤ ~120 tokens)
  private[queries] val shingleCte =
    s"""w AS (SELECT doc_id, $wsSql AS ws FROM documents),
       |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |       FROM w CROSS JOIN range(1, 1000) t(i) WHERE i <= len(ws) - 2),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)""".stripMargin

  // Exact shingle-Jaccard pairs at ≥ 0.5 — the oracle for BOTH q36 (the
  // direct exact plan) and q37 (MinHash-LSH): LSH candidates get exact
  // Jaccard verification, so with candidate recall 1.0 (asserted against
  // this very relation in TextDedupSpec, and implied by 16 bands × 4 rows
  // at j ≥ 0.5 on this corpus) its output EQUALS the exact pair set —
  // the approximate path is held to the hard hash-match bar.
  private val exactJaccardSql =
    s"""WITH $shingleCte,
       |inter AS (
       |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS n_inter
       |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id,
       |  n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = a_id
       |JOIN sizes sb ON sb.doc_id = b_id
       |WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
       |ORDER BY a_id, b_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // Token/char statistics — pure higher-order functions, no explode.
    QueryDef(
      "q31_text_stats",
      (s, dir) =>
        tbl(s, dir, "documents")
          // tokens materialized once per row (inline use would re-split
          // per consuming expression — Catalyst does not CSE across
          // independent expression trees)
          .withColumn("__t", Text.tokensNorm(col("text")))
          .select(
            col("doc_id"),
            length(col("text")).cast("bigint").as("n_chars_calc"),
            size(col("__t")).cast("bigint").as("n_tokens"),
            size(array_distinct(col("__t"))).cast("bigint").as("n_distinct"),
            (length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("double") /
              length(col("text")).cast("double")).as("alpha_ratio"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  length(text) AS n_chars_calc,
              |  len($wsSql) AS n_tokens,
              |  len(list_distinct($wsSql)) AS n_distinct,
              |  length(regexp_replace(lower(text), '[^a-z]', '', 'g')) / length(text)
              |    AS alpha_ratio
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Composite quality score (stopword density + type/token ratio +
    // length saturation) with a bucketed label.
    QueryDef(
      "q32_quality_score",
      (s, dir) => {
        val q = Text.qualityScoreFromTokens(col("__t"))
        tbl(s, dir, "documents")
          .withColumn("__t", Text.tokensNorm(col("text")))
          .select(
            col("doc_id"),
            size(col("__t")).cast("bigint").as("n_tokens"),
            q.as("quality"),
            when(q >= 0.6, "high").when(q >= 0.45, "medium").otherwise("low").as("label"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, len($wsSql) AS n,
              |    ${scoreSql(Text.stopwordsEn)} AS n_stop,
              |    len(list_distinct($wsSql)) AS n_dist
              |  FROM documents),
              |q AS (SELECT doc_id, n,
              |        (n_stop / n) * 0.4 + (n_dist / n) * 0.3 + least(1.0, n / 100.0) * 0.3
              |          AS quality
              |      FROM t)
              |SELECT doc_id, n AS n_tokens, quality,
              |  CASE WHEN quality >= 0.6 THEN 'high'
              |       WHEN quality >= 0.45 THEN 'medium' ELSE 'low' END AS label
              |FROM q ORDER BY doc_id""".stripMargin)),

    // Deterministic stopword-vote language ID (+ per-language scores).
    QueryDef(
      "q33_lang_id",
      (s, dir) =>
        tbl(s, dir, "documents")
          .withColumn("__t", Text.tokensNorm(col("text")))
          .select(
            col("doc_id"),
            Text.wordCount(col("__t"), Text.stopwordsEn).as("s_en"),
            Text.wordCount(col("__t"), Text.stopwordsDe).as("s_de"),
            Text.wordCount(col("__t"), Text.stopwordsFr).as("s_fr"),
            Text.wordCount(col("__t"), Text.stopwordsEs).as("s_es"),
            Text.cjkCount(col("text")).as("s_zh"),
            Text.langIdFromTokens(col("__t"), col("text")).as("lang_pred"))
          .orderBy("doc_id"),
      Some(s"""WITH sc AS (
              |  SELECT doc_id,
              |    ${scoreSql(Text.stopwordsEn)} AS s_en,
              |    ${scoreSql(Text.stopwordsDe)} AS s_de,
              |    ${scoreSql(Text.stopwordsFr)} AS s_fr,
              |    ${scoreSql(Text.stopwordsEs)} AS s_es,
              |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS s_zh
              |  FROM documents)
              |SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh,
              |  CASE WHEN s_zh > 0 THEN 'zh'
              |       WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
              |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              |       WHEN s_fr >= s_es THEN 'fr'
              |       ELSE 'es' END AS lang_pred
              |FROM sc ORDER BY doc_id""".stripMargin)),

    // Canonical-form fingerprint (md5 of normalized text — the
    // engine-independent exact-dedup key).
    QueryDef(
      "q34_fingerprint",
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(
            col("doc_id"),
            Text.fingerprintMd5(col("text")).as("fp"),
            length(Text.normalize(col("text"))).cast("bigint").as("n_chars_norm"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, md5($normSql) AS fp, length($normSql) AS n_chars_norm
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Exact-duplicate groups: one hash aggregate, deterministic keeper.
    QueryDef(
      "q35_dedup_exact",
      (s, dir) =>
        Dedup.exactGroups(tbl(s, dir, "documents"), "doc_id", "text").orderBy("fp"),
      Some(s"""SELECT md5($normSql) AS fp, min(doc_id) AS keep_id, count(*) AS n_docs
              |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin)),

    // Exact 3-gram-shingle Jaccard near-dup pairs at ≥ 0.5 — pairs only
    // materialize through the shared-shingle join, and candidate
    // generation runs behind the maxDf hot-shingle guard (df ≤ 1000 —
    // far above any fixture df, max 25 at sf0.1, so output is identical;
    // what changes is the PLAN: a boilerplate shingle shared by 100k docs
    // caps at maxDf² candidate rows instead of df²). Verification uses
    // the FULL shingle sets, so every emitted jaccard is exact.
    QueryDef(
      "q36_dedup_ngram",
      (s, dir) =>
        Dedup.ngramJaccardPairs(tbl(s, dir, "documents"), "doc_id", "text", 3, 0.5,
            maxDf = Dedup.BatteryMaxDf)
          .orderBy("a_id", "b_id"),
      Some(exactJaccardSql)),

    // MinHash + LSH banding (64 hashes, 16 bands × 4) with exact
    // verification of candidates. Oracled with the SAME exact-pair SQL as
    // q36: exact verification makes precision 1.0 by construction, and
    // candidate recall 1.0 (TextDedupSpec pins it vs the exact pairs)
    // makes the LSH output equal the exact pair set.
    QueryDef(
      "q37_dedup_minhash",
      (s, dir) =>
        Dedup.minhashLshPairs(tbl(s, dir, "documents"), "doc_id", "text", 3, 64, 4, 0.5)
          .orderBy("a_id", "b_id"),
      Some(exactJaccardSql)),

    // SimHash near-dup sketch (64-bit, 4-chunk blocking, hamming ≤ 3) —
    // fully hash-oracled: the token hash is md5-derived (Text.tokenHash64),
    // so the oracle rebuilds the ENTIRE sketch pipeline in SQL. Bit b of
    // the 64-bit hash is read straight off hex digit 16 - b/4 of md5(t)
    // (bit b%4), sidestepping signed-integer construction; the sketch
    // reassembles as a HUGEINT sum (bit 63 contributes -2^63, the signed
    // two's-complement value) and casts back to BIGINT, matching Spark's
    // LongType exactly — then the same chunk-blocked self-join + XOR
    // popcount yields the identical pair set.
    QueryDef(
      "q38_dedup_simhash",
      (s, dir) =>
        Dedup.simhashPairs(tbl(s, dir, "documents"), "doc_id", "text", 3)
          .orderBy("a_id", "b_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
              |th AS (SELECT doc_id, t, count(*) AS w
              |       FROM (SELECT doc_id, unnest(ws) AS t FROM w)
              |       WHERE t <> '' GROUP BY doc_id, t),
              |v AS (SELECT doc_id, b,
              |        sum(CASE WHEN ((strpos('0123456789abcdef',
              |                         substr(md5(t), 16 - b // 4, 1)) - 1)
              |                       >> (b % 4)) & 1 = 1
              |                 THEN w ELSE -w END) AS vote
              |      FROM th CROSS JOIN range(0, 64) r(b) GROUP BY doc_id, b),
              |sh AS (SELECT doc_id,
              |         CAST(sum(CASE WHEN vote > 0 THEN
              |                    CASE WHEN b = 63
              |                         THEN CAST(-9223372036854775808 AS HUGEINT)
              |                         ELSE CAST(CAST(1 AS BIGINT) << b AS HUGEINT) END
              |                  ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS simhash
              |       FROM v GROUP BY doc_id),
              |ch AS (SELECT doc_id, simhash, c, (simhash >> (c * 16)) & 65535 AS cv
              |       FROM sh CROSS JOIN range(0, 4) r(c)),
              |pr AS (SELECT DISTINCT p.doc_id AS a_id, q.doc_id AS b_id,
              |         CAST(bit_count(xor(p.simhash, q.simhash)) AS BIGINT) AS hamming
              |       FROM ch p JOIN ch q
              |         ON p.c = q.c AND p.cv = q.cv AND p.doc_id < q.doc_id)
              |SELECT a_id, b_id, hamming FROM pr
              |WHERE hamming <= 3 ORDER BY a_id, b_id""".stripMargin)),

    // Order-sensitive rolling-hash fingerprint of the token stream:
    // base-31 polynomial mod 1e9+7 over md5-derived 32-bit token hashes.
    // Fully hash-oracled — the DuckDB SQL re-derives the identical number
    // with nested list_reduce folds (md5 hashes UTF-8 bytes the same way
    // in both engines; all modular arithmetic stays below 2^35).
    QueryDef(
      "q42_rolling_fingerprint",
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"), Text.rollingHash(Text.tokensNorm(col("text"))).as("rhash"))
          .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents)
              |SELECT doc_id,
              |  list_reduce(
              |    list_prepend(CAST(0 AS BIGINT), list_transform(ws, t ->
              |      list_reduce(
              |        list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9),
              |          i -> CAST(strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1 AS BIGINT))),
              |        (a, x) -> a * 16 + x))),
              |    (acc, h) -> (acc * 31 + h % 1000000007) % 1000000007) AS rhash
              |FROM w ORDER BY doc_id""".stripMargin)),

    // BPE-style pre-tokenizer counts vs whitespace counts (the regex is
    // dialect-neutral: no lookaheads, so Java and RE2 agree).
    QueryDef(
      "q52_bpe_tokens",
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(
            col("doc_id"),
            Text.nTokensBpe(col("text")).as("n_bpe"),
            size(Text.tokensNorm(col("text"))).cast("bigint").as("n_ws"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  len(regexp_extract_all(text, '${Text.bpePattern.replace("'", "''")}')) AS n_bpe,
              |  len(string_split_regex(trim(lower(text)), '\\s+')) AS n_ws
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Corpus-level n-gram frequency: top-20 trigrams by document
    // frequency (deterministic tiebreak on the shingle itself).
    QueryDef(
      "q46_ngram_freq",
      (s, dir) =>
        Dedup.shingleRel(tbl(s, dir, "documents"), "doc_id", "text", 3)
          .groupBy(col("shingle"))
          .agg(count(lit(1)).as("doc_freq"))
          .orderBy(col("doc_freq").desc, col("shingle").asc)
          .limit(20),
      Some(s"""WITH $shingleCte
              |SELECT shingle, count(*) AS doc_freq
              |FROM sh GROUP BY shingle
              |ORDER BY doc_freq DESC, shingle LIMIT 20""".stripMargin)),

    // Passage-level (span) dedup profile — C4/RefinedWeb-style: how much
    // of each doc consists of 8-token non-overlapping passages seen
    // elsewhere in the corpus (or repeated in-doc). Catches shared
    // boilerplate blocks that document-level fingerprints miss; keep
    // drops docs that are mostly duplicated spans.
    QueryDef(
      "q112_passage_dedup",
      (s, dir) =>
        graft.ext.Corpus
          .passageDupStats(tbl(s, dir, "documents"), "doc_id", "text", 8)
          .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
              |pass AS (SELECT doc_id, j AS pidx,
              |           array_to_string(ws[(j*8+1):(j*8+8)], ' ') AS passage
              |         FROM w CROSS JOIN range(0, 1000) t(j) WHERE j < len(ws) // 8),
              |cnts AS (SELECT passage, count(*) AS cnt FROM pass GROUP BY passage),
              |st AS (SELECT doc_id, count(*) AS n_pass,
              |         count(CASE WHEN cnt > 1 THEN 1 END) AS n_dup
              |       FROM pass JOIN cnts USING (passage) GROUP BY doc_id)
              |SELECT d.doc_id,
              |  coalesce(st.n_pass, 0) AS n_pass,
              |  coalesce(st.n_dup, 0) AS n_dup,
              |  coalesce(CAST(st.n_dup AS DOUBLE) / CAST(st.n_pass AS DOUBLE), 0.0) AS dup_frac,
              |  coalesce(CAST(st.n_dup AS DOUBLE) / CAST(st.n_pass AS DOUBLE), 0.0) < 0.5 AS keep
              |FROM documents d LEFT JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // The span-dedup TRANSFORMATION (q112 is the report, this is the
    // cleaning): rebuild every doc with corpus-duplicated 8-token
    // passages removed, original order preserved, ragged tail appended.
    // Order preservation costs no sort shuffle — surviving passages
    // reassemble via sort_array inside one hash aggregate.
    QueryDef(
      "q114_passage_scrub",
      (s, dir) =>
        graft.ext.Corpus
          .passageDedupText(tbl(s, dir, "documents"), "doc_id", "text", 8)
          .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
              |pass AS (SELECT doc_id, j AS pidx,
              |           array_to_string(ws[(j*8+1):(j*8+8)], ' ') AS passage
              |         FROM w CROSS JOIN range(0, 1000) t(j) WHERE j < len(ws) // 8),
              |cnts AS (SELECT passage, count(*) AS cnt FROM pass GROUP BY passage),
              |keep AS (SELECT doc_id, string_agg(passage, ' ' ORDER BY pidx) AS kept
              |         FROM pass JOIN cnts USING (passage) WHERE cnt = 1 GROUP BY doc_id),
              |tl AS (SELECT doc_id,
              |         CASE WHEN len(ws) >= 8
              |           THEN array_to_string(ws[((len(ws)//8)*8+1):len(ws)], ' ')
              |           ELSE array_to_string(ws, ' ') END AS tail
              |       FROM w)
              |SELECT d.doc_id,
              |  regexp_replace(trim(concat_ws(' ', coalesce(k.kept, ''), t.tail)),
              |                 ' +', ' ', 'g') AS clean_text
              |FROM documents d
              |LEFT JOIN keep k USING (doc_id)
              |JOIN tl t USING (doc_id)
              |ORDER BY doc_id""".stripMargin)))
}
