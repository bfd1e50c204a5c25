package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Text}
import graft.ops.{Layout, Num}
import QueryDef.tbl

/** Round-3 additions (q101+): the curation operators a training-data
  * pipeline runs between dedup and packing — PII redaction, quality-aware
  * duplicate resolution (keep the BEST copy, not the first), and fuzzy
  * cross-set benchmark decontamination (LSH across two corpora, where
  * exact shingle overlap misses paraphrased leaks). All three are
  * DuckDB-oracled.
  */
object Extended4 {

  // dialect-neutral patterns (no lookarounds — Java regex and RE2 agree);
  // phone key is zero-padded to 6 so no fixture custkey truncates
  private val emailPat = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phonePat = "\\+1-555-[0-9]{6}"

  val all: Seq[QueryDef] = Seq(
    // PII redaction: scrub emails/phones from free text and count what
    // was redacted (the audit trail). The fixture corpus carries no PII,
    // so contact strings are manufactured deterministically from
    // customer keys — BOTH engines build the identical input, then the
    // redaction itself is what the hash-match verifies. Pure
    // regexp_replace/extract_all: codegen'd, linear, partition-local.
    QueryDef(
      "q101_pii_scrub",
      (s, dir) => {
        val contact = concat(
          col("c_name"), lit(" reach me at user"), col("c_custkey").cast("string"),
          lit("@example.com or call +1-555-"),
          lpad(col("c_custkey").cast("string"), 6, "0"), lit(" now"))
        tbl(s, dir, "customer")
          .select(col("c_custkey"), contact.as("contact"))
          .select(
            col("c_custkey"),
            regexp_replace(
              regexp_replace(col("contact"), emailPat, "<EMAIL>"),
              phonePat, "<PHONE>").as("scrubbed"),
            size(regexp_extract_all(col("contact"), lit(emailPat), lit(0)))
              .cast("bigint").as("n_emails"),
            size(regexp_extract_all(col("contact"), lit(phonePat), lit(0)))
              .cast("bigint").as("n_phones"))
          .orderBy("c_custkey")
      },
      Some(s"""WITH b AS (SELECT c_custkey,
              |  c_name || ' reach me at user' || CAST(c_custkey AS VARCHAR)
              |    || '@example.com or call +1-555-'
              |    || lpad(CAST(c_custkey AS VARCHAR), 6, '0') || ' now' AS contact
              |  FROM customer)
              |SELECT c_custkey,
              |  regexp_replace(regexp_replace(contact,
              |    '$emailPat', '<EMAIL>', 'g'), '$phonePat', '<PHONE>', 'g') AS scrubbed,
              |  len(regexp_extract_all(contact, '$emailPat')) AS n_emails,
              |  len(regexp_extract_all(contact, '$phonePat')) AS n_phones
              |FROM b ORDER BY c_custkey""".stripMargin)),

    // Quality-aware dedup: among exact duplicates (same normalized-text
    // fingerprint), keep the HIGHEST-quality copy rather than the first
    // — the resolution rule real pipelines use when duplicates differ in
    // surrounding cleanliness. One window over (fp): rank by quality
    // desc, doc_id asc (total order — quality is an exact integer-ratio
    // score, identical cross-engine per q32's oracle).
    QueryDef(
      "q102_quality_dedup",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .withColumn("__t", Text.tokensNorm(col("text")))
          .withColumn("__q", Text.qualityScoreFromTokens(col("__t")))
          .withColumn("fp", Text.fingerprintMd5(col("text")))
        val w = Window.partitionBy(col("fp")).orderBy(col("__q").desc, col("doc_id").asc)
        d.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("fp"), Num.roundTo(col("__q"), 4).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id,
              |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
              |    len(${TextQueries.wsSql}) AS n,
              |    ${TextQueries.scoreSql(Text.stopwordsEn)} AS n_stop,
              |    len(list_distinct(${TextQueries.wsSql})) AS n_dist
              |  FROM documents),
              |q AS (SELECT doc_id, fp,
              |        (n_stop / n) * 0.4 + (n_dist / n) * 0.3
              |          + least(1.0, n / 100.0) * 0.3 AS quality
              |      FROM t),
              |r AS (SELECT doc_id, fp, quality,
              |        row_number() OVER (PARTITION BY fp
              |                           ORDER BY quality DESC, doc_id) AS rn
              |      FROM q)
              |SELECT doc_id, fp, ${Num.roundSql("quality", 4)} AS quality
              |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // Fuzzy benchmark decontamination: MinHash-LSH pairs ACROSS two
    // corpora (training side vs the src15-src19 held-out slice) with
    // exact Jaccard verification — catches near-verbatim leaks that
    // q62's exact-shingle overlap understates. Oracled with the exact
    // cross-set pair SQL (same recall-1.0 + exact-verification argument
    // as q37; every fixture cross pair sits at jaccard ≥ 0.88, far above
    // the 0.5 band threshold). Candidates only form across the sets:
    // O(docs × bands) with a broadcastable benchmark band relation at
    // 100 TB.
    QueryDef(
      "q103_fuzzy_contamination",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val benchSrc = Seq("src15", "src16", "src17", "src18", "src19")
        Dedup.minhashLshPairsAcross(
          docs.filter(!col("source").isin(benchSrc: _*)),
          docs.filter(col("source").isin(benchSrc: _*)),
          "doc_id", "text", 3, 64, 4, 0.5)
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, source, ${TextQueries.wsSql} AS ws FROM documents),
              |sh AS (SELECT DISTINCT doc_id, source,
              |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
              |       FROM w CROSS JOIN range(1, 1000) t(i) WHERE i <= len(ws) - 2),
              |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS n_inter
              |  FROM sh x JOIN sh y ON x.shingle = y.shingle
              |  WHERE x.source NOT IN ('src15','src16','src17','src18','src19')
              |    AND y.source IN ('src15','src16','src17','src18','src19')
              |  GROUP BY 1, 2)
              |SELECT a_id, b_id,
              |  n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
              |FROM inter
              |JOIN sizes sa ON sa.doc_id = a_id
              |JOIN sizes sb ON sb.doc_id = b_id
              |WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
              |ORDER BY a_id, b_id""".stripMargin)),

    // Z-order (Morton) locality: interleave min-max-normalized
    // (l_partkey, l_suppkey) bits, bucket by the top 4 z-bits, and show
    // each bucket's bounding box in BOTH dimensions — the multi-dim
    // file-pruning layout (ops/Layout.writeZOrdered writes it; this
    // query oracle-checks the arithmetic: the interleave SQL is
    // generated from the same Scala loop as the Column expression, so
    // the engines agree by construction).
    QueryDef(
      "q104_zorder_locality",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        val mm = li.agg(
          min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
          min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
        li.crossJoin(broadcast(mm))
          .withColumn("__z", Layout.zValue(
            col("l_partkey"), col("pmin"), col("pmax"),
            col("l_suppkey"), col("smin"), col("smax"), 16))
          .withColumn("bucket", shiftright(col("__z"), 28))
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n"),
            min(col("l_partkey")).as("p_lo"), max(col("l_partkey")).as("p_hi"),
            min(col("l_suppkey")).as("s_lo"), max(col("l_suppkey")).as("s_hi"))
          .orderBy("bucket")
      },
      Some(s"""WITH mm AS (SELECT min(l_partkey) pmin, max(l_partkey) pmax,
              |                  min(l_suppkey) smin, max(l_suppkey) smax
              |           FROM lineitem),
              |nrm AS (SELECT l_partkey, l_suppkey,
              |         CAST(floor((l_partkey - pmin) * 65535.0 / (pmax - pmin)) AS BIGINT) AS an,
              |         CAST(floor((l_suppkey - smin) * 65535.0 / (smax - smin)) AS BIGINT) AS bn
              |       FROM lineitem CROSS JOIN mm),
              |zr AS (SELECT l_partkey, l_suppkey,
              |         ${Layout.interleaveSql("an", "bn", 16)} AS zv
              |       FROM nrm)
              |SELECT zv >> 28 AS bucket, count(*) AS n,
              |  min(l_partkey) AS p_lo, max(l_partkey) AS p_hi,
              |  min(l_suppkey) AS s_lo, max(l_suppkey) AS s_hi
              |FROM zr GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // SCD type-2 history build: turn a change stream into validity
    // intervals — eff_from = the change's timestamp, eff_to = the NEXT
    // change for the same key (NULL ⇒ current row). One window with a
    // total per-key order (ts, then the globally-unique event_id), no
    // self-join — the warehouse-dimension twin of q79's latest-only CDC
    // compaction.
    QueryDef(
      "q105_scd2",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("next_ts", lead(col("ts"), 1).over(w))
          .select(
            col("user_id"), col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("eff_from"),
            date_format(col("next_ts"), "yyyy-MM-dd HH:mm:ss").as("eff_to"),
            col("next_ts").isNull.as("is_current"),
            Num.roundTo(col("value"), 4).as("value_r"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
              |           FROM events),
              |v AS (SELECT user_id, event_id, ts, value,
              |        lead(ts) OVER (PARTITION BY user_id
              |                       ORDER BY ts, event_id) AS next_ts
              |      FROM e)
              |SELECT user_id, event_id,
              |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS eff_from,
              |  strftime(next_ts, '%Y-%m-%d %H:%M:%S') AS eff_to,
              |  (next_ts IS NULL) AS is_current,
              |  ${Num.roundSql("value", 4)} AS value_r
              |FROM v ORDER BY user_id, event_id""".stripMargin)),

    // Spark 4 VARIANT: parse the semi-structured props payload into the
    // binary variant type (schema-on-read WITHOUT a declared schema —
    // the open-content twin of q30/q71's typed from_json) and extract a
    // typed field plus the inferred per-row schema, aggregated. At
    // 100 TB variant shreds/filters without materializing a global
    // schema, which is the point for heterogeneous event payloads.
    QueryDef(
      "q106_variant",
      (s, dir) =>
        tbl(s, dir, "events")
          .select(col("event_id"), parse_json(col("props")).as("v"))
          .select(
            col("event_id"),
            variant_get(col("v"), "$.k", "bigint").as("k_val"),
            schema_of_variant(col("v")).as("v_schema"))
          .groupBy(col("v_schema"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("k_val")).as("k_sum"),
            min(col("k_val")).as("k_min"),
            max(col("k_val")).as("k_max"))
          .orderBy("v_schema"),
      Some("""WITH x AS (SELECT event_id,
             |  CAST(props->>'$.k' AS BIGINT) AS k_val FROM events)
             |SELECT 'OBJECT<k: BIGINT>' AS v_schema, count(*) AS n,
             |  CAST(sum(k_val) AS BIGINT) AS k_sum,
             |  min(k_val) AS k_min, max(k_val) AS k_max
             |FROM x ORDER BY v_schema""".stripMargin)),

    // Deterministic quality-WEIGHTED sampling — the data-mixing
    // primitive (keep each document with probability ∝ its quality
    // score, reproducibly): u = first 8 md5 hex digits of the text as a
    // uniform [0,1) draw, keep iff u < quality. Content-derived draws
    // are retry/partition-stable (rand() is neither) and md5 is
    // engine-independent, so the SAMPLE ITSELF is oracle-verified —
    // both engines keep exactly the same rows. Embarrassingly parallel:
    // one filter, no shuffle.
    QueryDef(
      "q107_weighted_sample",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .withColumn("__t", Text.tokensNorm(col("text")))
          .withColumn("__q", Text.qualityScoreFromTokens(col("__t")))
        val u = conv(substring(md5(col("text")), 1, 8), 16, 10)
          .cast("long").cast("double") / lit(4294967296.0)
        d.withColumn("__u", u)
          .filter(col("__u") < col("__q"))
          .select(col("doc_id"),
            Num.roundTo(col("__q"), 4).as("quality"),
            Num.roundTo(col("__u"), 6).as("u"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, md5(text) AS h,
              |    len(${TextQueries.wsSql}) AS n,
              |    ${TextQueries.scoreSql(Text.stopwordsEn)} AS n_stop,
              |    len(list_distinct(${TextQueries.wsSql})) AS n_dist
              |  FROM documents),
              |q AS (SELECT doc_id,
              |        (n_stop / n) * 0.4 + (n_dist / n) * 0.3
              |          + least(1.0, n / 100.0) * 0.3 AS quality,
              |        (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0
              |          + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216.0
              |          + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576.0
              |          + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536.0
              |          + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096.0
              |          + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256.0
              |          + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16.0
              |          + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1) AS uv
              |      FROM t)
              |SELECT doc_id, ${Num.roundSql("quality", 4)} AS quality,
              |  ${Num.roundSql("uv / 4294967296.0", 6)} AS u
              |FROM q WHERE uv / 4294967296.0 < quality
              |ORDER BY doc_id""".stripMargin)),

    // Character-entropy quality signal (CCNet/Gopher-style gibberish
    // filter): Shannon entropy in bits over each document's character
    // distribution. Per-term values are rounded to 12 places and summed
    // in DECIMAL so the per-doc sum is order-independent — the standard
    // trick here for oracle-exact floating aggregation (ln itself
    // matches bit-for-bit across engines, as q65's tf-idf established).
    QueryDef(
      "q108_char_entropy",
      (s, dir) => {
        val counts = tbl(s, dir, "documents")
          .select(col("doc_id"), length(col("text")).as("n"),
            explode(split(col("text"), "")).as("ch"))
          .filter(col("ch") =!= "")
          .groupBy(col("doc_id"), col("n"), col("ch"))
          .agg(count(lit(1)).as("c"))
        val p = col("c").cast("double") / col("n").cast("double")
        val term = (p * log(p) / log(lit(2.0))) * lit(-1.0)
        counts
          .groupBy(col("doc_id"), col("n"))
          .agg(sum(Num.roundTo(term, 12)
            .cast(org.apache.spark.sql.types.DecimalType(24, 12))).cast("double").as("h"))
          .select(col("doc_id"), col("n").cast("bigint").as("n_chars"),
            Num.roundTo(col("h"), 4).as("entropy_bits"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ch AS (SELECT doc_id, length(text) AS n, substr(text, i, 1) AS c1
              |            FROM documents CROSS JOIN range(1, 4001) t(i)
              |            WHERE i <= length(text)),
              |g AS (SELECT doc_id, n, c1, count(*) AS c FROM ch GROUP BY 1, 2, 3),
              |e AS (SELECT doc_id, n,
              |        sum(CAST(${Num.roundSql("((c / n) * ln(c / n) / ln(2)) * -1.0", 12)}
              |                 AS DECIMAL(24,12))) AS h
              |      FROM g GROUP BY 1, 2)
              |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
              |  ${Num.roundSql("CAST(h AS DOUBLE)", 4)} AS entropy_bits
              |FROM e ORDER BY doc_id""".stripMargin)),

    // Temperature-based source mixing (the multilingual-LM sampling
    // rule, alpha = 0.5): per-source weight ∝ n^alpha, renormalized;
    // per-source sampling rate to hit the target mix in expectation.
    // The Σ n^alpha normalizer accumulates rounded DECIMAL terms so the
    // cross-source sum is order-independent and oracle-exact.
    QueryDef(
      "q109_mix_rates",
      (s, dir) => {
        val perSrc = tbl(s, dir, "documents")
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        val wRaw = Num.roundTo(sqrt(col("n_docs").cast("double")), 8)
        val totals = perSrc.agg(
          sum(col("n_docs")).as("n_total"),
          sum(wRaw.cast(org.apache.spark.sql.types.DecimalType(24, 8)))
            .cast("double").as("w_sum"))
        perSrc.crossJoin(broadcast(totals))
          .select(
            col("source"), col("n_docs"),
            Num.roundTo(wRaw / col("w_sum"), 6).as("weight"),
            Num.roundTo(
              least(lit(1.0),
                (wRaw / col("w_sum")) * col("n_total").cast("double") /
                  col("n_docs").cast("double")), 6).as("sample_rate"))
          .orderBy("source")
      },
      Some(s"""WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
              |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
              |        CAST(sum(CAST(${Num.roundSql("sqrt(CAST(n_docs AS DOUBLE))", 8)}
              |                      AS DECIMAL(24,8))) AS DOUBLE) AS w_sum
              |      FROM s)
              |SELECT source, n_docs,
              |  ${Num.roundSql(s"${Num.roundSql("sqrt(CAST(n_docs AS DOUBLE))", 8)} / w_sum", 6)} AS weight,
              |  ${Num.roundSql(
                s"least(1.0, (${Num.roundSql("sqrt(CAST(n_docs AS DOUBLE))", 8)} / w_sum) * n_total / n_docs)",
                6)} AS sample_rate
              |FROM s CROSS JOIN t ORDER BY source""".stripMargin)),

    // End-to-end fuzzy-dedup RESOLUTION — the capstone that composes the
    // ACTUAL 100 TB dedup stack: MinHash-LSH near-dup pairs (q37 — exact
    // verification makes precision 1.0, and candidate recall 1.0 on this
    // corpus is pinned in TextDedupSpec, so the pair set EQUALS the exact
    // q36 relation with no df² term anywhere) → connected components
    // (q70) → keep the best-QUALITY representative per cluster (q102's
    // rule, upgraded from exact-dup groups to fuzzy clusters); singleton
    // docs are their own cluster. Output is the full decision table a
    // pipeline applies (doc_id, cluster, kept). Oracle: the recursive-CTE
    // component labeling (q70's) joined with the quality CTE and the
    // same keep-window.
    QueryDef(
      "q110_dedup_resolve",
      (s, dir) => {
        val raw = tbl(s, dir, "documents")
        val d = raw
          .withColumn("__t", Text.tokensNorm(col("text")))
          .select(col("doc_id"), Text.qualityScoreFromTokens(col("__t")).as("__q"))
        val clusters = Dedup.connectedComponents(
          Dedup.minhashLshPairs(raw, "doc_id", "text", 3, 64, 4, 0.5))
        val w = Window.partitionBy(col("cluster_id")).orderBy(col("__q").desc, col("doc_id").asc)
        d.join(clusters, Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
          .withColumn("rn", row_number().over(w))
          .select(col("doc_id"), col("cluster_id"),
            (col("rn") === 1).as("kept"),
            Num.roundTo(col("__q"), 4).as("quality"))
          .orderBy("doc_id")
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
              |cl AS (SELECT node AS doc_id, least(node, min(reach)) AS cluster_id
              |       FROM r GROUP BY node),
              |tq AS (SELECT doc_id, len(${TextQueries.wsSql}) AS n,
              |         ${TextQueries.scoreSql(Text.stopwordsEn)} AS n_stop,
              |         len(list_distinct(${TextQueries.wsSql})) AS n_dist
              |       FROM documents),
              |qy AS (SELECT doc_id,
              |         (n_stop / n) * 0.4 + (n_dist / n) * 0.3
              |           + least(1.0, n / 100.0) * 0.3 AS quality
              |       FROM tq),
              |j AS (SELECT qy.doc_id, COALESCE(cl.cluster_id, qy.doc_id) AS cluster_id,
              |        qy.quality
              |      FROM qy LEFT JOIN cl ON cl.doc_id = qy.doc_id),
              |rk AS (SELECT doc_id, cluster_id, quality,
              |         row_number() OVER (PARTITION BY cluster_id
              |                            ORDER BY quality DESC, doc_id) AS rn
              |       FROM j)
              |SELECT doc_id, cluster_id, rn = 1 AS kept,
              |  ${Num.roundSql("quality", 4)} AS quality
              |FROM rk ORDER BY doc_id""".stripMargin)),

    // Mixture MATERIALIZATION — turns q109's temperature rates into an
    // actual training-set selection under a token budget: per-source
    // quota = n^α weight share × 25% of total corpus tokens; within each
    // source docs are taken best-quality-first (q102's score, doc_id
    // tie-break) until the running token count crosses the quota. The
    // full decision table is emitted, so the SAMPLE ITSELF is
    // hash-verified, like q107. The per-source selection rank AND running
    // token sum both come from ONE PrefixSum.exclusiveSum pass (coarse
    // quality cells + exact offsets — `source` is a ~20-value key, so a
    // plain `PARTITION BY source` window would put N/20 docs in one task
    // at 100 TB); weights go through the q109 pattern (round-to-8 then
    // DECIMAL-accumulate) so the weight sum is order-independent in both
    // engines.
    QueryDef(
      "q113_mix_materialize",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .withColumn("__t", Text.tokensNorm(col("text")))
          .withColumn("n_tokens", size(col("__t")).cast("bigint"))
          .withColumn("__q", Text.qualityScoreFromTokens(col("__t")))
        val wRaw = Num.roundTo(sqrt(col("n_docs").cast("double")), 8)
        val weights = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .select(col("source"), wRaw.as("__w"))
        val totals = d.agg(sum(col("n_tokens")).as("__tot")).crossJoin(
          weights.agg(
            sum(col("__w").cast(org.apache.spark.sql.types.DecimalType(24, 8)))
              .cast("double").as("__wsum")))
        val cum = graft.ops.PrefixSum.exclusiveSum(
          d.drop("__t"), Seq("source"), col("__q"), ascending = false,
          Seq(col("doc_id")), col("n_tokens"), "__cum_before", Some("sel_rank"))
        cum.join(broadcast(weights), "source")
          .crossJoin(broadcast(totals))
          .withColumn("quota", col("__w") / col("__wsum") * col("__tot").cast("double") * 0.25)
          .select(
            col("doc_id"), col("source"), col("n_tokens"), col("sel_rank"),
            (col("__cum_before").cast("double") < col("quota")).as("selected"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, len(${TextQueries.wsSql}) AS n,
              |         ${TextQueries.scoreSql(Text.stopwordsEn)} AS n_stop,
              |         len(list_distinct(${TextQueries.wsSql})) AS n_dist
              |       FROM documents),
              |q AS (SELECT doc_id, source, CAST(n AS BIGINT) AS n_tokens,
              |        (n_stop / n) * 0.4 + (n_dist / n) * 0.3
              |          + least(1.0, n / 100.0) * 0.3 AS quality
              |      FROM t),
              |s AS (SELECT source, count(*) AS n_docs FROM q GROUP BY 1),
              |tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM q),
              |ws AS (SELECT CAST(sum(CAST(${Num.roundSql("sqrt(CAST(n_docs AS DOUBLE))", 8)}
              |                            AS DECIMAL(24,8))) AS DOUBLE) AS wsum FROM s),
              |r AS (SELECT q.doc_id, q.source, q.n_tokens,
              |        row_number() OVER (PARTITION BY q.source
              |                           ORDER BY quality DESC, q.doc_id) AS sel_rank,
              |        sum(q.n_tokens) OVER (PARTITION BY q.source
              |                              ORDER BY quality DESC, q.doc_id
              |                              ROWS UNBOUNDED PRECEDING) AS cum,
              |        ${Num.roundSql("sqrt(CAST(s.n_docs AS DOUBLE))", 8)} / ws.wsum
              |          * tt.tot * 0.25 AS quota
              |      FROM q JOIN s USING (source) CROSS JOIN tt CROSS JOIN ws)
              |SELECT doc_id, source, n_tokens, sel_rank,
              |  CAST(cum - n_tokens AS DOUBLE) < quota AS selected
              |FROM r ORDER BY doc_id""".stripMargin)),

    // CURATION FUNNEL — the end-to-end keep/drop decision a training-
    // data pipeline actually ships, with per-doc attribution: every
    // stage signal (benchmark-source exclusion, language-ID, token-length
    // band, quality floor, character-entropy floor, best-copy dedup,
    // exact-shingle decontamination) is computed INDEPENDENTLY over the
    // full corpus (so attribution doesn't depend on stage order), then
    // keep = AND of all, drop_reason = first failing stage. Composes six
    // already-oracled formulas (q33/q69/q102/q108/q62) into one decision
    // table; all stage thresholds are corpus-calibrated.
    QueryDef(
      "q115_curation_funnel",
      (s, dir) => {
        val benchSrc = Seq("src15", "src16", "src17", "src18", "src19")
        val d = tbl(s, dir, "documents")
          .withColumn("__t", Text.tokensNorm(col("text")))
        val base = d.select(
          col("doc_id"), col("source"),
          (!col("source").isin(benchSrc: _*)).as("src_ok"),
          (Text.langIdFromTokens(col("__t"), col("text")) === "en").as("lang_ok"),
          size(col("__t")).between(20, 100).as("len_ok"),
          (Text.qualityScoreFromTokens(col("__t")) >= 0.30).as("quality_ok"),
          Text.fingerprintMd5(col("text")).as("__fp"),
          Text.qualityScoreFromTokens(col("__t")).as("__q"))
        val wDup = Window.partitionBy(col("__fp")).orderBy(col("__q").desc, col("doc_id").asc)
        val withDup = base.withColumn("dup_ok", row_number().over(wDup) === 1)
        val entCounts = d
          .select(col("doc_id"), length(col("text")).as("n"),
            explode(split(col("text"), "")).as("ch"))
          .filter(col("ch") =!= "")
          .groupBy(col("doc_id"), col("n"), col("ch"))
          .agg(count(lit(1)).as("c"))
        val p = col("c").cast("double") / col("n").cast("double")
        val ent = entCounts
          .groupBy(col("doc_id"), col("n"))
          .agg(sum(Num.roundTo((p * log(p) / log(lit(2.0))) * lit(-1.0), 12)
            .cast(org.apache.spark.sql.types.DecimalType(24, 12))).cast("double").as("__h"))
          .select(col("doc_id"), (col("__h") >= 4.0).as("entropy_ok"))
        val contam = graft.ext.Corpus
          .contaminationRates(d, "doc_id", "text", col("source").isin(benchSrc: _*), 3)
          .select(col("doc_id"), (col("rate") <= 0.15).as("__contam"))
        withDup
          .join(ent, "doc_id")
          .join(contam, Seq("doc_id"), "left")
          .withColumn("contam_ok", coalesce(col("__contam"), lit(true)))
          .withColumn("keep",
            col("src_ok") && col("lang_ok") && col("len_ok") && col("quality_ok") &&
              col("entropy_ok") && col("dup_ok") && col("contam_ok"))
          .withColumn("drop_reason",
            when(!col("src_ok"), "benchmark_source")
              .when(!col("lang_ok"), "language")
              .when(!col("len_ok"), "length")
              .when(!col("quality_ok"), "quality")
              .when(!col("entropy_ok"), "entropy")
              .when(!col("dup_ok"), "duplicate")
              .when(!col("contam_ok"), "contaminated")
              .otherwise("kept"))
          .select("doc_id", "source", "src_ok", "lang_ok", "len_ok", "quality_ok",
            "entropy_ok", "dup_ok", "contam_ok", "keep", "drop_reason")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, text, ${TextQueries.wsSql} AS ws FROM documents),
              |sc AS (SELECT doc_id,
              |         ${TextQueries.scoreSql(Text.stopwordsEn)} AS s_en,
              |         ${TextQueries.scoreSql(Text.stopwordsDe)} AS s_de,
              |         ${TextQueries.scoreSql(Text.stopwordsFr)} AS s_fr,
              |         ${TextQueries.scoreSql(Text.stopwordsEs)} AS s_es,
              |         length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS s_zh
              |       FROM documents),
              |lp AS (SELECT doc_id,
              |         CASE WHEN s_zh > 0 THEN 'zh'
              |              WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
              |              WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              |              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              |              WHEN s_fr >= s_es THEN 'fr'
              |              ELSE 'es' END AS lang_pred
              |       FROM sc),
              |qs AS (SELECT doc_id, len(ws) AS n,
              |         ${TextQueries.scoreSql(Text.stopwordsEn)} AS n_stop,
              |         len(list_distinct(ws)) AS n_dist,
              |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
              |       FROM t),
              |qq AS (SELECT doc_id, n, fp,
              |         (n_stop / n) * 0.4 + (n_dist / n) * 0.3
              |           + least(1.0, n / 100.0) * 0.3 AS quality
              |       FROM qs),
              |dup AS (SELECT doc_id,
              |          row_number() OVER (PARTITION BY fp
              |                             ORDER BY quality DESC, doc_id) = 1 AS dup_ok
              |        FROM qq),
              |ch AS (SELECT doc_id, length(text) AS nc, substr(text, i, 1) AS c1
              |       FROM documents CROSS JOIN range(1, 4001) t(i)
              |       WHERE i <= length(text)),
              |g AS (SELECT doc_id, nc, c1, count(*) AS c FROM ch GROUP BY 1, 2, 3),
              |e AS (SELECT doc_id,
              |        CAST(sum(CAST(${Num.roundSql("((c / nc) * ln(c / nc) / ln(2)) * -1.0", 12)}
              |                      AS DECIMAL(24,12))) AS DOUBLE) >= 4.0 AS entropy_ok
              |      FROM g GROUP BY doc_id),
              |sh AS (SELECT DISTINCT w.doc_id, w.ws[i] || ' ' || w.ws[i+1] || ' ' || w.ws[i+2] AS shingle
              |       FROM t w CROSS JOIN range(1, 1000) r(i) WHERE i <= len(w.ws) - 2),
              |b AS (SELECT DISTINCT shingle FROM sh
              |      JOIN documents d ON sh.doc_id = d.doc_id
              |      WHERE d.source IN ('src15','src16','src17','src18','src19')),
              |cr AS (SELECT r.doc_id,
              |         CAST(count(b.shingle) AS DOUBLE) / CAST(count(*) AS DOUBLE) <= 0.15 AS contam0
              |       FROM (SELECT sh.doc_id, sh.shingle FROM sh
              |             JOIN documents d ON sh.doc_id = d.doc_id
              |             WHERE d.source NOT IN ('src15','src16','src17','src18','src19')) r
              |       LEFT JOIN b ON r.shingle = b.shingle
              |       GROUP BY r.doc_id),
              |f AS (SELECT d.doc_id, d.source,
              |        d.source NOT IN ('src15','src16','src17','src18','src19') AS src_ok,
              |        lp.lang_pred = 'en' AS lang_ok,
              |        qq.n BETWEEN 20 AND 100 AS len_ok,
              |        qq.quality >= 0.30 AS quality_ok,
              |        e.entropy_ok AS entropy_ok,
              |        dup.dup_ok AS dup_ok,
              |        coalesce(cr.contam0, TRUE) AS contam_ok
              |      FROM documents d
              |      JOIN lp USING (doc_id) JOIN qq USING (doc_id) JOIN dup USING (doc_id)
              |      JOIN e USING (doc_id) LEFT JOIN cr USING (doc_id))
              |SELECT doc_id, source, src_ok, lang_ok, len_ok, quality_ok, entropy_ok,
              |  dup_ok, contam_ok,
              |  src_ok AND lang_ok AND len_ok AND quality_ok AND entropy_ok
              |    AND dup_ok AND contam_ok AS keep,
              |  CASE WHEN NOT src_ok THEN 'benchmark_source'
              |       WHEN NOT lang_ok THEN 'language'
              |       WHEN NOT len_ok THEN 'length'
              |       WHEN NOT quality_ok THEN 'quality'
              |       WHEN NOT entropy_ok THEN 'entropy'
              |       WHEN NOT dup_ok THEN 'duplicate'
              |       WHEN NOT contam_ok THEN 'contaminated'
              |       ELSE 'kept' END AS drop_reason
              |FROM f ORDER BY doc_id""".stripMargin)))
}
