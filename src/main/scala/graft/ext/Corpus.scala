package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relation operators for training-data curation: the exploded
  * token relation and the document-level analyses built on it — TF-IDF
  * term ranking, intra-document repetition scoring (boilerplate/spam
  * filter), and benchmark-contamination rates (n-gram overlap against a
  * held-out set).
  *
  * Scale design: everything is explode → hash-aggregate → (broadcast or
  * shuffle) join on computed keys. No per-document collect, no
  * driver-side loops; the token/shingle relations are a small multiple of
  * the text size and partition freely. Rankings that feed row_number use
  * integer keys with total tie-breaks (term frequency, then the token
  * string) so results are deterministic across engines and partitionings
  * — floats only ever appear in OUTPUT columns, never in ordering.
  */
object Corpus {

  /** (doc_id, pos, tok) — whitespace tokens exploded with their 0-based
    * position. The generator (UDTF-shaped) surface of the text stack.
    * NOT cached by default — same policy (and rationale) as
    * Dedup.shingleRel: plan-build-time `.cache()` has no unpersist scope
    * and leaks for the session; within one query ReuseExchange dedupes
    * the identical subplans, and batch jobs that want cross-query reuse
    * opt in with cache=true (or checkpoint to parquet at 100 TB).
    */
  def tokenRel(df: DataFrame, idCol: String, textCol: String, cache: Boolean = false): DataFrame = {
    val rel = df.select(
        col(idCol).as("doc_id"),
        posexplode(Text.tokensNorm(col(textCol))).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    if (cache) rel.cache() else rel
  }

  /** Per-(doc, token) term frequencies. */
  def termFreq(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenRel(df, idCol, textCol)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k TF-IDF terms per document: (doc_id, rnk, tok, tf, score) with
    * idf = ln((N+1)/(df+1)) + 1 (smoothed; never negative). Ranking is on
    * (tf DESC, tok ASC) — exact integers + strings, so the row_number is
    * deterministic; the double-valued score is output-only.
    *
    * Document frequency comes from re-aggregating the tf relation (one
    * row per doc×token already), and N rides along as a broadcast scalar
    * — two small hash aggregates over the token relation, no self-join.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFreq(df, idCol, textCol)
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df_t"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val ranked = tf
      .withColumn(
        "rnk",
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("tf").desc, col("tok").asc)))
      .filter(col("rnk") <= k)
    ranked
      .join(dfreq, "tok")
      .crossJoin(nDocs)
      .select(
        col("doc_id"), col("rnk"), col("tok"), col("tf"),
        (col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df_t") + 1).cast("double")) + 1))
          .as("score"))
  }

  /** Intra-document repetition stats: (doc_id, n_tokens, top_tok_n,
    * top_ratio) where top_ratio = occurrences of the most frequent token /
    * total tokens — the cheap boilerplate/keyword-stuffing signal (real
    * pipelines threshold it, e.g. ratio ≥ 0.12 → drop).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    termFreq(df, idCol, textCol)
      .groupBy(col("doc_id"))
      .agg(max(col("tf")).as("top_tok_n"), sum(col("tf")).cast("bigint").as("n_tokens"))
      .select(
        col("doc_id"), col("n_tokens"), col("top_tok_n"),
        (col("top_tok_n").cast("double") / col("n_tokens").cast("double")).as("top_ratio"))

  /** Benchmark-contamination rates: for every document NOT in the
    * benchmark set, the fraction of its distinct k-gram shingles that
    * also occur in the benchmark set (`benchFilter` selects benchmark
    * rows of `df`). Output: (doc_id, n_sh, n_contam, rate). Documents
    * with fewer than k tokens have no shingles and are not scored.
    *
    * Shingles are compared by 64-bit hash (2⁻⁶⁴-scale collision odds on a
    * corpus dictionary — immaterial), so the benchmark set that ships to
    * the join is 8 bytes per distinct shingle: at 100 TB the benchmark
    * side is typically small enough to broadcast, and the scan side
    * streams once.
    */
  def contaminationRates(
      df: DataFrame, idCol: String, textCol: String,
      benchFilter: Column, k: Int): DataFrame = {
    val rel = Dedup.shingleRel(df, idCol, textCol, k)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
    val isBench = df.select(col(idCol).as("doc_id"), benchFilter.as("__is_bench"))
    val tagged = rel.join(isBench, "doc_id")
    val bench = tagged.filter(col("__is_bench")).select(col("sh_h")).distinct()
      .withColumn("__hit", lit(1))
    tagged.filter(!col("__is_bench"))
      .join(bench, Seq("sh_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"), count(col("__hit")).as("n_contam"))
      .select(
        col("doc_id"), col("n_sh"), col("n_contam"),
        (col("n_contam").cast("double") / col("n_sh").cast("double")).as("rate"))
  }

  /** (doc_id, pidx, passage): NON-OVERLAPPING k-token passages — the
    * span-level unit for C4-style repeated-passage removal (unlike
    * shingles, which overlap and serve similarity; a ragged tail shorter
    * than k is dropped, so every passage compares equal-length).
    */
  def passageRel(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), Text.tokensNorm(col(textCol)).as("__ws"))
      .select(
        col("doc_id"),
        posexplode(
          when(size(col("__ws")) >= k,
            transform(
              sequence(lit(0), (size(col("__ws")) / k).cast("int") - 1),
              j => concat_ws(" ", slice(col("__ws"), j * k + 1, lit(k)))))
            .otherwise(array().cast("array<string>"))).as(Seq("pidx", "passage")))

  /** Passage-level duplication profile per document: how much of each
    * doc consists of k-token passages that appear elsewhere in the
    * corpus (or repeat within the doc) — the C4/RefinedWeb-style
    * span-dedup signal that document-level fingerprints miss when only
    * a boilerplate block is shared. keep = duplicated fraction < 0.5.
    *
    * Scale: one passage hash-agg for corpus counts, one join back, one
    * per-doc agg — all on equi keys; passages are non-overlapping so the
    * relation is ≤ tokens/k rows, SMALLER than the token relation.
    */
  /** The TRANSFORMATION behind [[passageDupStats]]: rebuild each doc's
    * text with corpus-duplicated k-token passages REMOVED, in original
    * passage order (plus the ragged tail, which never participates in
    * dedup) — the C4-style span-cleaning step itself, not just its
    * report. Docs shorter than k pass through normalized-whole.
    *
    * Order preservation costs no sort shuffle: surviving passages are
    * re-assembled per doc with a sort_array over (pidx, passage) structs
    * inside one hash aggregate.
    */
  def passageDedupText(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val rel = passageRel(df, idCol, textCol, k)
    val counts = rel.groupBy(col("passage")).agg(count(lit(1)).as("__cnt"))
    val kept = rel.join(counts, "passage")
      .filter(col("__cnt") === 1)
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            sort_array(collect_list(struct(col("pidx"), col("passage")))),
            x => x.getField("passage")),
          " ").as("__kept"))
    val ws = Text.tokensNorm(col(textCol))
    val tail = when(size(ws) >= k,
        concat_ws(" ", slice(ws, (size(ws) / k).cast("int") * k + 1, size(ws))))
      .otherwise(concat_ws(" ", ws))
    df.select(col(idCol).as("doc_id"), tail.as("__tail"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        concat_ws(" ", coalesce(col("__kept"), lit("")), col("__tail")).as("clean_text"))
      .withColumn("clean_text",
        // concat_ws of empty parts can leave edge spaces; normalize once
        regexp_replace(trim(col("clean_text")), " +", " "))
  }

  def passageDupStats(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val rel = passageRel(df, idCol, textCol, k)
    val counts = rel.groupBy(col("passage")).agg(count(lit(1)).as("__cnt"))
    val stats = rel.join(counts, "passage")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_pass"),
        count(when(col("__cnt") > 1, 1)).as("n_dup"))
    val frac = coalesce(
      col("n_dup").cast("double") / col("n_pass").cast("double"), lit(0.0))
    df.select(col(idCol).as("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_pass"), lit(0L)).as("n_pass"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        frac.as("dup_frac"),
        (frac < 0.5).as("keep"))
  }
}
