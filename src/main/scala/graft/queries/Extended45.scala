package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 eighteenth batch: corpus keyword extraction and compaction
  * planning —
  *
  *  - q269 RAKE keyword extraction: stopword-delimited candidate phrases
  *    scored by Σ deg(w)/freq(w) over member words — the classic
  *    unsupervised keyworder (complements q65 TF-IDF's per-doc weights
  *    and q158 PMI's pair collocations with multi-word phrase units).
  *    Word scores are integer-ratio doubles rounded to DECIMAL(20,10),
  *    so phrase sums are order-free exact.
  *  - q270 compaction planning via first-fit-decreasing bin packing: the
  *    small-files problem — plan how per-source files coalesce into
  *    ~capacity-sized outputs. The greedy FFD walk is inherently
  *    sequential PER SOURCE (bin loads mutate step by step) and runs as
  *    one integer `aggregate` HOF fold per group — embarrassingly
  *    parallel across sources, zero driver state, the DTW/Holt pattern
  *    on exact BIGINTs. The oracle steps the identical walk with a
  *    list-carrying WITH RECURSIVE.
  */
object Extended45 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** Shared tokenizer (graft.ext.Text / TextQueries.wsSql parity). */
  private val wsSql = "string_split_regex(trim(lower(text)), '\\s+')"

  private val Stop = Seq("the", "a")
  private def stopIn = Stop.map(w => s"'$w'").mkString("(", ",", ")")

  /** q270: top files per source considered by the planner (bounds the
    * sequential walk regardless of corpus size) and target bin capacity
    * in characters.
    */
  private val TopFiles = 200
  private val Cap = 1200L

  val all: Seq[QueryDef] = Seq(

    // ----- q269: RAKE keyword extraction --------------------------------
    QueryDef(
      "q269_rake_keywords",
      (s, dir) => {
        val words = tbl(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(split(trim(lower(col("text"))), "\\s+")))
          .toDF("doc_id", "pos", "word")
          .filter(length(col("word")) > 0)
          .withColumn("stop", col("word").isin(Stop: _*))
        val isl = words.withColumn("island",
          sum(col("stop").cast("long")).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        val pw = isl.filter(!col("stop"))
          .select(col("doc_id"), col("island"), col("pos"), col("word"))
        val phrases = pw.groupBy(col("doc_id"), col("island"))
          .agg(array_join(transform(
              sort_array(collect_list(struct(col("pos"), col("word")))),
              e => e.getField("word")), " ").as("phrase"),
            count(lit(1)).as("len"))
        val occs = pw.join(phrases, Seq("doc_id", "island"))
        val wstats = occs.groupBy(col("word"))
          .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
          .withColumn("score_dec",
            R(col("deg").cast("double") / col("freq").cast("double"), 10)
              .cast(DecimalType(20, 10)))
        val pscore = occs.join(wstats.select(col("word"), col("score_dec")), "word")
          .groupBy(col("doc_id"), col("island"), col("phrase"), col("len"))
          .agg(sum(col("score_dec")).as("ps"))
        pscore.groupBy(col("phrase"))
          .agg(count(lit(1)).as("n_occurrences"),
            max(col("len")).as("n_words"), max(col("ps")).as("ps"))
          .select(col("phrase"), col("n_occurrences"), col("n_words"),
            R(col("ps").cast("double"), 6).as("score_r"))
          .orderBy(col("score_r").desc, col("phrase"))
          .limit(25)
      },
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
              |tok AS (
              |  SELECT doc_id, i AS pos, ws[i] AS word,
              |    ws[i] IN $stopIn AS stop
              |  FROM w CROSS JOIN range(1, 1000) t(i)
              |  WHERE i <= len(ws) AND length(ws[i]) > 0),
              |isl AS (
              |  SELECT *, sum(CASE WHEN stop THEN 1 ELSE 0 END)
              |    OVER (PARTITION BY doc_id ORDER BY pos) AS island
              |  FROM tok),
              |pw AS (
              |  SELECT doc_id, island, pos, word FROM isl WHERE NOT stop),
              |phrases AS (
              |  SELECT doc_id, island,
              |    string_agg(word, ' ' ORDER BY pos) AS phrase,
              |    count(*) AS len
              |  FROM pw GROUP BY 1, 2),
              |occs AS (
              |  SELECT pw.*, p.phrase, p.len
              |  FROM pw JOIN phrases p USING (doc_id, island)),
              |wstats AS (
              |  SELECT word, count(*) AS freq, sum(len) AS deg
              |  FROM occs GROUP BY 1),
              |ws2 AS (
              |  SELECT word,
              |    CAST(${rs("CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)", 10)}
              |      AS DECIMAL(20,10)) AS score_dec
              |  FROM wstats),
              |pscore AS (
              |  SELECT o.doc_id, o.island, o.phrase, o.len,
              |    sum(score_dec) AS ps
              |  FROM occs o JOIN ws2 USING (word)
              |  GROUP BY 1, 2, 3, 4)
              |SELECT phrase, count(*) AS n_occurrences,
              |  CAST(max(len) AS BIGINT) AS n_words,
              |  ${rs("CAST(max(ps) AS DOUBLE)", 6)} AS score_r
              |FROM pscore GROUP BY phrase
              |ORDER BY score_r DESC, phrase
              |LIMIT 25""".stripMargin),
    ),

    // ----- q270: first-fit-decreasing compaction plan -------------------
    QueryDef(
      "q270_ffd_compaction",
      (s, dir) => {
        val wTop = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        val files = tbl(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= TopFiles)
        val packed = files.groupBy(col("source"))
          .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("total_chars"),
            // sort key (-size, doc_id): FFD considers biggest first
            transform(sort_array(collect_list(
                struct((-col("n_chars")).as("neg"), col("doc_id")))),
              e => -e.getField("neg")).as("items"))
          .withColumn("bins", expr(
            s"""aggregate(items, CAST(array() AS ARRAY<BIGINT>),
               |  (bins, x) -> CASE
               |    WHEN size(filter(bins, b -> b + x <= $Cap)) = 0
               |      THEN array_append(bins, x)
               |    ELSE transform(bins, (b, i) ->
               |      CASE WHEN i = array_position(bins,
               |          filter(bins, b2 -> b2 + x <= $Cap)[0]) - 1
               |        THEN b + x ELSE b END)
               |  END)""".stripMargin))
        packed.select(col("source"), col("n_files"), col("total_chars"),
            size(col("bins")).cast("long").as("n_bins"),
            expr("array_max(bins)").as("max_bin"),
            expr("array_min(bins)").as("min_bin"),
            R(col("total_chars").cast("double") /
              (size(col("bins")).cast("double") * Cap.toDouble), 6).as("util_r"))
          .orderBy(col("source"))
      },
      Some(s"""WITH RECURSIVE files AS (
              |  SELECT source, doc_id, n_chars,
              |    row_number() OVER (PARTITION BY source
              |      ORDER BY n_chars DESC, doc_id) AS rn
              |  FROM documents
              |  QUALIFY rn <= $TopFiles),
              |it AS (
              |  SELECT source, 0 AS k, CAST([] AS BIGINT[]) AS bins
              |  FROM files GROUP BY source
              |  UNION ALL
              |  SELECT it.source, it.k + 1,
              |    CASE
              |      WHEN len(list_filter(it.bins, b -> b + f.n_chars <= $Cap)) = 0
              |        THEN list_append(it.bins, f.n_chars)
              |      ELSE list_transform(it.bins, (b, i) ->
              |        CASE WHEN i = list_position(it.bins,
              |            list_filter(it.bins, b2 -> b2 + f.n_chars <= $Cap)[1])
              |          THEN b + f.n_chars ELSE b END)
              |    END
              |  FROM it JOIN files f ON f.source = it.source AND f.rn = it.k + 1),
              |fin AS (
              |  SELECT source, max_by(bins, k) AS bins, max(k) AS n_files
              |  FROM it GROUP BY source),
              |tot AS (
              |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars
              |  FROM files GROUP BY source)
              |SELECT f.source, f.n_files, t.total_chars,
              |  CAST(len(f.bins) AS BIGINT) AS n_bins,
              |  CAST(list_max(f.bins) AS BIGINT) AS max_bin,
              |  CAST(list_min(f.bins) AS BIGINT) AS min_bin,
              |  ${rs(s"CAST(t.total_chars AS DOUBLE) / (CAST(len(f.bins) AS DOUBLE) * $Cap)", 6)} AS util_r
              |FROM fin f JOIN tot t USING (source)
              |ORDER BY f.source""".stripMargin),
    )
  )
}
