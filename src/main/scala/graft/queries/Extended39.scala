package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num
import QueryDef.tbl

/** Round-9 twelfth batch: weighted sampling WITHOUT replacement
  * (Efraimidis–Spirakis exponential race — the distributed top-k form;
  * q107's Bernoulli keep is with-replacement-style thinning and cannot
  * hit an exact k), and anomalous-actor detection (rate outliers vs a
  * corpus percentile — the bot screen that runs BEFORE q247's SRM reads
  * an experiment).
  */
object Extended39 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // ----- q254: weighted reservoir (Efraimidis–Spirakis) ---------------
    // Exact-k weighted sample without replacement: each doc draws a
    // deterministic uniform u (md5 48-bit fraction — engine-neutral),
    // races with key = −ln(u)/w (exponential with rate w = n_chars),
    // and the k smallest keys win — P(doc in sample) rises with w, no
    // second pass, no global state: the ONE weighted-sampling scheme
    // that distributes as a TakeOrdered top-k at any corpus size.
    // Exactness: u is an exact 48-bit integer ratio; the key is one
    // shared ln shape; ranking happens on pre-rounded doubles identical
    // on both engines (md5 keys make cross-engine ties impossible in
    // practice; doc_id tie-break makes the order total regardless).
    QueryDef(
      "q254_weighted_reservoir",
      (s, dir) => {
        val u = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("double") / lit(2.81474976710656E14) // 2^48
        val key = -log(col("u")) / col("w")
        tbl(s, dir, "documents")
          .select(col("doc_id"), col("n_chars").cast("double").as("w"))
          .withColumn("u", u)
          .withColumn("k", key)
          .orderBy(col("k").asc, col("doc_id").asc)
          .limit(20)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("k").asc, col("doc_id").asc)).cast("long"))
          .select(col("rank"), col("doc_id"), col("w").cast("long").as("n_chars"),
            R(col("u"), 8).as("u_r"), R(col("k") * 1e6, 6).as("key_ppm_r"))
      },
      Some(s"""WITH keyed AS (
              |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
              |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
              |      / 2.81474976710656E14 AS u
              |  FROM documents),
              |raced AS (
              |  SELECT *, -ln(u) / w AS k FROM keyed
              |  ORDER BY k ASC, doc_id ASC LIMIT 20),
              |ranked AS (
              |  SELECT *, CAST(row_number() OVER (ORDER BY k ASC, doc_id ASC) AS BIGINT) AS rank
              |  FROM raced)
              |SELECT rank, doc_id, CAST(w AS BIGINT) AS n_chars,
              |  ${rs("u", 8)} AS u_r,
              |  ${rs("k * 1e6", 6)} AS key_ppm_r
              |FROM ranked ORDER BY rank""".stripMargin)),

    // ----- q255: anomalous-actor (rate outlier) screen ------------------
    // Flag users whose events-per-active-minute rate exceeds the corpus
    // p95 — the bot/script screen run before experiment readouts (a few
    // scripted actors shift q247's arm sizes and q183's means). The
    // threshold is RELATIVE (exact interpolating percentile, q47
    // parity), so the screen stays non-vacuous at every corpus scale —
    // a fixed absolute rate threshold silently passes everything on
    // quiet fixtures. Exactness: counts are integers; the rate and the
    // percentile comparison are shared double shapes. Shape: one user
    // agg, one broadcast scalar, flagged output only.
    QueryDef(
      "q255_rate_outliers",
      (s, dir) => {
        val users = tbl(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(date_trunc("minute", col("ts"))).as("active_min"))
          .withColumn("rate",
            col("n_events").cast("double") / col("active_min").cast("double"))
        val thr = users.agg(percentile(col("rate"), lit(0.95)).as("p95"),
          count(lit(1)).as("n_users"))
        users.crossJoin(broadcast(thr))
          .filter(col("rate") > col("p95"))
          .select(col("user_id"), col("n_events"), col("active_min"),
            R(col("rate"), 6).as("rate_r"),
            R(col("p95"), 6).as("p95_r"),
            col("n_users"))
          .orderBy("user_id")
      },
      Some(s"""WITH users AS (
              |  SELECT user_id, count(*) AS n_events,
              |    count(DISTINCT date_trunc('minute', ts)) AS active_min
              |  FROM events GROUP BY 1),
              |wr AS (
              |  SELECT *, CAST(n_events AS DOUBLE) / CAST(active_min AS DOUBLE) AS rate
              |  FROM users),
              |thr AS (
              |  SELECT quantile_cont(rate, 0.95) AS p95, count(*) AS n_users FROM wr)
              |SELECT user_id, n_events, active_min,
              |  ${rs("rate", 6)} AS rate_r,
              |  ${rs("p95", 6)} AS p95_r,
              |  n_users
              |FROM wr CROSS JOIN thr
              |WHERE rate > p95
              |ORDER BY user_id""".stripMargin))
  )
}
