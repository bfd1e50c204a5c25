package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 twenty-second batch: sequential episode mining — support /
  * confidence / dwell time for gap-constrained event SEQUENCES (A
  * followed by B within one hour). The ordered, time-bounded cousin of
  * q225's unordered basket rules and q167's adjacent-step Markov
  * transitions: an episode counts however many events sit between A and
  * B as long as B lands inside A's window.
  *
  * Scale shape: the pair join is keyed on (user, hour-bucket) with the
  * probe side covering its two candidate buckets (the q207 interval
  * recipe) — never an unbounded per-user cross of full histories; pair
  * volume is Σ events-per-window, linear in the corpus at fixed window.
  * Support/confidence divide exact distinct-user counts; dwell is a
  * DECIMAL mean of integral microsecond gaps.
  */
object Extended56 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** Episode window: B within one hour after A (strictly later — equal
    * timestamps are not ordered evidence).
    */
  private val WinUs = 3600000000L

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q301_episode_mining",
      (s, dir) => {
        val e = tbl(s, dir, "events").select(
          col("user_id").as("u"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        val a = e.select(col("u"), col("event_type").as("ta"),
            col("us").as("ta_us"),
            explode(array(
              floor(col("us") / WinUs),
              floor(col("us") / WinUs) + 1)).as("bk"))
        val b = e.select(col("u"), col("event_type").as("tb"),
          col("us").as("tb_us"),
          floor(col("us") / WinUs).as("bk"))
        val pairs = a.join(b, Seq("u", "bk"))
          .filter(col("tb_us") > col("ta_us") &&
            col("tb_us") <= col("ta_us") + WinUs)
        val ep = pairs.groupBy(col("ta"), col("tb")).agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("u")).as("n_users"),
          sum((col("tb_us") - col("ta_us")).cast(DecimalType(28, 0))).as("gap_sum"))
        val base = e.groupBy(col("event_type").as("ta"))
          .agg(countDistinct(col("u")).as("n_users_a"))
        val tot = e.agg(countDistinct(col("u")).as("n_total_users"))
        ep.join(broadcast(base), "ta")
          .crossJoin(broadcast(tot))
          .select(col("ta"), col("tb"), col("n_pairs"), col("n_users"),
            col("n_users_a"),
            R(col("n_users").cast("double") / col("n_total_users"), 6)
              .as("support_r"),
            R(col("n_users").cast("double") / col("n_users_a"), 6)
              .as("confidence_r"),
            R(col("gap_sum").cast("double") / col("n_pairs") / 1000000.0, 4)
              .as("avg_gap_s_r"))
          .orderBy("ta", "tb")
      },
      Some(s"""WITH e AS (
              |  SELECT user_id AS u, event_type, epoch_us(ts) AS us FROM events),
              |pairs AS (
              |  SELECT a.u, a.event_type AS ta, b.event_type AS tb,
              |    b.us - a.us AS gap
              |  FROM e a JOIN e b ON a.u = b.u
              |    AND b.us > a.us AND b.us <= a.us + $WinUs),
              |ep AS (
              |  SELECT ta, tb, COUNT(*) AS n_pairs,
              |    COUNT(DISTINCT u) AS n_users,
              |    SUM(CAST(gap AS DECIMAL(28,0))) AS gap_sum
              |  FROM pairs GROUP BY ta, tb),
              |base AS (
              |  SELECT event_type AS ta, COUNT(DISTINCT u) AS n_users_a
              |  FROM e GROUP BY event_type),
              |tot AS (SELECT COUNT(DISTINCT u) AS n_total_users FROM e)
              |SELECT ep.ta, ep.tb, ep.n_pairs, ep.n_users, base.n_users_a,
              |  ${rs("CAST(ep.n_users AS DOUBLE) / n_total_users", 6)} AS support_r,
              |  ${rs("CAST(ep.n_users AS DOUBLE) / base.n_users_a", 6)} AS confidence_r,
              |  ${rs("CAST(gap_sum AS DOUBLE) / n_pairs / 1000000.0", 4)} AS avg_gap_s_r
              |FROM ep JOIN base ON base.ta = ep.ta CROSS JOIN tot
              |ORDER BY ep.ta, tb""".stripMargin))
  )
}
