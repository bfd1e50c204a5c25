package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num
import QueryDef.tbl

/** Round-9 twentieth batch: greedy 1-to-1 order matching — the
  * assignment/matching family (distinct from q43's as-of join, which
  * reuses the same purchase for every signup; here each purchase is
  * CONSUMED by its match). Within each user, signup↔purchase candidate
  * pairs inside a 4-hour window are taken greedily by (lag, ids); a pair
  * is accepted only if both endpoints are still unmatched — the classic
  * order-book / entity-reconciliation greedy, yielding a maximal (not
  * maximum) matching deterministically.
  *
  * The accept/reject walk is inherently sequential per user (whether a
  * pair is taken depends on every earlier acceptance), so it runs as one
  * struct-state `aggregate` HOF fold over the per-user candidate array —
  * bounded by per-user activity, embarrassingly parallel across users,
  * exact integer arithmetic throughout. The oracle replays the identical
  * walk with a list-carrying WITH RECURSIVE.
  */
object Extended47 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** Candidate window: purchase within 4 h after the signup. */
  private val WinUs = 4L * 3600000000L

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q273_order_matching",
      (s, dir) => {
        val e = tbl(s, dir, "events")
        val su = e.filter(col("event_type") === "signup")
          .select(col("user_id"), unix_micros(col("ts")).as("st"),
            col("event_id").as("sid"))
        val pu = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"), unix_micros(col("ts")).as("pt"),
            col("event_id").as("pid"))
        val cands = su.join(pu,
            col("p_uid") === col("user_id") &&
              col("pt") >= col("st") && col("pt") - col("st") <= WinUs)
          .select(col("user_id"), (col("pt") - col("st")).as("lag"),
            col("sid"), col("pid"))
        val folded = cands.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_cands"),
            countDistinct(col("sid")).as("n_signups"),
            countDistinct(col("pid")).as("n_purchases"),
            sort_array(collect_list(
              struct(col("lag"), col("sid"), col("pid")))).as("cs"))
          .withColumn("acc", expr(
            """aggregate(cs,
              |  named_struct('s', CAST(array() AS ARRAY<BIGINT>),
              |               'p', CAST(array() AS ARRAY<BIGINT>),
              |               'n', 0L, 'lagsum', 0L),
              |  (acc, x) -> IF(array_contains(acc.s, x.sid) OR
              |                 array_contains(acc.p, x.pid),
              |    acc,
              |    named_struct('s', array_append(acc.s, x.sid),
              |                 'p', array_append(acc.p, x.pid),
              |                 'n', acc.n + 1L,
              |                 'lagsum', acc.lagsum + x.lag)))""".stripMargin))
        folded.select(col("user_id"), col("n_cands"),
            col("n_signups"), col("n_purchases"),
            expr("acc.n").as("n_matched"),
            expr("acc.lagsum div 1000000").as("sum_lag_s"),
            R(expr("CAST(acc.lagsum AS DOUBLE) / CAST(acc.n AS DOUBLE)") / 1.0e6, 3)
              .as("mean_lag_s_r"))
          .orderBy("user_id")
      },
      Some(s"""WITH RECURSIVE su AS (
              |  SELECT user_id, epoch_us(ts) AS st, event_id AS sid
              |  FROM events WHERE event_type = 'signup'),
              |pu AS (
              |  SELECT user_id, epoch_us(ts) AS pt, event_id AS pid
              |  FROM events WHERE event_type = 'purchase'),
              |cands AS (
              |  SELECT su.user_id, pt - st AS lag, sid, pid,
              |    row_number() OVER (PARTITION BY su.user_id
              |      ORDER BY pt - st, sid, pid) AS rn
              |  FROM su JOIN pu ON pu.user_id = su.user_id
              |   AND pu.pt >= su.st AND pu.pt - su.st <= $WinUs),
              |it AS (
              |  SELECT user_id, 0 AS k,
              |    CAST([] AS BIGINT[]) AS ms, CAST([] AS BIGINT[]) AS mp,
              |    CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS lagsum
              |  FROM cands GROUP BY user_id
              |  UNION ALL
              |  SELECT it.user_id, it.k + 1,
              |    CASE WHEN list_contains(it.ms, c.sid) OR list_contains(it.mp, c.pid)
              |      THEN it.ms ELSE list_append(it.ms, c.sid) END,
              |    CASE WHEN list_contains(it.ms, c.sid) OR list_contains(it.mp, c.pid)
              |      THEN it.mp ELSE list_append(it.mp, c.pid) END,
              |    it.n + CASE WHEN list_contains(it.ms, c.sid) OR list_contains(it.mp, c.pid)
              |      THEN 0 ELSE 1 END,
              |    it.lagsum + CASE WHEN list_contains(it.ms, c.sid) OR list_contains(it.mp, c.pid)
              |      THEN 0 ELSE c.lag END
              |  FROM it JOIN cands c
              |    ON c.user_id = it.user_id AND c.rn = it.k + 1),
              |fin AS (
              |  SELECT user_id, max(k) AS n_cands,
              |    max_by(n, k) AS n_matched, max_by(lagsum, k) AS lagsum
              |  FROM it GROUP BY user_id),
              |sz AS (
              |  SELECT user_id, count(DISTINCT sid) AS n_signups,
              |    count(DISTINCT pid) AS n_purchases
              |  FROM cands GROUP BY user_id)
              |SELECT f.user_id, f.n_cands, s.n_signups, s.n_purchases,
              |  f.n_matched, f.lagsum // 1000000 AS sum_lag_s,
              |  ${rs("(CAST(f.lagsum AS DOUBLE) / CAST(f.n_matched AS DOUBLE)) / 1.0e6", 3)} AS mean_lag_s_r
              |FROM fin f JOIN sz s USING (user_id)
              |ORDER BY f.user_id""".stripMargin),
    )
  )
}
