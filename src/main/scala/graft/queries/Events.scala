package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Sessions
import graft.ops.Num
import QueryDef.tbl

/** Event-stream operators in their batch form (SURVEY.md §2.10): tumbling
  * event-time windows, gaps-and-islands sessionization, and semi-structured
  * JSON extraction. The same logic runs as Structured Streaming in
  * graft.ext.Streaming (watermarks + session_window); these batch
  * equivalents are the oracle-checkable surface.
  */
object Events {

  val all: Seq[QueryDef] = Seq(
    // Tumbling 1-hour event-time window via Spark's window() — rendered as
    // the window start string so the oracle (date_trunc) compares exactly.
    QueryDef(
      "q28_events_hourly",
      (s, dir) =>
        tbl(s, dir, "events")
          .groupBy(
            window(col("ts"), "1 hour").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), Num.roundTo(avg(col("value")), 4).as("avg_value"))
          .select(
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
            col("event_type"), col("n"), col("avg_value"))
          .orderBy("hour_start", "event_type"),
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
              |  event_type, count(*) AS n, ${Num.roundSql("avg(value)", 4)} AS avg_value
              |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin)),

    // Sessionization (30-min gap), per-session rollup.
    QueryDef(
      "q29_sessionize",
      (s, dir) =>
        Sessions
          .summarize(
            Sessions.assign(tbl(s, dir, "events"), "user_id", "ts", 1800, Seq(col("event_id"))),
            "user_id", "ts", "value")
          .select(
            col("user_id"), col("session_id"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("start_s"),
            date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("end_s"),
            col("n_events"), Num.roundTo(col("value_sum"), 4).as("value_sum_r"))
          .orderBy("user_id", "session_id"),
      Some(s"""WITH e AS (
              |  SELECT user_id, event_id, ts, value,
              |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
              |    lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
              |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
              |  FROM events),
              |f AS (
              |  SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
              |                 THEN 1 ELSE 0 END AS is_new
              |  FROM e),
              |g AS (
              |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                                   ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
              |              AS session_id
              |  FROM f)
              |SELECT user_id, session_id,
              |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
              |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_s,
              |  count(*) AS n_events,
              |  ${Num.roundSql("sum(value)", 4)} AS value_sum_r
              |FROM g GROUP BY user_id, session_id
              |ORDER BY user_id, session_id""".stripMargin)),

    // Semi-structured extraction: JSON props → typed column, then
    // aggregate. get_json_object is a codegen'd path expression.
    QueryDef(
      "q30_events_json",
      (s, dir) =>
        tbl(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k")).as("sum_k"),
            count(when(col("k") > 50, 1)).as("n_high"),
            count(col("k")).as("n_with_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END)
             |    AS n_high,
             |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)))
}
