package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{AsOf, Multimodal}
import graft.ops.{Aggregates, Num}
import QueryDef.tbl

/** Extended target-spec operators: as-of (point-in-time) join and CUBE
  * with dispersion statistics.
  */
object Extended {

  val all: Seq[QueryDef] = Seq(
    // As-of join: for each purchase event, the user's latest click value
    // at-or-before the purchase. Composed union+window plan (see
    // ext/AsOf.scala) — deterministic tie rules, so fully oracled.
    QueryDef(
      "q43_asof_join",
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        AsOf.asofJoin(purchases, clicks, "user_id", "ts", Seq("value"), "event_id")
          .select(
            col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
            Num.roundTo(col("asof_value"), 4).as("last_click_value"))
          .orderBy("event_id")
      },
      Some(s"""WITH u AS (
              |  SELECT user_id, ts, event_id, value, 1 AS is_r, NULL AS p_event
              |  FROM events WHERE event_type = 'click'
              |  UNION ALL
              |  SELECT user_id, ts, event_id, NULL, 0, event_id
              |  FROM events WHERE event_type = 'purchase'),
              |w AS (SELECT *, last_value(value IGNORE NULLS) OVER
              |        (PARTITION BY user_id ORDER BY ts, is_r DESC, event_id
              |         ROWS UNBOUNDED PRECEDING) AS lcv
              |      FROM u)
              |SELECT p_event AS event_id, user_id,
              |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
              |  ${Num.roundSql("lcv", 4)} AS last_click_value
              |FROM w WHERE is_r = 0 ORDER BY event_id""".stripMargin)),

    // CUBE over two keys with dispersion stats (subtotals on every
    // grouping-set combination).
    QueryDef(
      "q44_cube_stats",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n"),
            Num.roundTo(avg(col("l_quantity")), 4).as("avg_qty"),
            // single-row groups: Spark stddev_samp yields NaN, DuckDB
            // NULL — normalize to NULL for oracle parity
            Num.roundTo(
              when(isnan(stddev_samp(col("l_quantity"))), lit(null))
                .otherwise(stddev_samp(col("l_quantity"))), 4).as("sd_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n"), col("avg_qty"), col("sd_qty"))
          .orderBy("returnflag", "linestatus"),
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
              |  COALESCE(l_linestatus, 'ALL') AS linestatus,
              |  count(*) AS n,
              |  ${Num.roundSql("avg(l_quantity)", 4)} AS avg_qty,
              |  ${Num.roundSql("stddev_samp(l_quantity)", 4)} AS sd_qty
              |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              |ORDER BY returnflag, linestatus""".stripMargin)),

    // Pivot with an explicit value list (deterministic columns; implicit
    // pivot would scan for values first). Oracle = conditional aggregation,
    // which is exactly what Catalyst rewrites pivot into.
    QueryDef(
      "q45_pivot",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(count(lit(1)))
          .select(
            col("l_returnflag"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_f,
             |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_o
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Exact interpolating percentiles (Spark percentile ≡ DuckDB
    // quantile_cont — both linear-interpolate), the exact twin of the
    // approx_percentile sketch path.
    QueryDef(
      "q47_percentiles",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          // one percentile buffer for all three quantiles (3 separate
          // aggs would sort/buffer the group three times)
          .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"))
          .select(
            col("l_returnflag"),
            Num.roundTo(col("ps").getItem(0), 4).as("p50"),
            Num.roundTo(col("ps").getItem(1), 4).as("p90"),
            Num.roundTo(col("ps").getItem(2), 4).as("p99"))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
              |  ${Num.roundSql("quantile_cont(l_extendedprice, 0.5)", 4)} AS p50,
              |  ${Num.roundSql("quantile_cont(l_extendedprice, 0.9)", 4)} AS p90,
              |  ${Num.roundSql("quantile_cont(l_extendedprice, 0.99)", 4)} AS p99
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Multimodal plumbing in the driver battery: text→binary assets,
    // mapPartitions batch feature extraction (real javax.imageio decode
    // for image bytes; the text fixtures are NOT images, so decode_ok is
    // false and the deterministic byte-feature fallback applies — see
    // ext/Multimodal). Oracled byte-for-byte: DuckDB recomputes n_bytes /
    // byte mean / frame count from the hex of the UTF-8 payload, and
    // pins decode_ok to FALSE.
    QueryDef(
      "q48_multimodal_features",
      (s, dir) =>
        Multimodal
          .extractFeatures(
            Multimodal.withBinaryAsset(tbl(s, dir, "documents"), "doc_id", "text"))
          .toDF()
          .select(
            col("asset_id"), col("n_bytes"),
            Num.roundTo(col("byte_mean"), 4).as("byte_mean_r"),
            col("frames_sampled").cast("bigint").as("frames_sampled"),
            col("decode_ok"))
          .orderBy("asset_id"),
      Some(s"""WITH b AS (SELECT CAST(doc_id AS BIGINT) AS asset_id,
              |                  hex(encode(text)) AS hx,
              |                  octet_length(encode(text)) AS n
              |           FROM documents),
              |s AS (SELECT asset_id, n,
              |        sum((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
              |            + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS total
              |      FROM b CROSS JOIN range(1, 4001) t(i) WHERE i <= n
              |      GROUP BY asset_id, n),
              |a AS (SELECT b.asset_id, b.n, COALESCE(s.total, 0) AS total
              |      FROM b LEFT JOIN s ON s.asset_id = b.asset_id)
              |SELECT asset_id, n AS n_bytes,
              |  CASE WHEN n = 0 THEN CAST(0.0 AS DOUBLE)
              |       ELSE ${Num.roundSql("total / n", 4)} END AS byte_mean_r,
              |  least(4, n) AS frames_sampled, FALSE AS decode_ok
              |FROM a ORDER BY asset_id""".stripMargin)),

    // Explicit GROUPING SETS through the SQL surface (rollup/cube's
    // general form): per-flag, per-status, and grand-total rows only.
    QueryDef(
      "q51_grouping_sets",
      (s, dir) => {
        tbl(s, dir, "lineitem").createOrReplaceTempView("li_gs")
        s.sql("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                |       COALESCE(l_linestatus, 'ALL') AS linestatus,
                |       count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
                |FROM li_gs
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY returnflag, linestatus""".stripMargin)
      },
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             |       COALESCE(l_linestatus, 'ALL') AS linestatus,
             |       count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY returnflag, linestatus""".stripMargin)),

    // The registered UDAF surface (typed Aggregator via udaf()) run
    // through spark.sql — same strict-mode semantics as q09's relational
    // plan, same oracle.
    QueryDef(
      "q49_mode_udaf",
      (s, dir) => {
        Aggregates.registerUdafs(s)
        tbl(s, dir, "lineitem")
          .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
          .createOrReplaceTempView("li_udaf")
        s.sql("""SELECT ship_month, mode_strict(l_returnflag) AS mode_returnflag_strict
                |FROM li_udaf GROUP BY ship_month ORDER BY ship_month""".stripMargin)
      },
      Some("""WITH counts AS (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_returnflag, count(*) AS cnt
             |  FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1, 2),
             |m AS (SELECT ship_month, l_returnflag, cnt,
             |             max(cnt) OVER (PARTITION BY ship_month) AS maxc FROM counts)
             |SELECT ship_month,
             |  CASE WHEN count(*) = 1 THEN min(l_returnflag) END AS mode_returnflag_strict
             |FROM m WHERE cnt = maxc GROUP BY ship_month ORDER BY ship_month""".stripMargin)))
}
