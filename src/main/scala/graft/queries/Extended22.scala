package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-8 sixth batch: four time-series/eval shapes completing the
  * monitoring and ML-evaluation families — a trailing rolling median
  * (robust rolling statistic; plain rolling means are outlier-fragile), a
  * lead-lag cross-correlation function between two metrics (does A lead
  * B?), burst/spike detection against a trailing baseline (the rate-
  * anomaly alert), and a cumulative-gains/lift curve (the targeting
  * companion to q193's AUC).
  *
  * Determinism follows the house contract (QueryDef scaladoc). Rolling
  * median: DuckDB's ordered-set aggregates IGNORE window frames
  * (median() OVER a ROWS frame silently computes the whole partition), so
  * BOTH engines express the trailing window as a calendar range
  * self-join + grouped exact median — identical semantics by
  * construction, and Spark percentile ≡ DuckDB quantile_cont (q47).
  */
object Extended22 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q200: trailing window in days (6 preceding + current). */
  private val MedWin = 6

  /** q201: lead-lag offsets probed, view → purchase. */
  private val CcfLags = (-3 to 3).toSeq

  /** q202: burst threshold ×10 (12 = 1.2× the trailing-week mean) and
    * minimum baseline days. Fixed-ratio flag counts DO go to zero as
    * daily volumes grow (CLT) — the top-3 ratio ranking is the
    * scale-free report; the threshold count is an extra exact column.
    */
  private val BurstNum = 12L
  private val MinBase = 3L

  val all: Seq[QueryDef] = Seq(

    // ----- q200: trailing rolling median --------------------------------
    // 7-day trailing median of each type's daily revenue — the robust
    // smoother for dashboards (one bad day cannot drag it like a mean).
    // Calendar semantics via a bounded range self-join on the daily
    // relation (≤ 7 partners per row at any scale; missing days shrink
    // the window identically on both engines), exact interpolating
    // median over doubles of exact DECIMALs. Shape: one data-sized hash
    // agg, then joins/aggs over the calendar-bounded relation only.
    QueryDef(
      "q200_rolling_median",
      (s, dir) => {
        val daily = tbl(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(R(col("value"), 4).cast(DecimalType(18, 4))).as("x"))
        val win = daily.select(col("event_type").as("et2"),
          col("day").as("pday"), col("x").cast("double").as("px"))
        daily.join(win,
            col("event_type") === col("et2") &&
              col("pday") >= expr(s"date_sub(day, $MedWin)") &&
              col("pday") <= col("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n_win"),
            expr("percentile(px, 0.5D)").as("med"))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_win"), R(col("med"), 4).as("med_r"))
          .orderBy("event_type", "day")
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, CAST(ts AS DATE) AS day,
              |    sum(CAST(${rs("value", 4)} AS DECIMAL(18,4))) AS x
              |  FROM events GROUP BY 1, 2),
              |j AS (
              |  SELECT d.event_type, d.day, CAST(p.x AS DOUBLE) AS px
              |  FROM daily d JOIN daily p
              |    ON p.event_type = d.event_type
              |    AND p.day >= d.day - $MedWin AND p.day <= d.day)
              |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
              |  count(*) AS n_win,
              |  ${rs("quantile_cont(px, 0.5)", 4)} AS med_r
              |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ----- q201: lead-lag cross-correlation (CCF) -----------------------
    // Does 'view' traffic LEAD 'purchase' revenue? Pearson correlation
    // between the two daily count series at offsets −3..+3 — the
    // cause-precedes-effect screen (positive peak lag k: views predict
    // purchases k days out). Calendar-true pairing like q186; all six
    // moment sums exact BIGINTs; the single float division is shared.
    // The peak lag is an order-encoded argmax over the 7-row CCF
    // relation — fully deterministic.
    QueryDef(
      "q201_cross_correlation",
      (s, dir) => {
        val daily = tbl(s, dir, "events")
          .filter(col("event_type").isin("view", "purchase"))
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val v = daily.filter(col("event_type") === "view")
          .select(col("day"), col("c").as("x"))
        val p = daily.filter(col("event_type") === "purchase")
          .select(col("day").as("pday"), col("c").as("y"))
        val lagged = v.withColumn("k", explode(array(CcfLags.map(lit): _*)))
          .withColumn("target", expr("date_add(day, k)"))
        val pairs = lagged.join(p, col("target") === col("pday"))
        val ccf = pairs.groupBy(col("k"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("k").cast("long").as("lag_k"), col("n_pairs"),
            R((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double")),
              6).as("ccf_r"))
        // integer-encoded (ccf, lag) argmax: the 6-dp-rounded ccf scales to
        // an exact integer via the shared floor(x·1e6 + 0.5) formula, so
        // the packed max is bit-stable (no %f formatting divergence)
        ccf.withColumn("enc",
            (floor((col("ccf_r") + 2) * 1e6 + 0.5).cast("long") * 100 +
              (col("lag_k") + 10)))
          .withColumn("is_peak",
            col("enc") === max(col("enc")).over(Window.partitionBy()))
          .drop("enc")
          .orderBy("lag_k")
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
              |  FROM events WHERE event_type IN ('view', 'purchase')
              |  GROUP BY 1, 2),
              |v AS (SELECT day, c AS x FROM daily WHERE event_type = 'view'),
              |p AS (SELECT day AS pday, c AS y FROM daily WHERE event_type = 'purchase'),
              |lagged AS (
              |  SELECT v.day, v.x, CAST(k.k AS INTEGER) AS k,
              |    v.day + CAST(k.k AS INTEGER) AS target
              |  FROM v CROSS JOIN (VALUES ${CcfLags.map(k => s"($k)").mkString(", ")}) k(k)),
              |pairs AS (
              |  SELECT lagged.k, lagged.x, p.y FROM lagged
              |  JOIN p ON p.pday = lagged.target),
              |m AS (
              |  SELECT k, count(*) AS n_pairs,
              |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              |    CAST(sum(x * y) AS BIGINT) AS sxy,
              |    CAST(sum(x * x) AS BIGINT) AS sxx,
              |    CAST(sum(y * y) AS BIGINT) AS syy
              |  FROM pairs GROUP BY 1),
              |ccf AS (
              |  SELECT CAST(k AS BIGINT) AS lag_k, n_pairs,
              |    ${rs("CAST(n_pairs * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) * CAST(n_pairs * syy - sy * sy AS DOUBLE))", 6)} AS ccf_r
              |  FROM m),
              |b AS (
              |  SELECT *, CAST(floor((ccf_r + 2) * 1e6 + 0.5) AS BIGINT) * 100
              |    + (lag_k + 10) AS enc
              |  FROM ccf)
              |SELECT lag_k, n_pairs, ccf_r,
              |  enc = max(enc) OVER () AS is_peak
              |FROM b ORDER BY lag_k""".stripMargin)),

    // ----- q202: burst detection vs trailing baseline -------------------
    // Flag days whose event count spikes against the TRAILING week — the
    // rate-anomaly alert (q199 bounds level excursions; this scores
    // RATIOS against a moving baseline, robust to slow drift). The
    // comparison c·n7 > θ·s7 is cross-multiplied pure integer arithmetic
    // (no division), the per-type top-3 burstiest days rank by the same
    // integer-safe encoded ratio, and fixed-threshold counts are an
    // extra column (they legitimately →0 as volumes smooth out — the
    // ranking is the scale-free signal). One agg + lag-frame windows.
    QueryDef(
      "q202_burst_detect",
      (s, dir) => {
        val daily = tbl(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val base = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-7, -1)
        val w = daily
          .withColumn("s7", sum(col("c")).over(base))
          .withColumn("n7", count(col("c")).over(base))
          .filter(col("n7") >= MinBase)
          .withColumn("ratio",
            col("c").cast("double") * col("n7").cast("double") /
              col("s7").cast("double"))
        val ranked = w.withColumn("rk", row_number().over(
            Window.partitionBy(col("event_type"))
              .orderBy(col("ratio").desc, col("day"))))
        ranked.filter(col("rk") <= 3)
          .select(col("event_type"), col("rk").cast("long").as("rank"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("c"), col("s7"), col("n7"),
            R(col("ratio"), 6).as("ratio_r"),
            (col("c") * col("n7") * 10 > col("s7") * BurstNum).as("over_1_2x"))
          .orderBy("event_type", "rank")
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
              |  FROM events GROUP BY 1, 2),
              |w AS (
              |  SELECT *,
              |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
              |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s7,
              |    CAST(count(c) OVER (PARTITION BY event_type ORDER BY day
              |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS n7
              |  FROM daily),
              |f AS (
              |  SELECT *, CAST(c AS DOUBLE) * CAST(n7 AS DOUBLE) / CAST(s7 AS DOUBLE) AS ratio
              |  FROM w WHERE n7 >= $MinBase),
              |rk AS (
              |  SELECT *, row_number() OVER (PARTITION BY event_type
              |    ORDER BY ratio DESC, day) AS rk
              |  FROM f)
              |SELECT event_type, CAST(rk AS BIGINT) AS rank,
              |  strftime(day, '%Y-%m-%d') AS day, c, s7, n7,
              |  ${rs("ratio", 6)} AS ratio_r,
              |  c * n7 * 10 > s7 * $BurstNum AS over_1_2x
              |FROM rk WHERE rk <= 3 ORDER BY event_type, rank""".stripMargin)),

    // ----- q203: cumulative gains / lift curve --------------------------
    // Target the top score deciles: rank documents by length, walk down
    // the deciles, and report what share of the 'en' positives each
    // cumulative cut captures and its lift over random — the campaign-
    // targeting readout beside q193's AUC (AUC summarizes the whole
    // ranking; the lift curve says what the top 10 %/20 % buys you).
    // Exactness: ntile over a TOTAL order (score desc, doc_id), integer
    // positive counts, cumulative windows over the 10-row decile
    // relation; divisions happen once per output row. The scored
    // relation is DATA-SIZED, so the decile assignment runs as
    // Quantiles.exactNtile (identical bucket assignment, no single-task
    // global sort — QuantilesSpec pins row-identity to window ntile);
    // the downstream cumulative windows see only the 10-row decile
    // rollup.
    QueryDef(
      "q203_lift_curve",
      (s, dir) => {
        val scored = graft.ops.Quantiles.exactNtile(
          tbl(s, dir, "documents")
            .select((col("lang") === "en").cast("long").as("y"),
              col("n_chars"), col("doc_id")),
          10, col("n_chars"), ascending = false, Seq(col("doc_id")), "decile")
        val dec = scored.groupBy(col("decile"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
        val wCum = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy()
        dec
          .withColumn("cum_n", sum(col("n")).over(wCum))
          .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
          .withColumn("tot_n", sum(col("n")).over(wAll))
          .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
          .select(col("decile").cast("long").as("decile"), col("n"), col("n_pos"),
            R(col("cum_pos").cast("double") / col("tot_pos").cast("double"), 6)
              .as("capture_r"),
            R((col("cum_pos").cast("double") / col("cum_n").cast("double")) /
              (col("tot_pos").cast("double") / col("tot_n").cast("double")), 6)
              .as("lift_r"))
          .orderBy("decile")
      },
      Some(s"""WITH scored AS (
              |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
              |    ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
              |  FROM documents),
              |dec AS (
              |  SELECT decile, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
              |  FROM scored GROUP BY 1),
              |w AS (
              |  SELECT *,
              |    CAST(sum(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
              |    CAST(sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
              |    CAST(sum(n) OVER () AS BIGINT) AS tot_n,
              |    CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos
              |  FROM dec)
              |SELECT CAST(decile AS BIGINT) AS decile, n, n_pos,
              |  ${rs("CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE)", 6)} AS capture_r,
              |  ${rs("(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) / (CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE))", 6)} AS lift_r
              |FROM w ORDER BY decile""".stripMargin))
  )
}
