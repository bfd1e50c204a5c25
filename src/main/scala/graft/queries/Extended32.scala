package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 fifth batch: robust trend estimation (Theil–Sen — the
  * estimator whose significance test is q217's Mann–Kendall; q228's OLS
  * is the outlier-sensitive line both guard), experiment variance
  * reduction (CUPED — the pre-period adjustment every modern A/B stack
  * applies before q183/q206 read the result), and
  * difference-in-differences (the 2×2 causal readout for staged
  * rollouts).
  */
object Extended32 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // ----- q232: Theil–Sen robust slope ---------------------------------
    // Median of all pairwise slopes of the daily-revenue series, plus
    // the median-residual intercept — immune to the outlier days that
    // drag q228's least-squares line. Exactness: x is an integer epoch
    // day and y an exact integer cent sum; each pairwise slope is ONE
    // shared-shape double division; both medians are exact
    // interpolating percentiles (the q47-pinned Spark percentile ≡
    // DuckDB quantile_cont parity). Shape: the pair join is
    // calendar-bounded (≤ days²/2 pairs regardless of corpus size —
    // q217's documented bound); the day relation broadcasts at runtime;
    // slope/intercept are two scalar aggregates, the intercept pass
    // re-walks only the day-sized relation with the slope scalar
    // broadcast.
    QueryDef(
      "q232_theil_sen",
      (s, dir) => {
        // NOT Ckpt'd (r16 decision): materializing daily would hide the
        // aggregate from the battery-wide structural boundedness gate
        // (the partition-less slope window's child must show the
        // calendar-saturating rollup), and the saved pass is one
        // day-rollup recompute — the strict gate is worth more.
        val daily = tbl(s, dir, "lineitem")
          .groupBy(datediff(to_date(col("l_shipdate")), lit("1995-01-01"))
            .cast("long").as("x"))
          .agg(sum(R(col("l_extendedprice") * 100.0, 0).cast(DecimalType(18, 0)))
            .cast("double").as("y"))
        val a = daily.select(col("x").as("xi"), col("y").as("yi"))
        val b = daily.select(col("x").as("xj"), col("y").as("yj"))
        val slopes = a.join(b, col("xi") < col("xj"))
          .select(((col("yj") - col("yi")) /
            (col("xj").cast("double") - col("xi").cast("double"))).as("sl"))
        // median via sort + positional pick, NOT the percentile aggregate:
        // on the ~days²/2 pair relation the exact-percentile buffer (a
        // per-value hash map merged across partitions) measures 2.4×
        // slower than one sort; the interpolation shape v_lo +
        // frac·(v_hi − v_lo) is percentile/quantile_cont's own (q47
        // parity), so the oracle keeps quantile_cont unchanged
        val ranked = slopes
          .withColumn("rn", row_number().over(Window.orderBy(col("sl"))).cast("long"))
          .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        val med = ranked
          .filter(col("rn") === ((col("nn") + 1) / 2).cast("long") ||
            col("rn") === (col("nn") / 2 + 1).cast("long"))
          .agg(max(col("nn")).as("n_pairs"),
            (min(col("sl")) +
              (((max(col("nn")) - 1) % 2).cast("double") * lit(0.5)) *
                (max(col("sl")) - min(col("sl")))).as("slope"))
        val icpt = daily.crossJoin(broadcast(med))
          .select(col("n_pairs"), col("slope"),
            (col("y") - col("slope") * col("x").cast("double")).as("res"))
          .groupBy(col("n_pairs"), col("slope"))
          .agg(count(lit(1)).as("n_days"),
            percentile(col("res"), lit(0.5)).as("icpt"))
        icpt.select(col("n_days"), col("n_pairs"),
          R(col("slope"), 6).as("slope_cents_per_day_r"),
          R(col("icpt"), 2).as("intercept_cents_r"))
      },
      Some(s"""WITH daily AS (
              |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS x,
              |    CAST(sum(CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT)) AS DOUBLE) AS y
              |  FROM lineitem GROUP BY 1),
              |slopes AS (
              |  SELECT (b.y - a.y) / (CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE)) AS sl
              |  FROM daily a JOIN daily b ON a.x < b.x),
              |med AS (
              |  SELECT count(*) AS n_pairs, quantile_cont(sl, 0.5) AS slope FROM slopes),
              |icpt AS (
              |  SELECT n_pairs, slope, count(*) AS n_days,
              |    quantile_cont(y - slope * CAST(x AS DOUBLE), 0.5) AS icpt
              |  FROM daily CROSS JOIN med GROUP BY 1, 2)
              |SELECT n_days, n_pairs,
              |  ${rs("slope", 6)} AS slope_cents_per_day_r,
              |  ${rs("icpt", 2)} AS intercept_cents_r
              |FROM icpt""".stripMargin)),

    // ----- q233: CUPED variance reduction -------------------------------
    // Pre-period adjustment: x = first-half view count, y = second-half
    // purchase count per user, arm = user_id % 2. θ = cov(x,y)/var(x)
    // and ρ² (the fraction of outcome variance CUPED removes) come from
    // ONE pooled exact-integer moment aggregate; each arm's adjusted
    // mean ȳₐ − θ(x̄ₐ − x̄) needs only per-arm integer sums. Closed
    // form throughout — no second pass over users, no joins; the arm
    // relation is 2 rows, so its global windows are bounded. Exactness:
    // all moments are BIGINT-exact (counts are small integers); the
    // double hand-off happens once, every shape shared.
    QueryDef(
      "q233_cuped",
      (s, dir) => {
        val mid = lit("2024-01-16")
        val users = tbl(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "view" && to_date(col("ts")) < mid, 1L)
              .otherwise(0L)).as("x"),
            sum(when(col("event_type") === "purchase" && to_date(col("ts")) >= mid, 1L)
              .otherwise(0L)).as("y"))
          .withColumn("arm", pmod(col("user_id"), lit(2)))
        val arms = users.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("y") * col("y")).as("syy"))
        val tot = Window.partitionBy()
        val g = Seq("n", "sx", "sy", "sxx", "sxy", "syy").foldLeft(arms: DataFrame) {
          (df, c) => df.withColumn(s"t$c", sum(col(c)).over(tot))
        }
        val d = (c: Column) => c.cast("double")
        val nT = d(col("tn"))
        val varx = nT * d(col("tsxx")) - d(col("tsx")) * d(col("tsx"))
        val covxy = nT * d(col("tsxy")) - d(col("tsx")) * d(col("tsy"))
        val vary = nT * d(col("tsyy")) - d(col("tsy")) * d(col("tsy"))
        val theta = covxy / varx
        val xbarT = d(col("tsx")) / nT
        val adj = d(col("sy")) / d(col("n")) -
          theta * (d(col("sx")) / d(col("n")) - xbarT)
        g.select(col("arm"), col("n").as("n_users"),
            R(d(col("sx")) / d(col("n")), 6).as("xbar_r"),
            R(d(col("sy")) / d(col("n")), 6).as("ybar_r"),
            R(adj, 6).as("adj_mean_r"),
            R(theta, 6).as("theta_r"),
            R(covxy * covxy / (varx * vary), 6).as("rho2_r"))
          .orderBy("arm")
      },
      Some(s"""WITH users AS (
              |  SELECT user_id,
              |    CAST(sum(CASE WHEN event_type = 'view' AND CAST(ts AS DATE) < DATE '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS x,
              |    CAST(sum(CASE WHEN event_type = 'purchase' AND CAST(ts AS DATE) >= DATE '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS y,
              |    user_id % 2 AS arm
              |  FROM events GROUP BY user_id),
              |arms AS (
              |  SELECT arm, count(*) AS n,
              |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              |    CAST(sum(x * x) AS BIGINT) AS sxx,
              |    CAST(sum(x * y) AS BIGINT) AS sxy,
              |    CAST(sum(y * y) AS BIGINT) AS syy
              |  FROM users GROUP BY 1),
              |g AS (
              |  SELECT *,
              |    CAST(sum(n) OVER () AS BIGINT) AS tn,
              |    CAST(sum(sx) OVER () AS BIGINT) AS tsx,
              |    CAST(sum(sy) OVER () AS BIGINT) AS tsy,
              |    CAST(sum(sxx) OVER () AS BIGINT) AS tsxx,
              |    CAST(sum(sxy) OVER () AS BIGINT) AS tsxy,
              |    CAST(sum(syy) OVER () AS BIGINT) AS tsyy
              |  FROM arms),
              |c AS (
              |  SELECT *,
              |    CAST(tn AS DOUBLE) * CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE) AS varx,
              |    CAST(tn AS DOUBLE) * CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE) AS covxy,
              |    CAST(tn AS DOUBLE) * CAST(tsyy AS DOUBLE) - CAST(tsy AS DOUBLE) * CAST(tsy AS DOUBLE) AS vary
              |  FROM g)
              |SELECT arm, n AS n_users,
              |  ${rs("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS xbar_r,
              |  ${rs("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS ybar_r,
              |  ${rs("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) - (covxy / varx) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - CAST(tsx AS DOUBLE) / CAST(tn AS DOUBLE))", 6)} AS adj_mean_r,
              |  ${rs("covxy / varx", 6)} AS theta_r,
              |  ${rs("covxy * covxy / (varx * vary)", 6)} AS rho2_r
              |FROM c ORDER BY arm""".stripMargin)),

    // ----- q234: difference-in-differences ------------------------------
    // The 2×2 staged-rollout readout: purchase-per-event rate per
    // (arm = user_id % 2) × (period = before/after Jan 16), and
    // DiD = (treat post − treat pre) − (control post − control pre).
    // Exactness: cell rates are exact integer ratios; DiD combines the
    // four rates in one shared double shape attached via a window over
    // the 4-row cell relation. Shape: one hash agg over events, then
    // bounded-relation windows — scales as a scan.
    QueryDef(
      "q234_did",
      (s, dir) => {
        val cells = tbl(s, dir, "events")
          .groupBy(pmod(col("user_id"), lit(2)).cast("long").as("arm"),
            (to_date(col("ts")) >= lit("2024-01-16")).as("post"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purch"))
          .withColumn("rate", col("n_purch").cast("double") / col("n_events").cast("double"))
        val tot = Window.partitionBy()
        def pick(arm: Int, post: Boolean) =
          max(when(col("arm") === arm && col("post") === post, col("rate"))).over(tot)
        val did = (pick(1, true) - pick(1, false)) - (pick(0, true) - pick(0, false))
        cells.select(col("arm"), col("post"), col("n_events"), col("n_purch"),
            R(col("rate"), 6).as("rate_r"),
            R(did, 6).as("did_r"))
          .orderBy("arm", "post")
      },
      Some(s"""WITH cells AS (
              |  SELECT user_id % 2 AS arm,
              |    CAST(ts AS DATE) >= DATE '2024-01-16' AS post,
              |    count(*) AS n_events,
              |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purch
              |  FROM events GROUP BY 1, 2),
              |wr AS (
              |  SELECT *, CAST(n_purch AS DOUBLE) / CAST(n_events AS DOUBLE) AS rate
              |  FROM cells),
              |g AS (
              |  SELECT *,
              |    (max(CASE WHEN arm = 1 AND post THEN rate END) OVER ()
              |     - max(CASE WHEN arm = 1 AND NOT post THEN rate END) OVER ())
              |    - (max(CASE WHEN arm = 0 AND post THEN rate END) OVER ()
              |       - max(CASE WHEN arm = 0 AND NOT post THEN rate END) OVER ()) AS did
              |  FROM wr)
              |SELECT arm, post, n_events, n_purch,
              |  ${rs("rate", 6)} AS rate_r,
              |  ${rs("did", 6)} AS did_r
              |FROM g ORDER BY arm, post""".stripMargin))
  )
}
