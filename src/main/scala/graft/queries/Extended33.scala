package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 sixth batch: experiment design (power / minimum-detectable-
  * effect sizing — the question asked BEFORE q183/q206/q233 ever run),
  * uplift targeting evaluation (Qini curve — q203's lift curve grades a
  * response model, this grades an incremental-effect model), and
  * inter-rater reliability (Cohen's κ — the labeling-pipeline agreement
  * metric behind every "how good are our annotations" readout).
  */
object Extended33 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  // z_{α/2} at α=0.05 and z_β at 80% power — E-notation literals shared
  // verbatim by both engines (the q211 Wilson-CI convention).
  private val zA = "1.959963984540054E0"
  private val zB = "8.416212335729143E-1"

  val all: Seq[QueryDef] = Seq(

    // ----- q235: power / MDE sizing grid --------------------------------
    // For relative lifts of 1/2/5/10% over the observed baseline
    // conversion rate: the two-proportion sample size per arm
    // n = (z_{α/2}+z_β)² · 2p̄(1−p̄) / δ² and the days of traffic that
    // buys at the observed users-per-day rate. Exactness: p and
    // users/day are exact integer ratios from ONE events aggregate; the
    // grid is a 4-element literal explode; ceil enters once per column
    // on irrational operands (no tie risk). Shape: one scan → 1-row
    // scalars → bounded grid — scales as a scan.
    QueryDef(
      "q235_power_mde",
      (s, dir) => {
        // unit = event exposure (per-user conversion saturates to p = 1 on
        // the small fixtures — a degenerate 0-sample answer); the event-
        // level purchase share is ~0.2 at every SF
        val base = tbl(s, dir, "events")
          .agg(count(lit(1)).as("n_units"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_conv"),
            countDistinct(to_date(col("ts"))).as("n_days"))
        val g = base.select(explode(array(
            lit(0.01), lit(0.02), lit(0.05), lit(0.10))).as("mde_rel"),
          col("n_units"), col("n_conv"), col("n_days"))
        val p = col("n_conv").cast("double") / col("n_units").cast("double")
        val delta = p * col("mde_rel")
        val z2 = (expr(zA) + expr(zB)) * (expr(zA) + expr(zB))
        val nArm = ceil(z2 * lit(2.0) * p * (lit(1.0) - p) / (delta * delta))
          .cast("long")
        val upd = col("n_units").cast("double") / col("n_days").cast("double")
        g.select(R(col("mde_rel"), 2).as("mde_rel_r"),
            col("n_units"), col("n_conv"),
            R(p, 6).as("baseline_p_r"),
            R(delta, 6).as("delta_abs_r"),
            nArm.as("n_per_arm"),
            ceil(nArm.cast("double") * 2.0 / upd).cast("long").as("days_needed"))
          .orderBy("mde_rel_r")
      },
      Some(s"""WITH base AS (
              |  SELECT count(*) AS n_units,
              |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_conv,
              |    count(DISTINCT CAST(ts AS DATE)) AS n_days
              |  FROM events),
              |grid AS (
              |  SELECT m.mde_rel, n_units, n_conv, n_days
              |  FROM base CROSS JOIN (VALUES (0.01), (0.02), (0.05), (0.10)) AS m(mde_rel)),
              |c AS (
              |  SELECT *,
              |    CAST(n_conv AS DOUBLE) / CAST(n_units AS DOUBLE) AS p,
              |    CAST(n_conv AS DOUBLE) / CAST(n_units AS DOUBLE) * mde_rel AS delta,
              |    ($zA + $zB) * ($zA + $zB) AS z2,
              |    CAST(n_units AS DOUBLE) / CAST(n_days AS DOUBLE) AS upd
              |  FROM grid),
              |n AS (
              |  SELECT *,
              |    CAST(ceil(z2 * 2.0 * p * (1.0 - p) / (delta * delta)) AS BIGINT) AS n_per_arm
              |  FROM c)
              |SELECT ${rs("mde_rel", 2)} AS mde_rel_r,
              |  n_units, n_conv,
              |  ${rs("p", 6)} AS baseline_p_r,
              |  ${rs("delta", 6)} AS delta_abs_r,
              |  n_per_arm,
              |  CAST(ceil(CAST(n_per_arm AS DOUBLE) * 2.0 / upd) AS BIGINT) AS days_needed
              |FROM n ORDER BY mde_rel_r""".stripMargin)),

    // ----- q236: Qini / uplift-by-decile curve --------------------------
    // Rank users by a targeting score (view count), split into deciles,
    // and grade the score as an INCREMENTAL-effect model: per-decile
    // uplift (treat rate − control rate, arms = user_id % 2) and the
    // cumulative Qini statistic Q(k) = cumTreatConv − cumCtrlConv ·
    // cumTreatN / cumCtrlN. q203's lift curve would call a score good
    // for finding converters anywhere; Qini only rewards finding users
    // whose conversion the treatment CAUSES. Exactness: all counts are
    // integers; rates/Qini are shared double shapes over the 10-row
    // decile relation. Shape: one user agg + one exactNtile (q222's
    // binning template — the user relation is data-sized, so the decile
    // split runs distributed, no single-task sort) + bounded-relation
    // windows.
    QueryDef(
      "q236_qini_curve",
      (s, dir) => {
        val users = tbl(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
          .withColumn("arm", pmod(col("user_id"), lit(2)))
        val binned = graft.ops.Quantiles.exactNtile(
          users, 10, col("views"), ascending = false, Seq(col("user_id")), "decile")
        val dec = binned.groupBy(col("decile"))
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
            sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c_t"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
            sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c_c"))
        val cum = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val g = Seq("n_t", "c_t", "n_c", "c_c").foldLeft(dec: DataFrame) {
          (df, c) => df.withColumn(s"k$c", sum(col(c)).over(cum))
        }
        val d = (c: Column) => c.cast("double")
        val uplift = d(col("c_t")) / d(col("n_t")) - d(col("c_c")) / d(col("n_c"))
        val qini = d(col("kc_t")) - d(col("kc_c")) * d(col("kn_t")) / d(col("kn_c"))
        // tiny fixtures can produce an all-treat or all-control decile —
        // the guarded NULL is the honest answer and keeps ANSI division
        // semantics intact on both engines
        g.select(col("decile"), col("n_t"), col("c_t"), col("n_c"), col("c_c"),
            when(col("n_t") > 0 && col("n_c") > 0, R(uplift, 6)).as("uplift_r"),
            when(col("kn_c") > 0, R(qini, 4)).as("qini_r"))
          .orderBy("decile")
      },
      Some(s"""WITH users AS (
              |  SELECT user_id,
              |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
              |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv,
              |    user_id % 2 AS arm
              |  FROM events GROUP BY user_id),
              |binned AS (
              |  SELECT *, CAST(ntile(10) OVER (ORDER BY views DESC, user_id) AS BIGINT) AS decile
              |  FROM users),
              |dec AS (
              |  SELECT decile,
              |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
              |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_t,
              |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
              |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_c
              |  FROM binned GROUP BY 1),
              |g AS (
              |  SELECT *,
              |    CAST(sum(n_t) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kn_t,
              |    CAST(sum(c_t) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kc_t,
              |    CAST(sum(n_c) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kn_c,
              |    CAST(sum(c_c) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kc_c
              |  FROM dec)
              |SELECT decile, n_t, c_t, n_c, c_c,
              |  CASE WHEN n_t > 0 AND n_c > 0 THEN ${rs("CAST(c_t AS DOUBLE) / CAST(n_t AS DOUBLE) - CAST(c_c AS DOUBLE) / CAST(n_c AS DOUBLE)", 6)} END AS uplift_r,
              |  CASE WHEN kn_c > 0 THEN ${rs("CAST(kc_t AS DOUBLE) - CAST(kc_c AS DOUBLE) * CAST(kn_t AS DOUBLE) / CAST(kn_c AS DOUBLE)", 4)} END AS qini_r
              |FROM g ORDER BY decile""".stripMargin)),

    // ----- q237: Cohen's kappa ------------------------------------------
    // Agreement between two deterministic document "annotators" beyond
    // chance: rater A labels long documents (n_chars above the corpus
    // median), rater B labels low-type-token-ratio documents (distinct
    // tokens / tokens below the corpus median) — κ = (pₒ − pₑ)/(1 − pₑ)
    // from the exact 2×2 confusion matrix. The labeling-QA metric raw
    // accuracy inflates on skewed label mixes. Exactness: both
    // thresholds are exact interpolating medians (q47 parity); the
    // confusion matrix is integers; pₒ/pₑ/κ are shared double shapes on
    // a 1-row relation. Shape: one doc-sized pass (HOF token stats, no
    // explode), two scalar medians broadcast back, one count agg.
    QueryDef(
      "q237_cohens_kappa",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
          .select(col("doc_id"), col("n_chars"),
            (size(array_distinct(col("toks"))).cast("double") /
              size(col("toks")).cast("double")).as("ttr"))
        val meds = docs.agg(
          percentile(col("n_chars"), lit(0.5)).as("med_chars"),
          percentile(col("ttr"), lit(0.5)).as("med_ttr"))
        val lab = docs.crossJoin(broadcast(meds))
          .select((col("n_chars").cast("double") > col("med_chars")).as("a"),
            (col("ttr") < col("med_ttr")).as("b"))
        val m = lab.agg(count(lit(1)).as("n"),
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
          sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
          sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
          sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
        val d = (c: Column) => c.cast("double")
        val nD = d(col("n"))
        val po = (d(col("n11")) + d(col("n00"))) / nD
        val pe = ((d(col("n11")) + d(col("n10"))) / nD) *
          ((d(col("n11")) + d(col("n01"))) / nD) +
          ((d(col("n01")) + d(col("n00"))) / nD) *
          ((d(col("n10")) + d(col("n00"))) / nD)
        m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          R(po, 6).as("po_r"), R(pe, 6).as("pe_r"),
          R((po - pe) / (lit(1.0) - pe), 6).as("kappa_r"))
      },
      Some(s"""WITH docs AS (
              |  SELECT doc_id, n_chars,
              |    CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS DOUBLE)
              |      / CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) AS ttr
              |  FROM documents),
              |meds AS (
              |  SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med_chars,
              |    quantile_cont(ttr, 0.5) AS med_ttr
              |  FROM docs),
              |lab AS (
              |  SELECT CAST(n_chars AS DOUBLE) > med_chars AS a, ttr < med_ttr AS b
              |  FROM docs CROSS JOIN meds),
              |m AS (
              |  SELECT count(*) AS n,
              |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
              |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
              |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
              |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
              |  FROM lab),
              |c AS (
              |  SELECT *,
              |    (CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE) AS po,
              |    ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE)) / CAST(n AS DOUBLE))
              |      * ((CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE)) / CAST(n AS DOUBLE))
              |    + ((CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE))
              |      * ((CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE)) AS pe
              |  FROM m)
              |SELECT n, n11, n10, n01, n00,
              |  ${rs("po", 6)} AS po_r,
              |  ${rs("pe", 6)} AS pe_r,
              |  ${rs("(po - pe) / (1.0 - pe)", 6)} AS kappa_r
              |FROM c""".stripMargin))
  )
}
