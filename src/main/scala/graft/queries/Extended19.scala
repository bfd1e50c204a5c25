package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-8 third batch: four inference/temporal shapes the first 187
  * queries do not cover — a point-in-time (SCD2-validity) join (the
  * temporal-correctness join every feature store needs; q43's as-of is
  * the tolerance variant, q105 BUILDS the intervals, nothing yet JOINS
  * through them), a Kaplan–Meier survival estimator with real censoring
  * (time-to-event analytics), rank-based quantile normalization onto the
  * pooled distribution (the distribution-alignment normalizer — q161's
  * z-score sibling for non-Gaussian shapes), and a Poisson-bootstrap
  * confidence interval (the streaming-friendly resampling inference that
  * needs no second pass over the data).
  *
  * Determinism follows the house contract (QueryDef scaladoc). The
  * bootstrap's randomness is md5-keyed (reproducible across engines and
  * retries, like q75/q107); its Poisson weights come from STRING
  * comparisons against precomputed 48-bit hex thresholds, so no float
  * RNG parity is ever needed.
  */
object Extended19 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q189: observation window after first signup (hours). 48 h leaves
    * both arms non-vacuous at every fixture SF (sf0.001: 10 events /
    * 5 censored; sf0.01: 99/51).
    */
  private val ObsHours = 48L
  private val ObsUs = ObsHours * 3600000000L

  /** q190: quantile grid resolution. */
  private val Cells = 100

  /** q191: bootstrap replicates; CI ranks are the nearest-rank 2.5 % /
    * 97.5 % order statistics of the B replicate means.
    */
  private val B = 40
  private val LoRank = math.ceil(0.025 * B).toLong // 1
  private val HiRank = math.ceil(0.975 * B).toLong // 39

  /** Cumulative Poisson(1) CDF as 48-bit hex thresholds: weight w is the
    * number of thresholds ≤ the row's 12-hex-digit md5 prefix — a pure
    * string comparison, bit-identical in any engine. Tail capped at 6
    * (P ≈ 6e-5 per draw).
    */
  private val PoissonHex: Seq[String] = {
    val probs = Iterator.iterate((math.exp(-1.0), 0)) { case (p, k) =>
      (p / (k + 1), k + 1)
    }.take(6).map(_._1).toSeq
    probs.scanLeft(0.0)(_ + _).tail
      .map(f => f"${(f * (1L << 48)).toLong}%012x")
  }

  private val PoissonCaseSql: String =
    PoissonHex.zipWithIndex
      .map { case (t, k) => s"WHEN h < '$t' THEN $k" }
      .mkString("CASE ", " ", " ELSE 6 END")

  val all: Seq[QueryDef] = Seq(

    // ----- q188: point-in-time (SCD2 validity) join ---------------------
    // Join each purchase to the signup-state version that was VALID at
    // purchase time — the feature-store temporal-correctness join (no
    // leakage from future dimension versions). The dim is the signup
    // history turned into [eff_from, eff_to) intervals by one lead()
    // window (q105's construction); the join is EQUI on user_id with the
    // interval predicate as a post-join filter — Catalyst keeps it a hash
    // join keyed on the entity, never an interval cross product, and the
    // non-overlapping intervals guarantee ≤ 1 match per fact row.
    // Purchases before the first signup stay unmatched (left join) and
    // are reported — silent row loss is how PIT joins go wrong.
    QueryDef(
      "q188_pit_join",
      (s, dir) => {
        val w = Window.partitionBy(col("u")).orderBy(col("f"), col("eid"))
        val dim = tbl(s, dir, "events")
          .filter(col("event_type") === "signup")
          .select(col("user_id").as("u"), unix_micros(col("ts")).as("f"),
            col("event_id").as("eid"),
            R(col("value"), 4).cast(DecimalType(18, 4)).as("tier"))
          .withColumn("t", lead(col("f"), 1).over(w))
        val fact = tbl(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("pt"),
            R(col("value"), 4).cast(DecimalType(18, 4)).as("v"))
        fact.join(dim,
            fact("user_id") === dim("u") && col("pt") >= col("f") &&
              (col("t").isNull || col("pt") < col("t")),
            "left")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_purch"),
            count(col("f")).as("n_matched"),
            sum(when(col("f").isNotNull, col("v"))).as("mrev"),
            sum(when(col("f").isNotNull, col("tier"))).as("tsum"))
          .select(col("user_id"), col("n_purch"), col("n_matched"),
            R(coalesce(col("mrev").cast("double"), lit(0.0)), 4)
              .as("matched_rev_r"),
            R(col("tsum").cast("double") /
              when(col("n_matched") === 0, lit(null))
                .otherwise(col("n_matched")).cast("double"), 4)
              .as("avg_tier_r"))
          .orderBy("user_id")
      },
      Some(s"""WITH dim AS (
              |  SELECT user_id AS u, epoch_us(ts) AS f, event_id AS eid,
              |    CAST(${rs("value", 4)} AS DECIMAL(18,4)) AS tier,
              |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
              |      ORDER BY epoch_us(ts), event_id) AS t
              |  FROM events WHERE event_type = 'signup'),
              |fact AS (
              |  SELECT user_id, epoch_us(ts) AS pt,
              |    CAST(${rs("value", 4)} AS DECIMAL(18,4)) AS v
              |  FROM events WHERE event_type = 'purchase'),
              |j AS (
              |  SELECT fact.user_id, fact.v, dim.f, dim.tier
              |  FROM fact LEFT JOIN dim
              |    ON dim.u = fact.user_id AND fact.pt >= dim.f
              |      AND (dim.t IS NULL OR fact.pt < dim.t))
              |SELECT user_id, count(*) AS n_purch,
              |  count(f) AS n_matched,
              |  ${rs("coalesce(CAST(sum(CASE WHEN f IS NOT NULL THEN v END) AS DOUBLE), 0.0)", 4)} AS matched_rev_r,
              |  ${rs("CAST(sum(CASE WHEN f IS NOT NULL THEN tier END) AS DOUBLE) / CAST(nullif(count(f), 0) AS DOUBLE)", 4)} AS avg_tier_r
              |FROM j GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // ----- q189: Kaplan–Meier survival with censoring -------------------
    // Time from first signup to first purchase, right-censored at a 48 h
    // observation window (or the corpus end) — the product-limit
    // estimator behind every retention/time-to-convert curve. Exactness:
    // durations and risk-set arithmetic are pure integers; the survival
    // product is exp(Σ ln(1 − d/n)) with ROUNDED-TERM DECIMAL
    // accumulation (q127's ln-parity pattern), and the d = n endpoint
    // (survival exactly 0) is handled by an integer flag, never a float
    // −∞. Shape: two user-sized aggs + one broadcast scalar, then
    // windows over the duration-bounded KM table (≤ ObsHours + 1 rows).
    QueryDef(
      "q189_kaplan_meier",
      (s, dir) => {
        val e = tbl(s, dir, "events")
        val su = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts"))).as("smin"))
        val pu = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"), unix_micros(col("ts")).as("pt"))
        val mx = e.agg(max(unix_micros(col("ts"))).as("mt"))
        // pt >= smin lives in the JOIN condition, not a post-filter: a user
        // whose every purchase precedes first signup must survive as a
        // NULL-extended (censored) subject, matching the oracle's ON clause.
        val firstP = su.join(pu,
            col("p_uid") === col("user_id") && col("pt") >= col("smin"), "left")
          .groupBy(col("user_id"), col("smin"))
          .agg(min(col("pt")).as("pmin"))
        val subj = firstP.crossJoin(broadcast(mx))
          .withColumn("oe", least(col("smin") + ObsUs, col("mt")))
          .withColumn("ev",
            (col("pmin").isNotNull && col("pmin") < col("oe")).cast("int"))
          .withColumn("dur",
            when(col("ev") === 1, (col("pmin") - col("smin")) / 3600000000L)
              .otherwise((col("oe") - col("smin")) / 3600000000L)
              .cast("long"))
        val km = subj.groupBy(col("dur"))
          .agg(sum(col("ev")).as("d"),
            sum(lit(1) - col("ev")).as("c"))
        val wOrd = Window.orderBy(col("dur"))
        val prior = Window.orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val curve = km
          .withColumn("total", sum(col("d") + col("c")).over(
            Window.partitionBy()))
          .withColumn("nrisk",
            col("total") - coalesce(sum(col("d") + col("c")).over(prior), lit(0L)))
          .withColumn("term",
            when(col("d") < col("nrisk"),
              R(log(lit(1.0) - col("d").cast("double") / col("nrisk").cast("double")), 12)
                .cast(DecimalType(24, 12)))
              .otherwise(lit(null)))
          .withColumn("zf", max((col("d") === col("nrisk")).cast("int")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("lnsum", sum(col("term")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        curve.filter(col("d") > 0)
          .select(col("dur").as("dur_hours"), col("nrisk"), col("d").as("n_events"),
            col("c").as("n_censored"),
            when(col("zf") === 1, lit(0.0))
              .otherwise(R(exp(col("lnsum").cast("double")), 6)).as("surv_r"))
          .orderBy("dur_hours")
      },
      Some(s"""WITH su AS (
              |  SELECT user_id, min(epoch_us(ts)) AS smin FROM events
              |  WHERE event_type = 'signup' GROUP BY 1),
              |pu AS (
              |  SELECT user_id, epoch_us(ts) AS pt FROM events
              |  WHERE event_type = 'purchase'),
              |mx AS (SELECT max(epoch_us(ts)) AS mt FROM events),
              |fp AS (
              |  SELECT su.user_id, su.smin, min(pu.pt) AS pmin
              |  FROM su LEFT JOIN pu
              |    ON pu.user_id = su.user_id AND pu.pt >= su.smin
              |  GROUP BY 1, 2),
              |subj AS (
              |  SELECT fp.*, least(smin + $ObsUs, mt) AS oe,
              |    CASE WHEN pmin IS NOT NULL AND pmin < least(smin + $ObsUs, mt)
              |      THEN 1 ELSE 0 END AS ev
              |  FROM fp CROSS JOIN mx),
              |subj2 AS (
              |  SELECT *, CASE WHEN ev = 1 THEN (pmin - smin) // 3600000000
              |    ELSE (oe - smin) // 3600000000 END AS dur
              |  FROM subj),
              |km AS (
              |  SELECT dur, CAST(sum(ev) AS BIGINT) AS d,
              |    CAST(sum(1 - ev) AS BIGINT) AS c
              |  FROM subj2 GROUP BY 1),
              |w1 AS (
              |  SELECT *, CAST(sum(d + c) OVER () AS BIGINT) AS total,
              |    CAST(coalesce(sum(d + c) OVER (ORDER BY dur
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              |      AS cum
              |  FROM km),
              |w2 AS (
              |  SELECT *, total - cum AS nrisk FROM w1),
              |w3 AS (
              |  SELECT *,
              |    CASE WHEN d < nrisk THEN CAST(
              |      ${rs("ln(1E0 - CAST(d AS DOUBLE) / CAST(nrisk AS DOUBLE))", 12)}
              |      AS DECIMAL(24,12)) END AS term,
              |    max(CASE WHEN d = nrisk THEN 1 ELSE 0 END) OVER (ORDER BY dur
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zf
              |  FROM w2),
              |w4 AS (
              |  SELECT *, sum(term) OVER (ORDER BY dur
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum
              |  FROM w3)
              |SELECT dur AS dur_hours, nrisk, d AS n_events, c AS n_censored,
              |  CASE WHEN zf = 1 THEN 0.0E0
              |    ELSE ${rs("exp(CAST(lnsum AS DOUBLE))", 6)} END AS surv_r
              |FROM w4 WHERE d > 0 ORDER BY dur_hours""".stripMargin)),

    // ----- q190: quantile normalization onto the pooled distribution ----
    // Replace each source's raw length distribution by the pooled
    // corpus's — rank-based quantile normalization, the alignment step
    // that makes heterogeneous sources comparable before mixing (q161's
    // z-score assumes a shape; this one doesn't). Scale shape: the
    // per-source rank comes from PrefixSum.rank (a plain `PARTITION BY
    // source` window would single-task N/20 rows — ~20 sources), each doc
    // maps to one of 100 quantile cells by integer ceil-rank arithmetic
    // (per-source sizes are a 20-row broadcast agg, not a partition-only
    // window), and the pooled side is a single percentile() aggregate
    // (mergeable buffer) posexploded to a 100-row broadcast grid — the
    // output is bounded by sources × cells at any corpus size. Spark
    // percentile ≡ DuckDB quantile_cont (linear interpolation, parity
    // proven by q47).
    QueryDef(
      "q190_quantile_normalize",
      (s, dir) => {
        val fracs = (1 to Cells).map(_ / 100.0)
        val base = tbl(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
        val sizes = base.groupBy(col("source")).agg(count(lit(1)).as("ns"))
        // char counts are integers with data-sized tie runs (every
        // GenScale copy keeps its length): tieCell splits ties by doc_id
        // so in-cell tasks track N/(keys·cells), not value multiplicity
        val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
        val ranked = graft.ops.PrefixSum.rank(
            base, Seq("source"), col("n_chars"), ascending = true,
            Seq(col("doc_id")), "r",
            cellKey = Some(graft.ops.PrefixSum.tieCell(
              col("n_chars"), ascending = true, col("doc_id"), maxId)))
          .join(broadcast(sizes), Seq("source"))
          .withColumn("cell",
            ((col("r") * Cells + col("ns") - 1) / col("ns")).cast("long"))
        val grid = base
          .agg(expr(s"percentile(n_chars, array(${fracs.mkString(",")}))")
            .as("qs"))
          .select(posexplode(col("qs")).as(Seq("pos", "qval")))
          .select((col("pos") + 1).cast("long").as("cell"), col("qval"))
        ranked.groupBy(col("source"), col("cell"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("src_min"),
            max(col("n_chars")).as("src_max"))
          .join(broadcast(grid), Seq("cell"))
          .select(col("source"), col("cell"), col("n_docs"),
            col("src_min"), col("src_max"),
            R(col("qval"), 4).as("mapped_r"))
          .orderBy("source", "cell")
      },
      Some(s"""WITH ranked AS (
              |  SELECT source, n_chars,
              |    row_number() OVER (PARTITION BY source
              |      ORDER BY n_chars, doc_id) AS r,
              |    count(*) OVER (PARTITION BY source) AS ns
              |  FROM documents),
              |cells AS (
              |  SELECT source, (r * $Cells + ns - 1) // ns AS cell, n_chars
              |  FROM ranked),
              |grid AS (
              |  SELECT CAST(c.c AS BIGINT) AS cell, qs[CAST(c.c AS INTEGER)] AS qval
              |  FROM (SELECT quantile_cont(n_chars,
              |      [${(1 to Cells).map(_ / 100.0).mkString(",")}]) AS qs
              |    FROM documents) q CROSS JOIN range(1, ${Cells + 1}) c(c))
              |SELECT cells.source, cells.cell, count(*) AS n_docs,
              |  min(n_chars) AS src_min, max(n_chars) AS src_max,
              |  ${rs("qval", 4)} AS mapped_r
              |FROM cells JOIN grid ON grid.cell = cells.cell
              |GROUP BY 1, 2, qval ORDER BY 1, 2""".stripMargin)),

    // ----- q191: Poisson-bootstrap confidence interval ------------------
    // A 95 % CI for each priority's mean order value WITHOUT a second
    // pass: every (row, replicate) pair draws a Poisson(1) weight from
    // an md5-keyed uniform — the streaming bootstrap (independent
    // per-row draws, no global resampling state), reproducible across
    // engines because the weight is a string compare against 48-bit hex
    // CDF thresholds. Shape: a B-way map-side explode into ONE hash agg
    // on (priority, replicate) — partial agg absorbs the fan-out — then
    // order statistics of the B means per group via a window over the
    // groups×B-sized relation. All sums are exact (BIGINT weights ×
    // DECIMAL cents); the replicate mean's division is the shared float.
    QueryDef(
      "q191_bootstrap_ci",
      (s, dir) => {
        val o = tbl(s, dir, "orders").select(
          col("o_orderpriority").as("pri"), col("o_orderkey"),
          R(col("o_totalprice"), 2).cast(DecimalType(18, 2)).as("v"))
        val reps = o.withColumn("b", explode(sequence(lit(1), lit(B))))
          .withColumn("h",
            substring(md5(concat(col("o_orderkey"), lit("|"), col("b"))), 1, 12))
          .withColumn("w", expr(PoissonCaseSql).cast("long"))
        val means = reps.groupBy(col("pri"), col("b"))
          .agg((sum(col("w") * col("v")).cast("double") /
            sum(col("w")).cast("double")).as("mb"))
        val wOrd = Window.partitionBy(col("pri")).orderBy(col("mb"), col("b"))
        val ci = means.withColumn("rn", row_number().over(wOrd))
          .groupBy(col("pri"))
          .agg(max(when(col("rn") === LoRank, col("mb"))).as("lo"),
            max(when(col("rn") === HiRank, col("mb"))).as("hi"))
        val point = o.groupBy(col("pri"))
          .agg(count(lit(1)).as("n_orders"),
            (sum(col("v")).cast("double") / count(lit(1))).as("mean"))
        point.join(ci, Seq("pri"))
          .select(col("pri"), col("n_orders"),
            R(col("mean"), 4).as("mean_r"),
            R(col("lo"), 4).as("lo_r"), R(col("hi"), 4).as("hi_r"),
            R(col("hi") - col("lo"), 4).as("width_r"),
            (col("mean") >= col("lo") && col("mean") <= col("hi"))
              .as("covered"))
          .orderBy("pri")
      },
      Some(s"""WITH o AS (
              |  SELECT o_orderpriority AS pri, o_orderkey,
              |    CAST(${rs("o_totalprice", 2)} AS DECIMAL(18,2)) AS v
              |  FROM orders),
              |reps AS (
              |  SELECT pri, v, CAST(b.b AS INTEGER) AS b,
              |    substr(md5(o_orderkey || '|' || CAST(b.b AS INTEGER)), 1, 12) AS h
              |  FROM o CROSS JOIN range(1, ${B + 1}) b(b)),
              |wts AS (
              |  SELECT pri, v, b, CAST($PoissonCaseSql AS BIGINT) AS w FROM reps),
              |means AS (
              |  SELECT pri, b,
              |    CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS mb
              |  FROM wts GROUP BY 1, 2),
              |rk AS (
              |  SELECT *, row_number() OVER (PARTITION BY pri
              |    ORDER BY mb, b) AS rn FROM means),
              |ci AS (
              |  SELECT pri, max(CASE WHEN rn = $LoRank THEN mb END) AS lo,
              |    max(CASE WHEN rn = $HiRank THEN mb END) AS hi
              |  FROM rk GROUP BY 1),
              |pt AS (
              |  SELECT pri, count(*) AS n_orders,
              |    CAST(sum(v) AS DOUBLE) / count(*) AS mean FROM o GROUP BY 1)
              |SELECT pt.pri, pt.n_orders,
              |  ${rs("mean", 4)} AS mean_r,
              |  ${rs("lo", 4)} AS lo_r, ${rs("hi", 4)} AS hi_r,
              |  ${rs("hi - lo", 4)} AS width_r,
              |  (mean >= lo AND mean <= hi) AS covered
              |FROM pt JOIN ci ON ci.pri = pt.pri ORDER BY 1""".stripMargin))
  )
}
