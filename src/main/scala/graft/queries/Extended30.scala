package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 third batch: four analytics families the battery did not yet
  * cover — market-basket association rules (the co-occurrence miner),
  * Jensen–Shannon divergence (the always-finite corpus-drift metric the
  * PSI/KL family needs when supports differ), Brier-score calibration
  * with the exact Murphy decomposition (is a probabilistic scorer
  * honest, not just discriminative — q193's AUC cannot see
  * miscalibration), and grouped closed-form OLS trend fitting (slope /
  * intercept / R² from one exact-moment aggregate).
  *
  * House exactness rules throughout: integers stay integers until a
  * single shared-shape division; float terms accumulate as ROUNDED
  * DECIMALs (order-free across engines); every output double goes
  * through Num.roundTo / Num.roundSql.
  */
object Extended30 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // ----- q225: market-basket association rules ------------------------
    // Support / confidence (both directions) / lift for every observed
    // brand pair co-purchased within an order — the 2-itemset Apriori
    // readout behind recommender candidates and cross-sell dashboards.
    // Exactness: all counts are integers; the four ratios are single
    // shared-shape double divisions, rounded. Shape: the basket relation
    // is one distinct hash agg; pair generation is a self-equi-join on
    // the basket key whose fan-out is bounded by (distinct items per
    // basket)² — a map-side constant, never an item×item matrix; item
    // supports are a vocabulary-sized relation broadcast to the pair
    // relation; output is bounded by the observed-pair vocabulary
    // (≤ 300 brand pairs at any corpus scale).
    QueryDef(
      "q225_assoc_rules",
      (s, dir) => {
        val ob = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("o"), col("p_brand").as("item"))
          .distinct()
        val items = ob.groupBy(col("item")).agg(count(lit(1)).as("ni"))
        val nbask = ob.agg(countDistinct(col("o")).as("n_baskets"))
        val pairs = ob.as("x")
          .join(ob.as("y"),
            col("x.o") === col("y.o") && col("x.item") < col("y.item"))
          .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
          .agg(count(lit(1)).as("nab"))
        val d = (c: Column) => c.cast("double")
        pairs
          .join(broadcast(items.select(col("item").as("item_a"), col("ni").as("na"))), "item_a")
          .join(broadcast(items.select(col("item").as("item_b"), col("ni").as("nb"))), "item_b")
          .crossJoin(broadcast(nbask))
          .select(col("item_a"), col("item_b"), col("nab"), col("na"), col("nb"),
            R(d(col("nab")) / d(col("n_baskets")), 6).as("support_r"),
            R(d(col("nab")) / d(col("na")), 6).as("conf_ab_r"),
            R(d(col("nab")) / d(col("nb")), 6).as("conf_ba_r"),
            R(d(col("n_baskets")) * d(col("nab")) / (d(col("na")) * d(col("nb"))), 6)
              .as("lift_r"))
          .orderBy("item_a", "item_b")
      },
      Some(s"""WITH ob AS (
              |  SELECT DISTINCT l_orderkey AS o, p_brand AS item
              |  FROM lineitem JOIN part ON l_partkey = p_partkey),
              |items AS (SELECT item, count(*) AS ni FROM ob GROUP BY 1),
              |tot AS (SELECT count(DISTINCT o) AS n_baskets FROM ob),
              |pairs AS (
              |  SELECT x.item AS item_a, y.item AS item_b, count(*) AS nab
              |  FROM ob x JOIN ob y ON x.o = y.o AND x.item < y.item
              |  GROUP BY 1, 2)
              |SELECT item_a, item_b, nab, a.ni AS na, b.ni AS nb,
              |  ${rs("CAST(nab AS DOUBLE) / CAST(n_baskets AS DOUBLE)", 6)} AS support_r,
              |  ${rs("CAST(nab AS DOUBLE) / CAST(a.ni AS DOUBLE)", 6)} AS conf_ab_r,
              |  ${rs("CAST(nab AS DOUBLE) / CAST(b.ni AS DOUBLE)", 6)} AS conf_ba_r,
              |  ${rs("CAST(n_baskets AS DOUBLE) * CAST(nab AS DOUBLE) / (CAST(a.ni AS DOUBLE) * CAST(b.ni AS DOUBLE))", 6)} AS lift_r
              |FROM pairs
              |JOIN items a ON a.item = pairs.item_a
              |JOIN items b ON b.item = pairs.item_b
              |CROSS JOIN tot
              |ORDER BY item_a, item_b""".stripMargin)),

    // ----- q226: Jensen–Shannon divergence between feeds ----------------
    // Distribution drift between the three pseudo-feeds (q149's keying:
    // doc_id % 3 — deterministic in both engines) measured on their
    // language mixes. JS = ½KL(P‖M) + ½KL(Q‖M) with M the midpoint —
    // finite even when supports differ (where raw KL blows up), which
    // is why it is the curator's default drift metric alongside PSI.
    // Zero-probability terms contribute 0 by the p·ln(...) limit — made
    // explicit with a p > 0 guard on BOTH engines. Exactness: shares
    // are exact integer ratios; each ln term is one shared shape
    // accumulated as a ROUNDED DECIMAL over the (feeds × langs)-bounded
    // grid. Shape: one cell hash agg; the pair join runs on the tiny
    // grid relation — at any corpus scale only the first agg sees data.
    QueryDef(
      "q226_js_divergence",
      (s, dir) => {
        // One scan: per-lang conditional counts for the three feeds (a
        // 3-wide pivot the grid join would otherwise re-derive — and the
        // re-derivation costs a re-scan per reference, pinned at 1 by
        // PlanSpec). Zero cells stay explicit so the missing-support
        // terms (the reason JS is finite where KL is not) are computed,
        // not dropped by an inner join.
        def cf(i: Int) =
          sum(when(pmod(col("doc_id"), lit(3)) === i, 1L).otherwise(0L)).as(s"c$i")
        val byLang = tbl(s, dir, "documents")
          .select(col("doc_id"), col("lang"))
          .groupBy(col("lang"))
          .agg(cf(0), cf(1), cf(2))
        val tot = Window.partitionBy()
        val wl = (0 to 2).foldLeft(byLang) { (df, i) =>
          df.withColumn(s"n$i", sum(col(s"c$i")).over(tot))
        }
        val p = (i: Int) => col(s"c$i").cast("double") / col(s"n$i").cast("double")
        def pairS(a: Int, b: Int) = struct(
          lit(a).cast("long").as("feed_a"), lit(b).cast("long").as("feed_b"),
          p(a).as("pa"), p(b).as("pb"),
          col(s"n$a").as("docs_a"), col(s"n$b").as("docs_b"))
        val pairs = wl.select(explode(array(pairS(0, 1), pairS(0, 2), pairS(1, 2))).as("e"))
          .select(col("e.*"))
        val dec = DecimalType(28, 12)
        val termA = when(col("pa") > 0,
          R(lit(0.5) * col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb"))), 12))
          .otherwise(lit(0.0))
        val termB = when(col("pb") > 0,
          R(lit(0.5) * col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb"))), 12))
          .otherwise(lit(0.0))
        pairs.groupBy(col("feed_a"), col("feed_b"))
          .agg(max(col("docs_a")).as("docs_a"), max(col("docs_b")).as("docs_b"),
            sum(termA.cast(dec)).cast("double").as("kla"),
            sum(termB.cast(dec)).cast("double").as("klb"))
          .select(col("feed_a"), col("feed_b"), col("docs_a"), col("docs_b"),
            R(col("kla") + col("klb"), 6).as("jsd_r"),
            R(sqrt(col("kla") + col("klb")), 6).as("js_dist_r"))
          .orderBy("feed_a", "feed_b")
      },
      Some {
        def pairSel(a: Int, b: Int) =
          s"""SELECT CAST($a AS BIGINT) AS feed_a, CAST($b AS BIGINT) AS feed_b,
             |  CAST(c$a AS DOUBLE) / CAST(n$a AS DOUBLE) AS pa,
             |  CAST(c$b AS DOUBLE) / CAST(n$b AS DOUBLE) AS pb,
             |  n$a AS docs_a, n$b AS docs_b FROM wl""".stripMargin
        s"""WITH byl AS (
           |  SELECT lang,
           |    CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
           |    CAST(sum(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           |    CAST(sum(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
           |  FROM documents GROUP BY 1),
           |wl AS (
           |  SELECT *, CAST(sum(c0) OVER () AS BIGINT) AS n0,
           |    CAST(sum(c1) OVER () AS BIGINT) AS n1,
           |    CAST(sum(c2) OVER () AS BIGINT) AS n2
           |  FROM byl),
           |pairs AS (
           |${pairSel(0, 1)}
           |UNION ALL
           |${pairSel(0, 2)}
           |UNION ALL
           |${pairSel(1, 2)}),
           |terms AS (
           |  SELECT feed_a, feed_b, docs_a, docs_b,
           |    CASE WHEN pa > 0 THEN CAST(${rs("0.5 * pa * ln(2.0 * pa / (pa + pb))", 12)} AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END AS ta,
           |    CASE WHEN pb > 0 THEN CAST(${rs("0.5 * pb * ln(2.0 * pb / (pa + pb))", 12)} AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END AS tb
           |  FROM pairs),
           |agg AS (
           |  SELECT feed_a, feed_b, max(docs_a) AS docs_a, max(docs_b) AS docs_b,
           |    CAST(sum(ta) AS DOUBLE) AS kla, CAST(sum(tb) AS DOUBLE) AS klb
           |  FROM terms GROUP BY 1, 2)
           |SELECT feed_a, feed_b, docs_a, docs_b,
           |  ${rs("kla + klb", 6)} AS jsd_r,
           |  ${rs("sqrt(kla + klb)", 6)} AS js_dist_r
           |FROM agg ORDER BY feed_a, feed_b""".stripMargin
      }),

    // ----- q227: Brier score + Murphy decomposition ---------------------
    // Calibration audit of a probabilistic scorer: a decile-grid
    // forecaster p̂ = 0.05 + 0.1·min(9, ⌊views/2⌋) predicts per-user
    // purchase; Brier = mean (p̂−y)² splits EXACTLY (Murphy) into
    // uncertainty ȳ(1−ȳ) + reliability − resolution because the
    // forecast takes ≤ 10 discrete values and bins ARE those values.
    // AUC (q193) rewards any monotone score; this catches a scorer
    // whose probabilities are systematically off. Exactness: per-bin
    // Σ(p̂−y)² expands over binary y to integer-weighted double squares
    // (f constant within bin); all cross-engine sums are rounded-term
    // DECIMALs; decomp_ok compares pre-rounded doubles built from
    // identical shapes, so it is bit-deterministic. Shape: one
    // user-sized hash agg, then everything runs on the ≤ 10-row bin
    // relation (global windows there are bounded by construction).
    QueryDef(
      "q227_brier_calibration",
      (s, dir) => {
        val users = tbl(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
        val k = least(lit(9L), floor(col("views").cast("double") / 2.0).cast("long"))
        val f = lit(0.05) + lit(0.1) * k.cast("double")
        val dec = DecimalType(28, 10)
        val bins = users
          .select(k.as("k"), f.as("f"), col("y"))
          .groupBy(col("k"), col("f"))
          .agg(count(lit(1)).as("n_k"), sum(col("y")).as("pos_k"))
        // Σ_bin (f−y)² = pos·(f−1)² + (n−pos)·f² — exact within the bin.
        val sq = col("pos_k").cast("double") * (col("f") - 1.0) * (col("f") - 1.0) +
          (col("n_k") - col("pos_k")).cast("double") * col("f") * col("f")
        val ybk = col("pos_k").cast("double") / col("n_k").cast("double")
        val tot = Window.partitionBy()
        val g = bins
          .withColumn("ybar_k", ybk)
          .withColumn("sq_t", R(sq, 10).cast(dec))
          .withColumn("nn", sum(col("n_k")).over(tot))
          .withColumn("pp", sum(col("pos_k")).over(tot))
          .withColumn("ybar", col("pp").cast("double") / col("nn").cast("double"))
          .withColumn("rel_t",
            R(col("n_k").cast("double") * (col("f") - col("ybar_k")) * (col("f") - col("ybar_k")), 10).cast(dec))
          .withColumn("res_t",
            R(col("n_k").cast("double") * (col("ybar_k") - col("ybar")) * (col("ybar_k") - col("ybar")), 10).cast(dec))
        val nD = col("nn").cast("double")
        val brier = sum(col("sq_t")).over(tot).cast("double") / nD
        val rel = sum(col("rel_t")).over(tot).cast("double") / nD
        val res = sum(col("res_t")).over(tot).cast("double") / nD
        val unc = col("ybar") * (lit(1.0) - col("ybar"))
        g.select(col("k"), col("n_k"), col("pos_k"),
            R(col("f"), 2).as("f_r"),
            R(col("ybar_k"), 6).as("ybar_k_r"),
            R(brier, 6).as("brier_r"),
            R(unc, 6).as("unc_r"),
            R(rel, 6).as("rel_r"),
            R(res, 6).as("res_r"),
            (abs(brier - (unc + rel - res)) < 1e-9).as("decomp_ok"))
          .orderBy("k")
      },
      Some(s"""WITH users AS (
              |  SELECT user_id,
              |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
              |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
              |  FROM events GROUP BY 1),
              |scored AS (
              |  SELECT least(9, CAST(floor(CAST(views AS DOUBLE) / 2.0) AS BIGINT)) AS k,
              |    0.05 + 0.1 * CAST(least(9, CAST(floor(CAST(views AS DOUBLE) / 2.0) AS BIGINT)) AS DOUBLE) AS f,
              |    y
              |  FROM users),
              |bins AS (
              |  SELECT k, f, count(*) AS n_k, CAST(sum(y) AS BIGINT) AS pos_k
              |  FROM scored GROUP BY 1, 2),
              |g AS (
              |  SELECT *,
              |    CAST(pos_k AS DOUBLE) / CAST(n_k AS DOUBLE) AS ybar_k,
              |    CAST(${rs("CAST(pos_k AS DOUBLE) * (f - 1.0) * (f - 1.0) + CAST(n_k - pos_k AS DOUBLE) * f * f", 10)} AS DECIMAL(28,10)) AS sq_t,
              |    CAST(sum(n_k) OVER () AS BIGINT) AS nn,
              |    CAST(sum(pos_k) OVER () AS BIGINT) AS pp
              |  FROM bins),
              |g2 AS (
              |  SELECT *, CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE) AS ybar,
              |    CAST(${rs("CAST(n_k AS DOUBLE) * (f - CAST(pos_k AS DOUBLE) / CAST(n_k AS DOUBLE)) * (f - CAST(pos_k AS DOUBLE) / CAST(n_k AS DOUBLE))", 10)} AS DECIMAL(28,10)) AS rel_t,
              |    CAST(${rs("CAST(n_k AS DOUBLE) * (CAST(pos_k AS DOUBLE) / CAST(n_k AS DOUBLE) - CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)) * (CAST(pos_k AS DOUBLE) / CAST(n_k AS DOUBLE) - CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE))", 10)} AS DECIMAL(28,10)) AS res_t
              |  FROM g),
              |fin AS (
              |  SELECT *,
              |    CAST(sum(sq_t) OVER () AS DOUBLE) / CAST(nn AS DOUBLE) AS brier,
              |    ybar * (1.0 - ybar) AS unc,
              |    CAST(sum(rel_t) OVER () AS DOUBLE) / CAST(nn AS DOUBLE) AS rel,
              |    CAST(sum(res_t) OVER () AS DOUBLE) / CAST(nn AS DOUBLE) AS res
              |  FROM g2)
              |SELECT k, n_k, pos_k,
              |  ${rs("f", 2)} AS f_r,
              |  ${rs("ybar_k", 6)} AS ybar_k_r,
              |  ${rs("brier", 6)} AS brier_r,
              |  ${rs("unc", 6)} AS unc_r,
              |  ${rs("rel", 6)} AS rel_r,
              |  ${rs("res", 6)} AS res_r,
              |  (abs(brier - (unc + rel - res)) < 1e-9) AS decomp_ok
              |FROM fin ORDER BY k""".stripMargin)),

    // ----- q228: grouped OLS trend fit ----------------------------------
    // Closed-form simple linear regression of daily revenue (exact
    // integer cents) on the epoch-day index, per return flag: slope,
    // intercept, R² — the BI trend line and the q194-backtest's missing
    // parametric sibling. Exactness: the five moments accumulate as
    // EXACT integers (Spark DECIMAL(38,0), DuckDB HUGEINT — both exact,
    // and the exact integer values cast to identical doubles); the
    // normal-equation differences n·Σxy − ΣxΣy etc. then evaluate in
    // shared-shape doubles (their squares overflow any fixed decimal,
    // so the double hand-off point is pinned at the moment casts).
    // Shape: one daily hash agg, one 3-group moment agg, closed form —
    // join-free, two aggs total, scales as a scan.
    QueryDef(
      "q228_ols_trend",
      (s, dir) => {
        val dec = DecimalType(38, 0)
        val daily = tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag").as("flag"),
            datediff(to_date(col("l_shipdate")), lit("1995-01-01")).cast("long").as("x"))
          .agg(sum(R(col("l_extendedprice") * 100.0, 0).cast(dec)).as("y"))
        val xD = col("x").cast(dec)
        val m = daily.groupBy(col("flag"))
          .agg(count(lit(1)).as("n"),
            sum(xD).as("sx"),
            sum(col("y")).as("sy"),
            sum(xD * xD).as("sxx"),
            sum(xD * col("y")).as("sxy"),
            sum(col("y") * col("y")).as("syy"))
        val d = (c: Column) => c.cast("double")
        val nD = d(col("n"))
        val sxx = nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))
        val sxy = nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))
        val syy = nD * d(col("syy")) - d(col("sy")) * d(col("sy"))
        val slope = sxy / sxx
        m.select(col("flag"), col("n").as("n_days"),
            R(slope, 6).as("slope_cents_per_day_r"),
            R((d(col("sy")) - slope * d(col("sx"))) / nD, 2).as("intercept_cents_r"),
            R(sxy * sxy / (sxx * syy), 6).as("r2_r"))
          .orderBy("flag")
      },
      Some(s"""WITH daily AS (
              |  SELECT l_returnflag AS flag,
              |    CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS x,
              |    CAST(sum(CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT)) AS HUGEINT) AS y
              |  FROM lineitem GROUP BY 1, 2),
              |m AS (
              |  SELECT flag, count(*) AS n,
              |    sum(CAST(x AS HUGEINT)) AS sx,
              |    sum(y) AS sy,
              |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
              |    sum(CAST(x AS HUGEINT) * y) AS sxy,
              |    sum(y * y) AS syy
              |  FROM daily GROUP BY 1),
              |c AS (
              |  SELECT flag, n,
              |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS bsxx,
              |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS bsxy,
              |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS bsyy,
              |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
              |  FROM m)
              |SELECT flag, n AS n_days,
              |  ${rs("bsxy / bsxx", 6)} AS slope_cents_per_day_r,
              |  ${rs("(syd - (bsxy / bsxx) * sxd) / CAST(n AS DOUBLE)", 2)} AS intercept_cents_r,
              |  ${rs("bsxy * bsxy / (bsxx * bsyy)", 6)} AS r2_r
              |FROM c ORDER BY flag""".stripMargin))
  )
}
