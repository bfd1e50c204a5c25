package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 eighth batch: multiple-testing control (Benjamini–Hochberg
  * FDR over the mixed hypothesis family the battery's tests produce —
  * without it a 100-metric dashboard "discovers" five false effects a
  * day), model-based imputation (per-group OLS prediction for gated
  * nulls — the regression upgrade of q10's median impute), and 1-D
  * earth-mover drift (the binned-distribution distance that, unlike
  * q127's PSI or q226's JS, sees HOW FAR mass moved, not just that it
  * moved).
  */
object Extended35 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // ----- q241: Benjamini–Hochberg FDR ---------------------------------
    // A 16-hypothesis family: 9 Benford first-digit deviations of order
    // totals (strongly non-null on this data — q184's finding) + 7
    // day-of-week uniformity deviations of event volume (mostly null).
    // Per cell: binomial z → the exact 2-df tail p = exp(−z²/2); BH at
    // q = 0.05: sort p ascending, reject ranks ≤ max{i : p_i ≤ i·q/m}.
    // The mixed family makes the procedure non-vacuous BOTH ways —
    // some hypotheses reject, some survive, at every fixture SF.
    // Exactness: observed counts are integers; z/p are shared double
    // shapes; the BH walk runs on the bounded 16-row relation
    // (rejection decided on pre-rounded doubles, identical on both
    // engines). Shape: two hash aggs (one per family) → 16-row union —
    // scales as two scans.
    QueryDef(
      "q241_bh_fdr",
      (s, dir) => {
        val dTot = Window.partitionBy(col("family"))
        // family 1: Benford digits of o_totalprice
        val ben = tbl(s, dir, "orders")
          .filter(col("o_totalprice") > 0)
          .select(substring(col("o_totalprice").cast(DecimalType(18, 2)).cast("string"), 1, 1)
            .cast("int").as("cell"))
          .filter(col("cell").between(1, 9))
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .select(lit("benford").as("family"), col("cell").cast("long").as("cell"),
            col("n"),
            (log(lit(1.0) + lit(1.0) / col("cell").cast("double")) / log(lit(10.0)))
              .as("e_share"))
        // family 2: day-of-week uniformity of event volume
        val dow = tbl(s, dir, "events")
          .select(((datediff(to_date(col("ts")), lit("1970-01-01")) + 4) % 7)
            .cast("long").as("cell"))
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .select(lit("dow_uniform").as("family"), col("cell"), col("n"),
            (lit(1.0) / lit(7.0)).as("e_share"))
        val cells = ben.unionByName(dow)
          .withColumn("tot", sum(col("n")).over(dTot))
        val tD = col("tot").cast("double")
        val z = (col("n").cast("double") - tD * col("e_share")) /
          sqrt(tD * col("e_share") * (lit(1.0) - col("e_share")))
        val withP = cells.withColumn("z", z)
          .withColumn("p", exp(lit(-0.5) * col("z") * col("z")))
        val m = Window.partitionBy()
        val rk = row_number()
          .over(Window.orderBy(col("p"), col("family"), col("cell"))).cast("long")
        val g = withP.withColumn("rank", rk)
          .withColumn("mh", count(lit(1)).over(m))
          .withColumn("bh_thresh",
            col("rank").cast("double") * lit(0.05) / col("mh").cast("double"))
          .withColumn("k", max(when(col("p") <= col("bh_thresh"), col("rank"))
            .otherwise(lit(0L))).over(m))
        g.select(col("family"), col("cell"), col("n"),
            R(col("z"), 4).as("z_r"),
            R(col("p"), 6).as("p_r"),
            col("rank"),
            R(col("bh_thresh"), 6).as("bh_thresh_r"),
            (col("rank") <= col("k")).as("rejected"))
          .orderBy("rank")
      },
      Some(s"""WITH ben AS (
              |  SELECT 'benford' AS family, CAST(cell AS BIGINT) AS cell, count(*) AS n,
              |    ln(1.0 + 1.0 / CAST(cell AS DOUBLE)) / ln(10.0) AS e_share
              |  FROM (SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INT) AS cell
              |        FROM orders WHERE o_totalprice > 0)
              |  WHERE cell BETWEEN 1 AND 9 GROUP BY 1, 2, 4),
              |dw AS (
              |  SELECT 'dow_uniform' AS family,
              |    CAST(((CAST(ts AS DATE) - DATE '1970-01-01') + 4) % 7 AS BIGINT) AS cell,
              |    count(*) AS n, 1.0 / 7.0 AS e_share
              |  FROM events GROUP BY 1, 2, 4),
              |cells AS (
              |  SELECT *, CAST(sum(n) OVER (PARTITION BY family) AS BIGINT) AS tot
              |  FROM (SELECT * FROM ben UNION ALL SELECT * FROM dw)),
              |wp AS (
              |  SELECT *,
              |    (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * e_share)
              |      / sqrt(CAST(tot AS DOUBLE) * e_share * (1.0 - e_share)) AS z
              |  FROM cells),
              |wp2 AS (
              |  SELECT *, exp(-0.5 * z * z) AS p FROM wp),
              |rkd AS (
              |  SELECT *,
              |    CAST(row_number() OVER (ORDER BY p, family, cell) AS BIGINT) AS rank,
              |    CAST(count(*) OVER () AS BIGINT) AS mh
              |  FROM wp2),
              |th AS (
              |  SELECT *, CAST(rank AS DOUBLE) * 0.05 / CAST(mh AS DOUBLE) AS bh_thresh
              |  FROM rkd),
              |kk AS (
              |  SELECT *, max(CASE WHEN p <= bh_thresh THEN rank ELSE 0 END) OVER () AS k
              |  FROM th)
              |SELECT family, cell, n,
              |  ${rs("z", 4)} AS z_r,
              |  ${rs("p", 6)} AS p_r,
              |  rank,
              |  ${rs("bh_thresh", 6)} AS bh_thresh_r,
              |  rank <= k AS rejected
              |FROM kk ORDER BY rank""".stripMargin)),

    // ----- q242: model-based (regression) imputation --------------------
    // Upgrade q10's median impute: quantities gated to NULL by the
    // range rule (q03's [5, 45] gate) are predicted per return flag
    // from the OLS line quantity ~ extendedprice fitted ONLY on
    // in-range rows. The imputed aggregate needs NO second pass:
    // Σ(a + b·price) over gated rows = n_gated·a + b·Σprice_gated —
    // both sides come from the same one-pass conditional moment
    // aggregate (the closed-form trick that keeps this a single scan
    // at any corpus size). Exactness: moments accumulate as exact
    // DECIMAL cent/quantity integers; the OLS hand-off and all means
    // are shared double shapes.
    QueryDef(
      "q242_regression_impute",
      (s, dir) => {
        val dec = DecimalType(38, 0)
        val inR = col("l_quantity") >= 5.0 && col("l_quantity") <= 45.0
        val pc = R(col("l_extendedprice") * 100.0, 0).cast(dec)
        val qc = R(col("l_quantity") * 100.0, 0).cast(dec)
        val m = tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag").as("flag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(inR, 1L).otherwise(0L)).as("n_in"),
            sum(when(!inR, 1L).otherwise(0L)).as("n_gated"),
            sum(when(inR, pc).otherwise(lit(0).cast(dec))).as("sx"),
            sum(when(inR, qc).otherwise(lit(0).cast(dec))).as("sy"),
            sum(when(inR, pc * pc).otherwise(lit(0).cast(dec))).as("sxx"),
            sum(when(inR, pc * qc).otherwise(lit(0).cast(dec))).as("sxy"),
            sum(when(!inR, pc).otherwise(lit(0).cast(dec))).as("sx_gated"),
            sum(when(!inR, qc).otherwise(lit(0).cast(dec))).as("sy_gated"))
        val d = (c: Column) => c.cast("double")
        val nD = d(col("n_in"))
        val bsxx = nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))
        val bsxy = nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))
        val b = bsxy / bsxx
        val a = (d(col("sy")) - b * d(col("sx"))) / nD
        // Σ imputed (in cent·100 units) = n_gated·a + b·Σx_gated
        val impSum = col("n_gated").cast("double") * a + b * d(col("sx_gated"))
        m.select(col("flag"), col("n_rows"), col("n_in"), col("n_gated"),
            R(b, 8).as("slope_r"),
            R(a / 100.0, 4).as("intercept_qty_r"),
            R(impSum / col("n_gated").cast("double") / 100.0, 4)
              .as("imputed_mean_qty_r"),
            R(d(col("sy")) / nD / 100.0, 4).as("inrange_mean_qty_r"),
            R(d(col("sy_gated")) / col("n_gated").cast("double") / 100.0, 4)
              .as("gated_raw_mean_qty_r"))
          .orderBy("flag")
      },
      Some(s"""WITH m AS (
              |  SELECT l_returnflag AS flag, count(*) AS n_rows,
              |    CAST(sum(CASE WHEN l_quantity >= 5.0 AND l_quantity <= 45.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
              |    CAST(sum(CASE WHEN l_quantity >= 5.0 AND l_quantity <= 45.0 THEN 0 ELSE 1 END) AS BIGINT) AS n_gated,
              |    sum(CASE WHEN l_quantity >= 5.0 AND l_quantity <= 45.0 THEN CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT) ELSE 0 END) AS sx,
              |    sum(CASE WHEN l_quantity >= 5.0 AND l_quantity <= 45.0 THEN CAST(${rs("l_quantity * 100.0", 0)} AS HUGEINT) ELSE 0 END) AS sy,
              |    sum(CASE WHEN l_quantity >= 5.0 AND l_quantity <= 45.0 THEN CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT) * CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT) ELSE 0 END) AS sxx,
              |    sum(CASE WHEN l_quantity >= 5.0 AND l_quantity <= 45.0 THEN CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT) * CAST(${rs("l_quantity * 100.0", 0)} AS HUGEINT) ELSE 0 END) AS sxy,
              |    sum(CASE WHEN l_quantity >= 5.0 AND l_quantity <= 45.0 THEN 0 ELSE CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT) END) AS sx_gated,
              |    sum(CASE WHEN l_quantity >= 5.0 AND l_quantity <= 45.0 THEN 0 ELSE CAST(${rs("l_quantity * 100.0", 0)} AS HUGEINT) END) AS sy_gated
              |  FROM lineitem GROUP BY 1),
              |c AS (
              |  SELECT *,
              |    CAST(n_in AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS bsxx,
              |    CAST(n_in AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS bsxy
              |  FROM m),
              |f AS (
              |  SELECT *, bsxy / bsxx AS b,
              |    (CAST(sy AS DOUBLE) - (bsxy / bsxx) * CAST(sx AS DOUBLE)) / CAST(n_in AS DOUBLE) AS a
              |  FROM c)
              |SELECT flag, n_rows, n_in, n_gated,
              |  ${rs("b", 8)} AS slope_r,
              |  ${rs("a / 100.0", 4)} AS intercept_qty_r,
              |  ${rs("(CAST(n_gated AS DOUBLE) * a + b * CAST(sx_gated AS DOUBLE)) / CAST(n_gated AS DOUBLE) / 100.0", 4)} AS imputed_mean_qty_r,
              |  ${rs("CAST(sy AS DOUBLE) / CAST(n_in AS DOUBLE) / 100.0", 4)} AS inrange_mean_qty_r,
              |  ${rs("CAST(sy_gated AS DOUBLE) / CAST(n_gated AS DOUBLE) / 100.0", 4)} AS gated_raw_mean_qty_r
              |FROM f ORDER BY flag""".stripMargin)),

    // ----- q243: 1-D earth-mover (Wasserstein) drift --------------------
    // EMD between the three pseudo-feeds' document-length
    // distributions, on a shared 10-bin equal-width grid over the
    // corpus [min, max]: EMD = Σ |CDF_a − CDF_b| in bin units. PSI
    // (q127) and JS (q226) score mass in-place — two distributions
    // whose mass sits one bin apart and ten bins apart look the same;
    // EMD orders them. Exactness: bin ids are exact integer floors
    // (boundary docs clamp to bin 9 identically on both engines);
    // shares are exact integer ratios; the CDF walk is a cumulative
    // window over the bounded 10-row bin relation (q226's one-scan
    // conditional-pivot shape — no joins anywhere).
    QueryDef(
      "q243_emd_drift",
      (s, dir) => {
        // corpus [min, max] via a scalar aggregate broadcast back — NOT a
        // partition-less window over the raw (data-sized) relation,
        // which would funnel every document into one task
        val doc = tbl(s, dir, "documents")
          .select(pmod(col("doc_id"), lit(3)).as("feed"),
            col("n_chars").cast("double").as("v"))
        val mm = doc.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        val base = doc.crossJoin(broadcast(mm))
        val bin = least(lit(9L),
          floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / lit(10.0)))
            .cast("long"))
        def cf(i: Int) =
          sum(when(col("feed") === i, 1L).otherwise(0L)).as(s"c$i")
        val bins = base.withColumn("bin", bin)
          .groupBy(col("bin")).agg(cf(0), cf(1), cf(2))
        val tot = Window.partitionBy()
        val cum = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wl = (0 to 2).foldLeft(bins) { (df, i) =>
          df.withColumn(s"n$i", sum(col(s"c$i")).over(tot))
            .withColumn(s"k$i", sum(col(s"c$i")).over(cum))
        }
        val dec = DecimalType(24, 10)
        def cdf(i: Int) = col(s"k$i").cast("double") / col(s"n$i").cast("double")
        def pairS(a: Int, b: Int) = struct(
          lit(a).cast("long").as("feed_a"), lit(b).cast("long").as("feed_b"),
          R(abs(cdf(a) - cdf(b)), 10).as("step"))
        val pairs = wl
          .select(col("bin"), explode(array(pairS(0, 1), pairS(0, 2), pairS(1, 2))).as("e"))
          .select(col("e.feed_a"), col("e.feed_b"), col("e.step"))
        pairs.groupBy(col("feed_a"), col("feed_b"))
          .agg(sum(col("step").cast(dec)).cast("double").as("emd"))
          .select(col("feed_a"), col("feed_b"), R(col("emd"), 6).as("emd_bins_r"))
          .orderBy("feed_a", "feed_b")
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id % 3 AS feed, CAST(n_chars AS DOUBLE) AS v,
              |    min(CAST(n_chars AS DOUBLE)) OVER () AS mn,
              |    max(CAST(n_chars AS DOUBLE)) OVER () AS mx
              |  FROM documents),
              |binned AS (
              |  SELECT feed,
              |    least(9, CAST(floor((v - mn) / ((mx - mn) / 10.0)) AS BIGINT)) AS bin
              |  FROM base),
              |bins AS (
              |  SELECT bin,
              |    CAST(sum(CASE WHEN feed = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
              |    CAST(sum(CASE WHEN feed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              |    CAST(sum(CASE WHEN feed = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
              |  FROM binned GROUP BY 1),
              |wl AS (
              |  SELECT *,
              |    CAST(sum(c0) OVER () AS BIGINT) AS n0,
              |    CAST(sum(c1) OVER () AS BIGINT) AS n1,
              |    CAST(sum(c2) OVER () AS BIGINT) AS n2,
              |    CAST(sum(c0) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS k0,
              |    CAST(sum(c1) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS k1,
              |    CAST(sum(c2) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS k2
              |  FROM bins),
              |pairs AS (
              |  SELECT CAST(0 AS BIGINT) AS feed_a, CAST(1 AS BIGINT) AS feed_b,
              |    CAST(${rs("abs(CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) - CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE))", 10)} AS DECIMAL(24,10)) AS step FROM wl
              |  UNION ALL
              |  SELECT CAST(0 AS BIGINT), CAST(2 AS BIGINT),
              |    CAST(${rs("abs(CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))", 10)} AS DECIMAL(24,10)) FROM wl
              |  UNION ALL
              |  SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT),
              |    CAST(${rs("abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))", 10)} AS DECIMAL(24,10)) FROM wl)
              |SELECT feed_a, feed_b,
              |  ${rs("CAST(sum(step) AS DOUBLE)", 6)} AS emd_bins_r
              |FROM pairs GROUP BY 1, 2 ORDER BY feed_a, feed_b""".stripMargin))
  )
}
