package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Num
import QueryDef.tbl

/** Round-8 tenth batch: three quick-but-distinct shapes — the Wilson
  * score interval for proportions (the CORRECT small-n binomial CI that
  * dashboards should use instead of the Wald ±1.96·√pq/n), the
  * cumulative-uniques growth curve (the "total users ever" metric whose
  * naive per-day countDistinct is quadratic — first-seen aggregation
  * makes it one pass), and great-circle (haversine) distances over a
  * nation centroid grid (true spherical geometry beside q179's planar
  * grid; trig parity handled by output rounding).
  */
object Extended26 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q211: z² and z for the 95 % Wilson interval, shared literals. */
  private val Z = "1.96E0"
  private val Z2 = "3.8416E0" // 1.96²: exact at 4 decimals, shared verbatim

  /** q213: mean Earth radius (IUGG) in km, shared literal. */
  private val EarthKm = "6371.0088E0"

  val all: Seq[QueryDef] = Seq(

    // ----- q211: Wilson score interval per group ------------------------
    // 95 % CI for each event type's high-value conversion share. The
    // Wilson interval (unlike the Wald CI the naive dashboard computes)
    // never leaves [0,1] and stays honest at small n / extreme p — and
    // it is a pure closed form over the integer (x, n) pair, so both
    // engines evaluate the identical IEEE expression from identical
    // integers: one hash agg, zero joins, bit-stable output.
    QueryDef(
      "q211_wilson_ci",
      (s, dir) => {
        val g = tbl(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum((col("value") >= 100).cast("long")).as("x"))
          .withColumn("nn", col("n").cast("double"))
          .withColumn("p", col("x").cast("double") / col("n").cast("double"))
          .withColumn("den", lit(1.0) + expr(Z2) / col("nn"))
          .withColumn("ctr", (col("p") + expr(Z2) / (lit(2.0) * col("nn"))) / col("den"))
          .withColumn("half",
            expr(Z) * sqrt(col("p") * (lit(1.0) - col("p")) / col("nn") +
              expr(Z2) / (lit(4.0) * col("nn") * col("nn"))) / col("den"))
        g.select(col("event_type"), col("n"), col("x"),
            R(col("p"), 6).as("p_r"),
            R(col("ctr") - col("half"), 6).as("lo_r"),
            R(col("ctr") + col("half"), 6).as("hi_r"))
          .orderBy("event_type")
      },
      Some(s"""WITH g AS (
              |  SELECT event_type, count(*) AS n,
              |    CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS x
              |  FROM events GROUP BY 1),
              |m AS (
              |  SELECT *, CAST(n AS DOUBLE) AS nn,
              |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p
              |  FROM g),
              |m2 AS (
              |  SELECT *, 1E0 + $Z2 / nn AS den,
              |    (p + $Z2 / (2E0 * nn)) / (1E0 + $Z2 / nn) AS ctr,
              |    $Z * sqrt(p * (1E0 - p) / nn + $Z2 / (4E0 * nn * nn)) /
              |      (1E0 + $Z2 / nn) AS half
              |  FROM m)
              |SELECT event_type, n, x,
              |  ${rs("p", 6)} AS p_r,
              |  ${rs("ctr - half", 6)} AS lo_r,
              |  ${rs("ctr + half", 6)} AS hi_r
              |FROM m2 ORDER BY event_type""".stripMargin)),

    // ----- q212: cumulative-uniques growth curve ------------------------
    // "Total distinct activated users ever, by day" — the growth chart
    // (activation = first purchase of value ≥ 200; raw first-activity
    // saturates the synthetic fixture on day 1, which would make the
    // curve vacuous). The naive form re-counts distinct over an
    // ever-growing prefix (quadratic and shuffle-heavy); the scale form
    // aggregates each user to their FIRST-activation day (one user-keyed
    // hash agg — the only data-sized shuffle), then a cumulative window
    // over the calendar-bounded daily relation. All counts exact.
    QueryDef(
      "q212_cumulative_uniques",
      (s, dir) => {
        val first = tbl(s, dir, "events")
          .filter(col("event_type") === "purchase" && col("value") >= 200)
          .groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("d0"))
        val daily = first.groupBy(col("d0")).agg(count(lit(1)).as("n_new"))
        val wCum = Window.orderBy(col("d0"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy()
        daily
          .withColumn("cum", sum(col("n_new")).over(wCum))
          .withColumn("tot", sum(col("n_new")).over(wAll))
          .select(date_format(col("d0"), "yyyy-MM-dd").as("day"),
            col("n_new"), col("cum").as("cum_users"),
            R(col("cum").cast("double") / col("tot").cast("double"), 6)
              .as("share_of_total_r"))
          .orderBy("day")
      },
      Some(s"""WITH first_ AS (
              |  SELECT user_id, min(CAST(ts AS DATE)) AS d0
              |  FROM events
              |  WHERE event_type = 'purchase' AND value >= 200 GROUP BY 1),
              |daily AS (SELECT d0, count(*) AS n_new FROM first_ GROUP BY 1),
              |w AS (
              |  SELECT *,
              |    CAST(sum(n_new) OVER (ORDER BY d0 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
              |    CAST(sum(n_new) OVER () AS BIGINT) AS tot
              |  FROM daily)
              |SELECT strftime(d0, '%Y-%m-%d') AS day, n_new,
              |  cum AS cum_users,
              |  ${rs("CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)", 6)} AS share_of_total_r
              |FROM w ORDER BY day""".stripMargin)),

    // ----- q213: great-circle (haversine) nearest neighbor --------------
    // True spherical distances between deterministic nation centroids
    // (q179's plane is fine for grids; shipping lanes are not planar).
    // The 25-vertex centroid set keeps the pairwise relation bounded
    // (625 rows — broadcast), so the exact all-pairs argmin is the right
    // plan at ANY data scale; the scale story lives in the derivation,
    // not the pairing. Trig functions are not correctly-rounded in
    // either libm, so the distance ROUNDS to 3 decimals before the
    // order-encoded argmin — both engines rank on the same grid point.
    QueryDef(
      "q213_haversine",
      (s, dir) => {
        def lat(k: Column) = (k * 37 % 1000).cast("double") / 1000.0 * 160.0 - 80.0
        def lon(k: Column) = (k * 91 % 1000).cast("double") / 1000.0 * 360.0 - 180.0
        val n = tbl(s, dir, "nation").select(
          col("n_nationkey").cast("long").as("nk"),
          radians(lat(col("n_nationkey").cast("long"))).as("la"),
          radians(lon(col("n_nationkey").cast("long"))).as("lo"))
        val m = n.select(col("nk").as("mk"), col("la").as("la2"), col("lo").as("lo2"))
        val pairs = n.join(m, col("nk") =!= col("mk"))
          .withColumn("a",
            pow(sin((col("la2") - col("la")) / 2), 2) +
              cos(col("la")) * cos(col("la2")) *
              pow(sin((col("lo2") - col("lo")) / 2), 2))
          .withColumn("dist_r",
            R(lit(2.0) * expr(EarthKm) * asin(sqrt(col("a"))), 3))
        // argmin on the ROUNDED distance grid: dist_r·1e3 is integral up to
        // float noise — floor(x+0.5) realigns it EXPLICITLY on both engines
        // (Spark's double→long cast truncates; DuckDB's rounds)
        val enc = floor(col("dist_r") * 1000 + 0.5).cast("long") * 100 + col("mk")
        pairs.groupBy(col("nk"))
          .agg(min(enc).as("e"), count(lit(1)).as("n_pairs"))
          .select(col("nk").as("nation"),
            (col("e") / 100).cast("long").cast("double").divide(1000.0)
              .as("nearest_km"),
            pmod(col("e"), lit(100L)).cast("long").as("nearest_nation"),
            col("n_pairs"))
          .withColumn("nearest_km", R(col("nearest_km"), 3))
          .orderBy("nation")
      },
      Some(s"""WITH n AS (
              |  SELECT CAST(n_nationkey AS BIGINT) AS nk,
              |    radians(CAST(CAST(n_nationkey AS BIGINT) * 37 % 1000 AS DOUBLE) / 1000.0 * 160.0 - 80.0) AS la,
              |    radians(CAST(CAST(n_nationkey AS BIGINT) * 91 % 1000 AS DOUBLE) / 1000.0 * 360.0 - 180.0) AS lo
              |  FROM nation),
              |pairs AS (
              |  SELECT a.nk, b.nk AS mk,
              |    ${rs(s"2E0 * $EarthKm * asin(sqrt(pow(sin((b.la - a.la) / 2), 2) + cos(a.la) * cos(b.la) * pow(sin((b.lo - a.lo) / 2), 2)))", 3)} AS dist_r
              |  FROM n a JOIN n b ON a.nk <> b.nk),
              |enc AS (
              |  SELECT nk, CAST(floor(dist_r * 1000 + 0.5) AS BIGINT) * 100 + mk AS e
              |  FROM pairs),
              |g AS (
              |  SELECT nk, min(e) AS e, count(*) AS n_pairs FROM enc GROUP BY 1)
              |SELECT nk AS nation,
              |  ${rs("CAST(CAST(e // 100 AS BIGINT) AS DOUBLE) / 1000.0", 3)} AS nearest_km,
              |  CAST(e % 100 AS BIGINT) AS nearest_nation, n_pairs
              |FROM g ORDER BY nation""".stripMargin))
  )
}
