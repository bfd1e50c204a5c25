package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-8 seventh batch: three decision-support shapes completing the
  * spatial, entity-resolution, and sequential-inference families — a
  * Getis–Ord-style spatial hotspot z-score over the q179 grid (WHERE is
  * activity concentrated, with edge-correct neighborhoods), a
  * precision/recall/F1 threshold sweep for the q145 ER pipeline (pick the
  * match threshold from data, not vibes), and Wald's sequential
  * probability-ratio test over daily conversion streams (the
  * early-stopping A/B decision rule).
  *
  * Determinism follows the house contract (QueryDef scaladoc); the SPRT's
  * log-likelihood increments use Scala-rendered shared literals and
  * rounded-term DECIMAL prefix sums; ER scores gate on the 4-decimal
  * rounded grid exactly like q135.
  */
object Extended23 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q204: lattice geometry — the q179 plane bucketed at Radius=25 into
    * a 40×40 grid; neighborhoods are the 3×3 lattice boxes clipped at
    * the border (W_i ∈ {4, 6, 9}).
    */
  private val Cell = 25L
  private val Side = 40L

  /** q205: match thresholds swept on the 4-decimal rounded score grid. */
  private val Thresholds = Seq("0.80", "0.85", "0.90", "0.95")

  /** q206: SPRT hypotheses (daily conversion = share of events with
    * value ≥ 100) and the α = β = 0.05 boundaries ±ln 19. Literals are
    * rendered once in Scala so both engines integrate the same doubles.
    */
  private val P0 = 0.18
  private val P1 = 0.22
  private val L1 = s"${math.log(P1 / P0)}E0" // per-conversion increment
  private val L0 = s"${math.log((1 - P1) / (1 - P0))}E0" // per-non-conversion
  private val Bound = s"${math.log(19.0)}E0"

  val all: Seq[QueryDef] = Seq(

    // ----- q204: spatial hotspot detection (Getis–Ord-style G*) ---------
    // Which grid cells concentrate customers beyond chance? Per-cell
    // counts over the FULL 40×40 lattice (empty cells matter — they
    // carry the null), 3×3 neighborhood sums via a generated offset
    // explode + lattice equi-join (never a distance cross product), and
    // the G*-style z-score with EDGE-CORRECT neighborhood sizes — border
    // cells compare against their true W_i, not a padded 9. All moments
    // are exact integers over the fixed 1600-cell lattice; the z
    // division is the single shared float. Top-10 hotspots rank by an
    // integer-encoded (rounded z, cell) key.
    QueryDef(
      "q204_hotspots",
      (s, dir) => {
        val pts = tbl(s, dir, "customer").select(
          // long BEFORE the multiply: int c_custkey*37 wraps at large SF
          ((col("c_custkey").cast("long") * 37 % 1000) / Cell).cast("long").as("gx"),
          ((col("c_custkey").cast("long") * 91 % 1000) / Cell).cast("long").as("gy"))
          .groupBy(col("gx"), col("gy")).agg(count(lit(1)).as("c"))
        val axis = sequence(lit(0), lit(Side - 1))
        val lattice = s.range(1)
          .select(explode(axis).as("gx"))
          .select(col("gx"), explode(axis).as("gy"))
        val cells = lattice.join(pts, Seq("gx", "gy"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val offs = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
          struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
        val nbr = cells.select(col("gx"), col("gy"), col("c"),
            explode(offs).as("o"))
          .select((col("gx") + col("o.dx")).as("nx"),
            (col("gy") + col("o.dy")).as("ny"), col("c"))
          .filter(col("nx").between(0, Side - 1) && col("ny").between(0, Side - 1))
          .groupBy(col("nx").as("gx"), col("ny").as("gy"))
          .agg(sum(col("c")).as("si"), count(lit(1)).as("w"))
        val g = cells.join(nbr, Seq("gx", "gy"))
          .withColumn("n", sum(lit(1)).over(Window.partitionBy()))
          .withColumn("sc", sum(col("c")).over(Window.partitionBy()))
          .withColumn("sc2", sum(col("c") * col("c")).over(Window.partitionBy()))
          .withColumn("mu", col("sc").cast("double") / col("n").cast("double"))
          .withColumn("sd", sqrt(col("sc2").cast("double") / col("n").cast("double") -
            col("mu") * col("mu")))
          .withColumn("z",
            (col("si").cast("double") - col("w").cast("double") * col("mu")) /
              (col("sd") * sqrt(
                (col("n").cast("double") * col("w").cast("double") -
                  col("w").cast("double") * col("w").cast("double")) /
                  (col("n").cast("double") - 1.0))))
          .withColumn("zr", R(col("z"), 6))
        g.withColumn("enc",
            floor((col("zr") + 100) * 1e6 + 0.5).cast("long") * 10000 -
              (col("gx") * Side + col("gy")))
          .withColumn("rank", row_number().over(Window.orderBy(col("enc").desc)))
          .filter(col("rank") <= 10)
          .select(col("rank").cast("long").as("rank"), col("gx"), col("gy"),
            col("c"), col("si").as("nbr_sum"), col("w"), col("zr").as("z_r"))
          .orderBy("rank")
      },
      Some(s"""WITH pts AS (
              |  SELECT (CAST(c_custkey AS BIGINT)*37 % 1000) // $Cell AS gx,
              |         (CAST(c_custkey AS BIGINT)*91 % 1000) // $Cell AS gy, count(*) AS c
              |  FROM customer GROUP BY 1, 2),
              |lattice AS (
              |  SELECT CAST(x.x AS BIGINT) AS gx, CAST(y.y AS BIGINT) AS gy
              |  FROM range(0, $Side) x(x) CROSS JOIN range(0, $Side) y(y)),
              |cells AS (
              |  SELECT lattice.gx, lattice.gy, coalesce(pts.c, 0) AS c
              |  FROM lattice LEFT JOIN pts
              |    ON pts.gx = lattice.gx AND pts.gy = lattice.gy),
              |nbr AS (
              |  SELECT cells.gx + dx.d AS gx, cells.gy + dy.d AS gy,
              |    CAST(sum(c) AS BIGINT) AS si, count(*) AS w
              |  FROM cells
              |  CROSS JOIN (VALUES (-1), (0), (1)) dx(d)
              |  CROSS JOIN (VALUES (-1), (0), (1)) dy(d)
              |  WHERE cells.gx + dx.d BETWEEN 0 AND ${Side - 1}
              |    AND cells.gy + dy.d BETWEEN 0 AND ${Side - 1}
              |  GROUP BY 1, 2),
              |g AS (
              |  SELECT cells.gx, cells.gy, cells.c, nbr.si, nbr.w,
              |    count(*) OVER () AS n,
              |    CAST(sum(cells.c) OVER () AS BIGINT) AS sc,
              |    CAST(sum(cells.c * cells.c) OVER () AS BIGINT) AS sc2
              |  FROM cells JOIN nbr ON nbr.gx = cells.gx AND nbr.gy = cells.gy),
              |g2 AS (
              |  SELECT *, CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
              |    sqrt(CAST(sc2 AS DOUBLE) / CAST(n AS DOUBLE) -
              |      (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) *
              |      (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))) AS sd
              |  FROM g),
              |g3 AS (
              |  SELECT *, ${rs("(CAST(si AS DOUBLE) - CAST(w AS DOUBLE) * mu) / (sd * sqrt((CAST(n AS DOUBLE) * CAST(w AS DOUBLE) - CAST(w AS DOUBLE) * CAST(w AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)))", 6)} AS zr
              |  FROM g2),
              |g4 AS (
              |  SELECT *, CAST(floor((zr + 100) * 1e6 + 0.5) AS BIGINT) * 10000
              |    - (gx * $Side + gy) AS enc
              |  FROM g3),
              |rk AS (
              |  SELECT *, row_number() OVER (ORDER BY enc DESC) AS rank FROM g4)
              |SELECT CAST(rank AS BIGINT) AS rank, gx, gy, c,
              |  si AS nbr_sum, w, zr AS z_r
              |FROM rk WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // ----- q205: ER precision/recall/F1 threshold sweep -----------------
    // Pick q145's match threshold FROM DATA: corrupted variants (vowels
    // stripped, every 5th doc) matched back to canon via consonant-
    // skeleton blocking, scored with the native codegen jaro_winkler
    // (DuckDB-bit-exact kernel, q135), then swept over four thresholds
    // on the 4-decimal ROUNDED score grid (both engines gate on the same
    // grid point). Ground truth is the doc_id itself, so TP/FP/FN are
    // exact integer counts; FN includes truth pairs LOST BY BLOCKING —
    // the honest recall (a sweep that only scores retrieved candidates
    // overstates recall). One blocked equi-join, never all-pairs.
    QueryDef(
      "q205_er_prf",
      (s, dir) => {
        graft.functions.StringExpressions.register(s)
        val docs = tbl(s, dir, "documents")
          .select(col("doc_id"), Text.normalize(col("text")).as("nm"))
        val canon = docs
          .withColumn("blk", substring(regexp_replace(col("nm"), "[aeiou ]", ""), 1, 6))
          .select(col("doc_id").as("cid"), col("nm").as("cnm"), col("blk"))
        val variants = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("vid"),
            regexp_replace(col("nm"), "[aeiou]", "").as("vnm"))
          .withColumn("blk", substring(regexp_replace(col("vnm"), " ", ""), 1, 6))
        val nv = variants.agg(count(lit(1)).as("n_var"))
        val scored = variants.join(canon, Seq("blk"))
          .withColumn("score_r",
            R(graft.functions.StringExpressions.jaroWinkler(col("vnm"), col("cnm")), 4))
        // conditional aggregation (no pre-filter) keeps EVERY threshold row
        // — a cut with zero matches reports n_match = 0, not a vanished row
        val sweep = scored
          .withColumn("th", explode(array(Thresholds.map(t => lit(t).cast("double")): _*)))
          .groupBy(col("th"))
          .agg(sum(when(col("score_r") >= col("th"), 1L).otherwise(0L)).as("n_match"),
            sum(when(col("score_r") >= col("th") && col("vid") === col("cid"), 1L)
              .otherwise(0L)).as("tp"))
        sweep.crossJoin(broadcast(nv))
          .withColumn("fp", col("n_match") - col("tp"))
          .withColumn("fn", col("n_var") - col("tp"))
          .select(format_string("%.2f", col("th")).as("threshold"),
            col("n_match"), col("tp"), col("fp"), col("fn"),
            R(col("tp").cast("double") /
              when(col("n_match") === 0, lit(null)).otherwise(col("n_match"))
                .cast("double"), 6).as("precision_r"),
            R(col("tp").cast("double") / col("n_var").cast("double"), 6)
              .as("recall_r"),
            R(lit(2.0) * col("tp").cast("double") /
              (col("n_match") + col("n_var")).cast("double"), 6).as("f1_r"))
          .orderBy("threshold")
      },
      Some {
        val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
        s"""WITH docs AS (
           |  SELECT doc_id, $norm AS nm FROM documents),
           |canon AS (
           |  SELECT doc_id AS cid, nm AS cnm,
           |    substr(regexp_replace(nm, '[aeiou ]', '', 'g'), 1, 6) AS blk
           |  FROM docs),
           |variants AS (
           |  SELECT doc_id AS vid,
           |    regexp_replace(nm, '[aeiou]', '', 'g') AS vnm
           |  FROM docs WHERE doc_id % 5 = 0),
           |v2 AS (
           |  SELECT *, substr(replace(vnm, ' ', ''), 1, 6) AS blk FROM variants),
           |nv AS (SELECT count(*) AS n_var FROM variants),
           |scored AS (
           |  SELECT vid, cid,
           |    ${rs("jaro_winkler_similarity(vnm, cnm)", 4)} AS score_r
           |  FROM v2 JOIN canon USING (blk)),
           |sweep AS (
           |  SELECT CAST(t.t AS DOUBLE) AS th,
           |    CAST(sum(CASE WHEN score_r >= CAST(t.t AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           |    CAST(sum(CASE WHEN score_r >= CAST(t.t AS DOUBLE) AND vid = cid THEN 1 ELSE 0 END) AS BIGINT) AS tp
           |  FROM scored CROSS JOIN (VALUES ${Thresholds.map(t => s"($t)").mkString(", ")}) t(t)
           |  GROUP BY 1)
           |SELECT printf('%.2f', th) AS threshold, n_match, tp,
           |  CAST(n_match - tp AS BIGINT) AS fp,
           |  CAST(n_var - tp AS BIGINT) AS fn,
           |  ${rs("CAST(tp AS DOUBLE) / CAST(nullif(n_match, 0) AS DOUBLE)", 6)} AS precision_r,
           |  ${rs("CAST(tp AS DOUBLE) / CAST(n_var AS DOUBLE)", 6)} AS recall_r,
           |  ${rs("2E0 * CAST(tp AS DOUBLE) / CAST(n_match + n_var AS DOUBLE)", 6)} AS f1_r
           |FROM sweep CROSS JOIN nv ORDER BY threshold""".stripMargin
      }),

    // ----- q206: Wald SPRT over a daily conversion stream ---------------
    // Sequential A/B decision per event type: does the share of
    // high-value events (value ≥ 100) run at p1 = 0.22 rather than
    // p0 = 0.18? Wald's SPRT integrates the log-likelihood ratio DAY BY
    // DAY and stops at ±ln 19 (α = β = 0.05) — the early-stopping rule
    // that ends experiments as soon as the evidence is in. Exactness:
    // daily (conversions, totals) are integers; each day's LLR increment
    // is x·L1 + (n−x)·L0 with Scala-rendered shared literals, rounded to
    // 12 decimals and accumulated as DECIMAL (order-fixed prefix);
    // boundary crossings compare exact DECIMALs against shared literals.
    // Windows run over the calendar-bounded daily relation only.
    QueryDef(
      "q206_sprt",
      (s, dir) => {
        val dec = DecimalType(24, 12)
        val daily = tbl(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            sum((col("value") >= 100).cast("long")).as("x"))
          .withColumn("inc",
            R(col("x").cast("double") * expr(L1) +
              (col("n") - col("x")).cast("double") * expr(L0), 12).cast(dec))
        val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val walked = daily
          .withColumn("llr", sum(col("inc")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cross",
            when(col("llr").cast("double") >= expr(Bound), lit("accept_h1"))
              .when(col("llr").cast("double") <= -expr(Bound), lit("accept_h0")))
          .withColumn("hit",
            when(col("cross").isNotNull,
              concat(date_format(col("day"), "yyyy-MM-dd"), lit("|"), col("cross"))))
        walked.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("x")).as("conversions"),
            sum(col("n")).as("events"),
            R(max(col("llr")).cast("double"), 6).as("llr_max_r"),
            R(min(col("llr")).cast("double"), 6).as("llr_min_r"),
            min(col("hit")).as("first_hit"))
          .select(col("event_type"), col("n_days"), col("conversions"),
            col("events"),
            col("llr_max_r"), col("llr_min_r"),
            coalesce(substring_index(col("first_hit"), "|", -1), lit("continue"))
              .as("decision"),
            substring_index(col("first_hit"), "|", 1).as("decision_day"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
              |    CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS x
              |  FROM events GROUP BY 1, 2),
              |inc AS (
              |  SELECT *, CAST(${rs(s"CAST(x AS DOUBLE) * $L1 + CAST(n - x AS DOUBLE) * $L0", 12)}
              |    AS DECIMAL(24,12)) AS inc
              |  FROM daily),
              |walked AS (
              |  SELECT *, sum(inc) OVER (PARTITION BY event_type ORDER BY day
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
              |  FROM inc),
              |flagged AS (
              |  SELECT *, CASE
              |    WHEN CAST(llr AS DOUBLE) >= $Bound THEN 'accept_h1'
              |    WHEN CAST(llr AS DOUBLE) <= -$Bound THEN 'accept_h0' END AS cross_
              |  FROM walked),
              |h AS (
              |  SELECT *, CASE WHEN cross_ IS NOT NULL
              |    THEN strftime(day, '%Y-%m-%d') || '|' || cross_ END AS hit
              |  FROM flagged)
              |SELECT event_type, count(*) AS n_days,
              |  CAST(sum(x) AS BIGINT) AS conversions,
              |  CAST(sum(n) AS BIGINT) AS events,
              |  ${rs("CAST(max(llr) AS DOUBLE)", 6)} AS llr_max_r,
              |  ${rs("CAST(min(llr) AS DOUBLE)", 6)} AS llr_min_r,
              |  coalesce(split_part(min(hit), '|', 2), 'continue') AS decision,
              |  split_part(min(hit), '|', 1) AS decision_day
              |FROM h GROUP BY 1 ORDER BY event_type""".stripMargin))
  )
}
