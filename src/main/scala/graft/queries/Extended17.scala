package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-8 first batch: five warehouse/pipeline shapes the first 178
  * queries do not cover — a grid-bucketed spatial radius join (the
  * geo-join template: no all-pairs at any scale), cumulative-deviation
  * drift detection over a daily series (CUSUM-style change monitoring),
  * an inverted-index posting-list build (the search/retrieval side of the
  * text stack), per-user event-path mining (the "top user journeys"
  * product-analytics query), and a Welch two-sample t-test from exact
  * moment sums (the A/B-readout shape, parametric sibling of q132's KS).
  *
  * Determinism follows the house contract (QueryDef scaladoc): total
  * ORDER BY, identical aliases both sides, `Num.roundTo`/`roundSql` for
  * floats, exact integer/DECIMAL accumulation wherever a sum's order is
  * not fixed by the plan, and argmin/argmax via order-encoded min/max
  * rather than engine-specific `min_by`.
  */
object Extended17 {

  import TextQueries.wsSql

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q179 geometry: both entity families are placed deterministically on a
    * 1000×1000 integer plane from their keys (multiplier-mod hashing —
    * same trick as the fixtures' own synthesis, chosen so sf0.001 already
    * yields matches). Radius and cell size are EQUAL, so any pair within
    * the radius differs by at most one cell per axis and the 3×3
    * neighborhood probe is exhaustive: |Δx| ≤ 25 ⇒ |Δx div 25| ≤ 1.
    */
  private val Radius = 25L
  private val R2 = Radius * Radius // 625
  /** argmin encoding d2·1e7 + suppkey: d2 ≤ 625 and the fixtures keep
    * suppkey < 1e7, so the packed BIGINT is collision-free and its min is
    * the lexicographic (d2, suppkey) argmin on both engines.
    */
  private val EncP = 10000000L

  /** q181: postings are capped at the 50 lowest doc_ids per token (df
    * still counts all) and the report at the 200 highest-df tokens, so
    * output stays bounded at any corpus size.
    */
  private val PostCap = 50
  private val TokCap = 200

  /** q182: path prefix length — the first 5 events define a user's
    * journey signature.
    */
  private val PathLen = 5

  /** q183: two-sided normal critical value at α=0.05 — inlined verbatim
    * into both engines so the significance flag is bit-identical.
    */
  private val ZCrit = "1.96"

  val all: Seq[QueryDef] = Seq(

    // ----- q179: grid-bucketed spatial radius join ----------------------
    // "Which suppliers are within radius r of each customer" — the
    // geospatial radius join. The scale-shaped design: each point maps to
    // a Radius-sized grid cell; the customer side explodes to its 3×3
    // cell neighborhood (map-side, 9×) and joins suppliers on cell
    // EQUALITY — a plain shuffled equi-join keyed on cell, never an
    // all-pairs cross product. Cell size = radius makes the neighborhood
    // probe provably exhaustive (see Radius scaladoc). Distances are
    // exact BIGINT squared-Euclidean (no float compare), the nearest
    // supplier is an order-encoded packed argmin, and the oracle is an
    // INDEPENDENT brute-force cross join — the strongest possible check
    // of the bucketing logic (a dropped boundary pair would hash-fail).
    QueryDef(
      "q179_spatial_join",
      (s, dir) => {
        val cust = tbl(s, dir, "customer").select(
          col("c_custkey").as("cid"),
          // widen BEFORE the multiply: 32-bit c_custkey*37 wraps silently in
          // Spark at large SF while DuckDB promotes — a scale-dependent split
          (col("c_custkey").cast("long") * 37 % 1000).as("cx"),
          (col("c_custkey").cast("long") * 91 % 1000).as("cy"))
        val supp = tbl(s, dir, "supplier").select(
          col("s_suppkey").cast("long").as("sid"),
          (col("s_suppkey").cast("long") * 53 % 1000).as("sx"),
          (col("s_suppkey").cast("long") * 17 % 1000).as("sy"))
          .withColumn("cell",
            (floor(col("sx") / Radius) * 100 + floor(col("sy") / Radius))
              .cast("long"))
        val nbrs = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
          ((floor(col("cx") / Radius) + dx) * 100 +
            (floor(col("cy") / Radius) + dy)).cast("long")): _*)
        val cand = cust.select(col("cid"), col("cx"), col("cy"),
            explode(nbrs).as("cell"))
          .join(supp, "cell")
        val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
          (col("cy") - col("sy")) * (col("cy") - col("sy"))
        cand.filter(d2 <= R2)
          .groupBy(col("cid"))
          .agg(count(lit(1)).as("n_near"),
            min(d2 * EncP + col("sid")).as("enc"))
          .select(col("cid"), col("n_near"),
            (col("enc") / EncP).cast("long").as("min_d2"),
            pmod(col("enc"), lit(EncP)).cast("long").as("nearest_sid"))
          .withColumn("dist_r", R(sqrt(col("min_d2").cast("double")), 4))
          .orderBy("cid")
      },
      Some(s"""WITH c AS (
              |  SELECT c_custkey AS cid,
              |         CAST(c_custkey AS BIGINT)*37 % 1000 AS cx,
              |         CAST(c_custkey AS BIGINT)*91 % 1000 AS cy FROM customer),
              |s AS (
              |  SELECT CAST(s_suppkey AS BIGINT) AS sid,
              |         CAST(s_suppkey AS BIGINT)*53 % 1000 AS sx,
              |         CAST(s_suppkey AS BIGINT)*17 % 1000 AS sy FROM supplier),
              |p AS (
              |  SELECT cid, sid,
              |         (cx-sx)*(cx-sx) + (cy-sy)*(cy-sy) AS d2
              |  FROM c CROSS JOIN s
              |  WHERE (cx-sx)*(cx-sx) + (cy-sy)*(cy-sy) <= $R2),
              |g AS (
              |  SELECT cid, count(*) AS n_near,
              |         min(d2*$EncP + sid) AS enc
              |  FROM p GROUP BY 1)
              |SELECT cid, n_near,
              |  CAST(enc // $EncP AS BIGINT) AS min_d2,
              |  CAST(enc % $EncP AS BIGINT) AS nearest_sid,
              |  ${rs(s"sqrt(CAST(enc // $EncP AS DOUBLE))", 4)} AS dist_r
              |FROM g ORDER BY cid""".stripMargin)),

    // ----- q180: cumulative-deviation drift detection (CUSUM shape) -----
    // Change monitoring over each event type's daily value series: the
    // cumulative deviation of the prefix from the series' own overall
    // rate. The exactness trick: instead of S_i = Σ(x_j − μ) with a float
    // mean, multiply through by n — D_i = n·P_i − i·T (prefix sum P,
    // total T, both exact BIGINT in 1e-4 value units) — so every
    // comparison, the argmax day, and the exceed count are pure integer
    // arithmetic; the single float division happens once for display.
    // Shape: one daily pre-aggregation (rounded-term DECIMAL, order-free),
    // then windows over the CALENDAR-bounded per-type daily relation
    // (≤ ~10⁴ rows per type at any data scale) — the heavy shuffle is the
    // first hash agg, which partial aggregation absorbs map-side.
    QueryDef(
      "q180_cusum_drift",
      (s, dir) => {
        val daily = tbl(s, dir, "events")
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg((sum(R(col("value"), 4).cast(DecimalType(18, 4))) * 10000)
            .cast("long").as("units"))
        val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
        val wAll = Window.partitionBy(col("event_type"))
        val dev = daily
          .withColumn("i", row_number().over(wOrd))
          .withColumn("p", sum(col("units")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("t", sum(col("units")).over(wAll))
          .withColumn("d", abs(col("n") * col("p") - col("i") * col("t")))
        dev
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            max(col("d")).as("maxd"),
            max(col("n")).as("n"),
            sum(when(col("d") * 10 > col("n") * abs(col("t")), 1L)
              .otherwise(0L)).as("n_exceed"),
            max(concat(format_string("%020d", col("d")), lit("|"),
              col("day"))).as("peak"))
          .select(col("event_type"), col("n_days"),
            R(col("maxd").cast("double") /
              (col("n").cast("double") * 10000.0), 4).as("max_dev_r"),
            substring_index(col("peak"), "|", -1).as("peak_day"),
            col("n_exceed"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
              |    CAST(sum(CAST(${rs("value", 4)} AS DECIMAL(18,4))) * 10000 AS BIGINT) AS units
              |  FROM events GROUP BY 1, 2),
              |dev AS (
              |  SELECT event_type, day,
              |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
              |    sum(units) OVER (PARTITION BY event_type ORDER BY day
              |      ROWS UNBOUNDED PRECEDING) AS p,
              |    count(*) OVER (PARTITION BY event_type) AS n,
              |    sum(units) OVER (PARTITION BY event_type) AS t
              |  FROM daily),
              |d2 AS (SELECT *, CAST(abs(n*p - i*t) AS BIGINT) AS d FROM dev)
              |SELECT event_type, count(*) AS n_days,
              |  ${rs("CAST(max(d) AS DOUBLE) / (CAST(max(n) AS DOUBLE) * 10000.0)", 4)} AS max_dev_r,
              |  split_part(max(printf('%020d', d) || '|' || day), '|', 2) AS peak_day,
              |  CAST(sum(CASE WHEN d*10 > n*abs(t) THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed
              |FROM d2 GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ----- q181: inverted-index posting lists ---------------------------
    // The retrieval-side build the text battery lacks: token → document
    // posting lists with term frequencies, document frequency, and
    // collection frequency. Scale shape: tokenize map-side (codegen'd
    // split, no UDF), ONE hash agg to (token, doc) for tf, a per-token
    // window for posting rank, one hash agg to token. Postings are capped
    // at the PostCap lowest doc_ids (df still counts everything) and the
    // report at the TokCap highest-df tokens, so the result — and the
    // single-partition vocabulary window that ranks it — is bounded by
    // VOCABULARY size, not corpus size, at any scale. Zero-padded
    // "doc:tf" entries make lexicographic order = numeric order, so
    // array_sort+join and DuckDB's ordered string_agg agree exactly.
    QueryDef(
      "q181_inverted_index",
      (s, dir) => {
        val tf = tbl(s, dir, "documents")
          .select(col("doc_id"), explode(Text.tokensNorm(col("text"))).as("tok"))
          .filter(length(col("tok")) > 0)
          .groupBy(col("tok"), col("doc_id"))
          .agg(count(lit(1)).as("tf"))
        val rn = row_number().over(
          Window.partitionBy(col("tok")).orderBy(col("doc_id")))
        val g = tf.withColumn("rn", rn)
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("df"),
            sum(col("tf")).as("tf_total"),
            array_join(array_sort(collect_list(when(col("rn") <= PostCap,
              format_string("%012d:%d", col("doc_id"), col("tf"))))),
              ",").as("postings"))
          .filter(col("df") >= 10)
        g.withColumn("rnk", row_number().over(
            Window.orderBy(col("df").desc, col("tok"))))
          .filter(col("rnk") <= TokCap)
          .select(col("tok"), col("df"), col("tf_total"),
            least(col("df"), lit(PostCap.toLong)).as("n_postings"),
            col("postings"))
          .orderBy("tok")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, unnest($wsSql) AS tok FROM documents),
              |tf AS (
              |  SELECT tok, doc_id, count(*) AS tf FROM t
              |  WHERE length(tok) > 0 GROUP BY 1, 2),
              |r AS (
              |  SELECT *, row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
              |  FROM tf),
              |g AS (
              |  SELECT tok, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
              |    string_agg(CASE WHEN rn <= $PostCap
              |      THEN printf('%012d:%d', doc_id, tf) END, ',' ORDER BY doc_id)
              |      AS postings
              |  FROM r GROUP BY 1 HAVING count(*) >= 10),
              |k AS (
              |  SELECT *, row_number() OVER (ORDER BY df DESC, tok) AS rnk FROM g)
              |SELECT tok, df, tf_total,
              |  CAST(least(df, $PostCap) AS BIGINT) AS n_postings, postings
              |FROM k WHERE rnk <= $TokCap ORDER BY tok""".stripMargin)),

    // ----- q182: event-path mining (top user journeys) ------------------
    // Each user's journey signature — the ordered types of their first
    // PathLen events — grouped into path counts with the cohort's average
    // early engagement value: the "what do users do first, and which
    // openings monetize" product query. Deterministic ordering: events
    // rank on (ts, event_id); the path string is rebuilt from an
    // array_sort over (rank, type) structs so collect_list's
    // non-determinism never reaches the output; value sums are
    // rounded-term DECIMAL. Shape: one user-partitioned rank window, two
    // hash aggs (user → path); no joins; the path space is bounded by
    // |types|^PathLen regardless of data volume.
    QueryDef(
      "q182_event_paths",
      (s, dir) => {
        val rn = row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
        val perUser = tbl(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value"))
          .withColumn("rn", rn)
          .filter(col("rn") <= PathLen)
          .groupBy(col("user_id"))
          .agg(
            array_join(transform(
              array_sort(collect_list(struct(col("rn"), col("event_type")))),
              x => x.getField("event_type")), ">").as("path"),
            count(lit(1)).as("path_len"),
            sum(R(col("value"), 4).cast(DecimalType(18, 4))).as("v"))
        perUser.groupBy(col("path"), col("path_len"))
          .agg(count(lit(1)).as("n_users"), sum(col("v")).as("tv"))
          .select(col("path"), col("path_len"), col("n_users"),
            R(col("tv").cast("double") / col("n_users").cast("double"), 4)
              .as("avg_user_value_r"))
          .orderBy(col("n_users").desc, col("path"))
      },
      Some(s"""WITH r AS (
              |  SELECT user_id, event_type, value,
              |    row_number() OVER (PARTITION BY user_id
              |      ORDER BY ts, event_id) AS rn
              |  FROM events),
              |u AS (
              |  SELECT user_id,
              |    string_agg(event_type, '>' ORDER BY rn) AS path,
              |    count(*) AS path_len,
              |    sum(CAST(${rs("value", 4)} AS DECIMAL(18,4))) AS v
              |  FROM r WHERE rn <= $PathLen GROUP BY 1)
              |SELECT path, path_len, count(*) AS n_users,
              |  ${rs("CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS avg_user_value_r
              |FROM u GROUP BY 1, 2
              |ORDER BY n_users DESC, path""".stripMargin)),

    // ----- q183: Welch two-sample t-test from exact moments -------------
    // The A/B readout: for each event type, is its mean value
    // significantly different from the rest of the traffic? Welch's
    // unequal-variance t with the Welch–Satterthwaite df — the parametric
    // sibling of q132's KS test. Exactness: per-type n/Σv/Σv² are
    // rounded-term DECIMAL sums (order-free); the complement group's
    // moments come by SUBTRACTION from the grand totals (computed as an
    // unpartitioned window over the |types|-sized aggregate — no second
    // scan), so the whole test needs ONE pass over events; every float op
    // downstream is the same parenthesized IEEE expression on both
    // engines. The significance flag compares |t| to an inlined ZCrit so
    // the boolean is bit-stable.
    QueryDef(
      "q183_welch_ttest",
      (s, dir) => {
        val v4 = R(col("value"), 4).cast(DecimalType(18, 4))
        val perType = tbl(s, dir, "events")
          .select(col("event_type"), v4.as("v"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n1"), sum(col("v")).as("s1"),
            sum(col("v") * col("v")).as("q1"))
        val wAll = Window.partitionBy()
        val m = perType
          .withColumn("nn", sum(col("n1")).over(wAll))
          .withColumn("ss", sum(col("s1")).over(wAll))
          .withColumn("qq", sum(col("q1")).over(wAll))
          .withColumn("n2", col("nn") - col("n1"))
          .withColumn("s1d", col("s1").cast("double"))
          .withColumn("q1d", col("q1").cast("double"))
          .withColumn("s2d", (col("ss") - col("s1")).cast("double"))
          .withColumn("q2d", (col("qq") - col("q1")).cast("double"))
          .withColumn("m1", col("s1d") / col("n1"))
          .withColumn("m2", col("s2d") / col("n2"))
          .withColumn("v1",
            (col("q1d") - col("s1d") * col("s1d") / col("n1")) / (col("n1") - 1))
          .withColumn("v2",
            (col("q2d") - col("s2d") * col("s2d") / col("n2")) / (col("n2") - 1))
          .withColumn("se1", col("v1") / col("n1"))
          .withColumn("se2", col("v2") / col("n2"))
          .withColumn("t",
            (col("m1") - col("m2")) / sqrt(col("se1") + col("se2")))
          .withColumn("df",
            (col("se1") + col("se2")) * (col("se1") + col("se2")) /
              (col("se1") * col("se1") / (col("n1") - 1) +
                col("se2") * col("se2") / (col("n2") - 1)))
        m.select(col("event_type"), col("n1"), col("n2"),
            R(col("m1"), 4).as("mean_r"),
            R(col("m2"), 4).as("mean_rest_r"),
            R(col("t"), 4).as("t_r"),
            R(col("df"), 2).as("df_r"),
            (abs(col("t")) > expr(ZCrit)).as("signif"))
          .orderBy("event_type")
      },
      Some(s"""WITH g AS (
              |  SELECT event_type, count(*) AS n1,
              |    sum(CAST(${rs("value", 4)} AS DECIMAL(18,4))) AS s1,
              |    sum(CAST(${rs("value", 4)} AS DECIMAL(18,4)) *
              |        CAST(${rs("value", 4)} AS DECIMAL(18,4))) AS q1
              |  FROM events GROUP BY 1),
              |w AS (
              |  SELECT *, sum(n1) OVER () AS nn, sum(s1) OVER () AS ss,
              |         sum(q1) OVER () AS qq FROM g),
              |m AS (
              |  SELECT event_type, n1, CAST(nn - n1 AS BIGINT) AS n2,
              |    CAST(s1 AS DOUBLE) AS s1d, CAST(q1 AS DOUBLE) AS q1d,
              |    CAST(ss - s1 AS DOUBLE) AS s2d, CAST(qq - q1 AS DOUBLE) AS q2d
              |  FROM w),
              |m2 AS (
              |  SELECT *, s1d / n1 AS m1, s2d / n2 AS m2,
              |    (q1d - s1d * s1d / n1) / (n1 - 1) AS v1,
              |    (q2d - s2d * s2d / n2) / (n2 - 1) AS v2
              |  FROM m),
              |m3 AS (
              |  SELECT *, v1 / n1 AS se1, v2 / n2 AS se2 FROM m2),
              |m4 AS (
              |  SELECT *, (m1 - m2) / sqrt(se1 + se2) AS t,
              |    (se1 + se2) * (se1 + se2) /
              |      (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)) AS df
              |  FROM m3)
              |SELECT event_type, n1, n2,
              |  ${rs("m1", 4)} AS mean_r, ${rs("m2", 4)} AS mean_rest_r,
              |  ${rs("t", 4)} AS t_r, ${rs("df", 2)} AS df_r,
              |  abs(t) > $ZCrit AS signif
              |FROM m4 ORDER BY event_type""".stripMargin))
  )
}
