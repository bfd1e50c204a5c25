package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-7 third batch: market-basket co-occurrence (frequent 2-itemsets
  * with lift), Pareto-frontier/skyline extraction, seasonal-trend-residual
  * decomposition of a time series, Markov transition matrices over event
  * streams, and interval consolidation (merge overlapping spans). Each is
  * a classic analytics/feature-engineering shape absent from q01–q163.
  *
  * Determinism follows the house contract: integer accumulation wherever
  * possible, `Num.roundTo`/`roundSql` at every float step, rounded-term
  * DECIMAL sums where an aggregate's order is not plan-fixed, total ORDER
  * BY over output keys, identical aliases both sides.
  */
object Extended13 {

  /** Minimum pair support for q164 — shared by plan and oracle. A-priori
    * pruning (single-brand support ≥ MinSup before the pair join) is
    * applied on the Spark side; it cannot change the result because
    * pair-support ≥ MinSup implies both item supports ≥ MinSup.
    */
  private val MinSup = 5

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // ----- q164: frequent brand pairs (2-itemsets, support + lift) -------
    // Market-basket association mining at the 2-itemset level: baskets are
    // orders, items are distinct part brands per order. Shape at scale:
    // one distinct (order,brand) projection, an a-priori semi-join that
    // drops infrequent brands BEFORE the pair blow-up, then a self-join
    // keyed on the order — per-basket cost is quadratic in DISTINCT BRANDS
    // PER ORDER (bounded by the brand vocabulary, not by basket row
    // count), and the frequent-brand prune is exactly how a-priori keeps
    // the candidate space linear on 100 TB of baskets. Counts stay
    // integers end-to-end; support and lift divide once at the end.
    QueryDef(
      "q164_brand_pairs",
      (s, dir) => {
        // Ckpt: the basket relation feeds four consumers (totals, supports,
        // both self-join sides) — materialize it once instead of scanning
        // and joining lineitem×part four times (4× the base read at scale)
        val b = tbl(s, dir, "lineitem").select(col("l_orderkey").as("okey"), col("l_partkey"))
          .join(tbl(s, dir, "part").select(col("p_partkey"), col("p_brand").as("brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("okey"), col("brand")).distinct()
          .transform(graft.ops.Ckpt.apply)
        val tot = b.select(countDistinct(col("okey")).as("n_orders"))
        val sup = b.groupBy(col("brand")).agg(count(lit(1)).as("cnt"))
        val freq = sup.filter(col("cnt") >= MinSup)
        val bf = b.join(freq.select(col("brand")), Seq("brand"), "left_semi")
        val pairs = bf.as("x")
          .join(bf.as("y"),
            col("x.okey") === col("y.okey") && col("x.brand") < col("y.brand"))
          .groupBy(col("x.brand").as("brand_a"), col("y.brand").as("brand_b"))
          .agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= MinSup)
        pairs
          .join(broadcast(sup.select(col("brand").as("brand_a"), col("cnt").as("ca"))), "brand_a")
          .join(broadcast(sup.select(col("brand").as("brand_b"), col("cnt").as("cb"))), "brand_b")
          .crossJoin(broadcast(tot))
          .select(col("brand_a"), col("brand_b"), col("cab"), col("ca"), col("cb"),
            R(col("cab").cast("double") / col("n_orders").cast("double"), 6).as("support_r"),
            R(col("cab").cast("double") * col("n_orders").cast("double") /
              (col("ca").cast("double") * col("cb").cast("double")), 6).as("lift_r"))
          .orderBy("brand_a", "brand_b")
      },
      Some(s"""WITH b AS MATERIALIZED (
              |  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
              |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
              |tot AS (SELECT count(DISTINCT okey) AS n_orders FROM b),
              |sup AS (SELECT brand, count(*) AS cnt FROM b GROUP BY 1),
              |pairs AS (SELECT x.brand AS brand_a, y.brand AS brand_b, count(*) AS cab
              |          FROM b x JOIN b y ON x.okey = y.okey AND x.brand < y.brand
              |          GROUP BY 1, 2 HAVING count(*) >= $MinSup)
              |SELECT p.brand_a, p.brand_b, p.cab, sa.cnt AS ca, sb.cnt AS cb,
              |  ${rs("CAST(p.cab AS DOUBLE) / CAST(tot.n_orders AS DOUBLE)", 6)} AS support_r,
              |  ${rs("CAST(p.cab AS DOUBLE) * CAST(tot.n_orders AS DOUBLE) / (CAST(sa.cnt AS DOUBLE) * CAST(sb.cnt AS DOUBLE))", 6)} AS lift_r
              |FROM pairs p
              |JOIN sup sa ON sa.brand = p.brand_a
              |JOIN sup sb ON sb.brand = p.brand_b
              |CROSS JOIN tot
              |ORDER BY brand_a, brand_b""".stripMargin)),

    // ----- q165: skyline / Pareto frontier (min price, max size) ---------
    // A part is on the frontier iff no other part is both no-more-expensive
    // and no-smaller with at least one strict improvement. The naive
    // definition is an O(n²) dominance self-join; this plan is the
    // sort-based O(n log n) form: collapse to per-price max-size (one hash
    // agg), take the running max over strictly-cheaper price groups (one
    // window, lag-free via ROWS ... 1 PRECEDING), and keep rows that beat
    // the running max and equal their own price-group max. The window
    // orders the per-price relation — |distinct prices| rows, not |parts|
    // — and at 100 TB the same two-pass shape holds (range-partition the
    // price axis, prefix-max per partition, one 1-row-per-partition
    // prefix exchange). The oracle is the structurally different NOT
    // EXISTS dominance test (DuckDB IEJoin), so plan bugs can't hide.
    QueryDef(
      "q165_skyline",
      (s, dir) => {
        val p = tbl(s, dir, "part")
          .select(col("p_partkey"), col("p_retailprice").as("price"), col("p_size").as("size"))
        val g = p.groupBy(col("price")).agg(max(col("size")).as("gmax"))
        val w = Window.orderBy(col("price")).rowsBetween(Window.unboundedPreceding, -1)
        val gg = g.withColumn("runmax", max(col("gmax")).over(w))
        p.join(gg, "price")
          .filter(col("size") === col("gmax") &&
            (col("runmax").isNull || col("runmax") < col("size")))
          .select(col("p_partkey"), col("price"), col("size"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p.p_partkey, p.p_retailprice AS price, p.p_size AS size
             |FROM part p
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM part q
             |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
             |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
             |ORDER BY p_partkey""".stripMargin)),

    // ----- q166: seasonal-trend-residual decomposition -------------------
    // Classical additive decomposition of the hourly event-value series:
    // trend = centered 25-hour moving (weighted) mean, seasonal = mean of
    // the detrended series per hour-of-day, residual = remainder. One
    // hash agg to hourly grain, then TWO windows — the trend's ordered
    // frame and the seasonal profile as an hour-of-day-partitioned
    // whole-partition mean. The window form (vs groupBy+join-back) keeps
    // the query single-pass: a join-back would recompute the events scan
    // and hourly agg for the profile branch, doubling the 100 TB read.
    // Both windows order/partition the HOURLY relation — |hours| rows,
    // ~9k/year at any raw scale; only the first agg touches the 100 TB.
    // Sums accumulate as DECIMAL of rounded terms (order-free); every
    // division is rounded identically both sides; `det` is a difference
    // of two identically-rounded doubles.
    QueryDef(
      "q166_seasonal_decomp",
      (s, dir) => {
        val dec4 = DecimalType(18, 4)
        val hourly = tbl(s, dir, "events")
          .select(date_trunc("hour", col("ts")).as("hb"), col("value"))
          .groupBy(col("hb")).agg(
            count(col("value")).as("n"),
            sum(R(col("value"), 4).cast(dec4)).as("vs"))
        val w = Window.orderBy(col("hb")).rowsBetween(-12, 12)
        val sw = Window.partitionBy(hour(col("hb")))
        hourly
          .withColumn("tnum", sum(col("vs")).over(w))
          .withColumn("tden", sum(col("n")).over(w))
          .withColumn("v_r", R(col("vs").cast("double") / col("n").cast("double"), 6))
          .withColumn("trend_r", R(col("tnum").cast("double") / col("tden").cast("double"), 6))
          .withColumn("det", R(col("v_r") - col("trend_r"), 6))
          .withColumn("seasonal_r",
            R(sum(col("det").cast(DecimalType(24, 12))).over(sw).cast("double") /
              count(col("det")).over(sw).cast("double"), 6))
          .select(
            date_format(col("hb"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
            col("n"), col("v_r"), col("trend_r"), col("seasonal_r"),
            R(col("det") - col("seasonal_r"), 6).as("resid_r"))
          .orderBy("hour_s")
      },
      Some(s"""WITH h AS (
              |  SELECT date_trunc('hour', ts) AS hb, count(value) AS n,
              |         sum(CAST(${rs("value", 4)} AS DECIMAL(18,4))) AS vs
              |  FROM events GROUP BY 1),
              |t AS (
              |  SELECT hb, n, vs,
              |         sum(vs) OVER wf AS tnum, sum(n) OVER wf AS tden
              |  FROM h
              |  WINDOW wf AS (ORDER BY hb ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
              |d AS (
              |  SELECT hb, n,
              |         ${rs("CAST(vs AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS v_r,
              |         ${rs("CAST(tnum AS DOUBLE) / CAST(tden AS DOUBLE)", 6)} AS trend_r
              |  FROM t),
              |d2 AS (SELECT *, ${rs("v_r - trend_r", 6)} AS det FROM d),
              |s AS (
              |  SELECT *,
              |         ${rs("CAST(sum(CAST(det AS DECIMAL(24,12))) OVER sw AS DOUBLE) / CAST(count(det) OVER sw AS DOUBLE)", 6)} AS seasonal_r
              |  FROM d2
              |  WINDOW sw AS (PARTITION BY hour(hb)))
              |SELECT strftime(hb, '%Y-%m-%d %H:%M:%S') AS hour_s, n, v_r,
              |  trend_r, seasonal_r, ${rs("det - seasonal_r", 6)} AS resid_r
              |FROM s
              |ORDER BY hour_s""".stripMargin)),

    // ----- q167: Markov transition matrix over event streams -------------
    // P(next event type | current) per adjacent pair in each user's
    // event sequence, Laplace-smoothed (+1 / +|V|). One window (lag over
    // the user shuffle), two hash aggs on the tiny (prev,cur) key space,
    // scalar vocabulary count broadcast. Counts are exact integers; the
    // smoothed probability divides once. The canonical session-behavior
    // feature (next-action prediction priors, anomaly scoring) at any
    // scale: shuffle-by-user once, everything after is vocabulary-sized.
    QueryDef(
      "q167_markov_transitions",
      (s, dir) => {
        val e = tbl(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev", lag(col("event_type"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
          .filter(col("prev").isNotNull)
        val pairs = e.groupBy(col("prev"), col("event_type").as("cur"))
          .agg(count(lit(1)).as("c"))
        val totals = e.groupBy(col("prev")).agg(count(lit(1)).as("n_prev"))
        val vocab = tbl(s, dir, "events").select(countDistinct(col("event_type")).as("nv"))
        pairs
          .join(broadcast(totals), "prev")
          .crossJoin(broadcast(vocab))
          .select(col("prev"), col("cur"), col("c"), col("n_prev"),
            R((col("c").cast("double") + lit(1.0)) /
              (col("n_prev").cast("double") + col("nv").cast("double")), 6).as("p_r"))
          .orderBy("prev", "cur")
      },
      Some(s"""WITH e AS (
              |  SELECT user_id, event_type,
              |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              |  FROM events),
              |p AS (SELECT prev, event_type AS cur, count(*) AS c
              |      FROM e WHERE prev IS NOT NULL GROUP BY 1, 2),
              |t AS (SELECT prev, count(*) AS n_prev FROM e WHERE prev IS NOT NULL GROUP BY 1),
              |v AS (SELECT count(DISTINCT event_type) AS nv FROM events)
              |SELECT p.prev, p.cur, p.c, t.n_prev,
              |  ${rs("(CAST(p.c AS DOUBLE) + 1.0) / (CAST(t.n_prev AS DOUBLE) + CAST(v.nv AS DOUBLE))", 6)} AS p_r
              |FROM p JOIN t ON t.prev = p.prev CROSS JOIN v
              |ORDER BY p.prev, p.cur""".stripMargin)),

    // ----- q168: interval consolidation (merge overlapping spans) --------
    // Each event opens a span [ts, ts + 60·value seconds]; overlapping or
    // touching spans per user merge into one. The standard sweep: sort by
    // start within user, running max of prior ends (one window), a break
    // flag where the start exceeds it, a running sum of breaks as the
    // island id, then one agg per island. Two windows + one agg over a
    // single user-keyed shuffle — the gaps-and-islands shape generalized
    // to intervals, all in exact epoch-microsecond integers. Scales like
    // sessionization: per-user state only, no self-join, no driver state.
    QueryDef(
      "q168_interval_merge",
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("t0"), col("event_id"))
        val e = tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("t0"),
            (unix_micros(col("ts")) +
              greatest(lit(0.0), floor(col("value") * 60)).cast("long") * 1000000L).as("t1"))
        e.withColumn("pmax",
            max(col("t1")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("brk",
            when(col("pmax").isNull || col("t0") > col("pmax"), 1L).otherwise(0L))
          .withColumn("island",
            sum(col("brk")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("island"))
          .agg(min(col("t0")).as("start_us"), max(col("t1")).as("end_us"),
            count(lit(1)).as("n_events"))
          .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
          .orderBy("user_id", "start_us")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS t0,
             |         epoch_us(ts) + CAST(greatest(0, floor(value * 60)) AS BIGINT) * 1000000 AS t1
             |  FROM events),
             |m AS (
             |  SELECT user_id, event_id, t0, t1,
             |         max(t1) OVER (PARTITION BY user_id ORDER BY t0, event_id
             |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |  FROM e),
             |f AS (SELECT *, CASE WHEN pmax IS NULL OR t0 > pmax THEN 1 ELSE 0 END AS brk FROM m),
             |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t0, event_id
             |                               ROWS UNBOUNDED PRECEDING) AS island FROM f)
             |SELECT user_id, min(t0) AS start_us, max(t1) AS end_us, count(*) AS n_events
             |FROM g GROUP BY user_id, island
             |ORDER BY user_id, start_us""".stripMargin)),

    // ----- q169: sliding-window distinct count (trailing 24 h) -----------
    // Distinct users in the trailing 24-hour window at each observed hour.
    // Exact sliding distinct cannot use a plain window frame (COUNT
    // DISTINCT over frames isn't supported and would be quadratic
    // anyway); the scalable shape is fan-out-to-buckets: pre-dedup to
    // (hour, user) memberships (map-side partial), explode each into the
    // ≤24 window-ends it can serve, then one countDistinct per window
    // end. Cost is linear × the window/granule ratio — no self-join, no
    // per-window rescans; the same plan serves any trailing window by
    // changing the fan-out constant. Ckpt'd membership relation feeds
    // both the fan-out and the observed-hour semi-join without a second
    // events scan. Integer epoch-hours end-to-end.
    QueryDef(
      "q169_sliding_distinct",
      (s, dir) => {
        val eh = tbl(s, dir, "events")
          .select(expr("unix_micros(ts) div 3600000000").as("h"), col("user_id"))
          .distinct()
          .transform(graft.ops.Ckpt.apply)
        val hours = eh.select(col("h").as("wh")).distinct()
        eh.select(explode(sequence(col("h"), col("h") + lit(23L))).as("wh"), col("user_id"))
          .join(hours, Seq("wh"), "left_semi")
          .groupBy(col("wh")).agg(countDistinct(col("user_id")).as("u24"))
          .orderBy("wh")
      },
      Some("""WITH eh AS MATERIALIZED (
             |  SELECT DISTINCT epoch_us(ts) // 3600000000 AS h, user_id FROM events),
             |ex AS (SELECT h + k AS wh, user_id FROM eh CROSS JOIN range(0, 24) r(k))
             |SELECT wh, count(DISTINCT user_id) AS u24
             |FROM ex WHERE wh IN (SELECT h FROM eh)
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
