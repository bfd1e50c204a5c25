package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 second batch: graph robustness (k-core decomposition — the
  * peeling template the LPA/BFS/PageRank family did not yet cover),
  * credit-scoring feature screening (weight-of-evidence / information
  * value), survey-style margin calibration (iterative proportional
  * fitting), and corpus-mix diversity indices (HHI, Shannon, effective
  * numbers) — each a standard operation a 100 TB curation or analytics
  * stack runs, each exactly mirrored in the DuckDB oracle.
  *
  * Iterative queries use the house template: a FIXED round count shared
  * by the Spark loop and a GENERATED unrolled-CTE oracle, per-round
  * rounding where floats enter, Ckpt-truncated lineage on the Spark
  * side.
  */
object Extended29 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** k-core parameters, shared by the Spark loop and the unrolled oracle:
    * k = 3 over the strong-edge (pair weight > p90) trade graph; 6 peel
    * rounds reach the fixpoint at every fixture SF (verified 7/14, 14/24,
    * 17/24 vertices in-core at sf0.001/0.01/0.1 — both kept and dropped
    * classes non-vacuous everywhere).
    */
  private val CoreK = 3
  private val PeelRounds = 6

  /** Directed pair-weight relation + p90 threshold + symmetric strong
    * edge list: the same strong-edge construction family as q176.
    */
  private def strongSym(s: SparkSession, dir: String): DataFrame = {
    val pw = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      .join(tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey").as("cu")),
        col("o_custkey") === col("c_custkey"))
      .join(tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey").as("sv")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("cu") =!= col("sv"))
      .groupBy(col("cu").as("u"), col("sv").as("v"))
      .agg(count(lit(1)).as("w"))
    val t = pw.agg(percentile(col("w"), lit(0.9)).as("t"))
    val und = pw.crossJoin(broadcast(t)).filter(col("w") > col("t"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
    und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
  }

  private val strongSymSql =
    s"""pw AS (SELECT c.c_nationkey AS u, s.s_nationkey AS v, count(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
       |q AS (SELECT quantile_cont(w, 0.9) AS t FROM pw),
       |und AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
       |        FROM pw CROSS JOIN q WHERE w > t),
       |e0 AS MATERIALIZED (SELECT a AS u, b AS v FROM und
       |       UNION ALL SELECT b AS u, a AS v FROM und)""".stripMargin

  /** q221 oracle: the peel unrolled to PeelRounds — each round keeps the
    * vertices of degree ≥ k and restricts the edge relation to kept
    * endpoints (integer-only, no float anywhere).
    */
  private def kcoreSql: String = {
    val rounds = (1 to PeelRounds).map { r =>
      s"""k$r AS MATERIALIZED (SELECT u FROM (SELECT u, count(*) AS c FROM e${r - 1} GROUP BY 1)
         |        WHERE c >= $CoreK),
         |e$r AS MATERIALIZED (SELECT e.u, e.v FROM e${r - 1} e
         |        JOIN k$r x ON e.u = x.u JOIN k$r y ON e.v = y.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH $strongSymSql,
       |$rounds,
       |deg AS (SELECT u, count(*) AS deg_strong FROM e0 GROUP BY 1),
       |core AS (SELECT DISTINCT u FROM e$PeelRounds)
       |SELECT deg.u AS nation, deg.deg_strong,
       |  (core.u IS NOT NULL) AS in_core
       |FROM deg LEFT JOIN core ON core.u = deg.u
       |ORDER BY nation""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // ----- q221: k-core decomposition -----------------------------------
    // Which vertices survive iterated low-degree peeling — the graph
    // robustness primitive behind community cores, spam-farm detection,
    // and "dense enough to bother" pre-filters before expensive motif
    // counting (q195). Algorithm: repeat R times — drop vertices whose
    // degree in the CURRENT graph is < k, restrict edges to survivors.
    // All-integer: bit-exact on any engine, no rounding contract.
    // Shape: each round is one vertex-sized hash agg + two equi-joins of
    // the edge relation against the (tiny, broadcast) kept-vertex set,
    // Ckpt-truncated — the q144/q153/q160 iteration template; never an
    // all-pairs stage. The strong-edge threshold (pair weight > exact
    // p90) rides the q47-pinned percentile parity.
    QueryDef(
      "q221_kcore",
      (s, dir) => {
        var eg = strongSym(s, dir).transform(graft.ops.Ckpt.apply)
        val deg0 = eg.groupBy(col("u")).agg(count(lit(1)).as("deg_strong"))
        (1 to PeelRounds).foreach { _ =>
          val keep = eg.groupBy(col("u")).agg(count(lit(1)).as("c"))
            .filter(col("c") >= CoreK).select(col("u"))
          eg = eg.join(broadcast(keep), "u")
            .join(broadcast(keep.select(col("u").as("v"))), "v")
            .select(col("u"), col("v"))
            .transform(graft.ops.Ckpt.apply)
        }
        val core = eg.select(col("u")).distinct()
          .withColumn("__in", lit(true))
        deg0.join(core, Seq("u"), "left")
          .select(col("u").as("nation"), col("deg_strong"),
            coalesce(col("__in"), lit(false)).as("in_core"))
          .orderBy("nation")
      },
      Some(kcoreSql)),

    // ----- q222: weight-of-evidence / information value -----------------
    // The credit-scoring feature screen: bin users by an activity
    // feature (view-event count deciles), label them by conversion
    // (any purchase), and score the bin separation as WoE with the
    // bin-count-scaled Laplace smoothing that keeps empty classes
    // finite; IV = Σ (smoothed share gap) · WoE. Exactness: counts are
    // integers; shares and ln enter through one shared float shape;
    // the IV total accumulates ROUNDED-term DECIMALs over the 10-row
    // bin relation (a bounded global window, per the house rule).
    // Shape: one user-sized agg + one exactNtile (the user relation is
    // data-sized, so the decile split runs distributed — coarse cells +
    // exact offsets, no single-task sort; QuantilesSpec pins identity
    // with the window form) + 10-row rollup.
    QueryDef(
      "q222_woe_iv",
      (s, dir) => {
        val e = tbl(s, dir, "events")
        val users = e.groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("pos"))
        val binned = graft.ops.Quantiles.exactNtile(
          users, 10, col("views"), ascending = true, Seq(col("user_id")), "decile")
        val bins = binned.groupBy(col("decile"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("pos")).as("n_pos"),
            sum(lit(1L) - col("pos")).as("n_neg"))
        val tot = Window.partitionBy()
        val withTot = bins
          .withColumn("pt", sum(col("n_pos")).over(tot))
          .withColumn("nt", sum(col("n_neg")).over(tot))
        val gs = (col("n_pos").cast("double") + 0.5) / (col("pt").cast("double") + 5.0)
        val bs = (col("n_neg").cast("double") + 0.5) / (col("nt").cast("double") + 5.0)
        val woe = log(gs) - log(bs)
        val res = withTot
          .withColumn("woe_r", R(woe, 6))
          .withColumn("ivt", R((gs - bs) * woe, 8).cast(DecimalType(24, 8)))
          .withColumn("iv_total_r",
            R(sum(col("ivt")).over(tot).cast("double"), 6))
        res.select(col("decile"), col("n_users"), col("n_pos"), col("n_neg"),
            col("woe_r"), R(col("ivt").cast("double"), 6).as("iv_r"),
            col("iv_total_r"))
          .orderBy("decile")
      },
      Some(s"""WITH users AS (
              |  SELECT user_id,
              |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
              |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos
              |  FROM events GROUP BY 1),
              |binned AS (
              |  SELECT *, CAST(ntile(10) OVER (ORDER BY views, user_id) AS BIGINT) AS decile
              |  FROM users),
              |bins AS (
              |  SELECT decile, count(*) AS n_users,
              |    CAST(sum(pos) AS BIGINT) AS n_pos,
              |    CAST(sum(1 - pos) AS BIGINT) AS n_neg
              |  FROM binned GROUP BY 1),
              |wt AS (
              |  SELECT *, CAST(sum(n_pos) OVER () AS BIGINT) AS pt,
              |    CAST(sum(n_neg) OVER () AS BIGINT) AS nt
              |  FROM bins),
              |calc AS (
              |  SELECT *,
              |    (CAST(n_pos AS DOUBLE) + 0.5) / (CAST(pt AS DOUBLE) + 5.0) AS gs,
              |    (CAST(n_neg AS DOUBLE) + 0.5) / (CAST(nt AS DOUBLE) + 5.0) AS bs
              |  FROM wt),
              |terms AS (
              |  SELECT *, ln(gs) - ln(bs) AS woe,
              |    CAST(${rs("(gs - bs) * (ln(gs) - ln(bs))", 8)} AS DECIMAL(24,8)) AS ivt
              |  FROM calc)
              |SELECT decile, n_users, n_pos, n_neg,
              |  ${rs("woe", 6)} AS woe_r,
              |  ${rs("CAST(ivt AS DOUBLE)", 6)} AS iv_r,
              |  ${rs("CAST(sum(ivt) OVER () AS DOUBLE)", 6)} AS iv_total_r
              |FROM terms ORDER BY decile""".stripMargin)),

    // ----- q223: iterative proportional fitting (raking) ----------------
    // Calibrate cell weights so the weighted (event_type × dow) table
    // hits uniform target margins — the survey-weighting / panel-
    // balancing primitive (Deming–Stephan IPF). 3 full row+column
    // rounds with the house iterative-float contract: each
    // multiplicative update ROUNDS to 10 decimals, margin sums
    // accumulate rounded-term DECIMALs, so both engines walk the same
    // weight sequence bit-for-bit. Shape: the cell relation is bounded
    // (types × 7 days); every round is two windows over it — at any
    // corpus scale only the initial count agg touches data.
    QueryDef(
      "q223_ipf_raking",
      (s, dir) => {
        val cells = tbl(s, dir, "events")
          .select(col("event_type").as("et"),
            (datediff(to_date(col("ts")), lit("1970-01-01")) + 4).cast("long")
              .mod(7).as("dow"))
          .groupBy(col("et"), col("dow"))
          .agg(count(lit(1)).as("n"))
        val totals = cells.agg(sum(col("n")).as("total"),
          countDistinct(col("et")).as("n_et"),
          countDistinct(col("dow")).as("n_dow"))
        val base = cells.crossJoin(broadcast(totals))
          .withColumn("rt", col("total").cast("double") / col("n_et").cast("double"))
          .withColumn("ct", col("total").cast("double") / col("n_dow").cast("double"))
          .withColumn("w", lit(1.0))
        val dec = DecimalType(28, 8)
        def margin(part: Column) =
          sum(R(col("n").cast("double") * col("w"), 8).cast(dec))
            .over(Window.partitionBy(part)).cast("double")
        var cur = base
        (1 to 3).foreach { _ =>
          cur = cur.withColumn("w", R(col("w") * col("rt") / margin(col("et")), 10))
          cur = cur.withColumn("w", R(col("w") * col("ct") / margin(col("dow")), 10))
        }
        cur.select(col("et"), col("dow"), col("n"),
            R(col("w"), 6).as("w_r"),
            R(col("n").cast("double") * col("w"), 4).as("fitted_r"))
          .orderBy("et", "dow")
      },
      Some {
        val marginEt =
          s"CAST(sum(CAST(${rs("CAST(n AS DOUBLE) * w", 8)} AS DECIMAL(28,8))) OVER (PARTITION BY et) AS DOUBLE)"
        val marginDow =
          s"CAST(sum(CAST(${rs("CAST(n AS DOUBLE) * w", 8)} AS DECIMAL(28,8))) OVER (PARTITION BY dow) AS DOUBLE)"
        val rounds = (1 to 3).map { r =>
          s"""r${r}a AS (SELECT et, dow, n, rt, ct,
             |  ${rs(s"w * rt / $marginEt", 10)} AS w FROM ${if (r == 1) "base" else s"r${r - 1}b"}),
             |r${r}b AS (SELECT et, dow, n, rt, ct,
             |  ${rs(s"w * ct / $marginDow", 10)} AS w FROM r${r}a)""".stripMargin
        }.mkString(",\n")
        s"""WITH cells AS (
           |  SELECT event_type AS et,
           |    CAST(((CAST(ts AS DATE) - DATE '1970-01-01') + 4) % 7 AS BIGINT) AS dow,
           |    count(*) AS n
           |  FROM events GROUP BY 1, 2),
           |totals AS (
           |  SELECT CAST(sum(n) AS BIGINT) AS total,
           |    count(DISTINCT et) AS n_et, count(DISTINCT dow) AS n_dow
           |  FROM cells),
           |base AS (
           |  SELECT et, dow, n,
           |    CAST(total AS DOUBLE) / CAST(n_et AS DOUBLE) AS rt,
           |    CAST(total AS DOUBLE) / CAST(n_dow AS DOUBLE) AS ct,
           |    1E0 AS w
           |  FROM cells CROSS JOIN totals),
           |$rounds
           |SELECT et, dow, n, ${rs("w", 6)} AS w_r,
           |  ${rs("CAST(n AS DOUBLE) * w", 4)} AS fitted_r
           |FROM r3b ORDER BY et, dow""".stripMargin
      }),

    // ----- q224: corpus-mix diversity indices ---------------------------
    // How concentrated is each language's source mix — the question a
    // curator asks before trusting a per-language slice (one dominant
    // source = one failure domain). HHI (Σ p²), Shannon entropy
    // (−Σ p·ln p, nats), and both effective numbers (1/HHI, exp H) —
    // the "how many sources does this REALLY draw from" readouts.
    // Exactness: shares are exact integer ratios; the index sums
    // accumulate ROUNDED-term DECIMALs (order-free); 1/x and exp enter
    // once, shared shape, rounded. Shape: two nested hash aggs, no
    // joins — scales as a scan.
    QueryDef(
      "q224_diversity",
      (s, dir) => {
        val dec = DecimalType(28, 12)
        val ls = tbl(s, dir, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("c"))
          .withColumn("nl", sum(col("c")).over(Window.partitionBy(col("lang"))))
        val p = col("c").cast("double") / col("nl").cast("double")
        val agg = ls.groupBy(col("lang"))
          .agg(max(col("nl")).as("n_docs"),
            count(lit(1)).as("n_sources"),
            sum(R(p * p, 12).cast(dec)).cast("double").as("hhi"),
            sum(R(-p * log(p), 12).cast(dec)).cast("double").as("h"))
        agg.select(col("lang"), col("n_docs"), col("n_sources"),
            R(col("hhi"), 6).as("hhi_r"),
            R(col("h"), 6).as("shannon_r"),
            R(lit(1.0) / col("hhi"), 4).as("eff_simpson_r"),
            R(exp(col("h")), 4).as("eff_shannon_r"))
          .orderBy("lang")
      },
      Some(s"""WITH ls AS (
              |  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
              |wl AS (
              |  SELECT *, CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS nl FROM ls),
              |terms AS (
              |  SELECT lang, nl,
              |    CAST(${rs("(CAST(c AS DOUBLE) / CAST(nl AS DOUBLE)) * (CAST(c AS DOUBLE) / CAST(nl AS DOUBLE))", 12)} AS DECIMAL(28,12)) AS hhit,
              |    CAST(${rs("-(CAST(c AS DOUBLE) / CAST(nl AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(nl AS DOUBLE))", 12)} AS DECIMAL(28,12)) AS ht
              |  FROM wl),
              |agg AS (
              |  SELECT lang, max(nl) AS n_docs, count(*) AS n_sources,
              |    CAST(sum(hhit) AS DOUBLE) AS hhi, CAST(sum(ht) AS DOUBLE) AS h
              |  FROM terms GROUP BY 1)
              |SELECT lang, n_docs, n_sources,
              |  ${rs("hhi", 6)} AS hhi_r,
              |  ${rs("h", 6)} AS shannon_r,
              |  ${rs("1E0 / hhi", 4)} AS eff_simpson_r,
              |  ${rs("exp(h)", 4)} AS eff_shannon_r
              |FROM agg ORDER BY lang""".stripMargin))
  )
}
