package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-8 fourth batch: four evaluation/graph shapes the first 191
  * queries do not cover — a χ² test of INDEPENDENCE over a contingency
  * table (the two-variable sibling of q184's goodness-of-fit), rank-based
  * AUC via Mann–Whitney U with exact tie handling (the ML-eval family's
  * anchor metric), a seasonal-naive forecast backtest with MAPE/sMAPE/
  * MASE (forecast-accuracy evaluation), and exact triangle counting with
  * per-vertex clustering coefficients (the one classic graph statistic
  * the traversal battery lacks).
  *
  * Determinism follows the house contract (QueryDef scaladoc): integer /
  * DECIMAL arithmetic end-to-end, rounded-term accumulation for float
  * sums, total ORDER BYs, engine-neutral day-of-week via epoch-day
  * modulus (Spark dayofweek and DuckDB dow number Sundays differently).
  */
object Extended20 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q192: χ² critical value at α=0.05 for (5−1)(7−1)=24 dof, E-notation
    * so both parsers bind a DOUBLE literal.
    */
  private val Chi2Crit24 = "36.415E0"

  /** q194: seasonal period (weekly) and backtest horizon in days. */
  private val Season = 7
  private val Horizon = 7

  val all: Seq[QueryDef] = Seq(

    // ----- q192: chi-square test of independence ------------------------
    // Is event type independent of day-of-week? The contingency-table χ²
    // — the categorical-association screen (q184 tests a known marginal
    // law; this tests independence of two observed factors). Exactness:
    // day-of-week is (epoch_day + 4) % 7 in pure integer arithmetic
    // (identical on both engines, unlike dayofweek/dow builtins); the
    // FULL type × dow grid is generated so zero cells still contribute
    // expected counts; margins come from windows over the ≤ 35-row cell
    // relation (no rescans); χ² accumulates rounded terms in DECIMAL.
    // Shape: one hash agg over the scan, then constant-size work.
    QueryDef(
      "q192_chi2_independence",
      (s, dir) => {
        val cnt = tbl(s, dir, "events")
          .select(col("event_type").as("et"),
            (datediff(to_date(col("ts")), lit("1970-01-01")) + 4).cast("long")
              .mod(7).as("dow"))
          .groupBy(col("et"), col("dow"))
          .agg(count(lit(1)).as("o"))
        val grid = cnt.select(col("et")).distinct()
          .crossJoin(cnt.select(col("dow")).distinct())
        val full = grid.join(cnt, Seq("et", "dow"), "left")
          .withColumn("o", coalesce(col("o"), lit(0L)))
          .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("et"))))
          .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("dow"))))
          .withColumn("n", sum(col("o")).over(Window.partitionBy()))
          .withColumn("e",
            col("rt").cast("double") * col("ct").cast("double") /
              col("n").cast("double"))
          .withColumn("term",
            R((col("o").cast("double") - col("e")) *
              (col("o").cast("double") - col("e")) / col("e"), 8)
              .cast(DecimalType(24, 8)))
        full.groupBy()
          .agg(max(col("n")).as("n"),
            countDistinct(col("et")).as("n_types"),
            countDistinct(col("dow")).as("n_dows"),
            sum(col("term")).as("chi2"))
          .select(col("n"), col("n_types"), col("n_dows"),
            ((col("n_types") - 1) * (col("n_dows") - 1)).as("dof"),
            R(col("chi2").cast("double"), 4).as("chi2_r"),
            (col("chi2").cast("double") > expr(Chi2Crit24)).as("reject"))
      },
      Some(s"""WITH src AS (
              |  SELECT event_type AS et,
              |    ((CAST(ts AS DATE) - DATE '1970-01-01') + 4) % 7 AS dow
              |  FROM events),
              |cnt AS (SELECT et, dow, count(*) AS o FROM src GROUP BY 1, 2),
              |grid AS (
              |  SELECT a.et, b.dow
              |  FROM (SELECT DISTINCT et FROM cnt) a
              |  CROSS JOIN (SELECT DISTINCT dow FROM cnt) b),
              |full_ AS (
              |  SELECT grid.et, grid.dow, coalesce(cnt.o, 0) AS o
              |  FROM grid LEFT JOIN cnt
              |    ON cnt.et = grid.et AND cnt.dow = grid.dow),
              |w AS (
              |  SELECT *,
              |    CAST(sum(o) OVER (PARTITION BY et) AS BIGINT) AS rt,
              |    CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS ct,
              |    CAST(sum(o) OVER () AS BIGINT) AS n
              |  FROM full_),
              |t AS (
              |  SELECT *, CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS e
              |  FROM w),
              |t2 AS (
              |  SELECT *, CAST(${rs("(CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e", 8)}
              |    AS DECIMAL(24,8)) AS term
              |  FROM t)
              |SELECT max(n) AS n,
              |  count(DISTINCT et) AS n_types, count(DISTINCT dow) AS n_dows,
              |  CAST((count(DISTINCT et) - 1) * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
              |  ${rs("CAST(sum(term) AS DOUBLE)", 4)} AS chi2_r,
              |  CAST(sum(term) AS DOUBLE) > $Chi2Crit24 AS reject
              |FROM t2""".stripMargin)),

    // ----- q193: AUC via Mann–Whitney rank sum (exact ties) -------------
    // AUC of n_chars as a classifier for lang = 'en', per source — the
    // ranking-metric anchor of ML evaluation, computed WITHOUT sorting
    // individual rows driver-side: group by (source, score), one ordered
    // window for the exclusive cumulative count, then the rank-sum in
    // doubled-integer space (avg tie rank ×2 = 2·cum + cnt + 1 stays a
    // BIGINT), so AUC is exact integer arithmetic until one final
    // division. Tied scores are the POINT of the design — the fixture's
    // discrete lengths exercise the average-rank path everywhere. Shape:
    // one hash agg to the score histogram, one partitioned window, one
    // agg; nothing bigger than distinct-scores-per-source ever shuffles.
    QueryDef(
      "q193_auc_rank",
      (s, dir) => {
        val hist = tbl(s, dir, "documents")
          .select(col("source"), col("n_chars").as("score"),
            (col("lang") === "en").cast("long").as("y"))
          .groupBy(col("source"), col("score"))
          .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
        val wOrd = Window.partitionBy(col("source")).orderBy(col("score"))
        val ranked = hist
          .withColumn("cum", coalesce(sum(col("cnt")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("s2", col("pos") * (col("cum") * 2 + col("cnt") + 1))
        ranked.groupBy(col("source"))
          .agg(sum(col("pos")).as("n_pos"),
            (sum(col("cnt")) - sum(col("pos"))).as("n_neg"),
            sum(col("s2")).as("rs2"))
          .select(col("source"), col("n_pos"), col("n_neg"),
            R((col("rs2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
              (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")),
              6).as("auc_r"))
          .orderBy("source")
      },
      Some(s"""WITH hist AS (
              |  SELECT source, n_chars AS score, count(*) AS cnt,
              |    count(CASE WHEN lang = 'en' THEN 1 END) AS pos
              |  FROM documents GROUP BY 1, 2),
              |ranked AS (
              |  SELECT *,
              |    CAST(coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY score
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              |      AS cum
              |  FROM hist),
              |g AS (
              |  SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
              |    CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
              |    CAST(sum(pos * (2 * cum + cnt + 1)) AS BIGINT) AS rs2
              |  FROM ranked GROUP BY 1)
              |SELECT source, n_pos, n_neg,
              |  ${rs("CAST(rs2 - n_pos * (n_pos + 1) AS DOUBLE) / (2E0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))", 6)} AS auc_r
              |FROM g ORDER BY source""".stripMargin)),

    // ----- q194: seasonal-naive forecast backtest -----------------------
    // Backtest "next week looks like last week" on each type's daily
    // revenue: forecast(d) = actual(d−7) over the 7 most recent days,
    // scored with MAPE, sMAPE, and MASE (error relative to the SAME
    // naive method in-sample — the scale-free measure that survives unit
    // changes). Exactness: daily revenues are DECIMAL sums; |a−f| stays
    // DECIMAL; the per-term divisions accumulate as rounded-term
    // DECIMALs; MASE divides two DECIMAL means once. Calendar joins (on
    // day−7) over the calendar-bounded daily relation — a missing day
    // drops its pair on both engines identically. Shape: one hash agg,
    // one broadcast-sized self-join, two windows, a types-sized agg.
    QueryDef(
      "q194_forecast_backtest",
      (s, dir) => {
        val daily = tbl(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(R(col("value"), 4).cast(DecimalType(18, 4))).as("a"))
        val lagged = daily.select(col("event_type").as("et2"),
          col("day").as("pday"), col("a").as("f"))
        val paired = daily.join(lagged,
            col("event_type") === col("et2") &&
              expr(s"date_sub(day, $Season)") === col("pday"))
          .select(col("event_type"), col("day"), col("a"), col("f"))
        val wDesc = Window.partitionBy(col("event_type")).orderBy(col("day").desc)
        val marked = paired
          .withColumn("rnk", row_number().over(wDesc))
          .withColumn("isTest", col("rnk") <= Horizon)
          .withColumn("ae", abs(col("a") - col("f")))
        val dec = DecimalType(24, 12)
        marked.groupBy(col("event_type"))
          .agg(
            sum(when(col("isTest"), 1L).otherwise(0L)).as("n_test"),
            sum(when(!col("isTest"), 1L).otherwise(0L)).as("n_train"),
            sum(when(col("isTest"),
              R(col("ae").cast("double") / col("a").cast("double"), 12)
                .cast(dec))).as("mapes"),
            sum(when(col("isTest"),
              R(col("ae").cast("double") * 2.0 /
                (col("a") + col("f")).cast("double"), 12).cast(dec)))
              .as("smapes"),
            sum(when(col("isTest"), col("ae"))).as("test_ae"),
            sum(when(!col("isTest"), col("ae"))).as("train_ae"))
          .select(col("event_type"), col("n_test"), col("n_train"),
            R(col("mapes").cast("double") / col("n_test").cast("double"), 6)
              .as("mape_r"),
            R(col("smapes").cast("double") / col("n_test").cast("double"), 6)
              .as("smape_r"),
            R((col("test_ae").cast("double") / col("n_test").cast("double")) /
              (col("train_ae").cast("double") / col("n_train").cast("double")),
              6).as("mase_r"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, CAST(ts AS DATE) AS day,
              |    sum(CAST(${rs("value", 4)} AS DECIMAL(18,4))) AS a
              |  FROM events GROUP BY 1, 2),
              |paired AS (
              |  SELECT d.event_type, d.day, d.a, p.a AS f
              |  FROM daily d JOIN daily p
              |    ON p.event_type = d.event_type AND p.day = d.day - $Season),
              |marked AS (
              |  SELECT *,
              |    row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rnk,
              |    abs(a - f) AS ae
              |  FROM paired),
              |m AS (SELECT *, rnk <= $Horizon AS isTest FROM marked)
              |SELECT event_type,
              |  count(CASE WHEN isTest THEN 1 END) AS n_test,
              |  count(CASE WHEN NOT isTest THEN 1 END) AS n_train,
              |  ${rs("CAST(sum(CASE WHEN isTest THEN CAST(" + rs("CAST(ae AS DOUBLE) / CAST(a AS DOUBLE)", 12) + " AS DECIMAL(24,12)) END) AS DOUBLE) / CAST(count(CASE WHEN isTest THEN 1 END) AS DOUBLE)", 6)} AS mape_r,
              |  ${rs("CAST(sum(CASE WHEN isTest THEN CAST(" + rs("CAST(ae AS DOUBLE) * 2.0 / CAST(a + f AS DOUBLE)", 12) + " AS DECIMAL(24,12)) END) AS DOUBLE) / CAST(count(CASE WHEN isTest THEN 1 END) AS DOUBLE)", 6)} AS smape_r,
              |  ${rs("(CAST(sum(CASE WHEN isTest THEN ae END) AS DOUBLE) / CAST(count(CASE WHEN isTest THEN 1 END) AS DOUBLE)) / (CAST(sum(CASE WHEN NOT isTest THEN ae END) AS DOUBLE) / CAST(count(CASE WHEN NOT isTest THEN 1 END) AS DOUBLE))", 6)} AS mase_r
              |FROM m GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ----- q195: exact triangle count + clustering coefficients ---------
    // Triangles and per-vertex clustering on the nation trade graph —
    // the local-cohesion statistic the traversal battery (q153 BFS, q157
    // Bellman-Ford, q160 LPA, q163 harmonic, q176 assortativity) lacks.
    // Canonical a<b<c triple enumeration over the deduplicated edge
    // relation: each triangle materializes exactly once, per-vertex
    // counts come from exploding the triple's three corners — no
    // double-counting corrections. The nation graph is vertex-bounded,
    // so self-joins broadcast; at web scale the same plan gets the
    // degree-ordered orientation (orient each edge low→high degree) that
    // caps wedge fan-out at O(m^1.5) — noted here because the canonical
    // u<v form IS that orientation under a degree-monotone id relabel.
    QueryDef(
      "q195_triangles",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val ed = li
          .join(tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(tbl(s, dir, "customer").select(col("c_custkey"),
            col("c_nationkey").cast("long").as("cn")),
            col("o_custkey") === col("c_custkey"))
          .join(tbl(s, dir, "supplier").select(col("s_suppkey"),
            col("s_nationkey").cast("long").as("sn")),
            col("l_suppkey") === col("s_suppkey"))
          .filter(col("cn") =!= col("sn"))
          .select(least(col("cn"), col("sn")).as("u"),
            greatest(col("cn"), col("sn")).as("v"))
          .distinct()
        val e1 = ed.select(col("u").as("a"), col("v").as("b"))
        val e2 = ed.select(col("u").as("b2"), col("v").as("c"))
        val e3 = ed.select(col("u").as("a3"), col("v").as("c3"))
        val tri = e1.join(e2, col("b") === col("b2"))
          .join(e3, col("a") === col("a3") && col("c") === col("c3"))
          .select(col("a"), col("b"), col("c"))
        val corners = tri.select(explode(array(col("a"), col("b"), col("c")))
          .as("node"))
          .groupBy(col("node")).agg(count(lit(1)).as("tri"))
        val deg = ed.select(col("u").as("node"))
          .union(ed.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        deg.join(corners, Seq("node"), "left")
          .withColumn("tri", coalesce(col("tri"), lit(0L)))
          .select(col("node"), col("deg"), col("tri"),
            when(col("deg") >= 2,
              R(lit(2.0) * col("tri").cast("double") /
                (col("deg").cast("double") * (col("deg") - 1).cast("double")), 6))
              .as("cc_r"))
          .orderBy("node")
      },
      Some(s"""WITH ed AS MATERIALIZED (
              |  SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS u,
              |    greatest(c.c_nationkey, s.s_nationkey) AS v
              |  FROM lineitem l
              |  JOIN orders o ON o.o_orderkey = l.l_orderkey
              |  JOIN customer c ON c.c_custkey = o.o_custkey
              |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
              |  WHERE c.c_nationkey <> s.s_nationkey),
              |tri AS (
              |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
              |  FROM ed e1 JOIN ed e2 ON e2.u = e1.v
              |  JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v),
              |corners AS (
              |  SELECT node, count(*) AS tri FROM (
              |    SELECT a AS node FROM tri UNION ALL
              |    SELECT b FROM tri UNION ALL
              |    SELECT c FROM tri) t GROUP BY 1),
              |deg AS (
              |  SELECT node, count(*) AS deg FROM (
              |    SELECT u AS node FROM ed UNION ALL SELECT v FROM ed) d
              |  GROUP BY 1)
              |SELECT CAST(deg.node AS BIGINT) AS node,
              |  deg.deg, CAST(coalesce(corners.tri, 0) AS BIGINT) AS tri,
              |  CASE WHEN deg.deg >= 2 THEN
              |    ${rs("2E0 * CAST(coalesce(corners.tri, 0) AS DOUBLE) / (CAST(deg.deg AS DOUBLE) * CAST(deg.deg - 1 AS DOUBLE))", 6)}
              |  END AS cc_r
              |FROM deg LEFT JOIN corners ON corners.node = deg.node
              |ORDER BY 1""".stripMargin))
  )
}
