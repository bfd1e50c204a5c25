package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-7 fifth batch: exact-sum proportional allocation (largest
  * remainder / Hamilton method) and multi-level contribution analysis
  * (ratio-to-report). Both are reporting/finance staples whose naive
  * float formulations break exact-sum invariants — the point of each
  * query is the integer/DECIMAL discipline that keeps them exact.
  */
object Extended15 {

  /** q173: units to apportion among order priorities — shared constant. */
  private val Units = 10000L

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // ----- q173: largest-remainder (Hamilton) apportionment --------------
    // Distribute a fixed integer budget across groups proportional to a
    // DECIMAL measure so the allocations are integers that SUM EXACTLY to
    // the budget — naive per-row rounding drifts by ±(groups/2). Method:
    // floor the exact quota, then hand the leftover units to the largest
    // fractional remainders (deterministic tie-break on the group key).
    // All arithmetic is DECIMAL×integer — quota = measure·units/total is
    // computed as DECIMAL(38,6) the same way both sides; remainders
    // compare exactly. Shape: one agg, one broadcast total, one
    // groups-sized window — scales with group count, not row count.
    QueryDef(
      "q173_largest_remainder",
      (s, dir) => {
        val dec2 = DecimalType(18, 2)
        val g = tbl(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("prio"))
          .agg(sum(R(col("o_totalprice"), 2).cast(dec2)).as("m"))
        val tot = g.select(sum(col("m")).as("mt"), count(lit(1)).as("ng"))
        val q = g.crossJoin(broadcast(tot))
          .withColumn("quota",
            (col("m").cast(DecimalType(38, 6)) * lit(Units) / col("mt"))
              .cast(DecimalType(38, 6)))
          .withColumn("fl", floor(col("quota")).cast("bigint"))
          .withColumn("rem", col("quota") - col("fl"))
        val leftover = q.withColumn("used", sum(col("fl")).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("extra", lit(Units) - col("used"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rem").desc, col("prio").asc)))
        leftover
          .select(col("prio"), col("m").cast("double").as("m_d"), col("fl"),
            R(col("rem").cast("double"), 6).as("rem_r"),
            (col("fl") + when(col("rk") <= col("extra"), 1L).otherwise(0L)).as("alloc"))
          .orderBy("prio")
      },
      Some(s"""WITH g AS (
              |  SELECT o_orderpriority AS prio,
              |         sum(CAST(${rs("o_totalprice", 2)} AS DECIMAL(18,2))) AS m
              |  FROM orders GROUP BY 1),
              |t AS (SELECT sum(m) AS mt, count(*) AS ng FROM g),
              |q AS (
              |  SELECT prio, m,
              |         CAST(CAST(m AS DECIMAL(38,6)) * $Units / mt AS DECIMAL(38,6)) AS quota
              |  FROM g CROSS JOIN t),
              |f AS (
              |  SELECT prio, m, CAST(floor(quota) AS BIGINT) AS fl, quota - floor(quota) AS rem
              |  FROM q),
              |l AS (
              |  SELECT *, sum(fl) OVER () AS used,
              |         row_number() OVER (ORDER BY rem DESC, prio ASC) AS rk
              |  FROM f)
              |SELECT prio, CAST(m AS DOUBLE) AS m_d, fl,
              |       ${rs("CAST(rem AS DOUBLE)", 6)} AS rem_r,
              |       fl + CASE WHEN rk <= $Units - used THEN 1 ELSE 0 END AS alloc
              |FROM l ORDER BY prio""".stripMargin)),

    // ----- q174: ratio-to-report contribution analysis -------------------
    // Share-of-parent at two hierarchy levels in one pass: each nation's
    // revenue share within its region, and each region's share of the
    // grand total. Revenue aggregates as exact DECIMAL cents (one hash
    // agg at the finest grain); the two shares are partition-window sums
    // over the nation-level relation — |nations| rows, so the windows
    // cost nothing at any raw scale; ratios divide once, rounded both
    // sides. The standard contribution/mix-report shape (percent-of-
    // total columns) without grouping-sets re-aggregation.
    QueryDef(
      "q174_ratio_to_report",
      (s, dir) => {
        val dec2 = DecimalType(18, 2)
        val rev = tbl(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
          .join(tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(tbl(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(tbl(s, dir, "region").select(col("r_regionkey"), col("r_name"))),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(R(col("o_totalprice"), 2).cast(dec2)).as("rev"))
        val wr = Window.partitionBy(col("r_name"))
        val wg = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        rev
          .withColumn("rrev", sum(col("rev")).over(wr))
          .withColumn("grev", sum(col("rev")).over(wg))
          .select(col("r_name"), col("n_name"),
            col("rev").cast("double").as("rev_d"),
            R(col("rev").cast("double") / col("rrev").cast("double"), 6).as("share_in_region_r"),
            R(col("rrev").cast("double") / col("grev").cast("double"), 6).as("region_share_r"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""WITH rev AS (
              |  SELECT r.r_name, n.n_name,
              |         sum(CAST(${rs("o_totalprice", 2)} AS DECIMAL(18,2))) AS rev
              |  FROM orders o
              |  JOIN customer c ON o.o_custkey = c.c_custkey
              |  JOIN nation n ON c.c_nationkey = n.n_nationkey
              |  JOIN region r ON n.n_regionkey = r.r_regionkey
              |  GROUP BY 1, 2),
              |w AS (
              |  SELECT *, sum(rev) OVER (PARTITION BY r_name) AS rrev,
              |         sum(rev) OVER () AS grev
              |  FROM rev)
              |SELECT r_name, n_name, CAST(rev AS DOUBLE) AS rev_d,
              |       ${rs("CAST(rev AS DOUBLE) / CAST(rrev AS DOUBLE)", 6)} AS share_in_region_r,
              |       ${rs("CAST(rrev AS DOUBLE) / CAST(grev AS DOUBLE)", 6)} AS region_share_r
              |FROM w ORDER BY r_name, n_name""".stripMargin)),

    // ----- q175: time-weighted average (TWAP) ---------------------------
    // Each observation holds until the next one; the average weights each
    // value by its holding duration — the correct mean for irregularly
    // sampled series (sensor state, prices), where the plain mean
    // over-weights bursts. One lead() window per user gives the segment
    // durations in exact epoch-µs integers; the value·duration products
    // accumulate as DECIMAL (4-dp-rounded value × integer µs — exact, so
    // summation order cannot matter), and one division closes it out.
    // Single user-keyed shuffle, no self-join — same cost class as any
    // per-entity window feature at 100 TB.
    QueryDef(
      "q175_twap",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
        tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"), col("value"))
          .withColumn("nxt", lead(col("t"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("user_id"),
            (R(col("value"), 4).cast(DecimalType(18, 4)) * (col("nxt") - col("t"))).as("vd"),
            (col("nxt") - col("t")).as("dur"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_segments"),
            R(sum(col("vd")).cast("double") / sum(col("dur")).cast("double"), 6).as("twap_r"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (
              |  SELECT user_id, event_id, epoch_us(ts) AS t, value,
              |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt
              |  FROM events),
              |seg AS (
              |  SELECT user_id,
              |         CAST(${rs("value", 4)} AS DECIMAL(18,4)) * (nxt - t) AS vd,
              |         nxt - t AS dur
              |  FROM e WHERE nxt IS NOT NULL)
              |SELECT user_id, count(*) AS n_segments,
              |  ${rs("CAST(sum(vd) AS DOUBLE) / CAST(sum(dur) AS DOUBLE)", 6)} AS twap_r
              |FROM seg GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // ----- q176: graph profile (degree stats + assortativity) ------------
    // Structural statistics of the undirected trade graph in one pass:
    // vertex/edge counts, mean degree, and Newman's degree assortativity
    // (Pearson correlation of endpoint degrees over both edge
    // orientations). Every accumulator is an exact BIGINT moment sum —
    // the correlation divides once at the end, so the only float op is
    // shared verbatim by both engines. Shape: one distinct over canonical
    // edges, one vertex-sized degree agg broadcast onto both endpoints,
    // integer rollups. Complements the traversal battery (q153/q157/
    // q160/q163) with the "is my graph hub-heavy or flat" health check
    // that decides salting and partitioning strategy before running them.
    QueryDef(
      "q176_graph_profile",
      (s, dir) => {
        // strong-edge graph: keep pairs whose trade weight exceeds the
        // median pair weight — the raw nation graph is near-complete at
        // sf ≥ 0.01 (all degrees equal → assortativity is 0/0); the
        // thresholded graph has real degree structure at every SF
        val undW = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
          .join(tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey").as("u")),
            col("o_custkey") === col("c_custkey"))
          .join(tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey").as("w")),
            col("l_suppkey") === col("s_suppkey"))
          .filter(col("u") =!= col("w"))
          .groupBy(least(col("u"), col("w")).as("a"), greatest(col("u"), col("w")).as("b"))
          .agg(count(lit(1)).as("wgt"))
        val med = undW.agg(median(col("wgt")).as("md"))
        val und = undW.crossJoin(broadcast(med))
          .filter(col("wgt") > col("md"))
          .select(col("a"), col("b"))
          .transform(graft.ops.Ckpt.apply)
        val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("d"))
        val ends = und
          .join(broadcast(deg.select(col("v").as("a"), col("d").as("da"))), "a")
          .join(broadcast(deg.select(col("v").as("b"), col("d").as("db"))), "b")
        val pairs = ends.select(col("da").as("x"), col("db").as("y"))
          .unionAll(ends.select(col("db").as("x"), col("da").as("y")))
        val mom = pairs.agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
        val vstats = deg.agg(
          count(lit(1)).as("n_vertices"), sum(col("d")).as("dsum"),
          min(col("d")).as("deg_min"), max(col("d")).as("deg_max"))
        val nedges = und.agg(count(lit(1)).as("n_edges"))
        val varTerm = (col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) *
          (col("n").cast("double") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double"))
        val assort = (col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          when(varTerm === 0.0, lit(null).cast("double")).otherwise(sqrt(varTerm))
        vstats.crossJoin(broadcast(nedges)).crossJoin(broadcast(mom))
          .select(col("n_vertices"), col("n_edges"), col("deg_min"), col("deg_max"),
            R(col("dsum").cast("double") / col("n_vertices").cast("double"), 4)
              .as("deg_mean_r"),
            R(assort, 6).as("assort_r"))
      },
      Some(s"""WITH undw AS MATERIALIZED (
              |  SELECT least(c.c_nationkey, s.s_nationkey) AS a,
              |         greatest(c.c_nationkey, s.s_nationkey) AS b, count(*) AS wgt
              |  FROM lineitem l
              |  JOIN orders o ON l.l_orderkey = o.o_orderkey
              |  JOIN customer c ON o.o_custkey = c.c_custkey
              |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
              |  WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2),
              |md AS (SELECT median(wgt) AS md FROM undw),
              |und AS MATERIALIZED (
              |  SELECT a, b FROM undw CROSS JOIN md WHERE wgt > md.md),
              |deg AS MATERIALIZED (
              |  SELECT v, count(*) AS d FROM (
              |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
              |  GROUP BY 1),
              |ends AS (
              |  SELECT da.d AS x, db.d AS y
              |  FROM und JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b),
              |pairs AS (SELECT x, y FROM ends UNION ALL SELECT y AS x, x AS y FROM ends),
              |mom AS (
              |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              |         CAST(sum(x * y) AS BIGINT) AS sxy,
              |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
              |  FROM pairs),
              |vs AS (
              |  SELECT count(*) AS n_vertices, CAST(sum(d) AS BIGINT) AS dsum,
              |         min(d) AS deg_min, max(d) AS deg_max
              |  FROM deg),
              |ne AS (SELECT count(*) AS n_edges FROM und)
              |SELECT vs.n_vertices, ne.n_edges, vs.deg_min, vs.deg_max,
              |  ${rs("CAST(vs.dsum AS DOUBLE) / CAST(vs.n_vertices AS DOUBLE)", 4)} AS deg_mean_r,
              |  ${rs("(CAST(mom.n AS DOUBLE) * CAST(mom.sxy AS DOUBLE) - CAST(mom.sx AS DOUBLE) * CAST(mom.sy AS DOUBLE)) / sqrt(nullif((CAST(mom.n AS DOUBLE) * CAST(mom.sxx AS DOUBLE) - CAST(mom.sx AS DOUBLE) * CAST(mom.sx AS DOUBLE)) * (CAST(mom.n AS DOUBLE) * CAST(mom.syy AS DOUBLE) - CAST(mom.sy AS DOUBLE) * CAST(mom.sy AS DOUBLE)), 0))", 6)} AS assort_r
              |FROM vs CROSS JOIN ne CROSS JOIN mom""".stripMargin))
  )
}
