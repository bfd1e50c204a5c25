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
              |FROM seg GROUP BY 1 ORDER BY user_id""".stripMargin))
  )
}
