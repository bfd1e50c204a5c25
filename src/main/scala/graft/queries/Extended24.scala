package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-8 eighth batch: two classic shapes rounding out the temporal and
  * BI-reporting families — an interval OVERLAP join between two interval
  * sets (q168 merges intervals within ONE set; joining two sets is the
  * sessions × campaigns / outages × jobs shape), and a
  * period-over-period waterfall bridge (the revenue-change decomposition
  * every executive dashboard opens with).
  *
  * Determinism follows the house contract (QueryDef scaladoc): exact
  * epoch-µs integer interval arithmetic, DECIMAL cent revenue, and the
  * oracle for the interval join is a DIRECT range join — independently
  * verifying the grid-bucketed Spark plan the way q179's brute-force
  * oracle verifies the spatial cells.
  */
object Extended24 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q207 promo calendar: weekly windows starting 30 h into each week,
    * lasting 60 h — deterministic offsets from the corpus start, chosen
    * so windows straddle day boundaries (bucketing must handle
    * multi-cell intervals on BOTH sides).
    */
  private val PromoWeeks = 5
  private val PromoStartUs = 30L * 3600000000L
  private val PromoLenUs = 60L * 3600000000L
  private val WeekUs = 7L * 86400000000L
  private val DayUs = 86400000000L

  val all: Seq[QueryDef] = Seq(

    // ----- q207: interval overlap join (two sets) -----------------------
    // Which user activity intervals overlap which promo windows, and by
    // how much — the sessions × campaigns join. The scale design: both
    // interval sets EXPLODE to the day-grid cells they cover (activity
    // spans ≤ 2 cells, promos ≤ 4 — bounded map-side fan-out), the join
    // is EQUI on the day cell, and duplicate cell-hits collapse with one
    // distinct BEFORE aggregation — never a full interval cross product,
    // and the per-cell join key distributes. Overlap lengths are exact
    // epoch-µs integers. The oracle is the DIRECT range join (no
    // bucketing): a dropped boundary overlap would hash-fail.
    QueryDef(
      "q207_interval_join",
      (s, dir) => {
        val ev = tbl(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val acts = ev.groupBy(col("user_id"),
            (col("us") / DayUs).cast("long").as("d"))
          .agg(min(col("us")).as("a0"), max(col("us")).as("a1"))
          .filter(col("a1") > col("a0")) // degenerate points carry no overlap
        val t0 = ev.agg(min(col("us")).as("t0"))
        val promos = t0.select(col("t0"),
            explode(sequence(lit(0), lit(PromoWeeks - 1))).as("w"))
          .select(col("w").cast("long").as("promo_id"),
            (col("t0") + col("w") * WeekUs + PromoStartUs).as("p0"))
          .withColumn("p1", col("p0") + PromoLenUs)
        // day-grid cells covered by each side (inclusive integer ranges)
        val actCells = acts.select(col("user_id"), col("a0"), col("a1"),
          explode(sequence((col("a0") / DayUs).cast("long"),
            (col("a1") / DayUs).cast("long"))).as("cell"))
        val promoCells = promos.select(col("promo_id"), col("p0"), col("p1"),
          explode(sequence((col("p0") / DayUs).cast("long"),
            ((col("p1") - 1) / DayUs).cast("long"))).as("cell"))
        val pairs = actCells.join(promoCells, Seq("cell"))
          .filter(col("a0") < col("p1") && col("p0") < col("a1"))
          .select(col("user_id"), col("a0"), col("a1"),
            col("promo_id"), col("p0"), col("p1"))
          .distinct() // one pair may meet in several cells
          .withColumn("ovl",
            least(col("a1"), col("p1")) - greatest(col("a0"), col("p0")))
        pairs.groupBy(col("promo_id"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("ovl")).as("ovl_us"))
          .select(col("promo_id"), col("n_pairs"), col("n_users"),
            R(col("ovl_us").cast("double") / 3600000000.0, 4).as("ovl_hours_r"))
          .orderBy("promo_id")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, epoch_us(ts) AS us FROM events),
              |acts AS (
              |  SELECT user_id, us // $DayUs AS d,
              |    min(us) AS a0, max(us) AS a1
              |  FROM ev GROUP BY 1, 2 HAVING max(us) > min(us)),
              |t0 AS (SELECT min(us) AS t0 FROM ev),
              |promos AS (
              |  SELECT CAST(w.w AS BIGINT) AS promo_id,
              |    t0 + CAST(w.w AS BIGINT) * $WeekUs + $PromoStartUs AS p0,
              |    t0 + CAST(w.w AS BIGINT) * $WeekUs + $PromoStartUs + $PromoLenUs AS p1
              |  FROM t0 CROSS JOIN range(0, $PromoWeeks) w(w)),
              |pairs AS (
              |  SELECT acts.user_id, promos.promo_id,
              |    least(a1, p1) - greatest(a0, p0) AS ovl
              |  FROM acts JOIN promos
              |    ON acts.a0 < promos.p1 AND promos.p0 < acts.a1)
              |SELECT promo_id, count(*) AS n_pairs,
              |  count(DISTINCT user_id) AS n_users,
              |  ${rs("CAST(sum(ovl) AS DOUBLE) / 3600000000.0", 4)} AS ovl_hours_r
              |FROM pairs GROUP BY 1 ORDER BY promo_id""".stripMargin)),

    // ----- q208: period-over-period waterfall bridge --------------------
    // How did revenue move from the first calendar month to the last,
    // and which priority classes drove it — the waterfall/bridge
    // decomposition (start total → per-group deltas → end total). The
    // two periods come from the DATA (min/max order month, broadcast
    // scalars), revenue is exact DECIMAL cents, the per-group delta
    // share divides once, and the waterfall's running position is a
    // cumulative window over the groups-sized relation ordered by the
    // total ORDER of (priority) — every column replayable by integer
    // arithmetic.
    QueryDef(
      "q208_waterfall",
      (s, dir) => {
        val o = tbl(s, dir, "orders").select(
          col("o_orderpriority").as("pri"),
          date_format(col("o_orderdate"), "yyyy-MM").as("m"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        val bounds = o.agg(min(col("m")).as("m1"), max(col("m")).as("m2"))
        // group dimension joined back so a priority with NO orders in
        // either boundary month still appears as a zero bar (a waterfall
        // that silently drops groups does not close visually)
        val agg = o.crossJoin(broadcast(bounds))
          .filter(col("m") === col("m1") || col("m") === col("m2"))
          .groupBy(col("pri"))
          .agg(sum(when(col("m") === col("m1"), col("cents"))).as("c1"),
            sum(when(col("m") === col("m2"), col("cents"))).as("c2"))
        val per = o.select(col("pri")).distinct()
          .join(agg, Seq("pri"), "left")
          .withColumn("c1", coalesce(col("c1"), lit(0L)))
          .withColumn("c2", coalesce(col("c2"), lit(0L)))
          .withColumn("delta", col("c2") - col("c1"))
        val wAll = Window.partitionBy()
        val wCum = Window.orderBy(col("pri"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        per
          .withColumn("t1", sum(col("c1")).over(wAll))
          .withColumn("td", sum(col("delta")).over(wAll))
          .withColumn("cum", sum(col("delta")).over(wCum))
          .select(col("pri"),
            R(col("c1").cast("double") / 100.0, 2).as("rev_start_r"),
            R(col("c2").cast("double") / 100.0, 2).as("rev_end_r"),
            R(col("delta").cast("double") / 100.0, 2).as("delta_r"),
            R(col("delta").cast("double") / abs(col("td")).cast("double"), 6)
              .as("share_of_change_r"),
            R((col("t1") + col("cum")).cast("double") / 100.0, 2)
              .as("waterfall_pos_r"),
            R(col("delta").cast("double") /
              when(col("c1") === 0, lit(null)).otherwise(col("c1"))
                .cast("double"), 6).as("pct_change_r"))
          .orderBy("pri")
      },
      Some(s"""WITH o AS (
              |  SELECT o_orderpriority AS pri, strftime(o_orderdate, '%Y-%m') AS m,
              |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              |  FROM orders),
              |b AS (SELECT min(m) AS m1, max(m) AS m2 FROM o),
              |agg AS (
              |  SELECT pri,
              |    CAST(coalesce(sum(CASE WHEN m = m1 THEN cents END), 0) AS BIGINT) AS c1,
              |    CAST(coalesce(sum(CASE WHEN m = m2 THEN cents END), 0) AS BIGINT) AS c2
              |  FROM o CROSS JOIN b
              |  WHERE m = m1 OR m = m2 GROUP BY 1),
              |per AS (
              |  SELECT dim.pri, coalesce(agg.c1, 0) AS c1, coalesce(agg.c2, 0) AS c2
              |  FROM (SELECT DISTINCT pri FROM o) dim
              |  LEFT JOIN agg ON agg.pri = dim.pri),
              |d AS (SELECT *, c2 - c1 AS delta FROM per),
              |w AS (
              |  SELECT *, CAST(sum(c1) OVER () AS BIGINT) AS t1,
              |    CAST(sum(delta) OVER () AS BIGINT) AS td,
              |    CAST(sum(delta) OVER (ORDER BY pri
              |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              |  FROM d)
              |SELECT pri,
              |  ${rs("CAST(c1 AS DOUBLE) / 100.0", 2)} AS rev_start_r,
              |  ${rs("CAST(c2 AS DOUBLE) / 100.0", 2)} AS rev_end_r,
              |  ${rs("CAST(delta AS DOUBLE) / 100.0", 2)} AS delta_r,
              |  ${rs("CAST(delta AS DOUBLE) / CAST(abs(td) AS DOUBLE)", 6)} AS share_of_change_r,
              |  ${rs("CAST(t1 + cum AS DOUBLE) / 100.0", 2)} AS waterfall_pos_r,
              |  ${rs("CAST(delta AS DOUBLE) / CAST(nullif(c1, 0) AS DOUBLE)", 6)} AS pct_change_r
              |FROM w ORDER BY pri""".stripMargin))
  )
}
