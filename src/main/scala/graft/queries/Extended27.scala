package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-8 final batch: linear multi-touch attribution — q185 gives the
  * last touch ALL the credit; the linear model splits each purchase's
  * credit equally across EVERY touch in its lookback window (the other
  * standard attribution scheme, and the one that needs a genuine
  * purchase × touches range join rather than a single running window).
  */
object Extended27 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** Lookback window (24 h) in microseconds, shared with q185. */
  private val LookbackUs = 86400000000L

  val all: Seq[QueryDef] = Seq(

    // ----- q214: linear multi-touch attribution -------------------------
    // Each purchase splits one unit of conversion credit (and its
    // revenue) EQUALLY across all non-purchase touches in the prior
    // 24 h; untouched purchases credit '(none)' in full. Shape: the
    // purchase × touches pairing is an ENTITY-KEYED equi-join on user
    // with the time range as a post-filter (q188's PIT pattern — never a
    // time cross product); per-purchase touch counts come from one
    // window over the joined relation; credits are rounded-term DECIMAL
    // sums (1/k is not exact decimal — rounding fixes the order).
    // Invariant by construction: total credit = number of purchases.
    QueryDef(
      "q214_linear_attribution",
      (s, dir) => {
        val dec = DecimalType(24, 12)
        val e = tbl(s, dir, "events")
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
            unix_micros(col("ts")).as("pt"),
            R(col("value"), 4).cast(DecimalType(18, 4)).as("pv"))
        val touch = e.filter(col("event_type") =!= "purchase")
          .select(col("user_id").as("u2"), col("event_type").as("tt"),
            unix_micros(col("ts")).as("tt_us"))
        val joined = purch.join(touch,
            col("user_id") === col("u2") &&
              col("tt_us") >= col("pt") - LookbackUs && col("tt_us") < col("pt"),
            "left")
          .withColumn("k", count(col("tt")).over(Window.partitionBy(col("pid"))))
        val credited = joined
          .withColumn("attr", coalesce(col("tt"), lit("(none)")))
          .withColumn("credit",
            when(col("k") === 0, lit(1.0))
              .otherwise(lit(1.0) / col("k").cast("double")))
          .withColumn("cr", R(col("credit"), 12).cast(dec))
          .withColumn("rr",
            R(col("pv").cast("double") * col("credit"), 8)
              .cast(DecimalType(24, 8)))
        credited.groupBy(col("attr"))
          .agg(sum(col("cr")).as("credits"),
            sum(col("rr")).as("rev"),
            countDistinct(col("pid")).as("n_purchases_touched"))
          .select(col("attr"),
            R(col("credits").cast("double"), 6).as("credit_r"),
            R(col("rev").cast("double"), 4).as("revenue_r"),
            col("n_purchases_touched"))
          .orderBy("attr")
      },
      Some(s"""WITH purch AS (
              |  SELECT user_id, event_id AS pid, epoch_us(ts) AS pt,
              |    CAST(${rs("value", 4)} AS DECIMAL(18,4)) AS pv
              |  FROM events WHERE event_type = 'purchase'),
              |touch AS (
              |  SELECT user_id AS u2, event_type AS tt, epoch_us(ts) AS tt_us
              |  FROM events WHERE event_type <> 'purchase'),
              |joined AS (
              |  SELECT purch.*, touch.tt
              |  FROM purch LEFT JOIN touch
              |    ON touch.u2 = purch.user_id
              |    AND touch.tt_us >= purch.pt - $LookbackUs
              |    AND touch.tt_us < purch.pt),
              |k AS (
              |  SELECT *, count(tt) OVER (PARTITION BY pid) AS k FROM joined),
              |credited AS (
              |  SELECT coalesce(tt, '(none)') AS attr, pid,
              |    CASE WHEN k = 0 THEN 1E0 ELSE 1E0 / CAST(k AS DOUBLE) END AS credit,
              |    pv
              |  FROM k),
              |c2 AS (
              |  SELECT attr, pid,
              |    CAST(${rs("credit", 12)} AS DECIMAL(24,12)) AS cr,
              |    CAST(${rs("CAST(pv AS DOUBLE) * credit", 8)} AS DECIMAL(24,8)) AS rr
              |  FROM credited)
              |SELECT attr,
              |  ${rs("CAST(sum(cr) AS DOUBLE)", 6)} AS credit_r,
              |  ${rs("CAST(sum(rr) AS DOUBLE)", 4)} AS revenue_r,
              |  count(DISTINCT pid) AS n_purchases_touched
              |FROM c2 GROUP BY 1 ORDER BY attr""".stripMargin))
  )
}
