package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-8 ninth batch: two warehouse-introspection shapes — a one-pass
  * column profiler (the ANALYZE/data-catalog summary: null share,
  * cardinality, range, top value per column) and a numeric correlation
  * MATRIX (q83 proves corr parity for one pair; real feature screens
  * want every pair at once from a single scan).
  *
  * Determinism follows the house contract (QueryDef scaladoc): the
  * profiler's per-column stats are exact integers/strings from ONE
  * aggregate pass (no per-column rescans), top values break ties by
  * value; the matrix's six correlations come from one shared
  * moment-sum aggregate with q83's corr-function parity.
  */
object Extended25 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q209: the profiled lineitem columns (name → typed accessor pairs are
    * built per column inside the query; the list is the catalog).
    */
  private val ProfCols = Seq("l_quantity", "l_discount", "l_returnflag",
    "l_linestatus", "l_shipdate")

  /** q210: numeric columns whose pairwise correlations form the matrix. */
  private val MatCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val all: Seq[QueryDef] = Seq(

    // ----- q209: one-pass column profiler -------------------------------
    // The data-catalog summary every warehouse keeps per column: row
    // count, null share, distinct cardinality, lexicographic min/max
    // (rendered as strings so one schema fits every type), and the most
    // frequent value with its share. Shape: ONE scan feeding a per-value
    // hash agg per column via a map-side UNPIVOT explode (column-name,
    // rendered-value pairs), then per-column rollups from the value
    // histogram — no per-column rescans, no driver loops; the histogram
    // relation is bounded by Σ per-column cardinality. The top value is
    // an order-encoded argmax (count desc, value asc) like the house's
    // other mode queries.
    QueryDef(
      "q209_column_profile",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        // timestamps render through the house date format; FLOATING-POINT
        // columns through an explicit shared %.6f (Java's Double.toString
        // flips to E-notation for |x| >= 1e7 or < 1e-3 while DuckDB's
        // VARCHAR cast does not — an engine-native cast would silently
        // break parity on wide-range columns). %.6f of the same IEEE
        // double is identical across Java and C printf (an exact tie at
        // the 6th decimal would need a 5/10^7 tail, unrepresentable in
        // binary). Precondition: finite values (NaN/Inf spell differently).
        // Everything else renders via the engine-shared plain cast.
        val rendered = ProfCols.map { c =>
          val v =
            if (c == "l_shipdate") date_format(col(c), "yyyy-MM-dd HH:mm:ss")
            else li.schema(c).dataType match {
              case org.apache.spark.sql.types.DoubleType |
                   org.apache.spark.sql.types.FloatType =>
                when(col(c).isNotNull, format_string("%.6f", col(c)))
              case _ => col(c).cast("string")
            }
          struct(lit(c).as("cn"), v.as("v"))
        }
        val pairs = li.select(explode(array(rendered: _*)).as("p"))
          .select(col("p.cn").as("cn"), col("p.v").as("v"))
        val hist = pairs.groupBy(col("cn"), col("v"))
          .agg(count(lit(1)).as("c"))
        hist.groupBy(col("cn"))
          .agg(sum(col("c")).as("n_rows"),
            coalesce(sum(when(col("v").isNull, col("c"))), lit(0L)).as("n_null"),
            count(col("v")).as("n_distinct"),
            min(col("v")).as("min_s"),
            max(col("v")).as("max_s"),
            max(when(col("v").isNotNull,
              concat(format_string("%019d", col("c")), lit("|"), col("v"))))
              .as("topenc"))
          .select(col("cn").as("column_name"), col("n_rows"), col("n_null"),
            R(col("n_null").cast("double") / col("n_rows").cast("double"), 6)
              .as("null_share_r"),
            col("n_distinct"), col("min_s"), col("max_s"),
            substring_index(col("topenc"), "|", -1).as("top_value"),
            R(substring_index(col("topenc"), "|", 1).cast("long").cast("double") /
              col("n_rows").cast("double"), 6).as("top_share_r"))
          .orderBy("column_name")
      },
      Some {
        // mirror of the Spark rendering: fixture doubles go through the
        // same explicit %.6f (l_quantity/l_discount are DOUBLE in the
        // parquet schema; extend this set if ProfCols grows)
        val doubleCols = Set("l_quantity", "l_discount", "l_extendedprice", "l_tax")
        val armSql = ProfCols.map { c =>
          val v =
            if (c == "l_shipdate") s"strftime($c, '%Y-%m-%d %H:%M:%S')"
            else if (doubleCols(c))
              s"CASE WHEN $c IS NOT NULL THEN printf('%.6f', $c) END"
            else s"CAST($c AS STRING)"
          s"SELECT '$c' AS cn, $v AS v FROM lineitem"
        }.mkString("\nUNION ALL\n")
        s"""WITH pairs AS (
           |$armSql),
           |hist AS (SELECT cn, v, count(*) AS c FROM pairs GROUP BY 1, 2)
           |SELECT cn AS column_name,
           |  CAST(sum(c) AS BIGINT) AS n_rows,
           |  CAST(coalesce(sum(CASE WHEN v IS NULL THEN c END), 0) AS BIGINT) AS n_null,
           |  ${rs("CAST(coalesce(sum(CASE WHEN v IS NULL THEN c END), 0) AS DOUBLE) / CAST(sum(c) AS DOUBLE)", 6)} AS null_share_r,
           |  count(v) AS n_distinct,
           |  min(v) AS min_s, max(v) AS max_s,
           |  split_part(max(CASE WHEN v IS NOT NULL
           |    THEN printf('%019d', c) || '|' || v END), '|', 2) AS top_value,
           |  ${rs("CAST(CAST(split_part(max(CASE WHEN v IS NOT NULL THEN printf('%019d', c) || '|' || v END), '|', 1) AS BIGINT) AS DOUBLE) / CAST(sum(c) AS DOUBLE)", 6)} AS top_share_r
           |FROM hist GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ----- q210: numeric correlation matrix -----------------------------
    // Every pairwise Pearson correlation among four lineitem measures
    // from ONE scan — the feature-redundancy screen run before any
    // modeling. Exactness: all ten moment sums accumulate 4-decimal
    // rounded DECIMAL terms (order-free); each correlation is one shared
    // closed-form float expression over exact sums — no reliance on
    // engine corr() internals, and the matrix is emitted in long form
    // (col_a < col_b) with a total ORDER BY.
    QueryDef(
      "q210_corr_matrix",
      (s, dir) => {
        val dec = DecimalType(18, 4)
        val vals = MatCols.map(c => R(col(c), 4).cast(dec).as(s"v_$c"))
        val base = tbl(s, dir, "lineitem").select(vals: _*)
        val sums = base.agg(
          count(lit(1)).as("n"),
          MatCols.map(c => sum(col(s"v_$c")).as(s"s_$c")) ++
            (for { a <- MatCols; b <- MatCols if a <= b }
              yield sum(col(s"v_$a") * col(s"v_$b")).as(s"q_${a}_$b")): _*)
        val pairRows = for { a <- MatCols; b <- MatCols if a < b } yield {
          val n = col("n").cast("double")
          val sa = col(s"s_$a").cast("double"); val sb = col(s"s_$b").cast("double")
          val qab = col(s"q_${a}_$b").cast("double")
          val qaa = col(s"q_${a}_$a").cast("double")
          val qbb = col(s"q_${b}_$b").cast("double")
          sums.select(lit(a).as("col_a"), lit(b).as("col_b"),
            col("n").as("n"),
            R((n * qab - sa * sb) /
              sqrt((n * qaa - sa * sa) * (n * qbb - sb * sb)), 6).as("corr_r"))
        }
        pairRows.reduce(_ unionAll _).orderBy("col_a", "col_b")
      },
      Some {
        val rounded = MatCols.map(c =>
          s"CAST(${rs(c, 4)} AS DECIMAL(18,4)) AS v_$c").mkString(", ")
        val moments = (
          Seq("count(*) AS n") ++
            MatCols.map(c => s"sum(v_$c) AS s_$c") ++
            (for { a <- MatCols; b <- MatCols if a <= b }
              // (19,4)×(19,4) → DECIMAL(38,8): DuckDB would otherwise keep
              // width 18 through the multiply and overflow
              yield s"sum(CAST(v_$a AS DECIMAL(19,4)) * CAST(v_$b AS DECIMAL(19,4))) AS q_${a}_$b")).mkString(",\n    ")
        val arms = (for { a <- MatCols; b <- MatCols if a < b } yield {
          val e = s"(CAST(n AS DOUBLE) * CAST(q_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)) / " +
            s"sqrt((CAST(n AS DOUBLE) * CAST(q_${a}_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) * " +
            s"(CAST(n AS DOUBLE) * CAST(q_${b}_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))"
          s"SELECT '$a' AS col_a, '$b' AS col_b, n, ${rs(e, 6)} AS corr_r FROM sums"
        }).mkString("\nUNION ALL\n")
        s"""WITH base AS (SELECT $rounded FROM lineitem),
           |sums AS (
           |  SELECT $moments
           |  FROM base)
           |$arms
           |ORDER BY col_a, col_b""".stripMargin
      })
  )
}
