package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic rounding.
  *
  * Spark's `round` rounds the SHORTEST DECIMAL STRING of the double
  * (BigDecimal.valueOf + HALF_UP); DuckDB's `round` multiplies in binary
  * and rounds half away from zero. The two disagree whenever the shortest
  * representation looks like a tie at the target digit (~0.1% of rows on
  * real data — measured 73/60k on lineitem charge values), which would
  * break the driver's hash compare.
  *
  * `roundTo` instead pins ONE formula — sign(x)·⌊|x|·10ⁿ + 0.5⌋ / 10ⁿ —
  * expressed in plain IEEE double ops that evaluate bit-identically in any
  * engine; `roundSql` emits the same formula as SQL for the DuckDB oracle.
  * The trailing `+ 0.0` normalizes -0.0 to 0.0 on both sides.
  */
object Num {

  /** RANGE PRECONDITION: |x|·10ⁿ must stay below 2⁶³ (~9.2e18). Spark's
    * `floor` returns BIGINT and SATURATES at Long.MaxValue past that,
    * while DuckDB's `floor` stays DOUBLE — a silent cross-engine
    * mismatch (observed: an unnormalized N_h·S² term at 6 dp clipped to
    * 9223372036854.775). Above 2⁵³ both engines floor the same inexact
    * double, which stays bit-identical — only the 2⁶³ long cliff
    * diverges. Keep rounded terms normalized (shares, ratios, per-unit
    * values) or pick n so the product stays under the bound.
    */
  def roundTo(c: Column, n: Int): Column = {
    val p = math.pow(10, n.toDouble)
    signum(c) * floor(abs(c) * p + lit(0.5)) / p + lit(0.0)
  }

  def roundSql(expr: String, n: Int): String =
    s"(sign($expr) * floor(abs($expr) * 1e$n + 0.5) / 1e$n + 0.0)"

  /** Driver-side scalar twin of [[roundTo]] — the identical IEEE op
    * sequence (multiply, add 0.5, floor, divide, −0.0 normalize), so a
    * value rounded on the driver is bit-equal to the Column expression's
    * result. (Spark's `floor` goes through BIGINT; for |x|·10ⁿ < 2⁶³ the
    * long↔double round-trip is value-preserving, so `math.floor` — which
    * is also what DuckDB computes — agrees bit-for-bit.) Used by the
    * bounded-graph driver iterations (q144/q163/q274 family).
    */
  def roundToD(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  /** Driver-side twin of `CAST(x AS DECIMAL(24,12))`: Spark's
    * double→decimal cast parses `Double.toString` (shortest decimal
    * string — `java.math.BigDecimal.valueOf` does exactly that) and
    * rescales HALF_UP. Summing these BigDecimals is exact decimal
    * addition, order-free — the same contract the Column-side
    * `sum(cast(... as DECIMAL(24,12)))` provides.
    */
  def dec12(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(12, java.math.RoundingMode.HALF_UP)

  /** `sum(CAST(term AS DECIMAL(24,12))).cast("double")`, driver-side. */
  def dec12Sum(terms: IterableOnce[Double]): Double =
    terms.iterator.foldLeft(java.math.BigDecimal.ZERO)((a, t) => a.add(dec12(t)))
      .doubleValue
}
