package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity kernel, shared by the interpreted and
  * whole-stage-codegen paths (a Scala object with no companion class
  * compiles to static forwarders, so generated Java can call it directly).
  *
  * Semantics pinned to the classic algorithm as DuckDB implements it
  * (verified empirically against `jaro_winkler_similarity` over every
  * fixture pair in the q135 oracle):
  *   - either side empty → 0.0 (NOT 1.0 — some libraries differ here);
  *   - match window = max(|a|,|b|)/2 - 1, floored at 0;
  *   - Winkler prefix boost (p = 0.1, prefix capped at 4) applied only
  *     when the plain Jaro score exceeds 0.7;
  *   - case-sensitive, over UTF-16 code units (ASCII-safe; supplementary
  *     planes would need code-point iteration on both engines anyway).
  */
object JaroWinklerAlgo {

  def compute(a: UTF8String, b: UTF8String): Double =
    computeStr(a.toString, b.toString)

  def computeStr(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // Transpositions: walk both matched subsequences in order and count
    // position mismatches. The count can be ODD (a 3-cycle in the matched
    // permutation mismatches 3 positions), and DuckDB halves it with
    // INTEGER division — verified by fuzzing 20k random pairs — so this
    // kernel must too (t = trans/2 truncated, not trans/2.0).
    var k = 0
    var trans = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - (trans / 2).toDouble) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }
}

/** Native Catalyst Jaro-Winkler similarity — the verify kernel of the
  * entity-resolution path (q135). A Scala UDF here would box both strings
  * and break the codegen span around the blocked-join verify filter; this
  * expression stays inside whole-stage codegen with one static call per
  * row. Registered for SQL as `jaro_winkler` (Column surface:
  * [[StringExpressions.jaroWinkler]]).
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerAlgo.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object StringExpressions {

  /** Idempotent per-session registration; exposed to SQL as `jaro_winkler`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs.head, exprs(1)), "scala_udf")

  /** Column-API surface (requires register() on the session first). */
  def jaroWinkler(a: Column, b: Column): Column = call_function("jaro_winkler", a, b)
}
