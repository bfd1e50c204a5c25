package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst vector expressions.
  *
  * The generic path (`zip_with` + `aggregate`) evaluates a lambda per
  * element with boxed doubles and an intermediate zipped array — measured
  * as the dominant cost of similarity queries (~13M lambda invocations
  * for 200k pairs at dim 64). `VectorDot` is the same ascending-index
  * multiply-add loop over primitive ArrayData with whole-stage codegen,
  * so results are bit-identical to the fold (and to the DuckDB oracle)
  * while removing the interpretation overhead.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<double> args, got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch ($n vs ${y.numElements()}) — " +
          "a silent partial product would corrupt similarity scores")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance between equal SLICES of two double arrays:
  * `Σ_{i=0}^{len−1} (a[base+i] − b[base+i])²`, ascending-index fold from
  * 0.0 — bit-identical to the `aggregate` HOF form it replaces in the PQ
  * encode ([[graft.ext.Similarity.pqEncodeAgainst]]) and the per-subspace
  * codebook training, and to the DuckDB oracles' `sum((v[i]−c[i])²)`.
  * `base` is the ZERO-based slice start (an expression — it varies per
  * row with the subspace column), `len` the slice width.
  *
  * Why native: the HOF fold evaluates an interpreted lambda per element
  * (`ArrayAggregate.eval` → boxed `BinaryArithmetic.eval` +
  * `ElementAt.nullSafeEval`) — jstack'd as the dominant cost of every PQ
  * encode (round 16: a 20k-vector × 1053-codeword encode sat on one
  * interpreted stage for ~25 minutes; the same loop codegen'd is
  * bandwidth-bound). Same rationale as [[VectorDot]].
  */
case class VectorSliceSqDist(
    vec: Expression, cw: Expression, base: Expression, len: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = vec
  override def second: Expression = cw
  override def third: Expression = base
  override def fourth: Expression = len

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(vec, cw).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    val intsOk = Seq(base, len).forall(_.dataType == org.apache.spark.sql.types.IntegerType)
    if (arraysOk && intsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_slice_sqdist expects (array<double>, array<double>, int, int), got " +
        s"(${vec.dataType}, ${cw.dataType}, ${base.dataType}, ${len.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any, o: Any, l: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val off = o.asInstanceOf[Int]
    val n = l.asInstanceOf[Int]
    if (off < 0 || off + n > x.numElements() || off + n > y.numElements())
      throw new IllegalArgumentException(
        s"vec_slice_sqdist: slice [$off, ${off + n}) out of bounds " +
          s"(${x.numElements()}, ${y.numElements()}) — a silent partial " +
          "distance would corrupt code assignments")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(off + i) - y.getDouble(off + i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, o, l) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($o < 0 || $o + $l > $a.numElements() || $o + $l > $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_slice_sqdist: slice [" + $o + ", " + ($o + $l) + ") out of bounds (" +
         |      $a.numElements() + ", " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $l; $i++) {
         |  double $d = $a.getDouble($o + $i) - $b.getDouble($o + $i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(vec = f, cw = s, base = t, len = q)
}

object VectorExpressions {

  /** Idempotent per-session registration; exposed to SQL as `vec_dot`
    * and `vec_slice_sqdist`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDot(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_slice_sqdist",
      exprs => VectorSliceSqDist(exprs.head, exprs(1), exprs(2), exprs(3)), "scala_udf")
  }

  /** Column-API surface (requires register() on the session first). */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Column-API surface for [[VectorSliceSqDist]]; `base` zero-based. */
  def vecSliceSqDist(a: Column, b: Column, base: Column, len: Column): Column =
    call_function("vec_slice_sqdist", a, b, base, len)
}
