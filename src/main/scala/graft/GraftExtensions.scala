package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{JaroWinkler, VectorDot}

/** Session-extension entry point: makes the engine's native expressions
  * available in any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), the idiomatic way to
  * ship custom Catalyst functions with a library. The in-code surfaces
  * (Similarity.dot etc.) self-register per session and do not require
  * this.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getCanonicalName, "vec_dot"),
      exprs => VectorDot(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getCanonicalName, "jaro_winkler"),
      exprs => JaroWinkler(exprs.head, exprs(1))))
  }
}
