package graft

import org.apache.spark.sql.SparkSession

/** Library entry point for SQL users: one call wires the engine's whole
  * function surface into a session — the native codegen expression
  * (vec_dot), the scalar UDF twin (classify_wind), and the typed UDAFs
  * (mode_det, mode_strict). Catalyst-expression injection alone is
  * available session-wide via `spark.sql.extensions=graft.GraftExtensions`;
  * UDF/UDAF registration requires a live session, hence this helper.
  */
object Graft {
  def registerAll(spark: SparkSession): Unit = {
    functions.VectorExpressions.register(spark)
    functions.StringExpressions.register(spark)
    ops.Classify.registerUdfs(spark)
    ops.Aggregates.registerUdafs(spark)
  }
}
