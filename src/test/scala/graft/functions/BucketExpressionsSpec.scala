package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BucketExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("cell_bucket ≡ the when-chain it replaced, on randomized values incl. exact-boundary hits") {
    val rnd = new scala.util.Random(42)
    val bounds = Array.fill(63)(rnd.nextDouble() * 200 - 100).distinct.sorted
    // values: random, every bound exactly, just-below/above bounds, extremes
    val vals = (Array.fill(2000)(rnd.nextDouble() * 220 - 110) ++
      bounds ++ bounds.map(_ - 1e-9) ++ bounds.map(_ + 1e-9) ++
      Array(-1e18, 1e18, 0.0)).toSeq
    val df = vals.toDF("v")
    val chain = bounds.toSeq.map(b => when(col("v") > lit(b), 1).otherwise(0)).reduce(_ + _)
    val diverged = df
      .select(col("v"), chain.as("want"),
        BucketExpressions.cellBucket(spark, col("v"), bounds).as("got"))
      .filter(col("want") =!= col("got")).collect()
    assert(diverged.isEmpty,
      s"cell_bucket diverged from the when-chain at: ${diverged.take(5).mkString(", ")}")
  }

  test("cell_bucket edge semantics: NaN → last cell; ±0.0 share a cell; empty handled by caller") {
    val bounds = Array(-1.0, 0.0, 1.0)
    val got = Seq(Double.NaN, -0.0, 0.0, -2.0, 2.0).toDF("v")
      .select(col("v"), BucketExpressions.cellBucket(spark, col("v"), bounds).as("c"))
      .collect().map(r => r.getInt(1)).toSeq
    assert(got == Seq(3, 1, 1, 0, 3), s"got $got")
    // -0.0 in BOUNDS is normalized too: a 0.0 key must not straddle
    val gotNeg = Seq(0.0, -0.0).toDF("v")
      .select(BucketExpressions.cellBucket(spark, col("v"), Array(-1.0, -0.0, 1.0)).as("c"))
      .collect().map(_.getInt(0)).toSeq
    assert(gotNeg == Seq(1, 1), s"got $gotNeg")
  }

  test("cell_bucket survives interpreted eval (nullSafeEval path) identically") {
    val bounds = Array(1.0, 2.0, 3.0)
    for (v <- Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5))
      assert(CellBucket.search(bounds.map(_ + 0.0), v) ==
        bounds.count(v > _), s"mismatch at $v")
  }
}
