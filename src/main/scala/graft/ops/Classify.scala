package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket classification (P8). The reference's `classify_wind`
  * (v5_group_project_dag.py:113-141) converts km/h → m/s then walks an
  * if/elif chain of *overlapping* `<=` bounds — first match wins — and a
  * negative speed falls through every branch, returning Python None.
  *
  * Implemented as a chained `when()` Catalyst expression (first-match is
  * exactly `when` semantics), which stays inside whole-stage codegen. A
  * Scala-closure `udf` twin is also provided to exercise the UDF
  * registration surface, but the expression form is the default everywhere.
  */
object Classify {

  /** Generic first-match bucketizer: (condition, label) pairs in priority
    * order; anything matching no branch → NULL.
    */
  def bucketize(branches: Seq[(Column, String)]): Column =
    branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
      case (acc, (cond, label)) => acc.when(cond, label)
    } // no otherwise -> null on fall-through

  /** (lo, hi, label) with inclusive ends, first-match-wins; hi=None = unbounded. */
  val windBucketsMs: Seq[(Double, Option[Double], String)] = Seq(
    (0.0, Some(1.5), "Calm"),
    (1.5, Some(3.3), "Light Air"),
    (3.3, Some(5.4), "Light Breeze"),
    (5.4, Some(7.9), "Gentle Breeze"),
    (7.9, Some(10.7), "Moderate Breeze"),
    (10.7, Some(13.8), "Fresh Breeze"),
    (13.8, Some(17.1), "Strong Breeze"),
    (17.1, Some(20.7), "Near Gale"),
    (20.7, Some(24.4), "Gale"),
    (24.4, Some(28.4), "Strong Gale"),
    (28.4, Some(32.6), "Storm"),
    (32.6, None, "Violent Storm"))

  /** P7+P8: km/h input, classification on the m/s value. */
  def classifyWind(kmh: Column): Column = {
    val ms = kmh * 1000 / 3600
    bucketize(windBucketsMs.map { case (lo, hi, label) =>
      (hi.map(h => ms >= lo && ms <= h).getOrElse(ms >= lo), label)
    })
  }

  /** Closure twin of [[classifyWind]] (same first-match semantics,
    * negative → null via Option). Registered for the SQL surface as
    * `classify_wind`; prefer the expression form in plans.
    */
  def classifyWindScala(kmh: Double): Option[String] = {
    val ms = kmh * 1000 / 3600
    windBucketsMs.collectFirst {
      case (lo, hi, label) if ms >= lo && hi.forall(ms <= _) => label
    }
  }

  def registerUdfs(spark: SparkSession): Unit =
    spark.udf.register("classify_wind", (kmh: Double) => classifyWindScala(kmh).orNull)
}
