package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ClassifySpec extends SparkSuite {
  import spark.implicits._

  private def classify(kmh: Seq[Double]): Seq[Option[String]] =
    kmh.toDF("w")
      .select(Classify.classifyWind($"w").as("c"))
      .collect()
      .map(r => Option(r.getString(0))).toSeq

  /** Deterministic scalacheck sample (no scalatestplus bridge in the
    * offline cache — drive Gen directly with a pinned seed).
    */
  private def sample(lo: Double, hi: Double, n: Int, seed: Long): List[Double] =
    Gen.listOfN(n, Gen.choose(lo, hi)).apply(Gen.Parameters.default, Seed(seed)).get

  test("hand-pinned buckets incl. boundaries and negative fall-through") {
    // 10 km/h = 2.78 m/s → Light Air; 0 → Calm; 150 km/h = 41.7 m/s →
    // Violent Storm; negative falls through all branches → null
    // (v5_group_project_dag.py:113-141)
    assert(classify(Seq(10.0, 0.0, 150.0, -1.0)) ==
      Seq(Some("Light Air"), Some("Calm"), Some("Violent Storm"), None))
  }

  test("expression twin ≡ Scala closure twin on random inputs (first-match parity)") {
    val xs = sample(-10.0, 200.0, 200, 42L)
    assert(classify(xs) == xs.map(Classify.classifyWindScala))
  }

  test("boundary speeds agree with the reference's overlapping <= chain") {
    // bucket boundary values in km/h (m/s bound * 3.6) — first-match wins,
    // and any binary rounding must match Python's identical IEEE math,
    // which classifyWindScala reproduces
    val bounds = Classify.windBucketsMs.flatMap { case (lo, hi, _) => Seq(lo) ++ hi }
      .map(_ * 3.6).distinct
    assert(classify(bounds) == bounds.map(Classify.classifyWindScala))
  }

  test("totality: every non-negative speed gets a label") {
    val xs = sample(0.0, 1500.0, 200, 7L)
    assert(classify(xs).forall(_.isDefined))
  }

  test("registered SQL UDF surface matches the expression") {
    Classify.registerUdfs(spark)
    val viaUdf = Seq(10.0, 0.0, 150.0).toDF("w")
      .selectExpr("classify_wind(w) AS c").collect().map(_.getString(0))
    assert(viaUdf.toSeq == Seq("Light Air", "Calm", "Violent Storm"))
  }
}
