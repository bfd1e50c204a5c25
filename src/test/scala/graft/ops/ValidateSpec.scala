package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (Some(1.0), "ok"),
    (Some(200.0), "ok"), // range violation
    (None, "ok") // null violation (counts against both checks)
  ).toDF("x", "s")

  test("gate passes clean data through unchanged") {
    val clean = Seq((1.0, "a"), (2.0, "b")).toDF("x", "s")
    val out = Validate.gate(clean, Validate.notNull(Seq("x", "s")) :+ Validate.inRange("x", 0, 10))
    assert(out.count() == 2)
  }

  test("gate throws listing EVERY failed check with violation counts") {
    val checks = Validate.notNull(Seq("x")) :+ Validate.inRange("x", 0, 100)
    val e = intercept[Validate.ValidationException](Validate.gate(df, checks))
    val byName = e.failed.map(f => f.name -> f.violations).toMap
    assert(byName == Map("not_null(x)" -> 1L, "range(x,0.0,100.0)" -> 2L))
  }

  test("violationCounts is one aggregate pass and reports only failures") {
    val res = Validate.violationCounts(df, Validate.notNull(Seq("s")) :+ Validate.inRange("x", 0, 300))
    assert(res.map(f => f.name -> f.violations).toMap == Map("range(x,0.0,300.0)" -> 1L))
  }
}
