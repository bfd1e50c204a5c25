package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for Holt–Winters (q296): a 2-month hand computation and an
  * independent plain-Scala replay of the full recurrence (incl. the
  * 12-slot seasonal ring wrap) on a 26-month planted series.
  */
class Extended53Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r4(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e4 + 0.5) / 1e4 + 0.0

  /** Independent replay of the exact contract: l₁=y₁, b₁=0, zero
    * seasonal init; rounded steps; ring pops head / pushes tail.
    */
  private def walk(ys: Seq[Double]): (Double, Double, Vector[Double]) = {
    var l = 0.0; var b = 0.0; var s = Vector.fill(12)(0.0)
    ys.zipWithIndex.foreach { case (y, i) =>
      if (i == 0) { l = y; b = 0.0; s = s.tail :+ 0.0 }
      else {
        val sp = s.head
        val l2 = r4(0.3 * (y - sp) + 0.7 * (l + b))
        val b2 = r4(0.1 * (l2 - l) + 0.9 * b)
        val sn = r4(0.2 * (y - l2) + 0.8 * sp)
        l = l2; b = b2; s = s.tail :+ sn
      }
    }
    (l, b, s)
  }

  private def writeSeries(dir: String, rows: Seq[(String, String, Double)]): Unit =
    rows.toDF("l_returnflag", "d", "l_extendedprice")
      .select(col("l_returnflag"), to_timestamp(col("d")).as("l_shipdate"),
        col("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  test("q296: two-month hand computation (level 1300, trend 30, flat seasonals)") {
    val dir = java.nio.file.Files.createTempDirectory("x53a").toString
    writeSeries(dir, Seq(("A", "2000-01-15", 10.0), ("A", "2000-02-15", 20.0)))
    val r = q("q296_holt_winters")(spark, dir).collect().head
    // cents: y = 1000, 2000 → l₂ = 0.3·2000 + 0.7·1000 = 1300, b₂ = 30;
    // ring still zeros at positions 1–3 → fc_h = l + h·b
    assert((r.getString(0), r.getLong(1)) == (("A", 2L)))
    assert((r.getDouble(2), r.getDouble(3)) == ((1300.0, 30.0)))
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6)) == ((1330.0, 1360.0, 1390.0)))
  }

  test("q296: 26-month series matches the independent replay through the ring wrap") {
    val months = (0 until 26).map { i =>
      val ym = f"${2000 + i / 12}%04d-${i % 12 + 1}%02d-15"
      val cents = 100000.0 + 13700.0 * (i % 5) + 1000.0 * i
      (ym, cents)
    }
    val dir = java.nio.file.Files.createTempDirectory("x53b").toString
    writeSeries(dir, months.map { case (d, c) => ("A", d, c / 100.0) })
    val (l, b, s) = walk(months.map(_._2))
    val r = q("q296_holt_winters")(spark, dir).collect().head
    assert(r.getLong(1) == 26L)
    assert(r.getDouble(2) == r4(l) && r.getDouble(3) == r4(b), r)
    assert(r.getDouble(4) == r4(l + 1.0 * b + s(0)), r)
    assert(r.getDouble(5) == r4(l + 2.0 * b + s(1)), r)
    assert(r.getDouble(6) == r4(l + 3.0 * b + s(2)), r)
  }
}
