package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Quantiles.exactPercentileValues must be BIT-IDENTICAL to Spark's exact
  * `percentile`/`median` aggregate — it replaces them in q10/q266, whose
  * outputs sit under the driver's hash gate, so "close" is a regression.
  * Inputs are magnitude-adversarial (1e-13 .. 1e17, negatives, heavy
  * ties, even/odd counts, sizes that land integral and fractional
  * interpolation positions); the fixture column check runs the real
  * lineitem relation the swapped queries read.
  */
class PercentileParitySpec extends SparkSuite {

  private def check(vals: Seq[Double], probs: Seq[Double], cells: Int): Unit = {
    import spark.implicits._
    val df = vals.toDF("v")
    val want = df
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))"))
      .head().getSeq[Double](0)
    val got = Quantiles.exactPercentileValues(df, col("v"), probs, cells)
    want.zip(got).zipWithIndex.foreach { case ((w, g), i) =>
      assert(java.lang.Double.doubleToLongBits(w) ==
        java.lang.Double.doubleToLongBits(g),
        s"prob ${probs(i)}: percentile=$w exactPercentileValues=$g (cells=$cells, n=${vals.size})")
    }
  }

  private val probs = Seq(0.0, 0.05, 1.0 / 3.0, 0.5, 0.95, 0.99, 1.0)

  test("bit-parity with percentile() on adversarial inputs") {
    val rnd = new scala.util.Random(7)
    val datasets = Seq(
      (1 to 7).map(_ => rnd.nextDouble() * 1e9),
      (1 to 10).map(_ => rnd.nextDouble() * 1e-7),
      Seq(1.0, 1e17, -3.7, 2.5e-13, 99.0, 7.0),
      (1 to 101).map(_ => rnd.nextGaussian() * 1e6),
      (1 to 1000).map(_ => rnd.nextDouble() * 2e4 - 1e4),
      // heavy ties: small-integer domain (one hot value can span cells'
      // boundary ranks — equal values must interpolate to themselves)
      (1 to 500).map(_ => rnd.nextInt(5).toDouble),
      Seq(42.0),
      Seq(1.0, 2.0))
    for (ds <- datasets; cells <- Seq(1, 4, 64)) check(ds, probs, cells)
  }

  test("nulls are skipped exactly like the aggregate skips them") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, null, 3.0, null, 2.0, 100.0).toDF("v")
    val want = df.agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    val got = Quantiles.exactPercentileValues(df, col("v"), Seq(0.5), 4).head
    assert(java.lang.Double.doubleToLongBits(want) ==
      java.lang.Double.doubleToLongBits(got))
  }

  test("per-key parity with the grouped percentile aggregate (q137/q94 shape)") {
    val li = graft.Tables.load(spark, sf0001, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("x"))
    val want = li.groupBy("flag")
      .agg(expr("percentile(x, array(0.5, 0.95, 0.99))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val got = Quantiles.exactPercentilesByKey(
        li, Seq("flag"), col("x"), Seq(0.5, 0.95, 0.99), Seq("p50", "p95", "p99"))
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(want.keySet == got.keySet)
    for (k <- want.keySet; (w, g) <- want(k).zip(got(k)))
      assert(java.lang.Double.doubleToLongBits(w) ==
        java.lang.Double.doubleToLongBits(g), s"key $k: $w vs $g")
  }

  test("exactPercentileBounds feeds the quantile_cont frac form (q232 shape)") {
    import spark.implicits._
    val vals = (1 to 57).map(_.toDouble * 1.37)
    val df = vals.toDF("v")
    for (n <- Seq(56, 57)) { // even and odd counts
      val ds = vals.take(n)
      val sorted = ds.sorted
      val pos = 0.5 * (n - 1)
      val expect = sorted(math.floor(pos).toInt) +
        (pos - math.floor(pos)) *
          (sorted(math.ceil(pos).toInt) - sorted(math.floor(pos).toInt))
      val Seq((gpos, lo, hi)) = Quantiles.exactPercentileBounds(
        ds.toDF("v"), col("v"), Seq(0.5), 4)
      val got = lo + (gpos - math.floor(gpos)) * (hi - lo)
      assert(java.lang.Double.doubleToLongBits(expect) ==
        java.lang.Double.doubleToLongBits(got))
    }
    val _ = df // keep one DF construction on the default path
  }

  test("parity on the real fixture column q10/q266 read") {
    val g = graft.Tables.load(spark, sf0001, "lineitem")
      .select(when(col("l_extendedprice").between(1000, 50000),
        col("l_extendedprice")).as("v"))
    val want = g.agg(expr("percentile(v, array(0.5, 0.95))")).head().getSeq[Double](0)
    val got = Quantiles.exactPercentileValues(g, col("v"), Seq(0.5, 0.95))
    want.zip(got).foreach { case (w, x) =>
      assert(java.lang.Double.doubleToLongBits(w) ==
        java.lang.Double.doubleToLongBits(x))
    }
  }
}
