package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for the round-8 ninth batch (q209–q210): independent replays plus
  * each query's defining invariant — the profiler's per-column stats must
  * match a direct per-column scan including the top-value tie rule
  * (q209), and the correlation matrix must be symmetric-consistent with
  * independently computed pairwise correlations, diagonal-free, and
  * bounded by [−1, 1] (q210).
  */
class Extended25Spec extends SparkSuite {
  import spark.implicits._

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q209: profile equals a direct per-column replay; top value breaks ties upward") {
    // doubles render through the query's explicit %.6f contract (engine
    // casts diverge into E-notation at wide ranges; see q209's scaladoc)
    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(format_string("%.6f", $"l_quantity"), format_string("%.6f", $"l_discount"),
        $"l_returnflag", $"l_linestatus",
        date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss"))
      .collect().map(row => Seq(row.getString(0), row.getString(1),
        row.getString(2), row.getString(3), row.getString(4)))
    val names = Seq("l_quantity", "l_discount", "l_returnflag", "l_linestatus",
      "l_shipdate")
    val expected = names.zipWithIndex.map { case (cn, i) =>
      val vs = rows.map(_(i))
      val nonNull = vs.filter(_ != null)
      val hist = nonNull.groupBy(identity).view.mapValues(_.length).toMap
      val top = hist.toSeq.maxBy { case (v, c) => (c, v) } // count, then value
      (cn, vs.length.toLong, (vs.length - nonNull.length).toLong,
        r((vs.length - nonNull.length).toDouble / vs.length, 6),
        hist.size.toLong, nonNull.min, nonNull.max, top._1,
        r(top._2.toDouble / vs.length, 6))
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("q209_column_profile")(spark, sf0001)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getDouble(3), row.getLong(4), row.getString(5), row.getString(6),
        row.getString(7), row.getDouble(8))).toSeq
    assert(got == expected)
    // every column profiled exactly once from the single pass
    assert(got.map(_._1) == names.sorted)
    assert(got.forall(_._2 == rows.length.toLong))
  }

  test("q210: matrix equals independent pairwise correlations; bounded; no diagonal") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val data = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(cols.map(c => col(c)): _*).collect()
      .map(row => cols.indices.map(i => BigDecimal(r(row.getDouble(i), 4))))
    val expected = (for { a <- cols; b <- cols if a < b } yield {
      val (i, j) = (cols.indexOf(a), cols.indexOf(b))
      val n = BigDecimal(data.length)
      val sa = data.map(_(i)).sum; val sb = data.map(_(j)).sum
      val qab = data.map(x => x(i) * x(j)).sum
      val qaa = data.map(x => x(i) * x(i)).sum
      val qbb = data.map(x => x(j) * x(j)).sum
      val corr = (n * qab - sa * sb).toDouble /
        math.sqrt(((n * qaa - sa * sa) * (n * qbb - sb * sb)).toDouble)
      (a, b, data.length.toLong, r(corr, 6))
    }).sortBy(x => (x._1, x._2)).toSeq
    val got = graft.SparkEntry.queries("q210_corr_matrix")(spark, sf0001).collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2),
        row.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.size == 6, "4 columns yield exactly 6 upper-triangle pairs")
    assert(got.forall(x => x._4 >= -1.0 && x._4 <= 1.0))
    assert(got.forall(x => x._1 < x._2), "long form must stay strictly upper-triangle")
  }
}
