package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins for q256: a plain Scala DP replay of the DTW recurrence (same
  * per-cell 4-dp rounding), DTW's defining properties — self-distance
  * zero, symmetry under operand swap, and the elastic-beats-lockstep
  * inequality DTW ≤ lock-step L1 on equal-length series (warping can
  * only help).
  */
class Extended40Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  private def dtw(a: Array[Double], b: Array[Double]): Double = {
    val inf = 1e15
    var prev = Array.fill(a.length)(inf)
    for (j <- 1 to b.length) {
      val cur = new Array[Double](a.length)
      for (i <- 1 to a.length) {
        val diag = if (i == 1) { if (j == 1) 0.0 else inf } else prev(i - 2)
        val left = if (i == 1) inf else cur(i - 2)
        cur(i - 1) = r(math.abs(a(i - 1) - b(j - 1)) +
          math.min(prev(i - 1), math.min(diag, left)), 4)
      }
      prev = cur
    }
    prev(a.length - 1)
  }

  test("q256: DTW replays from a plain DP walk; metric properties hold") {
    val got = q("q256_dtw")(spark, sf0001).collect()
      .map(rw => ((rw.getString(0), rw.getString(1)), (rw.getLong(2), rw.getLong(3),
        rw.getDouble(4), rw.getDouble(5))))
    assert(got.length == 3, "three flag pairs")
    val series = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_returnflag",
        (year($"l_shipdate") * 10 + quarter($"l_shipdate")).cast("long").as("qk"),
        $"l_extendedprice")
      .collect()
      .map(rw => ((rw.getString(0), rw.getLong(1)),
        BigInt(r(rw.getDouble(2) * 100.0, 0).toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .groupBy(_._1._1).view
      .mapValues(_.sortBy(_._1._2).map(t => r(t._2.toDouble / 1e8, 4)).toArray)
      .toMap
    got.foreach { case ((fa, fb), (na, nb, dtwR, perStep)) =>
      val (a, b) = (series(fa), series(fb))
      assert(na == a.length && nb == b.length)
      val exp = dtw(a, b)
      assert(dtwR == r(exp, 4))
      assert(perStep == r(exp / (na + nb), 6))
      // symmetry: swapping operands gives the same distance
      assert(r(dtw(b, a), 4) == r(exp, 4))
      // self-distance is exactly zero
      assert(dtw(a, a) == 0.0 && dtw(b, b) == 0.0)
      // elasticity: DTW never exceeds the lock-step L1 on equal lengths
      if (a.length == b.length) {
        val lockstep = a.zip(b).map { case (x, y) =>
          BigDecimal(r(math.abs(x - y), 4))
        }.sum.toDouble
        assert(exp <= lockstep + 1e-9, "warping can only reduce the cost")
      }
    }
  }
}
