package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Independent replays for q263–q265: grid clustering against a plain
  * Scala union-find over the same cells, the isotonic fit against its
  * defining properties (monotone, pooling fires, mean-preserving), the
  * changepoint against a brute-force per-split SSE scan.
  */
class Extended42Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def r(x: Double, n: Int): Double = {
    val p = math.pow(10, n.toDouble)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p + 0.0
  }

  test("q263: clusters replay from a Scala union-find over the same dense cells") {
    val got = q("q263_grid_dbscan")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2)))
    // rebuild cells: same point mapping via one Spark pass (the hash is
    // engine-side), then union-find in plain Scala
    val cells = spark.read.parquet(s"$sf0001/events.parquet")
      .select(least($"value", lit(299.99)).as("x"),
        (conv(substring(md5($"event_id".cast("string")), 1, 12), 16, 10)
          .cast("double") / lit(2.81474976710656E14)).as("y"))
      .groupBy(floor($"x" / 10.0).cast("long").as("cx"),
        floor($"y" / 0.125).cast("long").as("cy"))
      .agg(count(lit(1)).as("n"))
      .collect().map(rw => ((rw.getLong(0), rw.getLong(1)), rw.getLong(2)))
    val avg = cells.map(_._2).sum.toDouble / cells.length
    val dense = cells.filter(_._2 >= 1.5 * avg).toMap
    val ids = dense.keys.map { case (cx, cy) => (cx, cy) -> (cx * 8 + cy) }.toMap
    val parent = scala.collection.mutable.Map(ids.values.map(v => v -> v).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val rt = find(parent(x)); parent(x) = rt; rt }
    for (((cx, cy), _) <- dense; dx <- -1L to 1L; dy <- -1L to 1L
         if (dx, dy) != ((0L, 0L)) && dense.contains((cx + dx, cy + dy))) {
      val (a, b) = (find(ids((cx, cy))), find(ids((cx + dx, cy + dy))))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    // toSeq first: mapping the Map directly would collapse cells sharing
    // a root into one entry and lose their counts
    val expSet = dense.toSeq.map { case (c, n) => (find(ids(c)), n) }
      .groupBy(_._1).map { case (root, xs) =>
        // root is the component min: unions always point larger to smaller
        (root, xs.size.toLong, xs.map(_._2).sum)
      }.toSet
    val noiseCells = cells.filter(_._2 < 1.5 * avg)
    val gotClusters = got.filter(_._1 >= 0).toSet
    assert(gotClusters == expSet)
    val noiseRow = got.find(_._1 == -1L).get
    assert(noiseRow._2 == noiseCells.length && noiseRow._3 == noiseCells.map(_._2).sum)
    assert(gotClusters.nonEmpty && noiseCells.nonEmpty, "non-vacuous split")
    assert(gotClusters.exists(_._2 > 1), "at least one multi-cell cluster")
  }

  test("q264: isotonic fit is monotone, pooled, and mean-preserving") {
    val rows = q("q264_isotonic")(spark, sf0001).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getDouble(2), rw.getDouble(3)))
    assert(rows.length == 20, "all 20 bins populated")
    val fits = rows.map(_._4)
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b }, "monotone")
    assert(rows.exists(t => t._3 != t._4), "pooling fired on fluctuating rates")
    // PAVA preserves the weighted mean (up to the 6-dp output rounding)
    val wSum = rows.map(_._2).sum.toDouble
    val rawMean = rows.map(t => t._2 * t._3).sum / wSum
    val fitMean = rows.map(t => t._2 * t._4).sum / wSum
    assert(math.abs(rawMean - fitMean) < 1e-4)
    // fits live inside the raw range
    assert(fits.min >= rows.map(_._3).min - 1e-9 &&
      fits.max <= rows.map(_._3).max + 1e-9)
  }

  test("q265: split day matches a brute-force SSE scan") {
    val row = q("q265_changepoint")(spark, sf0001).collect().head
    val daily = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(sum($"value").as("x"))
      .orderBy("day")
      .collect().map(rw => (rw.getString(0), r(rw.getDouble(1), 2)))
    val xs = daily.map(_._2)
    def sse(a: Array[Double]): Double = {
      val m = a.sum / a.length
      a.map(v => (v - m) * (v - m)).sum
    }
    val total = sse(xs)
    val best = (1 until xs.length).map { t =>
      (t, total - sse(xs.take(t)) - sse(xs.drop(t)))
    }.maxBy { case (t, g) => (r(g, 4), -t) }
    // double-accumulation order differs from the exact DECIMAL prefix sums;
    // compare at a 1e-2 tolerance and pin the argmax day exactly
    assert(row.getString(0) == daily(best._1 - 1)._1)
    assert(row.getLong(1) == best._1 && row.getLong(2) == xs.length)
    assert(math.abs(row.getDouble(3) - r(best._2, 4)) < 1e-2)
  }
}
