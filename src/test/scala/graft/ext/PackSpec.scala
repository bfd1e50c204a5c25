package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PackSpec extends SparkSuite {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long, Long)], cap: Long) =
    Pack
      .packGreedy(rows.toDF("doc_id", "bucket", "n_tokens"),
        "doc_id", "n_tokens", "bucket", cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
      .toSeq

  test("greedy fill: new bin exactly when capacity would overflow") {
    // capacity 10: [4,4] -> bin0 (fill 8), 3 overflows -> bin1, 7 fits
    // with 3? 3+7=10 <= 10 -> bin1, then 1 overflows -> bin2
    val out = pack(
      Seq((1L, 0L, 4L), (2L, 0L, 4L), (3L, 0L, 3L), (4L, 0L, 7L), (5L, 0L, 1L)),
      cap = 10L)
    assert(out.map(r => r._1 -> r._3) ==
      Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("oversized doc gets its own bin; packing resumes after it") {
    val out = pack(Seq((1L, 0L, 3L), (2L, 0L, 99L), (3L, 0L, 3L), (4L, 0L, 3L)),
      cap = 10L)
    assert(out.map(r => r._1 -> r._3) ==
      Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("bin ids are bucket-scoped and buckets pack independently") {
    val out = pack(Seq((1L, 0L, 6L), (2L, 1L, 6L), (3L, 0L, 6L), (4L, 1L, 2L)),
      cap = 10L)
    assert(out == Seq((1L, 0L, 0L, 6L), (2L, 1L, 0L, 6L), (3L, 0L, 1L, 6L),
      (4L, 1L, 0L, 2L)))
  }

  test("matches a sequential greedy replay on random inputs (pinned seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    for (seed <- Seq(11L, 12L)) {
      val docs = Gen.listOfN(80, Gen.zip(Gen.choose(0L, 3L), Gen.choose(1L, 30L)))
        .apply(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case ((bucket, n), i) => (i.toLong, bucket, n) }
      val got = pack(docs, cap = 40L)
      // sequential reference: per bucket in id order
      val expected = docs.groupBy(_._2).toSeq.flatMap { case (bucket, ds) =>
        var bin = 0L; var fill = 0L; var first = true
        ds.sortBy(_._1).map { case (id, _, n) =>
          if (first) { fill = n; first = false }
          else if (fill + n <= 40L) fill += n
          else { bin += 1; fill = n }
          (id, bucket, bin, n)
        }
      }.sortBy(_._1)
      assert(got == expected, s"seed $seed")
    }
  }

  test("no bin exceeds capacity unless it holds a single oversized doc") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("bucket"),
        size(Text.tokensNorm(col("text"))).cast("long").as("n_tokens"))
    val fills = Pack.packGreedy(docs, "doc_id", "n_tokens", "bucket", 256L)
      .groupBy("bucket", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
      .collect()
    assert(fills.nonEmpty)
    fills.foreach { r =>
      assert(r.getAs[Long]("fill") <= 256L || r.getAs[Long]("n_docs") == 1L,
        s"overfull multi-doc bin: $r")
    }
  }
}
