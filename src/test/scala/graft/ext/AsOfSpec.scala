package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq( // (key, ts, id, px)
    (1L, ts("2024-01-01 10:00:00"), 100L, 10.0),
    (1L, ts("2024-01-01 10:05:00"), 101L, 11.0),
    (1L, ts("2024-01-01 10:05:00"), 102L, 12.0), // same-ts dup: highest id wins
    (2L, ts("2024-01-01 09:00:00"), 103L, 99.0)
  ).toDF("k", "ts", "qid", "px")

  private val trades = Seq( // (key, ts, id)
    (1L, ts("2024-01-01 10:03:00"), 1L), // after first quote
    (1L, ts("2024-01-01 10:05:00"), 2L), // equal ts → as-of-or-equal match
    (1L, ts("2024-01-01 09:00:00"), 3L), // before any quote → null
    (3L, ts("2024-01-01 12:00:00"), 4L) // key with no quotes → null
  ).toDF("k", "ts", "tid")

  test("as-of join picks latest right row at-or-before, deterministic on ties") {
    val out = AsOf.asofJoin(trades, quotes, "k", "ts", Seq("px"), "qid")
      .collect().map(r => r.getAs[Long]("tid") -> Option(r.getAs[Any]("asof_px"))).toMap
    assert(out == Map(
      1L -> Some(10.0), // latest quote before 10:03
      2L -> Some(12.0), // equal-ts: quote included, highest qid wins
      3L -> None,
      4L -> None))
  }

  test("matches a brute-force reference on random inputs (pinned seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    for (seed <- Seq(21L, 22L)) {
      def gen(n: Int, s: Long) =
        Gen.listOfN(n, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 1000L)))
          .apply(Gen.Parameters.default, Seed(s)).get
      val qs = gen(60, seed).zipWithIndex
        .map { case ((k, t), i) => (k, new Timestamp(t * 1000), i.toLong, i * 1.5) }
      val tr = gen(40, seed + 100).zipWithIndex
        .map { case ((k, t), i) => (k, new Timestamp(t * 1000), i.toLong) }
      val out = AsOf
        .asofJoin(tr.toDF("k", "ts", "tid"), qs.toDF("k", "ts", "qid", "px"),
          "k", "ts", Seq("px"), "qid", toleranceSec = Some(200L))
        .collect()
        .map(r => r.getAs[Long]("tid") -> Option(r.getAs[Any]("asof_px")))
        .toMap
      // brute force: latest at-or-before within tolerance; ties on ts
      // break to the HIGHEST quote id
      val expected = tr.map { case (k, t, tid) =>
        val cands = qs.filter(q => q._1 == k && !q._2.after(t) &&
          (t.getTime - q._2.getTime) / 1000 <= 200L)
        tid -> cands.sortBy(q => (q._2.getTime, q._3)).lastOption.map(_._4)
      }.toMap
      assert(out == expected, s"seed $seed")
    }
  }

  test("tolerance nulls out stale matches") {
    val out = AsOf.asofJoin(trades, quotes, "k", "ts", Seq("px"), "qid", toleranceSec = Some(60))
      .collect().map(r => r.getAs[Long]("tid") -> Option(r.getAs[Any]("asof_px"))).toMap
    // trade 1 is 180s after quote 100 → stale; trade 2 matches at 0s
    assert(out(1L).isEmpty && out(2L) == Some(12.0))
  }

  test("left columns are preserved verbatim") {
    val out = AsOf.asofJoin(trades, quotes, "k", "ts", Seq("px"), "qid")
    assert(out.columns.toSeq == Seq("k", "ts", "tid", "asof_ts", "asof_px"))
    assert(out.count() == 4)
  }
}
