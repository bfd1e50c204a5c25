package graft

import org.apache.spark.sql.functions._

/** Empty-input and degenerate-input behavior of the custom operators —
  * the failure class that surfaces in production when a filter upstream
  * drops everything.
  */
class EdgeCaseSpec extends SparkSuite {
  import spark.implicits._

  test("prefixJaccardJoin with an empty probe side returns empty, no crash") {
    val probe = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(graft.ext.Dedup.prefixJaccardJoin(probe, corpus, "doc_id", "text", 9, 10)
      .count() == 0)
  }

  test("prefixJaccardPairs: single doc and whitespace-only docs produce no pairs") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    assert(graft.ext.Dedup.prefixJaccardPairs(docs, "doc_id", "text", 4, 5).count() == 0)
  }

  test("Ckpt on an empty DataFrame preserves schema and emptiness") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val out = graft.ops.Ckpt(empty)
    assert(out.columns.toSeq == Seq("k", "v") && out.count() == 0)
  }

  test("connectedComponents on an empty pair set returns an empty mapping") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(graft.ext.Dedup.connectedComponents(empty).count() == 0)
  }

  test("packGreedy on empty input returns empty with the right schema") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("doc_id", "bucket", "n_tokens")
    val out = graft.ext.Pack.packGreedy(empty, "doc_id", "n_tokens", "bucket", 256L)
    assert(out.columns.toSeq == Seq("doc_id", "bucket", "bin_id", "n_tokens"))
    assert(out.count() == 0)
  }

  test("profile on zero rows reports 0 counts and null min/max") {
    val empty = Seq.empty[(Long, String)].toDF("x", "s")
    val rows = graft.ops.Profile.profile(empty, Seq("x", "s")).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
      assert(r.isNullAt(4) && r.isNullAt(5))
    }
  }

  test("bloomSemiJoin with an empty key side returns no rows") {
    val large = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val keys = Seq.empty[Long].toDF("k")
    assert(graft.ops.Scale.bloomSemiJoin(large, keys, "k", 100L, 0.01).count() == 0)
  }

  test("mode aggregates on all-null groups yield null, not a crash") {
    val df = Seq(("g1", null: String), ("g1", null: String)).toDF("k", "v")
    val det = graft.ops.Aggregates.modeDeterministic(df, Seq("k"), "v", "m").collect()
    assert(det.forall(r => r.isNullAt(1)) || det.isEmpty)
  }
}
