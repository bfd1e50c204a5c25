package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-computed semantics pins for the rank/CF/link-prediction/
  * jackknife/streaks/confusion batch (q283–q288): each test plants a
  * fixture small enough to verify by hand, covering the contracts the
  * sf oracles can't isolate (tie-averaged ranks, basket symmetry, the
  * closed-form jackknife identities, island splitting, and the
  * never-predicted-class row).
  */
class Extended50Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  private def round6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6 + 0.0

  private def liDir(rows: Seq[(String, Double, Double, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("x50li").toString
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q283: tie-averaged ranks give rho=+1 / -1 on monotone groups") {
    // group A: y increases with x, SAME tie structure (both tie at rank
    // 2/3 → averaged 2.5) — Spearman exactly 1 even though Pearson on
    // raw values isn't; group N: strictly decreasing — exactly -1.
    val dir = liDir(Seq(
      ("A", 1.0, 10.0, 0.0), ("A", 2.0, 20.0, 0.0),
      ("A", 2.0, 20.0, 0.0), ("A", 3.0, 40.0, 0.0),
      ("N", 1.0, 30.0, 0.0), ("N", 2.0, 20.0, 0.0), ("N", 3.0, 10.0, 0.0)))
    val got = q("q283_spearman")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("A", 4L, 1.0), ("N", 3L, -1.0)))
  }

  private def basketDir(baskets: Seq[(Long, Long)]): String = {
    // one order per user; lineitem carries the (user, part) membership
    val dir = java.nio.file.Files.createTempDirectory("x50cf").toString
    baskets.map(_._1).distinct.map(u => (u * 10, u))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    baskets.map { case (u, p) => (u * 10, p) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q284: cosine neighbors from co-purchase counts, min-support prune pinned") {
    // u1:{1,2}, u2:{1,2}, u3:{1,3}, u4:{1,3,4} → n₁=4, n₂=2, n₃=2, n₄=1
    // co(1,2)=co(1,3)=2 → cos 2/√8 each (tie broken by neighbor key);
    // co(1,4)=co(3,4)=1 → BELOW MinCo=2, pruned — part 4 emits nothing.
    val dir = basketDir(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L), (4L, 4L)))
    val got = q("q284_item_cf")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val c = round6(2.0 / math.sqrt(8.0))
    assert(got.toSeq == Seq(
      (1L, 1, 2L, 2L, c),
      (1L, 2, 3L, 2L, c),
      (2L, 1, 1L, 2L, c),
      (3L, 1, 1L, 2L, c)))
  }

  test("q285: Adamic-Adar sums rounded 1/ln(df) over shared rare parts") {
    // p1 bought by {u1,u2,u3} (df 3), p2 by {u1,u2} (df 2):
    // AA(u1,u2) = 1/ln3 + 1/ln2; AA(u1,u3) = AA(u2,u3) = 1/ln3
    val dir = basketDir(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L)))
    def t(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e12 + 0.5) / 1e12
    val got = q("q285_adamic_adar")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, round6(t(1.0 / math.log(3.0)) + t(1.0 / math.log(2.0)))),
      (1L, 3L, 1L, round6(t(1.0 / math.log(3.0)))),
      (2L, 3L, 1L, round6(t(1.0 / math.log(3.0))))))
  }

  test("q286: delete-1 jackknife identities on a 2-row group") {
    // r=[2,4], q=[1,1]: θ=3, replicates {4,2} → mean 3, bias 0,
    // var = (1/2)·((4−3)²+(2−3)²) = 1 → SE 1
    val dir = liDir(Seq(("A", 1.0, 2.0, 0.0), ("A", 1.0, 4.0, 0.0)))
    val got = q("q286_jackknife")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(("A", 2L, 3.0, 0.0, 1.0)))
  }

  test("q287: islands split on gaps; longest/total/count per user") {
    // user 1 active on days {0,1,2,5,6} → streaks 3+2; user 2 on {10}
    val dir = java.nio.file.Files.createTempDirectory("x50ev").toString
    Seq((1L, 0L), (1L, 1L), (1L, 2L), (1L, 5L), (1L, 6L), (1L, 6L), (2L, 10L))
      .toDF("user_id", "day")
      .select(col("user_id"),
        timestamp_seconds(col("day") * 86400 + 3600).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = q("q287_streaks")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 5L, 2L), (2L, 1L, 1L, 1L)))
  }

  test("q288: confusion matrix keeps never-predicted and spurious classes") {
    // gold en predicted en (stopword hit); gold de predicted und (no
    // signal) → classes {de, en, und}: en P=R=F1=1; de R=0, P/F1 NULL
    // (never predicted); und P=0, R/F1 NULL (no gold rows).
    // macro-F1 = (1+0+0)/3.
    val dir = java.nio.file.Files.createTempDirectory("x50doc").toString
    Seq((1L, "the and of", "en"), (2L, "12345 67890", "de"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = q("q288_confusion")(spark, dir).collect()
    val byCls = rows.map(r => r.getString(0) -> r).toMap
    assert(rows.length == 3 && byCls.keySet == Set("de", "en", "und"))
    val en = byCls("en")
    assert((en.getLong(1), en.getLong(2), en.getLong(3)) == ((1L, 1L, 1L)))
    assert((en.getDouble(4), en.getDouble(5), en.getDouble(6)) == ((1.0, 1.0, 1.0)))
    val de = byCls("de")
    assert((de.getLong(1), de.getLong(2), de.getLong(3)) == ((1L, 0L, 0L)))
    assert(de.isNullAt(4) && de.getDouble(5) == 0.0 && de.isNullAt(6))
    val und = byCls("und")
    assert((und.getLong(1), und.getLong(2), und.getLong(3)) == ((0L, 1L, 0L)))
    assert(und.getDouble(4) == 0.0 && und.isNullAt(5) && und.isNullAt(6))
    assert(rows.forall(_.getDouble(7) == round6(1.0 / 3.0)))
  }
}
