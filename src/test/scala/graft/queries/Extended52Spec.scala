package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-computed pins for the Croston/PCA/burstiness batch (q293–q295). */
class Extended52Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  test("q293: Croston walk on a planted 3-demand series, daily pre-sum pinned") {
    // part 1: demands day 0 (4+6=10 — two rows pin the daily sum),
    // day 2 (20), day 5 (30). α=0.2:
    //   init  z=10,  a=1
    //   step2 z=0.2·20+0.8·10=12,    a=0.2·2+0.8·1=1.2
    //   step3 z=0.2·30+0.8·12=15.6,  a=0.2·3+0.8·1.2=1.56
    //   forecast 15.6/1.56=10
    // part 2 has only 2 demand days → outside the [3,40] band, dropped.
    val dir = java.nio.file.Files.createTempDirectory("x52cr").toString
    Seq(
      (1L, 0L, 4.0), (1L, 0L, 6.0), (1L, 2L, 20.0), (1L, 5L, 30.0),
      (2L, 0L, 1.0), (2L, 1L, 1.0))
      .toDF("l_partkey", "day", "l_quantity")
      .select(col("l_partkey"),
        timestamp_seconds(col("day") * 86400).as("l_shipdate"),
        col("l_quantity"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = q("q293_croston")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 3L, 15.6, 1.56, 10.0)))
  }

  test("q294: perfectly collinear variables give r=1, pc1 ∝ (1,1,1), λ=3") {
    // y = 2x dollars, discount = x/100 → all three correlations exactly 1;
    // the power iteration fixes at (1,1,1)/√3 and Rayleigh λ rounds to 3.
    val dir = java.nio.file.Files.createTempDirectory("x52pca").toString
    Seq((1.0, 2.0, 0.01), (2.0, 4.0, 0.02), (3.0, 6.0, 0.03))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = q("q294_pca_power")(spark, dir).collect().head
    assert(r.getLong(0) == 3L)
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) == ((1.0, 1.0, 1.0)))
    val u = 0.57735 // R(1/sqrt(3), 12) re-rounded to 6
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6)) == ((u, u, u)), r)
    assert(r.getDouble(7) == 3.0 && r.getDouble(8) == 1.0)
  }

  test("q295: burstiness separates a concentrated term from an evenly spread one") {
    // D = 4 docs; "apple" ×4 in one doc → VMR (16/4 − 1)/1 = 3;
    // "the" once per doc → VMR 0.
    val dir = java.nio.file.Files.createTempDirectory("x52b").toString
    Seq((1L, "apple apple apple apple the"), (2L, "b the"),
      (3L, "c the"), (4L, "d the"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = q("q295_burstiness")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.take(2) == Seq(("apple", 1L, 4L, 3.0), ("the", 4L, 4L, 0.0)))
  }
}
