package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-computed pins for contrastive triplet mining (q297): unit-axis
  * vectors with known cosines, the hard-negative choice (highest
  * different-label cosine, not just any), the tie-break by candidate
  * id, and the NULL-positive contract for a singleton label.
  */
class Extended54Spec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)

  test("q297: hard negatives, positives, ties, and the singleton-label NULL") {
    // v0=v1=(1,0,0) label 0; v2=(0,1,0), v3=(0.6,0.8,0) label 1;
    // v4=(0,0,1) label 2 (singleton → NULL positive).
    // cos(v0,v3)=0.6 beats cos(v0,v2)=0 → the HARD negative is v3.
    val dir = java.nio.file.Files.createTempDirectory("x54t").toString
    Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (1L, Array(1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f), 1),
      (3L, Array(0.6f, 0.8f, 0f), 1),
      (4L, Array(0f, 0f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = q("q297_triplet_mining")(spark, dir).collect()
    def t(i: Int) = {
      val r = rows(i)
      (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
        r.getLong(4), r.getInt(5), r.getDouble(6))
    }
    assert(t(0) == ((0L, 0, 1L, 1.0, 3L, 1, 0.6)))
    assert(t(1) == ((1L, 0, 0L, 1.0, 3L, 1, 0.6)))
    assert(t(2) == ((2L, 1, 3L, 0.8, 0L, 0, 0.0)))
    assert(t(3) == ((3L, 1, 2L, 0.8, 0L, 0, 0.6)))
    // margins: pos − neg where both exist
    assert(rows(0).getDouble(7) == 0.4 && rows(2).getDouble(7) == 0.8 &&
      rows(3).getDouble(7) == 0.2)
    // singleton label: NULL positive and NULL margin, hard negative still found
    val r4 = rows(4)
    assert(r4.getLong(0) == 4L && r4.isNullAt(2) && r4.isNullAt(3) &&
      r4.getLong(4) == 0L && r4.getDouble(6) == 0.0 && r4.isNullAt(7))
  }
}
