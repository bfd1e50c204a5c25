package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the shared `CROSS JOIN range(1, 1000)` tokenizer bound used by the
  * DuckDB oracles (Extended2/4/6/8, TextQueries): positions >= 1000 would be
  * SILENTLY dropped oracle-side while Spark explodes every token, so a
  * fixture document crossing the bound would surface as a mystery hash
  * mismatch (or worse, agree by accident on aggregate queries). This spec
  * turns that unpinned assumption into a loud failure at every scale factor
  * the driver verifies (sf0.01) or benches (sf0.1).
  */
class OracleTokenBoundSpec extends SparkSuite {

  private val OracleBound = 1000

  test("fixture documents stay under the range(1,1000) oracle tokenizer bound") {
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01", sf01)) {
      val mx = spark.read.parquet(s"$dir/documents.parquet")
        .agg(max(size(graft.ext.Text.tokensNorm(col("text")))))
        .head.getInt(0)
      assert(mx < OracleBound,
        s"$dir: max token count $mx >= $OracleBound — the range(1,1000) " +
          "oracles (q46/q55/q117/q126/q136/...) would silently truncate; " +
          "raise the bound in every oracle SQL before regenerating fixtures")
    }
  }
}
