package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** The q36/q299/q306/q307 family applies the `maxDf` hot-shingle guard on
  * the Spark side while their DuckDB oracles run UNGUARDED — sound only
  * while no fixture shingle is hot (a qualifying pair whose shared
  * shingles were ALL hot would be emitted by the oracle and skipped by
  * the guarded plan). ADVICE r10: pin that fixture property instead of
  * depending on it silently — if the driver ever regenerates documents
  * with boilerplate hot enough to cross BatteryMaxDf, this trips BEFORE
  * the hash gate does, with a message naming the real fix.
  */
class FixtureGuardSpec extends SparkSuite {

  test("no 3-shingle in any verify/bench fixture is hot (df > BatteryMaxDf) — the unguarded oracles stay equivalent") {
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01", sf01)) {
      val docs = Tables.load(spark, dir, "documents")
      val maxDf = Dedup.shingleRel(docs, "doc_id", "text", 3)
        .distinct()
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .agg(max(col("df"))).head().getLong(0)
      assert(maxDf <= Dedup.BatteryMaxDf,
        s"$dir has a shingle with df=$maxDf > ${Dedup.BatteryMaxDf}: the unguarded " +
          "DuckDB oracles of q36/q299/q306/q307 are no longer equivalent to the " +
          "guarded Spark plans — mirror the df guard in those oracle SQLs")
    }
  }
}
