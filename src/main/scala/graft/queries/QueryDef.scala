package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark plan over the fixture tables plus an
  * equivalent ANSI/DuckDB SQL oracle (None for ops whose results depend on
  * Spark-internal choices — e.g. murmur/xxhash signatures, approximate
  * sketches — where the driver records a weaker rows-only check).
  *
  * Determinism contract (driver hashes values after sorting columns by
  * name): every oracled query ends in a total ORDER BY, aliases every
  * computed column identically on both sides, renders date/timestamp keys
  * as strings, and rounds floating-point outputs (both sides with
  * half-away-from-zero semantics) so cross-engine summation-order noise
  * cannot flip the hash.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Best-effort recursive delete for streaming queries' per-invocation
    * scratch dirs (stream source copy, sink, checkpoint) — they are
    * created fresh each call and must not accumulate across verify/bench
    * cycles (ADVICE r10: q303 leaked a full events.parquet copy per
    * call). Callers materialize the sink read (localCheckpoint) first.
    */
  def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.deleteIfExists(f) catch { case _: Exception => () })
      finally walk.close() // Files.walk holds a directory fd until closed
    }
  }
}
