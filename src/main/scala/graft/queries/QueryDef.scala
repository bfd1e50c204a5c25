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
}
