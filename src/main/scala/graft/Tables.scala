package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet fixture tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * parquet directly — schema comes from parquet footers, so Catalyst gets
  * exact types and can push filters/column pruning into the scan.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses outright
  * (PARQUET_TYPE_ILLEGAL). We read it via the legacy nanos-as-long path and
  * rebuild a TimestampType column by integer-dividing to microseconds —
  * the same truncation DuckDB's ns→µs rendering applies, so second-level
  * keys stay oracle-exact.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
