package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet fixture tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * parquet directly — schema comes from parquet footers, so Catalyst gets
  * exact types and can push filters/column pruning into the scan.
  *
  * `events.ts` has shipped in two physical forms across fixture
  * generations: parquet TIMESTAMP(NANOS) — which Spark 4 refuses outright
  * (PARQUET_TYPE_ILLEGAL), so we read it via the legacy nanos-as-long path
  * and integer-divide to microseconds (the same truncation DuckDB's ns→µs
  * rendering applies) — and plain TIMESTAMP(MICROS), which surfaces as
  * TIMESTAMP_NTZ and only needs a cast to session-TZ TimestampType (a
  * no-op under the UTC session both Verify and Bench pin). The loader
  * inspects the footer schema and adapts, so a fixture regeneration can
  * never silently break every events-based query again.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
