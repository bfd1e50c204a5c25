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

  /** Memoized row count per (dir, table) — several embedding-query
    * builders derive their √N parameterization from the corpus size at
    * DataFrame-CONSTRUCTION time, so plan-only consumers (BatteryPlanSpec
    * constructs all battery plans, twice per sweep pair) would otherwise
    * pay a full table-scan count() job per construction (ADVICE r12).
    * Fixture dirs are immutable for a session's lifetime, so one count
    * per (dir, table) per JVM is exact; at 100 TB the same scalar comes
    * from table stats, not a scan.
    */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  def cachedCount(spark: SparkSession, dir: String, name: String): Long =
    countCache.computeIfAbsent((dir, name), { case (d, n) =>
      java.lang.Long.valueOf(load(spark, d, n).count())
    }).longValue()

  /** Memoized parquet schema per (dir, table) — metadata, not results:
    * without it every `spark.read.parquet` call re-reads footers to
    * infer the schema, and the battery constructs each table's reader
    * hundreds of times per run (339 queries × reps × tables/query). The
    * fixture dirs are immutable for a JVM's lifetime, so one footer read
    * per (dir, table) is exact; at 100 TB the same metadata comes from
    * the catalog/table format, never per-query footer reads (guide §6 —
    * the file-listing/metadata-cache class of fix).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // must be set BEFORE schema inference AND at scan time (the reader
      // honors it when decoding TIMESTAMP(NANOS) as long)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val schema = schemaCache.computeIfAbsent((dir, name), { case (d, n) =>
      spark.read.parquet(s"$d/$n.parquet").schema
    })
    val raw = spark.read.schema(schema).parquet(s"$dir/$name.parquet")
    if (name == "events") {
      schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else raw
  }
}
