package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes. The reference relies on pandas read_csv inference
  * (a correctness hazard at scale — a single malformed partition can flip
  * a column to string); the engine declares schemas and treats inference
  * as opt-in.
  */
object Schemas {

  /** weatherHistory.csv source (reference DDL v2_group_project_dag.py:
    * 281-298; column accesses v5_group_project_dag.py:74-94). The date
    * stays a string here — parsing (with its %z offset quirk) is a
    * cleaning-stage concern.
    */
  val weatherCsv: StructType = StructType(Seq(
    StructField("Formatted Date", StringType),
    StructField("Summary", StringType),
    StructField("Precip Type", StringType),
    StructField("Temperature (C)", DoubleType),
    StructField("Apparent Temperature (C)", DoubleType),
    StructField("Humidity", DoubleType),
    StructField("Wind Speed (km/h)", DoubleType),
    StructField("Wind Bearing (degrees)", DoubleType),
    StructField("Visibility (km)", DoubleType),
    StructField("Loud Cover", DoubleType),
    StructField("Pressure (millibars)", DoubleType),
    StructField("Daily Summary", StringType)))

  /** events fixture as Spark reads it via the nanos-as-long legacy path
    * (ts is raw nanos; Tables.load / Streaming.events rebuild a
    * TimestampType column).
    */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The micros-generation events fixture: ts is TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false, which Spark surfaces as TIMESTAMP_NTZ.
    */
  val eventsRawMicros: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))
}
