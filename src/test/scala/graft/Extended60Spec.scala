package graft

import org.apache.spark.sql.functions._

/** q308 (streaming dedup) and q309 (exact stratified sampling). */
class Extended60Spec extends SparkSuite {

  test("q308: the stream plans a streaming Deduplicate state operator (not a batch distinct)") {
    val src = java.nio.file.Files.createTempDirectory("graft_t308_src")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        src.resolve("events.parquet"))
      val stream = graft.ext.Streaming.eventsFileStream(spark, src.toString)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
      assert(stream.isStreaming)
      val logical = stream.queryExecution.analyzed.toString
      assert(logical.contains("Deduplicate"), logical)
    } finally graft.queries.QueryDef.rmTree(src)
  }

  test("q308: replayed streaming dedup counts == batch COUNT(DISTINCT) (micro-batch-order-free)") {
    val got = SparkEntry.queries("q308_stream_dedup")(spark, sf0001)
    val want = Tables.load(spark, sf0001, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("w"))
    val bad = got.join(want, Seq("event_type"), "full")
      .filter(!(col("n_distinct_users") <=> col("w"))).count()
    assert(bad == 0L)
  }

  test("q309: every stratum selects exactly n DIV 5 docs, and ranks match the native window") {
    val got = SparkEntry.queries("q309_stratified_sample")(spark, sf0001)
    got.cache()
    val perSrc = got.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(when(col("selected"), 1L).otherwise(0L)).as("n_sel"))
    val off = perSrc.filter(col("n_sel") =!= expr("n DIV 5L")).count()
    assert(off == 0L, "quota violated in some stratum")
    // rank parity with the single-task-per-stratum window it replaces
    val pri = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("bigint")
    val want = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source")).withColumn("__pri", pri)
      .withColumn("want_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("__pri"), col("doc_id"))).cast("long"))
    val diverged = got.join(want.select(col("doc_id"), col("want_rank")), "doc_id")
      .filter(col("sel_rank") =!= col("want_rank")).count()
    got.unpersist()
    assert(diverged == 0L, "PrefixSum rank diverged from the window rank")
  }
}
