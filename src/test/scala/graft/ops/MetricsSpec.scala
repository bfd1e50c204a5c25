package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSuite {

  test("listener records scan rows and shuffle records for an executed agg") {
    val (fetch, detach) = Metrics.attach(spark)
    try {
      graft.Tables.load(spark, sf0001, "orders")
        .groupBy(col("o_orderstatus")).count()
        .collect()
      // listener events are delivered asynchronously on the listener bus
      val deadline = System.nanoTime() + 10e9.toLong
      while (fetch().isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val ms = fetch()
      assert(ms.nonEmpty, "no metrics captured")
      val m = ms.last
      assert(m.durationNs > 0)
      assert(m.scanOutputRows > 0, m.toString)
      assert(m.shuffleRecordsWritten > 0, m.toString)
    } finally detach()
  }
}
