package graft

import org.apache.spark.sql.functions._

/** The typed Dataset[T] surface: case-class encoders, typed
  * filter/map/groupByKey/agg — proves a reference user can work
  * type-safe end-to-end, and that typed plans produce the same results
  * as the untyped DataFrame plans the query battery uses.
  */
class TypedApiSpec extends SparkSuite {
  import spark.implicits._
  import TypedApiSpec._

  test("typed filter/map/groupByKey agg matches the untyped plan") {
    val raw = graft.Tables.load(spark, sf0001, "orders")
    val ds = raw.as[Order]
    val typed = ds
      .filter(_.o_totalprice > 100000.0)
      .map(o => (o.o_orderstatus, o.o_totalprice))
      .groupByKey(_._1)
      .agg(TypedApiSpec.typedCount.name("n"))
      .map { case (status, n) => StatusCount(status, n) }
      .collect().map(s => s.status -> s.n).toMap
    val untyped = raw.filter(col("o_totalprice") > 100000.0)
      .groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == untyped && typed.nonEmpty)
  }

  test("join strategy hints are honored (shuffle_hash / merge / broadcast)") {
    val li = graft.Tables.load(spark, sf0001, "lineitem").select("l_orderkey")
    val o = graft.Tables.load(spark, sf0001, "orders").select("o_orderkey")
    def planOf(hint: String): String = {
      val j = li.join(o.hint(hint), col("l_orderkey") === col("o_orderkey"))
      j.collect()
      j.queryExecution.executedPlan.toString
    }
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
    assert(planOf("merge").contains("SortMergeJoin"))
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
  }
}

object TypedApiSpec {
  import org.apache.spark.sql.{Encoder, Encoders}

  /** Typed count as an Aggregator — the non-deprecated typed-agg path. */
  val typedCount: org.apache.spark.sql.TypedColumn[(String, Double), Long] =
    new org.apache.spark.sql.expressions.Aggregator[(String, Double), Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: (String, Double)): Long = b + 1
      def merge(a: Long, b: Long): Long = a + b
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }.toColumn

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)
  final case class StatusCount(status: String, n: Long)
}
