package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 twenty-first batch: HITS hubs & authorities over the nation
  * trade graph — the second classic link-analysis fixpoint (q144's
  * PageRank ranks by incoming random-walk mass; HITS separates "big
  * buyers" (hubs — nations whose customers order from everywhere) from
  * "big suppliers" (authorities — nations everyone orders FROM), which
  * PageRank's single score conflates on an asymmetric trade graph).
  *
  * Iteration contract (q144's recipe): 8 mutual-reinforcement rounds,
  * each summing 12-dp-rounded DECIMAL(24,12) terms (order-free exact)
  * and L1-normalizing both vectors; the oracle is the identical
  * computation UNROLLED into generated CTEs — no convergence tolerance
  * ever enters the comparison. Scale shape: the graph aggregates once
  * from the fact tables (one shuffle), then every round is two
  * broadcast joins over a ≤25-row vector.
  */
object Extended48 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  private val Iters = 8

  private def hitsSql: String = {
    val iters = (1 to Iters).map { k =>
      s"""araw$k AS MATERIALIZED (
         |  SELECT e.v, CAST(sum(CAST(${rs(s"h.h * e.w", 12)} AS DECIMAL(24,12))) AS DOUBLE) AS s
         |  FROM ew e JOIN h${k - 1} h ON h.u = e.u GROUP BY e.v),
         |an$k AS MATERIALIZED (SELECT CAST(sum(CAST(${rs("s", 12)} AS DECIMAL(24,12))) AS DOUBLE) AS t FROM araw$k),
         |a$k AS MATERIALIZED (
         |  SELECT vtx.v, ${rs(s"coalesce(araw$k.s, 0.0) / an$k.t", 12)} AS a
         |  FROM vtx LEFT JOIN araw$k ON araw$k.v = vtx.v CROSS JOIN an$k),
         |hraw$k AS MATERIALIZED (
         |  SELECT e.u, CAST(sum(CAST(${rs(s"a.a * e.w", 12)} AS DECIMAL(24,12))) AS DOUBLE) AS s
         |  FROM ew e JOIN a$k a ON a.v = e.v GROUP BY e.u),
         |hn$k AS MATERIALIZED (SELECT CAST(sum(CAST(${rs("s", 12)} AS DECIMAL(24,12))) AS DOUBLE) AS t FROM hraw$k),
         |h$k AS MATERIALIZED (
         |  SELECT vtx.v AS u, ${rs(s"coalesce(hraw$k.s, 0.0) / hn$k.t", 12)} AS h
         |  FROM vtx LEFT JOIN hraw$k ON hraw$k.u = vtx.v CROSS JOIN hn$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH eg AS MATERIALIZED (SELECT c.c_nationkey AS u, s.s_nationkey AS v, count(*) AS w
       |            FROM lineitem l
       |            JOIN orders o ON l.l_orderkey = o.o_orderkey
       |            JOIN customer c ON o.o_custkey = c.c_custkey
       |            JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |            GROUP BY 1, 2),
       |ew AS MATERIALIZED (SELECT u, v, CAST(w AS DOUBLE) AS w FROM eg),
       |vtx AS (SELECT n_nationkey AS v FROM nation),
       |h0 AS (SELECT v AS u, CAST(0.04 AS DOUBLE) AS h FROM vtx),
       |$iters
       |SELECT vtx.v, n_name,
       |  ${rs(s"a$Iters.a", 6)} AS authority_r,
       |  ${rs(s"h$Iters.h", 6)} AS hub_r
       |FROM vtx
       |JOIN a$Iters ON a$Iters.v = vtx.v
       |JOIN h$Iters ON h$Iters.u = vtx.v
       |JOIN nation ON n_nationkey = vtx.v
       |ORDER BY vtx.v""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q274_hits",
      (s, dir) => {
        val eg = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
          .join(tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey").as("u")),
            col("o_custkey") === col("c_custkey"))
          .join(tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey").as("v")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
          .select(col("u"), col("v"), col("w").cast("double").as("w"))
          .transform(graft.ops.Ckpt.apply)
        val vtx = tbl(s, dir, "nation").select(col("n_nationkey").as("v"))
        val dec = DecimalType(24, 12)
        def l1norm(x: DataFrame, key: String, value: String): DataFrame = {
          val t = x.agg(sum(R(col(value), 12).cast(dec)).cast("double").as("t"))
          x.crossJoin(broadcast(t))
            .select(col(key), R(col(value) / col("t"), 12).as(value))
        }
        var h = vtx.select(col("v").as("u"), lit(0.04).as("h"))
        var a = vtx.select(col("v"), lit(0.0).as("a"))
        (1 to Iters).foreach { _ =>
          val araw = eg.join(broadcast(h), "u")
            .groupBy(col("v"))
            .agg(sum(R(col("h") * col("w"), 12).cast(dec)).cast("double").as("s"))
          a = l1norm(
            vtx.join(broadcast(araw), Seq("v"), "left")
              .select(col("v"), coalesce(col("s"), lit(0.0)).as("a")), "v", "a")
          val hraw = eg.join(broadcast(a), "v")
            .groupBy(col("u"))
            .agg(sum(R(col("a") * col("w"), 12).cast(dec)).cast("double").as("s"))
          h = l1norm(
            vtx.select(col("v").as("u"))
              .join(broadcast(hraw), Seq("u"), "left")
              .select(col("u"), coalesce(col("s"), lit(0.0)).as("h")), "u", "h")
          // cut lineage each round: 8 rounds × (2 joins + 2 normalizations)
          // otherwise compounds into a plan Catalyst re-optimizes for
          // minutes (the vectors are ≤25 rows — checkpointing is free)
          a = graft.ops.Ckpt(a)
          h = graft.ops.Ckpt(h)
        }
        a.join(broadcast(h), col("v") === col("u"))
          .join(broadcast(tbl(s, dir, "nation")
            .select(col("n_nationkey").as("nv"), col("n_name"))), col("v") === col("nv"))
          .select(col("v"), col("n_name"),
            R(col("a"), 6).as("authority_r"), R(col("h"), 6).as("hub_r"))
          .orderBy("v")
      },
      Some(hitsSql))
  )
}
