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
        // dimension-bounded iteration state (≤ |nation|² edges by
        // schema): the 8 HITS rounds — 2 matrix-vector products + 2 L1
        // normalizations each — run on the driver over the collected
        // weighted edges (TinyGraph decision rule). Num.roundToD/
        // dec12Sum are the bit-exact driver twins of the former
        // roundTo/DECIMAL(24,12) column arithmetic, so every
        // intermediate vector is bit-identical to the distributed
        // loop's (and to the oracle's unrolled CTEs). The fact rollup
        // stays distributed.
        val edges = graft.ops.TinyGraph.collectBounded(eg, "q274 trade edges")
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2).toDouble))
        val byDst = edges.groupMap(_._2)(e => (e._1, e._3))
        val bySrc = edges.groupMap(_._1)(e => (e._2, e._3))
        val nations = graft.ops.TinyGraph.collectBounded(
          tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name")),
          "q274 vertices")
          .map(r => (r.getInt(0), r.getString(1)))
        val vtx = nations.map(_._1)
        def l1norm(x: Map[Int, Double]): Map[Int, Double] = {
          val t = Num.dec12Sum(x.valuesIterator.map(Num.roundToD(_, 12)).toSeq)
          x.map { case (k, v) => k -> Num.roundToD(v / t, 12) }
        }
        var h: Map[Int, Double] = vtx.map(v => v -> 0.04).toMap
        var a: Map[Int, Double] = vtx.map(v => v -> 0.0).toMap
        (1 to Iters).foreach { _ =>
          a = l1norm(vtx.map { v =>
            v -> Num.dec12Sum(byDst.getOrElse(v, Array.empty[(Int, Double)]).toSeq
              .flatMap { case (u, w) => h.get(u).map(hu => Num.roundToD(hu * w, 12)) })
          }.toMap)
          h = l1norm(vtx.map { u =>
            u -> Num.dec12Sum(bySrc.getOrElse(u, Array.empty[(Int, Double)]).toSeq
              .flatMap { case (v, w) => a.get(v).map(av => Num.roundToD(av * w, 12)) })
          }.toMap)
        }
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(nations.sortBy(_._1).map { case (v, name) =>
            org.apache.spark.sql.Row(v, name,
              Num.roundToD(a(v), 6), Num.roundToD(h(v), 6))
          }: _*)
        s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("n_name",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("authority_r",
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("hub_r",
              org.apache.spark.sql.types.DoubleType))))
          .orderBy("v")
      },
      Some(hitsSql))
  )
}
