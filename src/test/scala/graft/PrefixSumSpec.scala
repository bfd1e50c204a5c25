package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.PrefixSum

/** PrefixSum must be ROW-IDENTICAL to the single-task-per-partition window
  * it replaces (q142/q113/q58's `PARTITION BY source` running sums/ranks),
  * across randomized multi-seed inputs: low-cardinality keys, heavy order
  * ties, negative values, skewed key sizes, degenerate cell counts.
  */
class PrefixSumSpec extends SparkSuite {

  import spark.implicits._

  private def fixture(seed: Long, nKeys: Int, rows: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until rows).map { i =>
      val key = s"k${rnd.nextInt(nKeys)}"
      val ord = rnd.nextInt(5) match {
        case 0 => 0L // constant runs: heavy ties across cell boundaries
        case 1 => (rnd.nextInt(7) - 3).toLong
        case _ => (rnd.nextInt(2000) - 1000).toLong
      }
      val v = (rnd.nextInt(200) - 50).toLong // negative values too
      (i.toLong, key, ord, v)
    }.toDF("id", "key", "ord", "v").repartition(7)
  }

  test("exclusiveSum + rank ≡ window prefix sum + row_number (randomized, both directions)") {
    for (seed <- Seq(2L, 11L, 77L)) {
      val rnd = new scala.util.Random(seed ^ 0x9e3779b9L)
      val asc = rnd.nextBoolean()
      val cells = 1 + rnd.nextInt(30)
      val df = fixture(seed, nKeys = 1 + rnd.nextInt(6), rows = 800 + rnd.nextInt(1200))
      val got = PrefixSum.exclusiveSum(df, Seq("key"), col("ord"), asc,
        Seq(col("id")), col("v"), "cum", Some("rn"), cells)
      val w = Window.partitionBy(col("key"))
        .orderBy((if (asc) col("ord").asc else col("ord").desc), col("id").asc)
      val want = df
        .withColumn("cum_w",
          coalesce(sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("rn_w", row_number().over(w).cast("long"))
      val bad = got.join(want.select(col("id"), col("cum_w"), col("rn_w")), "id")
        .filter(col("cum") =!= col("cum_w") || col("rn") =!= col("rn_w")).count()
      assert(bad == 0L, s"seed=$seed asc=$asc cells=$cells: $bad rows diverged")
      assert(got.count() === df.count())
    }
  }

  test("exclusiveMaxLong ≡ global window exclusive running max (randomized)") {
    for (seed <- Seq(3L, 19L)) {
      val rnd = new scala.util.Random(seed)
      val cells = 1 + rnd.nextInt(20)
      // unique asc order key (q198's bucket id), monotone-ish but not
      // strictly monotone values
      val rows = (0 until 500 + rnd.nextInt(800)).map { i =>
        (i.toLong * 3 + rnd.nextInt(2), rnd.nextInt(100000).toLong)
      }.distinct
      val df = rows.toDF("b", "mx").repartition(5)
      val got = PrefixSum.exclusiveMaxLong(df, col("b"), Nil, col("mx"), "pmx", cells)
      val want = df.withColumn("pmx_w",
        max(col("mx")).over(
          Window.orderBy(col("b").asc).rowsBetween(Window.unboundedPreceding, -1)))
      val bad = got.join(want.select(col("b"), col("pmx_w")), "b")
        .filter(!(col("pmx") <=> col("pmx_w"))).count()
      assert(bad == 0L, s"seed=$seed cells=$cells: $bad rows diverged")
    }
  }

  test("null order key raises (fail-fast precondition, shared with exactNtile)") {
    val df = Seq((1L, "a", java.lang.Long.valueOf(5L), 1L),
      (2L, "a", null.asInstanceOf[java.lang.Long], 2L))
      .toDF("id", "key", "ord", "v")
    val ex = intercept[Exception] {
      PrefixSum.exclusiveSum(df, Seq("key"), col("ord"), true,
        Seq(col("id")), col("v"), "cum").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("null sort key")), s"unexpected error: $ex")
  }

  test("plan: no window partition ever exceeds ~N/cells rows (subtotal windows are cell-bounded)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = fixture(5L, nKeys = 3, rows = 2000)
    val got = PrefixSum.exclusiveSum(df, Seq("key"), col("ord"), true,
      Seq(col("id")), col("v"), "cum", Some("rn"), 16)
    got.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val wins = nodes(got.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    // every window partitions by MORE than the raw low-cardinality key:
    // either (key, cell) on data rows or key over the ≤cells-row subtotals
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty, "PrefixSum leaked a global window")
      val onDataRows = w.partitionSpec.exists(_.references.exists(_.name == "__pc"))
      val onSubtotals = nodes(w.child).exists {
        case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
        case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
        case _ => false
      }
      assert(onDataRows || onSubtotals,
        s"window neither cell-partitioned nor over the subtotal rollup:\n${w.treeString.take(800)}")
    }
  }
}
