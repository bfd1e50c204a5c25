package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("interleave: known Morton values; SQL twin generates identical numbers") {
    // (a=0b11, b=0b00) → bits at 0,2 → 5; (a=0, b=0b11) → bits at 1,3 → 10
    val out = Seq((3L, 0L), (0L, 3L), (3L, 3L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.interleave($"a", $"b", 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(5L, 10L, 15L, (1L << 32) - 1))
    // the generated SQL twin (run through Spark's SQL parser) agrees
    val viaSql = Seq((3L, 3L)).toDF("an", "bn")
      .selectExpr(s"${Layout.interleaveSql("an", "bn", 16)} AS z")
      .head().getLong(0)
    assert(viaSql == 15L)
  }

  test("z-ordered files bound BOTH dimensions (single-dim sort bounds only one)") {
    val li = graft.Tables.load(spark, sf0001, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(li, s"$dir/z", "l_partkey", "l_suppkey", numFiles = 8)

    def fileSpreads(path: String): Seq[(Double, Double)] = {
      val mm = li.agg(
        (max("l_partkey") - min("l_partkey")).cast("double"),
        (max("l_suppkey") - min("l_suppkey")).cast("double")).head()
      val (pDom, sDom) = (mm.getDouble(0), mm.getDouble(1))
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(
          ((max("l_partkey") - min("l_partkey")).cast("double") / pDom).as("ps"),
          ((max("l_suppkey") - min("l_suppkey")).cast("double") / sDom).as("ss"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    }
    val z = fileSpreads(s"$dir/z")
    assert(z.size > 1)
    val avgP = z.map(_._1).sum / z.size
    val avgS = z.map(_._2).sum / z.size
    // 8 z-range files over a 2-D square: each file's bounding box covers
    // a fraction of BOTH domains — the property single-key sorting lacks
    assert(avgP <= 0.65, s"partkey spread $avgP")
    assert(avgS <= 0.65, s"suppkey spread $avgS")

    // contrast: the same data range-partitioned by partkey alone prunes
    // partkey perfectly but leaves suppkey spans at ~the full domain
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/single")
    val single = fileSpreads(s"$dir/single")
    val avgSingleS = single.map(_._2).sum / single.size
    assert(avgSingleS > avgS, s"z-order ($avgS) should beat single-dim ($avgSingleS) on the second key")
  }

  test("z-order layout SKIPS row groups at scan time (metric-proven, not just min/max)") {
    // The pruning claim executed, not inferred: read back the z-ordered
    // files with a predicate on the SECOND dimension only — the case
    // single-dim layout cannot help with — and assert via the parquet
    // scan's own numOutputRows metric that whole row groups were
    // skipped. Each written file is one row group here, so the scan
    // metric counts rows of non-skipped files.
    val li = graft.Tables.load(spark, sf0001, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val total = li.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_zskip").toString
    Layout.writeZOrdered(li, s"$dir/z", "l_partkey", "l_suppkey", numFiles = 8)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/single")

    val bounds = li.agg(min("l_suppkey"), max("l_suppkey")).head()
    val (sLo, sHi) = (bounds.getLong(0), bounds.getLong(1))
    val cut = sLo + (sHi - sLo) / 10 // bottom decile of the suppkey domain

    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("l_suppkey") <= cut)
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no parquet scan in executed plan")
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val zRows = scanRows(s"$dir/z")
    val singleRows = scanRows(s"$dir/single")
    // z-order: files whose suppkey box misses the decile are skipped by
    // their row-group stats; partkey-sorted files all span the full
    // suppkey domain, so NOTHING skips there
    assert(zRows < total, s"z-ordered scan read all $total rows — no row group skipped")
    assert(singleRows == total,
      s"single-dim layout unexpectedly skipped ($singleRows of $total) — contrast broken")
    assert(zRows.toDouble / total <= 0.65,
      s"z-order skipped too little: $zRows of $total rows surfaced from the scan")
  }

  test("q104 buckets: every bucket's box is a fraction of the full 2-D domain") {
    val rows = graft.SparkEntry.queries("q104_zorder_locality")(spark, sf0001)
      .collect()
    assert(rows.length > 4) // multiple top-4-bit buckets materialize
    val mm = graft.Tables.load(spark, sf0001, "lineitem")
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
    val pDom = (mm.getLong(1) - mm.getLong(0)).toDouble
    val sDom = (mm.getLong(3) - mm.getLong(2)).toDouble
    rows.foreach { r =>
      assert((r.getLong(3) - r.getLong(2)) / pDom <= 0.30, s"bucket ${r.getLong(0)} partkey box")
      assert((r.getLong(5) - r.getLong(4)) / sDom <= 0.30, s"bucket ${r.getLong(0)} suppkey box")
    }
  }
}
