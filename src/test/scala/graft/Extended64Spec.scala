package graft

import org.apache.spark.sql.functions._

/** q318 (mergeSchema evolution), q319 (PERMISSIVE corrupt-record ingest). */
class Extended64Spec extends SparkSuite {

  test("q318: the merged seam conserves every order exactly once, with nulls only on the old generation") {
    val got = SparkEntry.queries("q318_schema_evolution")(spark, sf0001)
    got.cache()
    try {
      val o = Tables.load(spark, sf0001, "orders")
      val nAll = o.count()
      assert(got.agg(sum(col("n_orders"))).head.getLong(0) == nAll,
        "merged read lost or duplicated orders across the schema seam")
      // gen 1 rows predate the column: priority NULL, n_with_priority 0
      val g1bad = got.filter(col("gen") === 1)
        .filter(col("o_orderpriority").isNotNull || col("n_with_priority") =!= 0L).count()
      assert(g1bad == 0L, "a gen-1 group has a non-null backfilled priority")
      // gen 2 rows all carry it
      val g2 = got.filter(col("gen") === 2)
      assert(g2.filter(col("o_orderpriority").isNull).count() == 0L)
      assert(g2.filter(col("n_with_priority") =!= col("n_orders")).count() == 0L)
      // per-generation counts match the parity split
      val wantG1 = o.filter(pmod(col("o_orderkey"), lit(2)) === 0).count()
      assert(got.filter(col("gen") === 1).agg(sum(col("n_orders"))).head.getLong(0) == wantG1)
    } finally { got.unpersist(); () }
  }

  test("q319: quarantine counts match the corruption rule; good rows match the fixture per source") {
    val got = SparkEntry.queries("q319_corrupt_quarantine")(spark, sf0001)
    got.cache()
    try {
      val d = Tables.load(spark, sf0001, "documents")
      val wantBad = d.filter(pmod(col("doc_id"), lit(37)) === 0).count()
      val badRows = got.filter(col("quarantined"))
      assert(badRows.count() == 1L, "expected exactly one quarantine rollup row")
      val b = badRows.head
      assert(b.getAs[Long]("n_rows") == wantBad, "quarantined count != corruption-rule count")
      assert(b.getAs[Long]("n_payloads_kept") == wantBad,
        "PERMISSIVE mode dropped a corrupt payload instead of quarantining it")
      assert(b.isNullAt(b.fieldIndex("chars_sum")), "corrupt rows must not contribute parsed fields")
      // good side: per-source counts and char sums equal the fixture's
      val want = d.filter(pmod(col("doc_id"), lit(37)) =!= 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("w_n"), sum(col("n_chars")).as("w_chars"))
      val bad = got.filter(!col("quarantined"))
        .join(want, Seq("source"), "full")
        .filter(!(col("n_rows") <=> col("w_n")) || !(col("chars_sum") <=> col("w_chars")))
        .count()
      assert(bad == 0L, "good-row readout diverges from the fixture")
    } finally { got.unpersist(); () }
  }
}
