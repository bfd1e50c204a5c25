package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Num
import QueryDef.tbl

/** Round-11 batch 4: ingestion-resilience operators — the two failure
  * modes every long-lived lake hits that the battery didn't exercise.
  *
  * q318 is SCHEMA EVOLUTION: two ingestion generations of the same
  * table, the newer with an added column, read back as ONE relation via
  * parquet `mergeSchema` (older rows null-backfilled). The readout
  * aggregates across the schema seam, so the union semantics — not just
  * the read — sit under the hash gate. The generation split is
  * deterministic (orderkey parity), so the DuckDB oracle reproduces the
  * seam from the fixture without reading the scratch files.
  *
  * q319 is CORRUPT-RECORD INGEST: a JSONL batch where a deterministic
  * subset of lines is malformed, read with a DECLARED schema in
  * PERMISSIVE mode + columnNameOfCorruptRecord — the production posture
  * (never drop silently, never fail the batch; quarantine and count).
  * The per-source good/quarantined readout is hash-verified; the oracle
  * replays the corruption rule on the fixture directly.
  */
object Extended64 {

  val all: Seq[QueryDef] = Seq(
    // ----- q318: parquet mergeSchema across table generations -----------
    QueryDef(
      "q318_schema_evolution",
      (s, dir) => {
        val root = java.nio.file.Files.createTempDirectory("graft_q318")
        // try/finally spans writes AND readout (localCheckpoint is eager)
        // so a failed run cannot leak the scratch dir
        try {
        val o = tbl(s, dir, "orders")
        // gen 1: the original schema (no priority column), even keys
        o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$root/gen=1")
        // gen 2: schema grew a column, odd keys
        o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .write.mode("overwrite").parquet(s"$root/gen=2")
        val merged = s.read
          .option("mergeSchema", "true")
          .option("basePath", root.toString)
          .parquet(s"$root/gen=1", s"$root/gen=2")
        merged
          .groupBy(col("gen"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            Num.roundTo(sum(col("o_totalprice")), 4).as("total_r"),
            count(col("o_orderpriority")).as("n_with_priority"))
          .orderBy(col("gen"), col("o_orderpriority").asc_nulls_first)
          .localCheckpoint(true)
        } finally QueryDef.rmTree(root)
      },
      Some(s"""WITH seam AS (
              |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS gen,
              |    CASE WHEN o_orderkey % 2 = 0 THEN NULL
              |         ELSE o_orderpriority END AS o_orderpriority,
              |    o_totalprice
              |  FROM orders)
              |SELECT gen, o_orderpriority,
              |  count(*) AS n_orders,
              |  ${Num.roundSql("sum(o_totalprice)", 4)} AS total_r,
              |  count(o_orderpriority) AS n_with_priority
              |FROM seam GROUP BY gen, o_orderpriority
              |ORDER BY gen, o_orderpriority NULLS FIRST""".stripMargin)),

    // ----- q319: PERMISSIVE JSONL ingest with corrupt-record quarantine -
    QueryDef(
      "q319_corrupt_quarantine",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val scratch = java.nio.file.Files.createTempDirectory("graft_q319")
        // try/finally spans writes AND readout (localCheckpoint is eager)
        // so a failed run cannot leak the scratch dir
        try {
        // manufacture the JSONL batch from the fixture: every doc_id
        // divisible by 37 ships a malformed line (truncated JSON)
        val good = to_json(struct(col("doc_id"), col("source"), col("n_chars")))
        val line = when(pmod(col("doc_id"), lit(37)) === 0,
          concat(lit("{\"doc_id\": "), col("doc_id"), lit(", \"source\": BROKEN")))
          .otherwise(good)
        tbl(s, dir, "documents")
          .select(line.as("value"))
          .write.mode("overwrite").text(s"$scratch/batch")
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("source", StringType),
          StructField("n_chars", LongType), StructField("_bad", StringType)))
        val read = s.read
          .schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_bad")
          .json(s"$scratch/batch")
        // production posture: quarantine rows keep their raw payload; the
        // batch never fails and never silently drops. Readout: per-source
        // good rows + one NULL-source quarantine row with exact counts.
        read
          .withColumn("quarantined", col("_bad").isNotNull)
          .groupBy(col("quarantined"),
            when(col("quarantined"), lit(null)).otherwise(col("source")).as("source"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars")).as("chars_sum"),
            count(col("_bad")).as("n_payloads_kept"))
          .orderBy(col("quarantined"), col("source").asc_nulls_first)
          .localCheckpoint(true)
        } finally QueryDef.rmTree(scratch)
      },
      Some("""WITH cls AS (
             |  SELECT doc_id, source, n_chars, doc_id % 37 = 0 AS quarantined
             |  FROM documents)
             |SELECT quarantined,
             |  CASE WHEN quarantined THEN NULL ELSE source END AS source,
             |  count(*) AS n_rows,
             |  CAST(sum(CASE WHEN quarantined THEN NULL ELSE n_chars END) AS BIGINT)
             |    AS chars_sum,
             |  count(CASE WHEN quarantined THEN 1 END) AS n_payloads_kept
             |FROM cls GROUP BY 1, 2
             |ORDER BY quarantined, source NULLS FIRST""".stripMargin))
  )
}
