package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-5 batch 3: compliance and lakehouse-maintenance operators —
  * GDPR cascade deletion with orphan proof (q148), cross-source
  * duplicate-overlap matrix (q149), and incremental aggregate refresh
  * via algebraic partial-state merge (q150).
  */
object Extended10 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // GDPR right-to-be-forgotten: delete a customer set and cascade
    // through orders → lineitem, reporting per-table purge counts AND an
    // in-row orphan proof (post-purge children referencing a purged
    // parent — must be 0, and the oracle pins it). The deletion list is
    // tiny and BROADCASTS into every semi/anti join; each fact table is
    // scanned once per count pair. At 100 TB this is the erasure-job
    // template: no shuffle of the fact side, deletes expressed as
    // anti-joins.
    QueryDef(
      "q148_cascade_delete",
      (s, dir) => {
        val cust = tbl(s, dir, "customer")
        val orders = tbl(s, dir, "orders")
        val li = tbl(s, dir, "lineitem")
        val del = cust.filter(col("c_custkey") % 97 === 0)
          .select(col("c_custkey").as("k"))
        val ordPurged = orders.join(broadcast(del), col("o_custkey") === col("k"), "semi")
        val ordKeys = ordPurged.select(col("o_orderkey").as("ok"))
        val liPurged = li.join(broadcast(ordKeys), col("l_orderkey") === col("ok"), "semi")
        // post-purge orphans: surviving lineitem rows whose order was
        // purged (must be zero — lineitem purge keys off the SAME order
        // set), and surviving orders pointing at a deleted customer
        val liAfter = li.join(broadcast(ordKeys), col("l_orderkey") === col("ok"), "anti")
        val ordAfter = orders.join(broadcast(del), col("o_custkey") === col("k"), "anti")
        val rows = Seq(
          ("customer", cust.select(lit(1)), del.select(lit(1)),
            ordAfter.join(broadcast(del), col("o_custkey") === col("k"), "semi")
              .select(lit(1))),
          ("orders", orders.select(lit(1)), ordPurged.select(lit(1)),
            ordAfter.join(broadcast(del), col("o_custkey") === col("k"), "semi")
              .select(lit(1))),
          ("lineitem", li.select(lit(1)), liPurged.select(lit(1)),
            liAfter.join(broadcast(ordKeys), col("l_orderkey") === col("ok"), "semi")
              .select(lit(1))))
        rows.map { case (name, before, purged, orphans) =>
          before.agg(count(lit(1)).as("n_before")).crossJoin(
            purged.agg(count(lit(1)).as("n_purged"))).crossJoin(
            orphans.agg(count(lit(1)).as("n_orphans")))
            .select(lit(name).as("tbl"), col("n_before"), col("n_purged"),
              (col("n_before") - col("n_purged")).as("n_after"), col("n_orphans"))
        }.reduce(_ unionAll _).orderBy("tbl")
      },
      Some(s"""WITH del AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0),
              |op AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM del)),
              |lp AS (SELECT l_orderkey FROM lineitem
              |       WHERE l_orderkey IN (SELECT o_orderkey FROM op)),
              |c AS (SELECT 'customer' AS tbl,
              |        (SELECT count(*) FROM customer) AS n_before,
              |        (SELECT count(*) FROM del) AS n_purged, 0 AS n_orphans),
              |o AS (SELECT 'orders',
              |        (SELECT count(*) FROM orders),
              |        (SELECT count(*) FROM op),
              |        (SELECT count(*) FROM orders
              |         WHERE o_custkey IN (SELECT k FROM del)
              |           AND o_orderkey NOT IN (SELECT o_orderkey FROM op))),
              |l AS (SELECT 'lineitem',
              |        (SELECT count(*) FROM lineitem),
              |        (SELECT count(*) FROM lp),
              |        (SELECT count(*) FROM lineitem
              |         WHERE l_orderkey IN (SELECT o_orderkey FROM op)
              |           AND l_orderkey NOT IN (SELECT l_orderkey FROM lp)))
              |SELECT tbl, n_before, n_purged, n_before - n_purged AS n_after, n_orphans
              |FROM (SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l)
              |ORDER BY tbl""".stripMargin)),

    // Cross-source duplicate-overlap matrix: which ingestion sources
    // share verbatim content, and how much — the contamination heat-map
    // a corpus curator reads before mixing. Distinct (fingerprint,
    // source) pairs, then pairs of sources within a fingerprint
    // (bounded: ≤ |sources|² per fp — a constant, never O(df²) in docs),
    // plus each source's distinct-fp total for a Jaccard overlap. At
    // 100 TB: one hash agg over fingerprints, pair fan-out capped by the
    // source count.
    //
    // Source keying: three OVERLAPPING pseudo-feeds (each doc belongs to
    // the two feeds picked by doc_id % 3 — the overlapping-crawl /
    // partial-mirror shape). The fixtures' real `source` column has no
    // cross-source verbatim dups at small SF, which made the battery row
    // vacuously green (0 = 0 rows); overlapping feeds guarantee shared
    // fingerprints at EVERY scale factor, so the driver hash-match
    // exercises the pair fan-out and Jaccard arithmetic on real rows.
    QueryDef(
      "q149_overlap_matrix",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .select(Text.fingerprintMd5(col("text")).as("fp"),
            pmod(col("doc_id"), lit(3)).as("m"))
        val feeds =
          when(col("m") === 0, array(lit("feed_a"), lit("feed_c")))
            .when(col("m") === 1, array(lit("feed_a"), lit("feed_b")))
            .when(col("m") === 2, array(lit("feed_b"), lit("feed_c")))
        val fps = docs
          .select(col("fp"), explode(feeds).as("source"))
          .distinct()
        val perSrc = fps.groupBy("source").agg(count(lit(1)).as("n_fp"))
        val pairs = fps.as("a")
          .join(fps.as("b"), col("a.fp") === col("b.fp") &&
            col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
          .agg(count(lit(1)).as("n_shared"))
        pairs
          .join(broadcast(perSrc.select(col("source").as("s1"), col("n_fp").as("n1"))), "s1")
          .join(broadcast(perSrc.select(col("source").as("s2"), col("n_fp").as("n2"))), "s2")
          .select(col("s1"), col("s2"), col("n_shared"),
            R(col("n_shared").cast("double") /
              (col("n1") + col("n2") - col("n_shared")).cast("double"), 6).as("jaccard"))
          .orderBy("s1", "s2")
      },
      Some(s"""WITH d AS (SELECT
              |             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
              |             doc_id % 3 AS m
              |           FROM documents),
              |fps AS (SELECT DISTINCT fp, source FROM (
              |          SELECT fp, 'feed_a' AS source FROM d WHERE m IN (0, 1)
              |          UNION ALL SELECT fp, 'feed_b' FROM d WHERE m IN (1, 2)
              |          UNION ALL SELECT fp, 'feed_c' FROM d WHERE m IN (0, 2))),
              |per AS (SELECT source, count(*) AS n_fp FROM fps GROUP BY 1),
              |pr AS (SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
              |       FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
              |       GROUP BY 1, 2)
              |SELECT s1, s2, n_shared,
              |  ${rs("CAST(n_shared AS DOUBLE) / CAST(p1.n_fp + p2.n_fp - n_shared AS DOUBLE)", 6)}
              |    AS jaccard
              |FROM pr JOIN per p1 ON p1.source = pr.s1 JOIN per p2 ON p2.source = pr.s2
              |ORDER BY s1, s2""".stripMargin)),

    // Incremental aggregate refresh: maintain a per-priority revenue
    // aggregate as base state ⊎ delta batch WITHOUT recomputing the base
    // — the algebraic (sum, count) partial-state merge behind every
    // incremental materialized view. Money enters the state as
    // DECIMAL(18,2) (cent-exact, order-free), so merged state EQUALS the
    // full recompute bit-for-bit and the in-row matches_full proof is
    // honest. At 100 TB the base state is a tiny aggregate table; only
    // the delta partition is scanned per refresh.
    QueryDef(
      "q150_incremental_agg",
      (s, dir) => {
        val orders = tbl(s, dir, "orders")
        val cents = R(col("o_totalprice"), 2).cast(DecimalType(18, 2))
        def part(pred: Column) = orders.filter(pred)
          .groupBy(col("o_orderpriority").as("pri"))
          .agg(sum(cents).as("s"), count(lit(1)).as("n"))
        val split = lit("1995-06-17").cast("date")
        val base = part(col("o_orderdate") < split)
          .select(col("pri"), col("s").as("sb"), col("n").as("nb"))
        val delta = part(col("o_orderdate") >= split)
          .select(col("pri"), col("s").as("sd"), col("n").as("nd"))
        val full = part(lit(true))
          .select(col("pri"), col("s").as("sf"), col("n").as("nf"))
        base.join(delta, Seq("pri"), "full")
          .select(col("pri"),
            (coalesce(col("sb"), lit(0).cast(DecimalType(18, 2))) +
              coalesce(col("sd"), lit(0).cast(DecimalType(18, 2)))).as("sm"),
            (coalesce(col("nb"), lit(0L)) + coalesce(col("nd"), lit(0L))).as("nm"),
            coalesce(col("nb"), lit(0L)).as("n_base"),
            coalesce(col("nd"), lit(0L)).as("n_delta"))
          .join(full, Seq("pri"))
          .select(col("pri"), col("n_base"), col("n_delta"), col("nm").as("n_total"),
            R(col("sm").cast("double") / col("nm").cast("double"), 4).as("avg_refreshed"),
            (col("sm") === col("sf") && col("nm") === col("nf")).as("matches_full"))
          .orderBy("pri")
      },
      Some(s"""WITH base AS (
              |  SELECT o_orderpriority AS pri,
              |    sum(CAST(${rs("o_totalprice", 2)} AS DECIMAL(18,2))) AS sb,
              |    count(*) AS nb
              |  FROM orders WHERE o_orderdate < DATE '1995-06-17' GROUP BY 1),
              |delta AS (
              |  SELECT o_orderpriority AS pri,
              |    sum(CAST(${rs("o_totalprice", 2)} AS DECIMAL(18,2))) AS sd,
              |    count(*) AS nd
              |  FROM orders WHERE o_orderdate >= DATE '1995-06-17' GROUP BY 1),
              |full_ AS (
              |  SELECT o_orderpriority AS pri,
              |    sum(CAST(${rs("o_totalprice", 2)} AS DECIMAL(18,2))) AS sf,
              |    count(*) AS nf
              |  FROM orders GROUP BY 1),
              |m AS (SELECT coalesce(base.pri, delta.pri) AS pri,
              |        coalesce(sb, 0) + coalesce(sd, 0) AS sm,
              |        coalesce(nb, 0) + coalesce(nd, 0) AS nm,
              |        coalesce(nb, 0) AS n_base, coalesce(nd, 0) AS n_delta
              |      FROM base FULL OUTER JOIN delta ON base.pri = delta.pri)
              |SELECT m.pri, CAST(n_base AS BIGINT) AS n_base,
              |  CAST(n_delta AS BIGINT) AS n_delta, CAST(nm AS BIGINT) AS n_total,
              |  ${rs("CAST(sm AS DOUBLE) / CAST(nm AS DOUBLE)", 4)} AS avg_refreshed,
              |  (sm = sf AND nm = nf) AS matches_full
              |FROM m JOIN full_ ON full_.pri = m.pri
              |ORDER BY m.pri""".stripMargin)))
}
