package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-5 batch 4: lakehouse CDC MERGE, two-sample KS drift test, BM25
  * retrieval scoring, and equi-depth histogram statistics. All
  * hash-oracled; every float crossing the hash is either a single IEEE op
  * on exact integers or a rounded-term DECIMAL sum.
  */
object Extended7 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  import TextQueries.wsSql

  val all: Seq[QueryDef] = Seq(
    // CDC MERGE (the Delta/Iceberg MERGE INTO semantics as a plain
    // relational plan): a deterministic change feed (updates, deletes,
    // inserts manufactured from the key space) applied to the orders
    // base — one full-outer join on the key produces the post-merge
    // snapshot: D drops the row, U replaces columns, I adds rows, and
    // everything else passes through. At 100 TB both sides partition by
    // the merge key (one co-partitioned shuffle); no row ever meets more
    // than one change (keys are unique per batch by construction).
    QueryDef(
      "q131_cdc_merge",
      (s, dir) => {
        val base = tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val upd = base.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), lit("U").as("op"),
            lit("X").as("c_status"), (col("o_totalprice") + 100.0).as("c_total"))
        val del = base.filter(col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 11 === 0)
          .select(col("o_orderkey"), lit("D").as("op"),
            lit(null).cast("string").as("c_status"), lit(null).cast("double").as("c_total"))
        val ins = base.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"), lit("I").as("op"),
            lit("N").as("c_status"), (col("o_totalprice") * 0.5).as("c_total"))
        val changes = upd.unionAll(del).unionAll(ins)
        base.join(changes, Seq("o_orderkey"), "full")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(
            col("o_orderkey"),
            coalesce(col("c_status"), col("o_orderstatus")).as("status"),
            R(coalesce(col("c_total"), col("o_totalprice")), 2).as("total_r"),
            coalesce(col("op"), lit("=")).as("applied"))
          .orderBy("o_orderkey")
      },
      Some(s"""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
              |chg AS (
              |  SELECT o_orderkey, 'U' AS op, 'X' AS c_status,
              |         o_totalprice + 100.0 AS c_total
              |  FROM base WHERE o_orderkey % 7 = 0
              |  UNION ALL
              |  SELECT o_orderkey, 'D', NULL, NULL
              |  FROM base WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 = 0
              |  UNION ALL
              |  SELECT o_orderkey + 10000000, 'I', 'N', o_totalprice * 0.5
              |  FROM base WHERE o_orderkey % 13 = 0),
              |m AS (SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
              |        coalesce(c.c_status, b.o_orderstatus) AS status,
              |        coalesce(c.c_total, b.o_totalprice) AS total,
              |        coalesce(c.op, '=') AS applied
              |      FROM base b FULL OUTER JOIN chg c ON c.o_orderkey = b.o_orderkey
              |      WHERE c.op IS NULL OR c.op <> 'D')
              |SELECT o_orderkey, status, ${rs("total", 2)} AS total_r, applied
              |FROM m ORDER BY o_orderkey""".stripMargin)),

    // Two-sample Kolmogorov–Smirnov test between src0's and src1's
    // doc-length distributions — the sharper companion to q127's PSI
    // (detects ANY distributional shift, not just binned mass moves).
    // The supremum |F1−F2| is computed over EXACT integers
    // (|c1·n2 − c2·n1|, cumulative counts via one window over distinct
    // lengths) with ONE final division; the α=0.05 critical value is a
    // two-op expression on the same exact counts, so even the reject
    // decision is bit-stable.
    QueryDef(
      "q132_ks_test",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .filter(col("source").isin("src0", "src1"))
          .select(col("source"), size(Text.tokensNorm(col("text"))).cast("bigint").as("nt"))
        val per = d.groupBy(col("nt")).agg(
          count(when(col("source") === "src0", 1)).as("a"),
          count(when(col("source") === "src1", 1)).as("b"))
        val w = Window.orderBy(col("nt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = per.select(col("nt"),
          sum(col("a")).over(w).as("ca"), sum(col("b")).over(w).as("cb"),
          sum(col("a")).over().as("n1"), sum(col("b")).over().as("n2"))
        cum
          .agg(
            max(col("n1")).as("n1"), max(col("n2")).as("n2"),
            max(abs(col("ca") * col("n2") - col("cb") * col("n1"))).as("__sup"))
          .select(
            col("n1"), col("n2"),
            R(col("__sup").cast("double") / (col("n1") * col("n2")).cast("double"), 6)
              .as("d_stat_r"),
            R(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
              (col("n1") * col("n2")).cast("double")), 6).as("d_crit_r"),
            (col("__sup").cast("double") / (col("n1") * col("n2")).cast("double") >
              lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
                (col("n1") * col("n2")).cast("double"))).as("reject"))
      },
      Some(s"""WITH d AS (SELECT source, CAST(len($wsSql) AS BIGINT) AS nt
              |           FROM documents WHERE source IN ('src0', 'src1')),
              |per AS (SELECT nt,
              |          count(CASE WHEN source = 'src0' THEN 1 END) AS a,
              |          count(CASE WHEN source = 'src1' THEN 1 END) AS b
              |        FROM d GROUP BY nt),
              |cum AS (SELECT nt,
              |          sum(a) OVER (ORDER BY nt
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
              |          sum(b) OVER (ORDER BY nt
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
              |          sum(a) OVER () AS n1, sum(b) OVER () AS n2
              |        FROM per),
              |a AS (SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
              |        CAST(max(abs(ca * n2 - cb * n1)) AS BIGINT) AS sup
              |      FROM cum)
              |SELECT n1, n2,
              |  ${rs("CAST(sup AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)", 6)} AS d_stat_r,
              |  ${rs("1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE))", 6)} AS d_crit_r,
              |  CAST(sup AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) >
              |    1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)) AS reject
              |FROM a""".stripMargin)),

    // BM25 keyword retrieval (Robertson/Spärck Jones; the Lucene
    // idf = ln(1 + (N−df+0.5)/(df+0.5)) variant, k1=1.2, b=0.75) for a
    // fixed 3-term query — the relevance-scoring operator a corpus-search
    // or hard-negative-mining pipeline runs at scale. Per-term
    // contributions are rounded then DECIMAL-summed (ln-parity recipe),
    // and the top-20 ranking orders by that EXACT decimal score — no
    // float comparison crosses the hash. Scale: tf explode + two
    // broadcast-size aggregates (df per term, one avgdl scalar); the
    // corpus is scanned twice, never joined to itself.
    QueryDef(
      "q133_bm25",
      (s, dir) => {
        val terms = Seq("spark", "table", "query")
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), Text.tokensNorm(col("text")).as("__ws"))
          .select(col("doc_id"), col("__ws"), size(col("__ws")).cast("bigint").as("dl"))
        val stats = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
        val tf = d.select(col("doc_id"), col("dl"),
          explode(filter(col("__ws"), t => t.isin(terms.map(x => x: Any): _*))).as("t"))
          .groupBy(col("doc_id"), col("dl"), col("t")).agg(count(lit(1)).as("tf"))
        val df_ = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
        val scored = tf.join(broadcast(df_), Seq("t")).crossJoin(broadcast(stats))
          .select(col("doc_id"), col("dl"), col("t"), col("tf"),
            (log(lit(1.0) +
              (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
                (col("df").cast("double") + lit(0.5))) *
              (col("tf").cast("double") * lit(2.2)) /
              (col("tf").cast("double") + lit(1.2) *
                (lit(0.25) + lit(0.75) * col("dl").cast("double") /
                  (col("tot_dl").cast("double") / col("n_docs").cast("double")))))
              .as("term_score"))
        scored
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_terms_hit"),
            sum(R(col("term_score"), 12).cast(DecimalType(24, 12))).as("__score"))
          .withColumn("rank",
            row_number().over(
              Window.orderBy(col("__score").desc, col("doc_id").asc)).cast("bigint"))
          .filter(col("rank") <= 20)
          .select(col("rank"), col("doc_id"), col("n_terms_hit"),
            R(col("__score").cast("double"), 6).as("bm25_r"))
          .orderBy("rank")
      },
      Some(s"""WITH d AS (SELECT doc_id, $wsSql AS ws FROM documents),
              |dd AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM d),
              |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |         CAST(sum(dl) AS BIGINT) AS tot_dl FROM dd),
              |tf AS (SELECT doc_id, dl, t, count(*) AS tf
              |       FROM (SELECT doc_id, dl, unnest(ws) AS t FROM dd)
              |       WHERE t IN ('spark', 'table', 'query')
              |       GROUP BY doc_id, dl, t),
              |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
              |sc AS (SELECT doc_id,
              |         ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
              |                  (CAST(df.df AS DOUBLE) + 0.5)) *
              |         (CAST(tf AS DOUBLE) * 2.2) /
              |         (CAST(tf AS DOUBLE) + 1.2 *
              |          (0.25 + 0.75 * CAST(dl AS DOUBLE) /
              |           (CAST(tot_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS term_score
              |       FROM tf JOIN df USING (t) CROSS JOIN st),
              |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
              |         sum(CAST(${Num.roundSql("term_score", 12)} AS DECIMAL(24,12))) AS score
              |       FROM sc GROUP BY doc_id),
              |r AS (SELECT doc_id, n_terms_hit, score,
              |        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
              |      FROM ag)
              |SELECT rank, doc_id, n_terms_hit,
              |  ${rs("CAST(score AS DOUBLE)", 6)} AS bm25_r
              |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin)),

    // Equi-depth histogram (the ANALYZE statistic behind optimizer
    // selectivity estimates and skew detection): exact ntile(8) over
    // (value, key tie-break) → per-bucket count/min/max. The ntile runs
    // as Quantiles.exactNtile — approx boundaries place rows into coarse
    // cells, exact per-cell counts recover the global rank, a per-CELL
    // window assigns it — so the full lineitem relation never funnels
    // into one task (the round-9 verdict's #1 scale hazard; the old
    // single-partition form is QuantilesSpec's reference). Bucket stats
    // are invariant to tie placement (rows tied on every sort column are
    // interchangeable w.r.t. count/min/max), so the DuckDB oracle's own
    // ntile hash-matches unchanged.
    QueryDef(
      "q134_equidepth_hist",
      (s, dir) =>
        graft.ops.Quantiles.exactNtile(
          tbl(s, dir, "lineitem")
            .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
          8, col("l_extendedprice"), ascending = true,
          Seq(col("l_orderkey"), col("l_linenumber")), "bucket")
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_rows"),
            min(col("l_extendedprice")).as("lo"),
            max(col("l_extendedprice")).as("hi"))
          .orderBy("bucket"),
      Some("""WITH b AS (SELECT l_extendedprice,
             |  CAST(ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
             |       AS BIGINT) AS bucket
             |  FROM lineitem)
             |SELECT bucket, count(*) AS n_rows,
             |  min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)))
}
