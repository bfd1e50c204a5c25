package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-5 batch 2: blocklist scrubbing (the C4 bad-word stage), vocabulary
  * coverage (the tokenizer-design aggregate), LATERAL and WITH RECURSIVE
  * SQL surfaces (one SQL text valid verbatim in Spark AND DuckDB), and the
  * regr_* linear-regression aggregate battery. All hash-oracled.
  */
object Extended6 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  private def registerViews(s: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach(t => tbl(s, dir, t).createOrReplaceTempView(t))

  import TextQueries.wsSql

  /** C4-style blocklist (Raffel et al. 2020 §2.2 filter the "bad words"
    * list; here three fixture-vocabulary stand-ins).
    */
  private val blocklist = Seq("slow", "big", "the")
  private def inList(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  /** Correlated-aggregate LATERAL subquery — ONE text, valid verbatim in
    * Spark (decorrelated to a left outer aggregate join by Catalyst) and
    * DuckDB. count over an empty group is 0, max is NULL, in both.
    */
  private val sqlLateral =
    """SELECT p.p_partkey, p.p_name, t.n_li, t.max_price
      |FROM part p, LATERAL (
      |  SELECT count(*) AS n_li, max(l_extendedprice) AS max_price
      |  FROM lineitem WHERE l_partkey = p.p_partkey) t
      |WHERE p.p_partkey <= 25
      |ORDER BY p.p_partkey""".stripMargin

  /** Recursive-CTE ancestor walk over the implicit binary hierarchy
    * parent(k) = floor(k/2) — ONE text, valid verbatim in Spark 4
    * (UnionLoopExec) and DuckDB. UNION ALL recursion on an acyclic
    * relation, exact integer arithmetic throughout; depth_to_root and the
    * ancestor-key checksum pin every step of every walk.
    */
  private val sqlRecursive =
    """WITH RECURSIVE h(node, anc, depth) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 200
      |  UNION ALL
      |  SELECT node, CAST(floor(anc / 2.0) AS BIGINT), depth + 1
      |  FROM h WHERE anc > 1
      |)
      |SELECT node, max(depth) AS depth_to_root,
      |  CAST(sum(anc) AS BIGINT) AS anc_keysum
      |FROM h GROUP BY node ORDER BY node""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // Blocklist scrub — filter AND transformation in one pass: per-doc
    // hit count, the distinct offending terms, the text REBUILT with
    // blocklist tokens removed, and the keep decision. Pure higher-order
    // array ops over one scan: no shuffle, no join — at 100 TB the cost
    // is the scan. (Real pipelines swap in the published bad-word list;
    // the operator is list-size-independent: isin compiles to a hash-set
    // probe per token.)
    QueryDef(
      "q119_blocklist_scrub",
      (s, dir) => {
        val bl = blocklist.map(x => x: Any)
        val d = tbl(s, dir, "documents")
          .withColumn("__t", Text.tokensNorm(col("text")))
        val hits = filter(col("__t"), t => t.isin(bl: _*))
        val kept = filter(col("__t"), t => !t.isin(bl: _*))
        d.select(
          col("doc_id"),
          size(hits).cast("bigint").as("n_hits"),
          concat_ws(",", array_sort(array_distinct(hits))).as("hit_terms"),
          concat_ws(" ", kept).as("scrubbed"),
          (size(hits) === 0).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents)
              |SELECT doc_id,
              |  CAST(len(list_filter(ws, x -> x IN ${inList(blocklist)})) AS BIGINT) AS n_hits,
              |  coalesce(list_aggregate(list_sort(list_distinct(
              |    list_filter(ws, x -> x IN ${inList(blocklist)}))), 'string_agg', ','), '') AS hit_terms,
              |  coalesce(list_aggregate(
              |    list_filter(ws, x -> x NOT IN ${inList(blocklist)}), 'string_agg', ' '), '') AS scrubbed,
              |  len(list_filter(ws, x -> x IN ${inList(blocklist)})) = 0 AS keep
              |FROM w ORDER BY doc_id""".stripMargin)),

    // Vocabulary coverage curve: corpus token frequencies ranked, with
    // the cumulative share of all token OCCURRENCES covered by the top-r
    // types — the aggregate a tokenizer/vocab designer reads to size the
    // vocabulary (how many types cover 90%?). Exact integers until one
    // final division; the in_vocab90 flag is pure integer arithmetic
    // ((cum−cnt)·10 < total·9), so no float threshold crosses the hash.
    // The global window runs over VOCABULARY-cardinality rows (types, not
    // tokens) — at 100 TB the heavy part is the upstream hash agg; the
    // ranked curve is tiny.
    QueryDef(
      "q120_vocab_coverage",
      (s, dir) => {
        val freq = tbl(s, dir, "documents")
          .select(explode(Text.tokensNorm(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy(col("cnt").desc, col("tok").asc)
        val cum = sum(col("cnt"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        val total = sum(col("cnt")).over()
        freq
          .select(
            row_number().over(w).cast("bigint").as("rank"),
            col("tok"), col("cnt"), cum.as("cum"), total.as("total"))
          .filter(col("rank") <= 30)
          .select(
            col("rank"), col("tok"), col("cnt"), col("cum"),
            R(col("cum").cast("double") / col("total").cast("double"), 6).as("cov_r"),
            ((col("cum") - col("cnt")) * 10 < col("total") * 9).as("in_vocab90"))
          .orderBy("rank")
      },
      Some(s"""WITH f AS (
              |  SELECT tok, count(*) AS cnt
              |  FROM (SELECT unnest($wsSql) AS tok FROM documents)
              |  GROUP BY tok),
              |r AS (
              |  SELECT tok, cnt,
              |    row_number() OVER (ORDER BY cnt DESC, tok) AS rank,
              |    sum(cnt) OVER (ORDER BY cnt DESC, tok
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              |    sum(cnt) OVER () AS total
              |  FROM f)
              |SELECT CAST(rank AS BIGINT) AS rank, tok,
              |  CAST(cnt AS BIGINT) AS cnt, CAST(cum AS BIGINT) AS cum,
              |  ${rs("CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)", 6)} AS cov_r,
              |  (cum - cnt) * 10 < total * 9 AS in_vocab90
              |FROM r WHERE rank <= 30 ORDER BY rank""".stripMargin)),

    // LATERAL correlated subquery — the SQL-surface form of "for each
    // outer row, run this parameterized subquery". Catalyst decorrelates
    // it to a plain left outer aggregate join (no per-row re-execution),
    // which is exactly why it survives scale; the same text runs
    // verbatim in DuckDB.
    QueryDef(
      "q121_lateral_topk",
      (s, dir) => {
        registerViews(s, dir, Seq("part", "lineitem"))
        s.sql(sqlLateral)
      },
      Some(sqlLateral)),

    // WITH RECURSIVE (Spark 4's UnionLoopExec) — iterative reachability
    // as ONE declarative query: ancestor walks over parent(k)=⌊k/2⌋,
    // aggregated to depth + ancestor checksum per node. The batch twin
    // of the iterative min-label propagation in Dedup.connectedComponents
    // — same fixed-point idea, engine-managed loop.
    QueryDef(
      "q122_recursive_walk",
      (s, dir) => {
        registerViews(s, dir, Seq("customer"))
        s.sql(sqlRecursive)
      },
      Some(sqlRecursive)),

    // Linear-regression aggregate battery (regr_slope/intercept/r2/
    // avgx/avgy/count): price-versus-quantity fit per return flag — the
    // one-pass sufficient-statistics form (moments, not row iteration),
    // identical closed-form definitions in both engines, rounded like
    // q83's corr battery.
    QueryDef(
      "q124_regr_battery",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pairs"),
            R(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope_r"),
            R(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6).as("icept_r"),
            R(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2_r"),
            R(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6).as("avgx_r"),
            R(regr_avgy(col("l_extendedprice"), col("l_quantity")), 2).as("avgy_r"))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
              |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
              |  ${rs("regr_slope(l_extendedprice, l_quantity)", 6)} AS slope_r,
              |  ${rs("regr_intercept(l_extendedprice, l_quantity)", 6)} AS icept_r,
              |  ${rs("regr_r2(l_extendedprice, l_quantity)", 6)} AS r2_r,
              |  ${rs("regr_avgx(l_extendedprice, l_quantity)", 6)} AS avgx_r,
              |  ${rs("regr_avgy(l_extendedprice, l_quantity)", 2)} AS avgy_r
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)))
}
