package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-5 batch 2: iterative PageRank hash-oracled against an unrolled
  * recursive oracle (q144), the end-to-end entity-resolution capstone
  * composing corruption-invariant blocking + sorted-neighborhood
  * candidates + native Jaro-Winkler verify (q145), and time-series
  * linear interpolation — the midpoint-aware companion to q82's
  * forward fill (q146).
  */
object Extended9 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** q144's oracle is GENERATED: one CTE pair (contribution sum, new rank
    * vector) per iteration, each reproducing the Spark loop's exact
    * arithmetic — per-edge terms rounded to 12 decimals, summed as
    * DECIMAL (order-free), damped, re-rounded. Same constant fold shape
    * on both sides: 0.006 + 0.85 * coalesce(s, 0.0).
    */
  private val PrIters = 6
  private def pagerankSql: String = {
    val iters = (1 to PrIters).map { k =>
      s"""c$k AS (SELECT e.v,
         |        CAST(sum(CAST(${rs(s"r.r * e.frac", 12)} AS DECIMAL(24,12))) AS DOUBLE) AS s
         |      FROM ew e JOIN r${k - 1} r ON r.v = e.u GROUP BY e.v),
         |r$k AS (SELECT vtx.v, ${rs(s"0.006 + 0.85 * coalesce(c$k.s, 0.0)", 12)} AS r
         |      FROM vtx LEFT JOIN c$k ON c$k.v = vtx.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH eg AS (SELECT c.c_nationkey AS u, s.s_nationkey AS v, count(*) AS w
       |            FROM lineitem l
       |            JOIN orders o ON l.l_orderkey = o.o_orderkey
       |            JOIN customer c ON o.o_custkey = c.c_custkey
       |            JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |            GROUP BY 1, 2),
       |outd AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM eg GROUP BY 1),
       |ew AS (SELECT u, v, CAST(w AS DOUBLE) / CAST(outw AS DOUBLE) AS frac
       |       FROM eg JOIN outd USING (u)),
       |vtx AS (SELECT n_nationkey AS v FROM nation),
       |r0 AS (SELECT v, CAST(0.04 AS DOUBLE) AS r FROM vtx),
       |$iters
       |SELECT r$PrIters.v, n_name, r$PrIters.r AS pagerank
       |FROM r$PrIters JOIN nation ON n_nationkey = r$PrIters.v
       |ORDER BY v""".stripMargin
  }

  /** q147's oracle is also GENERATED: per merge round, a pair-count CTE
    * (zip-unnest of adjacent symbols), an argmax CTE (count DESC, then
    * lexicographic — fully deterministic), and a re-segmentation CTE
    * whose list_reduce fold replays the exact greedy left-to-right
    * non-overlapping merge the Spark `aggregate` HOF applies. DuckDB
    * list slices are INCLUSIVE ([:-2] drops the last element) — pinned
    * here because [:-1] silently keeps it.
    */
  private[graft] val BpeIters = 4

  /** The q147 training loop, shared with q321's corpus encode: returns
    * (per-iteration best-merge relations, the final word→symbols table).
    * Everything is lazy — q147 materializes only the merges, q321 only
    * the final segmentation (which transitively replays the merges).
    */
  private[graft] def bpeTrainLoop(
      s: org.apache.spark.sql.SparkSession, dir: String):
      (Seq[org.apache.spark.sql.DataFrame], org.apache.spark.sql.DataFrame) = {
    val words = tbl(s, dir, "documents")
      .select(explode(Text.tokensNorm(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var seq = words
      .select(col("w"), col("freq"), split(col("w"), "").as("syms"))
      .transform(graft.ops.Ckpt.apply)
    val merges = (1 to BpeIters).map { k =>
      val pairs = seq
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("p.0").as("pa"), col("p.1").as("pb"), col("freq"))
        .groupBy("pa", "pb").agg(sum(col("freq")).as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("pa"), col("pb")).limit(1)
      seq = seq.crossJoin(broadcast(best))
        .select(col("w"), col("freq"),
          aggregate(
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            slice(col("syms"), lit(1), lit(1)),
            (acc, x) => when(
              element_at(acc, -1) === col("pa") && x === col("pb"),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(col("pa"), col("pb")))))
              .otherwise(concat(acc, array(x)))).as("syms"))
      best.select(lit(k).as("it"), col("pa").as("a"), col("pb").as("b"),
        col("cnt").as("pair_count"))
    }
    (merges, seq)
  }

  /** The shared CTE chain (tok → w0 → s0 → p1/b1/s1 … p_K/b_K/s_K) for
    * both BPE oracles — s$BpeIters carries the final segmentation.
    */
  private[queries] def bpeCtes: String = {
    val iters = (1 to BpeIters).map { k =>
      s"""p$k AS (SELECT pa, pb, CAST(sum(freq) AS BIGINT) AS cnt
         |       FROM (SELECT freq, unnest(syms[:-2]) AS pa, unnest(syms[2:]) AS pb
         |             FROM s${k - 1})
         |       GROUP BY 1, 2),
         |b$k AS (SELECT pa, pb, cnt FROM p$k ORDER BY cnt DESC, pa, pb LIMIT 1),
         |s$k AS (SELECT w, freq,
         |          list_reduce(list_transform(syms, x -> [x]),
         |            (acc, x) -> CASE WHEN acc[-1] = pa AND x[1] = pb
         |                             THEN list_append(acc[:-2], pa || pb)
         |                             ELSE list_append(acc, x[1]) END) AS syms
         |        FROM s${k - 1} CROSS JOIN b$k)""".stripMargin
    }.mkString(",\n")
    s"""tok AS (SELECT t FROM (SELECT unnest(${TextQueries.wsSql}) AS t FROM documents)
       |             WHERE regexp_full_match(t, '[a-z]+')),
       |w0 AS (SELECT t AS w, count(*) AS freq FROM tok GROUP BY 1),
       |s0 AS (SELECT w, freq,
       |         list_transform(range(1, length(w)+1), i -> substr(w, CAST(i AS INT), 1))
       |           AS syms
       |       FROM w0),
       |$iters""".stripMargin
  }

  private def bpeSql: String = {
    val sel = (1 to BpeIters)
      .map(k => s"SELECT $k AS it, pa AS a, pb AS b, cnt AS pair_count FROM b$k")
      .mkString("\nUNION ALL ")
    s"""WITH $bpeCtes
       |$sel
       |ORDER BY it""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // PageRank over the customer-nation → supplier-nation trade graph
    // (damping 0.85, 6 iterations, uniform start 1/25). THE iterative-
    // algorithm template at 100 TB: the edge relation is aggregated once
    // (|V|² rows — Ckpt truncates the 4-way join lineage so
    // the loop doesn't replay it), the rank vector is tiny and BROADCAST
    // into every iteration's edge join; per-iteration cost is one
    // map-side join + one hash agg over edges. Per-vertex contribution
    // sums are rounded-term DECIMAL, so both engines converge through
    // bit-identical intermediate vectors. Dangling-vertex mass leaks (no
    // redistribution) — standard simplified PR, same on both sides.
    QueryDef(
      "q144_pagerank",
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
        // schema): the 6 rank rounds run on the driver over the
        // collected weighted edges (TinyGraph decision rule), with
        // Num.roundToD/dec12Sum as the bit-exact driver twins of the
        // former roundTo/DECIMAL(24,12) column arithmetic. The fact
        // rollup producing eg stays distributed — on a data-sized graph
        // (billions of vertices) the former broadcast-loop shape is
        // still the template.
        val edges = graft.ops.TinyGraph.collectBounded(eg, "q144 trade edges")
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        val outw = edges.groupMapReduce(_._1)(_._3)(_ + _)
        val byDst = edges
          .map { case (u, v, w) => (v, u, w.toDouble / outw(u).toDouble) }
          .groupMap(_._1)(e => (e._2, e._3))
        val nations = graft.ops.TinyGraph.collectBounded(
          tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name")),
          "q144 vertices")
          .map(r => (r.getInt(0), r.getString(1)))
        val vtx = nations.map(_._1)
        var rank: Map[Int, Double] = vtx.map(v => v -> 0.04).toMap
        (1 to PrIters).foreach { _ =>
          val snap = rank
          rank = vtx.map { v =>
            // snap.get mirrors the former inner join on u: an edge whose
            // source is not a nation key contributes nothing
            val s0 = Num.dec12Sum(byDst.getOrElse(v, Array.empty[(Int, Double)]).toSeq
              .flatMap { case (u, frac) =>
                snap.get(u).map(ru => Num.roundToD(ru * frac, 12)) })
            v -> Num.roundToD(0.006 + 0.85 * s0, 12)
          }.toMap
        }
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(nations.sortBy(_._1).map { case (v, name) =>
            org.apache.spark.sql.Row(v, name, rank(v))
          }: _*)
        s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("n_name",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("pagerank",
              org.apache.spark.sql.types.DoubleType))))
          .orderBy("v")
      },
      Some(pagerankSql)),

    // Entity-resolution capstone: q140's blocking + q135's verify as ONE
    // pipeline. Every 5th doc gets a deterministic corruption (all vowels
    // deleted); records block on the consonant skeleton — which the
    // corruption PRESERVES, so a variant always sorts adjacent to its
    // canon (same skeleton, same doc_id, kind 'c' < 'v') and candidate
    // recall on true pairs is 1.0 by construction. The native
    // jaro_winkler verify (>= 0.75 on the 60-char prefixes — below every
    // true restoration's score at sf0.01 AND sf0.1) emits surviving
    // pairs WITH their ground-truth label, so the output doubles as the
    // precision/recall evaluation table. Candidates are 2n via in-block
    // adjacency — no shingle blow-up; the verify is map-side codegen.
    // SCALE SHAPE: q140's hot-block argument — in-block positions come
    // from PrefixSum.rank (cells over the packed post-prefix skeleton
    // bytes; shuffled offsets), neighbor i is an equi-join on
    // (blk, pos+i), row-identical to lead(i) with no whole-block task.
    QueryDef(
      "q145_er_pipeline",
      (s, dir) => {
        graft.functions.StringExpressions.register(s)
        val docs = tbl(s, dir, "documents")
          .select(col("doc_id"), Text.normalize(col("text")).as("nm"))
        val canon = docs.select(col("doc_id"), lit("c").as("kind"), col("nm"))
        val variants = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), lit("v").as("kind"),
            regexp_replace(col("nm"), "[aeiou]", "").as("nm"))
        val tagged = canon.unionAll(variants)
          .withColumn("skel", substring(regexp_replace(col("nm"), "[aeiou ]", ""), 1, 16))
          .withColumn("blk", substring(col("skel"), 1, 6))
        val ranked = graft.ops.PrefixSum.rank(
          tagged, Seq("blk"), col("skel"), ascending = true,
          Seq(col("doc_id"), col("kind")), "__pos",
          cellKey = Some(graft.ops.PrefixSum.packAscii(col("skel"), 7, 6)),
          broadcastOffsets = false)
        val probes = ranked.select(col("doc_id"), col("kind"), col("nm"), col("blk"),
            explode(array(lit(1), lit(2))).as("__i"), col("__pos"))
          .select(col("doc_id"), col("kind"), col("nm"), col("blk"),
            (col("__pos") + col("__i")).as("__npos"))
        probes
          .join(ranked.select(col("blk"), col("__pos").as("__npos"),
            col("doc_id").as("nid"), col("kind").as("nkind"), col("nm").as("nnm")),
            Seq("blk", "__npos"))
          .filter(col("kind") =!= col("nkind"))
          .withColumn("jw_r", R(graft.functions.StringExpressions.jaroWinkler(
            substring(col("nm"), 1, 60), substring(col("nnm"), 1, 60)), 4))
          .filter(col("jw_r") >= 0.75)
          .select(
            when(col("kind") === "v", col("doc_id")).otherwise(col("nid")).as("variant_id"),
            when(col("kind") === "v", col("nid")).otherwise(col("doc_id")).as("canon_id"),
            col("jw_r"),
            (when(col("kind") === "v", col("doc_id")).otherwise(col("nid")) ===
              when(col("kind") === "v", col("nid")).otherwise(col("doc_id"))).as("is_true"))
          .orderBy("variant_id", "canon_id")
      },
      Some(s"""WITH docs AS (SELECT doc_id,
              |               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nm
              |             FROM documents),
              |tagged AS (
              |  SELECT doc_id, 'c' AS kind, nm FROM docs
              |  UNION ALL
              |  SELECT doc_id, 'v', regexp_replace(nm, '[aeiou]', '', 'g')
              |  FROM docs WHERE doc_id % 5 = 0),
              |k AS (SELECT doc_id, kind, nm,
              |        substr(regexp_replace(nm, '[aeiou ]', '', 'g'), 1, 16) AS skel
              |      FROM tagged),
              |kb AS (SELECT doc_id, kind, nm, skel, substr(skel, 1, 6) AS blk FROM k),
              |nb0 AS (SELECT doc_id, kind, nm,
              |          lead(doc_id, 1) OVER w AS nid1, lead(kind, 1) OVER w AS nk1,
              |          lead(nm, 1) OVER w AS nnm1,
              |          lead(doc_id, 2) OVER w AS nid2, lead(kind, 2) OVER w AS nk2,
              |          lead(nm, 2) OVER w AS nnm2
              |        FROM kb WINDOW w AS (PARTITION BY blk ORDER BY skel, doc_id, kind)),
              |nb AS (SELECT doc_id, kind, nm, nid1 AS nid, nk1 AS nkind, nnm1 AS nnm FROM nb0
              |       UNION ALL SELECT doc_id, kind, nm, nid2, nk2, nnm2 FROM nb0),
              |p AS (SELECT doc_id, kind, nid, nkind,
              |        ${rs("jaro_winkler_similarity(substr(nm, 1, 60), substr(nnm, 1, 60))", 4)}
              |          AS jw_r
              |      FROM nb WHERE nid IS NOT NULL AND kind <> nkind),
              |m AS (SELECT
              |        CASE WHEN kind = 'v' THEN doc_id ELSE nid END AS variant_id,
              |        CASE WHEN kind = 'v' THEN nid ELSE doc_id END AS canon_id,
              |        jw_r
              |      FROM p WHERE jw_r >= 0.75)
              |SELECT variant_id, canon_id, jw_r, variant_id = canon_id AS is_true
              |FROM m ORDER BY variant_id, canon_id""".stripMargin)),

    // Linear interpolation over the hourly timeline — q82's gap-fill
    // upgraded from step (last-observation-carried-forward) to
    // piecewise-linear, with edge policy ffill/bfill and a method column
    // for lineage. Two frame-bounded windows over ONE sort (same
    // partitioning as the timeline join — no extra exchange); the
    // interpolation weight is an exact integer ratio, so the arithmetic
    // is one deterministic IEEE chain on both engines.
    QueryDef(
      "q146_linear_interp",
      (s, dir) => {
        // Ckpt (r16): ev feeds the span rollup AND the timeline join-back
        // — the events scan+agg+repartition otherwise ran twice
        val ev = graft.ops.Ckpt(tbl(s, dir, "events")
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(R(avg(col("value")), 4).as("v"))
          .repartition(col("user_id")))
        val timeline = ev.groupBy(col("user_id"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
        val wb = Window.partitionBy(col("user_id")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // "next observation" = last-ignorenulls over the REVERSED order
        // with the same running frame — semantically first-over-following
        // (frame includes the current row either way), but Spark evaluates
        // running frames incrementally in O(n) while an
        // unbounded-FOLLOWING frame re-aggregates per row (O(n²) per
        // partition — measured 57 s vs 2 s on the sf0.1 timeline)
        val wf = Window.partitionBy(col("user_id")).orderBy(col("h").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sec = col("h").cast("long")
        val x = timeline.join(ev, Seq("user_id", "h"), "left")
          .select(col("user_id"), col("h"), col("v"),
            sec.as("hs"),
            last(col("v"), ignoreNulls = true).over(wb).as("pv"),
            last(when(col("v").isNotNull, sec), ignoreNulls = true).over(wb).as("ph"),
            last(col("v"), ignoreNulls = true).over(wf).as("nv"),
            last(when(col("v").isNotNull, sec), ignoreNulls = true).over(wf).as("nh"))
        x.select(
            col("user_id"),
            date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNotNull && col("nv").isNotNull,
                R(col("pv") + (col("nv") - col("pv")) *
                  ((col("hs") - col("ph")).cast("double") /
                    (col("nh") - col("ph")).cast("double")), 6))
              .otherwise(coalesce(col("pv"), col("nv"))).as("v_interp"),
            when(col("v").isNotNull, "obs")
              .when(col("pv").isNotNull && col("nv").isNotNull, "interp")
              .when(col("pv").isNotNull, "ffill")
              .otherwise("bfill").as("method"))
          .orderBy("user_id", "hour")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
              |    ${rs("avg(value)", 4)} AS v
              |  FROM events GROUP BY 1, 2),
              |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY 1),
              |tl AS (SELECT user_id,
              |         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              |       FROM span),
              |j AS (SELECT tl.user_id, tl.h, ev.v
              |      FROM tl LEFT JOIN ev ON ev.user_id = tl.user_id AND ev.h = tl.h),
              |x AS (SELECT user_id, h, v,
              |        CAST(epoch(h) AS BIGINT) AS hs,
              |        last_value(v IGNORE NULLS) OVER wb AS pv,
              |        last_value(CASE WHEN v IS NOT NULL
              |          THEN CAST(epoch(h) AS BIGINT) END IGNORE NULLS) OVER wb AS ph,
              |        first_value(v IGNORE NULLS) OVER wf AS nv,
              |        first_value(CASE WHEN v IS NOT NULL
              |          THEN CAST(epoch(h) AS BIGINT) END IGNORE NULLS) OVER wf AS nh
              |      FROM j
              |      WINDOW wb AS (PARTITION BY user_id ORDER BY h
              |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |             wf AS (PARTITION BY user_id ORDER BY h
              |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              |SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
              |  CASE WHEN v IS NOT NULL THEN v
              |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              |         ${rs("pv + (nv - pv) * (CAST(hs - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))", 6)}
              |       ELSE coalesce(pv, nv) END AS v_interp,
              |  CASE WHEN v IS NOT NULL THEN 'obs'
              |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
              |       WHEN pv IS NOT NULL THEN 'ffill'
              |       ELSE 'bfill' END AS method
              |FROM x ORDER BY user_id, hour""".stripMargin)),

    // BPE tokenizer training (Sennrich 2016): 4 merge rounds over the
    // corpus vocabulary, entirely inside the plan — per round one
    // zip-explode + hash agg counts adjacent symbol pairs (weighted by
    // word frequency), a TakeOrderedAndProject picks the argmax
    // (count DESC, then lexicographic — no ties possible), and the pick
    // BROADCASTS into an `aggregate` HOF fold that re-segments every
    // word greedily left-to-right. No collect anywhere: the learned rule
    // steers the next round as a broadcast column. At 100 TB the token
    // count is the only corpus-sized stage; everything after runs on the
    // distinct-word relation (vocabulary-sized, Ckpt-truncated once —
    // reliable when graft.checkpoint.dir is set).
    QueryDef(
      "q147_bpe_merges",
      (s, dir) => {
        val (merges, _) = bpeTrainLoop(s, dir)
        merges.reduce(_ unionAll _).orderBy("it")
      },
      Some(bpeSql)))
}
