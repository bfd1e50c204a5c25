package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-7 second batch: corpus phrase mining (PMI), exponentially-weighted
  * time-series features, label-propagation communities, cross-source score
  * calibration, functional-dependency profiling, and harmonic centrality.
  * Each fills a gap the first 157 queries do not cover: collocation
  * statistics, decayed temporal features, a community detector that is NOT
  * connected components, distribution-aware normalization across corpus
  * sources, FD-style data-quality audits, and a per-vertex centrality
  * beyond PageRank/BFS.
  *
  * Determinism follows the house contract (QueryDef scaladoc): total ORDER
  * BY, identical aliases both sides, `Num.roundTo`/`roundSql` for floats,
  * and rounded-term DECIMAL accumulation wherever a sum's order is not
  * fixed by the plan.
  */
object Extended12 {

  import TextQueries.wsSql

  /** Synchronous label-propagation rounds shared by the q160 Spark loop
    * and its generated unrolled-CTE oracle. Fixed rounds (not
    * convergence-tested) keep the two engines in lockstep by construction;
    * 4 rounds is past convergence on the fixture's dense trade graph.
    */
  private val LpaRounds = 4

  /** Hop bound shared by q163's Spark loop and its recursive-CTE oracle —
    * same contract as q153/q157: identical cutoffs mean identical results
    * even where the bound truncates a longer shortest path.
    */
  private val HcMaxHops = 6

  /** EWMA lookback (number of most-recent events) and decay. 0.5^k has
    * exactly k decimal digits, so every weight for k < 10 is EXACT as a
    * DECIMAL(24,12) — the weight sum carries no float error at all.
    */
  private val EwmaK = 10
  private val EwmaAlpha = BigDecimal("0.5")

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** The directed nation-level trade graph (customer nation → supplier
    * nation), shared by q160/q163. Same derivation as q153/q157.
    */
  private def tradeEdges(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      .join(tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey").as("u")),
        col("o_custkey") === col("c_custkey"))
      .join(tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey").as("w")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("u"), col("w").as("v")).distinct()

  private val tradeEdgesSql =
    """SELECT DISTINCT c.c_nationkey AS u, s.s_nationkey AS v
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey""".stripMargin

  /** q160 oracle: LPA unrolled to LpaRounds synchronous rounds. Each round
    * is neighbor-label join → (v,lab) count → deterministic argmax
    * (count DESC, label ASC) → left-join merge so isolated vertices keep
    * their label. Integer-only — no float noise anywhere.
    */
  private def lpaSql: String = {
    val rounds = (1 to LpaRounds).map { k =>
      s"""c$k AS (SELECT e.u AS v, l.lab, count(*) AS c
         |      FROM eg e JOIN l${k - 1} l ON l.v = e.v GROUP BY 1, 2),
         |p$k AS (SELECT v, lab FROM (
         |        SELECT v, lab,
         |               row_number() OVER (PARTITION BY v ORDER BY c DESC, lab ASC) AS rn
         |        FROM c$k) WHERE rn = 1),
         |l$k AS (SELECT l.v, coalesce(p.lab, l.lab) AS lab
         |      FROM l${k - 1} l LEFT JOIN p$k p ON p.v = l.v)""".stripMargin
    }.mkString(",\n")
    // MATERIALIZED: without it DuckDB inlines the 4-way edge join into
    // every unrolled round and OOMs at sf0.1 — compute the 25×25 edge
    // relation once
    s"""WITH dg AS MATERIALIZED ($tradeEdgesSql),
       |eg AS MATERIALIZED (SELECT u, v FROM dg WHERE u <> v
       |       UNION SELECT v, u FROM dg WHERE u <> v),
       |l0 AS (SELECT n_nationkey AS v, n_nationkey AS lab FROM nation),
       |$rounds
       |SELECT v, lab AS community FROM l$LpaRounds ORDER BY v""".stripMargin
  }

  /** q159 helper: the k-th decay weight as an exact decimal string. */
  private def w(k: Int): String = EwmaAlpha.pow(k).bigDecimal.toPlainString

  /** q159 oracle: the same EwmaK lag terms, generated. */
  private def ewmaSql: String = {
    val lags = (0 until EwmaK).map { k =>
      s"lag(value, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v$k"
    }.mkString(",\n       ")
    val terms = (0 until EwmaK).map { k =>
      s"coalesce(CAST(${rs(s"v$k * ${w(k)}", 12)} AS DECIMAL(24,12)), 0)"
    }.mkString(" +\n        ")
    val wts = (0 until EwmaK).map { k =>
      s"CASE WHEN v$k IS NOT NULL THEN CAST(${w(k)} AS DECIMAL(24,12)) ELSE CAST(0 AS DECIMAL(24,12)) END"
    }.mkString(" +\n        ")
    s"""WITH lagged AS (
       |  SELECT event_id, user_id,
       |       $lags
       |  FROM events),
       |acc AS (
       |  SELECT event_id, user_id,
       |        $terms AS s,
       |        $wts AS wsum
       |  FROM lagged)
       |SELECT event_id, user_id,
       |  ${rs("CAST(s AS DOUBLE) / CAST(nullif(wsum, 0) AS DOUBLE)", 4)} AS ewma_r
       |FROM acc ORDER BY event_id""".stripMargin
  }

  /** q163 oracle: multi-source bounded BFS via one recursive CTE over
    * (src, v, dist); UNION dedup keeps the walk finite on cycles.
    */
  private def harmonicSql: String =
    s"""WITH RECURSIVE eg AS ($tradeEdgesSql),
       |walk(src, v, dist) AS (
       |  SELECT n_nationkey, n_nationkey, 0 FROM nation
       |  UNION
       |  SELECT walk.src, eg.v, walk.dist + 1
       |  FROM walk JOIN eg ON eg.u = walk.v
       |  WHERE walk.dist < $HcMaxHops),
       |d AS (SELECT src, v, min(dist) AS d FROM walk GROUP BY 1, 2),
       |h AS (SELECT src,
       |        count(*) AS n_reached,
       |        CAST(sum(CAST(${rs("1.0 / CAST(d AS DOUBLE)", 12)} AS DECIMAL(24,12))) AS DOUBLE) AS hsum
       |      FROM d WHERE d > 0 GROUP BY 1)
       |SELECT n.n_nationkey AS v,
       |  coalesce(h.n_reached, 0) AS n_reached,
       |  ${rs("coalesce(h.hsum, 0.0)", 4)} AS harmonic_r
       |FROM nation n LEFT JOIN h ON h.src = n.n_nationkey
       |ORDER BY v""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ----- q158: PMI collocation mining (phrase detection) --------------
    // The classic phrase-mining pass over a training corpus (word2vec's
    // phrase pass, Mikolov et al. 2013 uses the same score family):
    // PMI(x,y) = log2( P(xy) / (P(x)P(y)) ) over adjacent token pairs.
    // Shape at scale: one token-keyed hash agg for unigrams, one
    // pair-keyed hash agg for bigrams (both map-side partial), two
    // token-keyed shuffle joins to attach marginals, scalar totals
    // broadcast. No all-pairs term anywhere — cost is corpus-linear plus
    // two joins keyed on tokens. min-count 5 prunes the long noise tail
    // BEFORE the joins, which is also the 100 TB posture (hapax bigrams
    // are most of the key space and carry no phrase signal).
    QueryDef(
      "q158_pmi_collocations",
      (s, dir) => {
        val toks = tbl(s, dir, "documents")
          .select(col("doc_id"), posexplode(Text.tokensNorm(col("text"))).as(Seq("pos", "t")))
          .filter(col("t") =!= "")
        val big = toks
          .withColumn("p",
            lag(col("t"), 1).over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
          .filter(col("p").isNotNull)
        val uni = toks.groupBy(col("t")).agg(count(lit(1)).as("cu"))
        val nu = toks.agg(count(lit(1)).as("nu"))
        val nb = big.agg(count(lit(1)).as("nb"))
        val pairs = big.groupBy(col("p"), col("t"))
          .agg(count(lit(1)).as("cb"))
          .filter(col("cb") >= 5)
        val pmi = log(
          (col("cb").cast("double") * col("nu").cast("double") * col("nu").cast("double")) /
            (col("nb").cast("double") * col("cup").cast("double") * col("cut").cast("double"))) /
          log(lit(2.0))
        pairs
          .join(uni.select(col("t").as("p"), col("cu").as("cup")), "p")
          .join(uni.select(col("t"), col("cu").as("cut")), "t")
          .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
          .select(col("p"), col("t"), col("cb"), R(pmi, 4).as("pmi_r"))
          .orderBy("p", "t")
      },
      // token relation via parallel unnest (positional zip of the two
      // shifted slices), NOT a range cross-join: the range form made
      // DuckDB materialize |docs|×1000 carrier rows and spill tens of GB
      // at sf0.1. Slices align only because ws never contains '' after
      // trim (whitespace-only text yields [''] with len 1, excluded).
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
              |tok AS (SELECT unnest(ws) AS t FROM w),
              |big AS (SELECT unnest(ws[1:len(ws)-1]) AS p,
              |               unnest(ws[2:len(ws)]) AS t
              |        FROM w WHERE len(ws) >= 2 AND ws[1] <> ''),
              |uni AS (SELECT t, count(*) AS cu FROM tok WHERE t <> '' GROUP BY 1),
              |tot AS (SELECT (SELECT count(*) FROM tok WHERE t <> '') AS nu,
              |               (SELECT count(*) FROM big) AS nb),
              |pairs AS (SELECT p, t, count(*) AS cb FROM big GROUP BY 1, 2
              |          HAVING count(*) >= 5),
              |j AS (SELECT pr.p, pr.t, pr.cb,
              |        ln((CAST(pr.cb AS DOUBLE) * CAST(tot.nu AS DOUBLE) * CAST(tot.nu AS DOUBLE)) /
              |           (CAST(tot.nb AS DOUBLE) * CAST(up.cu AS DOUBLE) * CAST(ut.cu AS DOUBLE))) /
              |        ln(2.0) AS pmi
              |      FROM pairs pr
              |      JOIN uni up ON up.t = pr.p
              |      JOIN uni ut ON ut.t = pr.t
              |      CROSS JOIN tot)
              |SELECT p, t, cb, ${rs("pmi", 4)} AS pmi_r
              |FROM j ORDER BY p, t""".stripMargin)),

    // ----- q159: per-user EWMA over the last 10 events ------------------
    // Exponentially-decayed temporal feature (fraud/engagement scoring,
    // feature-store backfill). One window over (user_id ORDER BY ts,
    // event_id) produces all 10 lag terms — a single shuffle on user_id,
    // no self-join, fully codegen'd. Each term is rounded to 12 dp and
    // accumulated as DECIMAL(24,12) in a FIXED textual order, and 0.5^k
    // is exact at ≤ 12 dp, so both engines compute bit-identical sums; a
    // null value (or pre-history lag) drops both the term and its weight.
    // At 100 TB this is the canonical "one shuffle per feature family"
    // design — every decayed feature shares the same window.
    QueryDef(
      "q159_ewma",
      (s, dir) => {
        val win = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val lagged = (0 until EwmaK).foldLeft(
          tbl(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"), col("value"))) {
          (df, k) => df.withColumn(s"v$k", lag(col("value"), k).over(win))
        }
        val dec = DecimalType(24, 12)
        val sTerm = (0 until EwmaK).map { k =>
          coalesce(R(col(s"v$k") * lit(w(k)).cast("double"), 12).cast(dec), lit(0).cast(dec))
        }.reduceLeft(_ + _)
        val wTerm = (0 until EwmaK).map { k =>
          when(col(s"v$k").isNotNull, lit(new java.math.BigDecimal(w(k))).cast(dec))
            .otherwise(lit(0).cast(dec))
        }.reduceLeft(_ + _)
        lagged
          .withColumn("s", sTerm).withColumn("wsum", wTerm)
          .select(col("event_id"), col("user_id"),
            R(col("s").cast("double") /
              when(col("wsum") === lit(0).cast(dec), lit(null).cast("double"))
                .otherwise(col("wsum").cast("double")), 4).as("ewma_r"))
          .orderBy("event_id")
      },
      Some(ewmaSql)),

    // ----- q160: label-propagation communities --------------------------
    // Community detection that is NOT connected components: synchronous
    // LPA (Raghavan et al. 2007) on the undirected trade graph, fixed
    // rounds, deterministic tie-break (neighbor-label count DESC, label
    // ASC). Per round: one shuffle join (edges × labels, both keyed on
    // vertex), one (v,label) hash agg, one per-vertex window argmax —
    // all integer arithmetic. Lineage is Ckpt-truncated per round like
    // q144/q153; on a real cluster the same switch selects reliable
    // checkpointing. Vertex state never collects to the driver, so the
    // plan survives graphs with billions of vertices (rounds are the only
    // serial dimension).
    QueryDef(
      "q160_label_prop",
      (s, dir) => {
        val dg = tradeEdges(s, dir).filter(col("u") =!= col("v"))
        // the symmetric nation-level edge relation is dimension-bounded
        // (≤ |nation|² rows by schema) — the 4 synchronous LPA rounds run
        // on the driver over the collected edges (TinyGraph decision
        // rule; all-integer argmax with the identical (count DESC, label
        // ASC) tie-break), instead of 4 × (join + agg + window + Ckpt)
        // scheduler rounds. The fact rollup producing dg stays
        // distributed; a data-sized graph keeps the distributed loop.
        val edges = graft.ops.TinyGraph.collectBounded(dg, "q160 trade edges")
          .map(r => (r.getInt(0), r.getInt(1)))
        val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
        val inTo = sym.groupMap(_._1)(_._2) // u -> neighbors v (labels flow v→u)
        val vtx = graft.ops.TinyGraph.collectBounded(
          tbl(s, dir, "nation").select(col("n_nationkey")), "q160 vertices")
          .map(_.getInt(0))
        var labels: Map[Int, Int] = vtx.map(v => v -> v).toMap
        (1 to LpaRounds).foreach { _ =>
          val snap = labels
          labels = vtx.map { v =>
            val nbLabels = inTo.getOrElse(v, Array.empty[Int]).toSeq.map(snap)
            if (nbLabels.isEmpty) v -> snap(v)
            else {
              val best = nbLabels.groupBy(identity).view
                .mapValues(_.size).toSeq
                .minBy { case (lab, c) => (-c, lab) }._1
              v -> best
            }
          }.toMap
        }
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(vtx.sorted.map(v =>
            org.apache.spark.sql.Row(v, labels(v))): _*)
        s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("community",
              org.apache.spark.sql.types.IntegerType))))
          .orderBy("v")
      },
      Some(lpaSql)),

    // ----- q161: cross-source score calibration -------------------------
    // Quality scores are not comparable across corpus sources (a "good"
    // web page and a "good" paper sit on different scales); mixing on raw
    // scores over- or under-samples whole domains. Calibration = per-source
    // z-score plus per-source percent_rank. The moments accumulate as
    // EXACT integer sums (sum, sum-of-squares over BIGINT n_chars) — one
    // map-side-partial hash agg — and only the final mean/var division
    // happens in (identically-written) double math, so engine summation
    // order cannot move the result. percent_rank is an exact rational of
    // two integers — and because SQL RANK() is 1 + (# rows strictly
    // below), it is a pure function of the (source, n_chars) FREQUENCY
    // ROLLUP: a `percent_rank() OVER (PARTITION BY source)` window over
    // raw docs would funnel N/20 rows into one task at 100 TB, so the
    // rank comes from PrefixSum over the length-domain-saturating rollup
    // instead, joined back on (source, n_chars).
    QueryDef(
      "q161_score_calibrate",
      (s, dir) => {
        val d = tbl(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
        val stats = d.groupBy(col("source")).agg(
          count(lit(1)).as("n"),
          sum(col("n_chars")).as("s1"),
          sum(col("n_chars") * col("n_chars")).as("s2"))
        val mean = col("s1").cast("double") / col("n").cast("double")
        val vr = (col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / col("n").cast("double")) /
          (col("n").cast("double") - lit(1.0))
        val z = (col("n_chars").cast("double") - mean) / sqrt(vr)
        val cnt = d.groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("__c"))
        val below = graft.ops.PrefixSum.exclusiveSum(
            cnt, Seq("source"), col("n_chars"), ascending = true, Nil, col("__c"), "__lt")
          .select(col("source"), col("n_chars"), col("__lt"))
        // per-source stats are |sources| rows — broadcast them; without
        // the hint fixture-scale stats make Spark broadcast the DOCUMENT
        // side (BuildLeft), which is exactly backwards at 100 TB
        d.join(broadcast(stats), "source")
          .join(below, Seq("source", "n_chars"))
          .withColumn("pct",
            when(col("n") > 1L,
              col("__lt").cast("double") / (col("n") - 1L).cast("double"))
              .otherwise(lit(0.0)))
          .select(col("doc_id"), col("source"), col("n_chars"),
            R(z, 4).as("z_r"), R(col("pct"), 6).as("pct_r"))
          .orderBy("doc_id")
      },
      Some(s"""WITH st AS (SELECT source, count(*) AS n,
              |         sum(n_chars) AS s1, sum(n_chars * n_chars) AS s2
              |       FROM documents GROUP BY 1),
              |j AS (SELECT d.doc_id, d.source, d.n_chars,
              |        (CAST(d.n_chars AS DOUBLE) - CAST(st.s1 AS DOUBLE) / CAST(st.n AS DOUBLE)) /
              |        sqrt((CAST(st.s2 AS DOUBLE) -
              |              CAST(st.s1 AS DOUBLE) * CAST(st.s1 AS DOUBLE) / CAST(st.n AS DOUBLE)) /
              |             (CAST(st.n AS DOUBLE) - 1.0)) AS z,
              |        percent_rank() OVER (PARTITION BY d.source ORDER BY d.n_chars) AS pct
              |      FROM documents d JOIN st ON st.source = d.source)
              |SELECT doc_id, source, n_chars,
              |  ${rs("z", 4)} AS z_r, ${rs("pct", 6)} AS pct_r
              |FROM j ORDER BY doc_id""".stripMargin)),

    // ----- q162: functional-dependency violation profiling ---------------
    // Schema-quality audit: for candidate FDs lhs → rhs, how many lhs
    // groups map to >1 distinct rhs, and how many rows sit in violating
    // groups. Each FD is one hash agg on the lhs (count-distinct on the
    // rhs is a partial-aggregable exact agg) followed by a 3-row rollup —
    // map-side combine does almost all the work, so the audit runs in one
    // pass per FD regardless of table size. The battery checks one FD per
    // fixture family: documents.lang→source, events.user_id→event_type,
    // part.p_brand→p_type.
    QueryDef(
      "q162_fd_check",
      (s, dir) => {
        def fd(df: DataFrame, name: String, lhs: String, rhs: String): DataFrame =
          df.groupBy(col(lhs)).agg(
            countDistinct(col(rhs)).as("nd"),
            count(lit(1)).as("nr"))
            .agg(
              count(lit(1)).as("n_groups"),
              sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
              sum(when(col("nd") > 1, col("nr")).otherwise(0L)).as("rows_violating"),
              sum(col("nr")).as("n_rows"))
            .select(lit(name).as("fd"), col("n_groups"), col("n_violating"),
              col("rows_violating"), col("n_rows"),
              R(col("n_violating").cast("double") / col("n_groups").cast("double"), 6)
                .as("viol_rate_r"))
        fd(tbl(s, dir, "documents"), "documents.lang->source", "lang", "source")
          .union(fd(tbl(s, dir, "events"), "events.user_id->event_type", "user_id", "event_type"))
          .union(fd(tbl(s, dir, "part"), "part.p_brand->p_type", "p_brand", "p_type"))
          .orderBy("fd")
      },
      Some {
        def fdSql(name: String, table: String, lhs: String, rhs: String) =
          s"""SELECT '$name' AS fd, count(*) AS n_groups,
             |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             |  CAST(sum(CASE WHEN nd > 1 THEN nr ELSE 0 END) AS BIGINT) AS rows_violating,
             |  CAST(sum(nr) AS BIGINT) AS n_rows,
             |  ${rs("CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS viol_rate_r
             |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd, count(*) AS nr
             |      FROM $table GROUP BY 1)""".stripMargin
        s"""${fdSql("documents.lang->source", "documents", "lang", "source")}
           |UNION ALL
           |${fdSql("events.user_id->event_type", "events", "user_id", "event_type")}
           |UNION ALL
           |${fdSql("part.p_brand->p_type", "part", "p_brand", "p_type")}
           |ORDER BY fd""".stripMargin
      }),

    // ----- q163: harmonic centrality (bounded multi-source BFS) ----------
    // Harmonic centrality h(u) = Σ_{v≠u} 1/d(u,v) — the closeness variant
    // that is well-defined on disconnected graphs. Exact all-sources BFS
    // is O(V²) state by definition; this entry runs it hop-bounded on the
    // nation-level graph where V is small, and the Scaladoc'd 100 TB path
    // is HyperBall-style HLL neighborhood sketches (q80's mergeable-HLL
    // machinery) when V is web-scale. Per round: one shuffle join of the
    // (src,v,dist) relation against edges + a min-merge — the same
    // broadcast-free frontier shape as q153 generalized to all sources.
    // 1/d terms are rounded to 12 dp and summed as DECIMAL, order-free.
    QueryDef(
      "q163_harmonic_centrality",
      (s, dir) => {
        // dimension-bounded all-source BFS state (≤ |nation|² (src, v)
        // pairs by schema) — the 6 hop rounds run on the driver over the
        // collected edge list (TinyGraph decision rule); the 1/d terms
        // accumulate via Num.dec12Sum, the bit-exact driver twin of the
        // former sum(CAST(roundTo(1/d,12) AS DECIMAL(24,12))). The fact
        // rollup stays distributed; HyperBall sketches remain the
        // documented web-scale path.
        val adj = graft.ops.TinyGraph.collectBounded(
            tradeEdges(s, dir), "q163 trade edges")
          .map(r => (r.getInt(0), r.getInt(1)))
          .groupMap(_._1)(_._2)
        val vtx = graft.ops.TinyGraph.collectBounded(
          tbl(s, dir, "nation").select(col("n_nationkey")), "q163 vertices")
          .map(_.getInt(0))
        val dist = scala.collection.mutable.Map[(Int, Int), Int](
          vtx.map(v => (v, v) -> 0).toSeq: _*)
        (1 to HcMaxHops).foreach { _ =>
          dist.toSeq.foreach { case ((src, u), d) =>
            adj.getOrElse(u, Array.empty[Int]).foreach { v =>
              val k = (src, v)
              if (!dist.contains(k) || dist(k) > d + 1) dist(k) = d + 1
            }
          }
        }
        val bySrc = dist.toSeq.filter(_._2 > 0).groupMap(_._1._1)(_._2)
        val rows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(vtx.sorted.map { v =>
            val ds = bySrc.getOrElse(v, Seq.empty[Int]).toSeq
            org.apache.spark.sql.Row(v, ds.size.toLong,
              Num.roundToD(Num.dec12Sum(ds.map(d => Num.roundToD(1.0 / d, 12))), 4))
          }: _*)
        s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("n_reached",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("harmonic_r",
              org.apache.spark.sql.types.DoubleType))))
          .orderBy("v")
      },
      Some(harmonicSql))
  )
}
