package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalTableScanExec, TakeOrderedAndProjectExec}

/** Battery-WIDE plan invariants — every query in SparkEntry.queries, not
  * a per-query pin (round-9 verdict: the q204/q208/q212 global-window pin
  * proved the right invariant but covered 3 of ~45 queries; "aggregated"
  * also isn't "bounded", which is how data-sized per-entity ntiles
  * slipped through). The rules:
  *
  *  1. NO CartesianProductExec anywhere in the battery. A cross product
  *     both of whose sides are data-sized cannot survive any scale.
  *  2. A WindowExec with an EMPTY partitionSpec funnels its whole input
  *     into one task, so it is allowed only when BOTH hold:
  *       (a) structurally, something bounding sits beneath it (an
  *           aggregate rollup, a global limit / TakeOrdered, a local
  *           relation, or a WindowGroupLimit rank-prune), so a raw
  *           data-sized scan can never feed it directly; and
  *       (b) the QUERY is whitelisted below with a justification saying
  *           why the windowed relation stays bounded at 100 TB
  *           (lattice / calendar / domain-saturation / explicit top-k) —
  *           a human-reviewed claim, because per-entity aggregation is
  *           structurally an "aggregate" yet still data-sized.
  *  3. A BroadcastNestedLoopJoin materializes its build side on every
  *     executor, so its BUILD subtree must be structurally bounded the
  *     same way, or the query whitelisted with the build's bound.
  *
  * Whitelists are exact: a query that stops tripping a rule FAILS the
  * stale-entry check, so entries can't outlive their hazard. Boundedness
  * justifications for the large cases are additionally machine-checked
  * by SF-growth in the companion test (q232: the one >1M-row global
  * window input).
  */
class BatteryPlanSpec extends SparkSuite {

  /** query → why its partition-less window input stays bounded at scale */
  private val globalWindowBounded: Map[String, String] = Map(
    "q120_vocab_coverage" -> "cumulative share over the ranked-vocab rollup — vocabulary-bounded (zipf domain saturates; 31 rows at sf0.001 AND sf0.01)",
    "q129_source_gini" -> "Lorenz walk over the 20-source rollup (source lattice)",
    "q132_ks_test" -> "CDF merge over the value-bucket rollup — bucket-domain-bounded (~40 rows, SF-invariant)",
    "q133_bm25" -> "IDF over the query-term vocabulary rollup (~500 terms, corpus-vocabulary-saturating)",
    "q165_skyline" -> "prefix-max over the per-price rollup — price-domain-bounded (TPC-H retail prices saturate ~100k distinct; 200→1000 at 10× data); scaladoc documents the range-partition two-pass beyond-domain path",
    "q166_seasonal_decomp" -> "hourly rollup — calendar-bounded (531→720 rows, saturating at the fixture's range ceiling)",
    "q173_largest_remainder" -> "5-row priority rollup",
    "q174_ratio_to_report" -> "25-row nation rollup",
    "q178_interval_proration" -> "calendar-month rollup (82 rows, SF-invariant)",
    "q181_inverted_index" -> "posting-vocabulary rollup (31 rows, SF-invariant)",
    "q183_welch_ttest" -> "5-group stat rollup",
    "q185_attribution" -> "5-channel rollup",
    "q189_kaplan_meier" -> "distinct-event-time rollup — duration-domain-bounded (9→43, saturating)",
    "q192_chi2_independence" -> "contingency lattice (35 cells, SF-invariant)",
    "q196_mutual_info" -> "joint-distribution lattice (35 cells, SF-invariant)",
    "q198_id_gaps" -> "cross-bucket lag over the 1024×-reduced bucket rollup (~10M single-task rows at 10B ids — a seconds-scale sort); within-bucket gaps distribute and the top-10 is TakeOrdered",
    "q201_cross_correlation" -> "7-lag lattice",
    "q203_lift_curve" -> "cumulative windows over the 10-row decile rollup (deciles assigned by the distributed Quantiles.exactNtile)",
    "q204_hotspots" -> "40×40 grid lattice (1600 cells, SF-invariant) — the round-8 pin, now battery-wide",
    "q208_waterfall" -> "5-row stage rollup — the round-8 pin",
    "q212_cumulative_uniques" -> "weekly rollup — calendar-bounded (4→21, saturating) — the round-8 pin",
    "q222_woe_iv" -> "WoE walk over the 10-bin rollup (bins assigned by the distributed Quantiles.exactNtile)",
    "q226_js_divergence" -> "5-bin rollup",
    "q227_brier_calibration" -> "calibration-bin rollup (≤10 rows)",
    "q229_zipf_fit" -> "top-rank vocabulary rollup (31 rows, SF-invariant)",
    "q232_theil_sen" -> "pairwise day-slope relation — CALENDAR-bounded (days², constant in corpus size; machine-checked by the SF-growth test below)",
    "q233_cuped" -> "2-row period rollup",
    "q234_did" -> "4-cell diff-in-diff lattice",
    "q236_qini_curve" -> "10-row decile rollup (deciles assigned by the distributed Quantiles.exactNtile)",
    "q238_retrieval_metrics" -> "query×rank lattice (20 rows)",
    "q239_logrank" -> "distinct-event-time rollup — duration-domain-bounded (9→43, saturating)",
    "q241_bh_fdr" -> "hypothesis-test rollup (9 rows, test lattice)",
    "q243_emd_drift" -> "10-bin shared-grid rollup (corpus min/max is a broadcast scalar agg, not a raw-relation window)",
    "q244_neyman_allocation" -> "25-stratum lattice",
    "q245_bloom_fpr" -> "4-row sizing-config lattice",
    "q246_consistent_hashing" -> "256-vnode ring lattice",
    "q248_mix_decomposition" -> "3-row source rollup",
    "q252_silhouette" -> "per-cell rollup of the √N-cell layout (sublinear: ~1k cells at 1M vectors)",
    "q254_weighted_reservoir" -> "rank over the 20 TakeOrdered winners (limit beneath)",
    "q264_isotonic" -> "20-bin score lattice (hash-uniform bins, SF-invariant)",
    "q265_changepoint" -> "daily rollup — calendar-bounded",
    "q267_nelson_aalen" -> "distinct-event-time rollup — duration-domain-bounded")

  /** query → why its nested-loop BUILD side stays bounded at scale (only
    * needed where the bound is a literal filter / lattice the structural
    * check can't see)
    */
  private val nestedLoopBounded: Map[String, String] = Map(
    "q39_embed_topk" -> "query side bounded by literal filter vec_id < 10",
    "q40_embed_ivf" -> "query side vec_id < 10; centroid side stride-sampled (fixed stride is the documented small-scale anchor; q302 carries the √N production rule)",
    "q302_embed_ivf_sqrt" -> "query side vec_id < 10; centroid side √N-sampled (sublinear broadcast — the standard IVF nlist rule)",
    "q123_ann_recall" -> "both arms' query sides bounded by vec_id < 10",
    "q304_matryoshka_overlap" -> "anchor side bounded by literal filter vec_id < 10",
    "q41_embed_neardup" -> "√N-cell centroid broadcast for the blocking assignment (sublinear, the q302 rule)",
    "q125_pq_encode" -> "codebook fixed at ~64 codewords (stride = N div 64 — constant broadcast at any corpus size)",
    "q127_psi_drift" -> "10-bin boundary relation",
    "q128_exact_decontam" -> "5-row benchmark-probe set",
    "q135_jaro_winkler" -> "25-anchor bounded relation",
    "q147_bpe_merges" -> "1-row selected-merge scalar per iteration (reused exchange hides the agg)",
    "q148_cascade_delete" -> "bounded delete-key set (reused exchange hides the limit)",
    "q213_haversine" -> "25-vertex centroid relation (intentional bounded all-pairs)",
    "q238_retrieval_metrics" -> "20-row judged set",
    "q246_consistent_hashing" -> "256-vnode ring relation",
    "q252_silhouette" -> "√N-cell centroid relation (sublinear broadcast, the q302 rule)",
    "q263_grid_dbscan" -> "occupied-cell rollup (reused exchange hides the agg)",
    "q264_isotonic" -> "20-bin pre relation (non-equi segment join over the bin lattice)",
    "q268_markov_attribution" -> "state-lattice transition matrix (≤16 states)",
    "q289_shapley_attribution" -> "2⁴ coalition lattice",
    "q297_triplet_mining" -> "20-anchor bounded broadcast",
    "q300_label_noise" -> "50-anchor bounded broadcast",
    "q54_join_cross" -> "region × nation dims (5 × 25, intentional bounded cross)",
    "q97_fuzzy_match" -> "25-anchor bounded relation")

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(nodes)
  }

  private def bounded(p: SparkPlan): Boolean = nodes(p).exists {
    case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
    case _: GlobalLimitExec | _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
    case _: LocalTableScanExec => true
    case _: WindowGroupLimitExec => true
    case _ => false
  }

  test("battery-wide: no cartesian products; every partition-less window and BNLJ build is bounded") {
    val flaggedWindows = scala.collection.mutable.Set[String]()
    val flaggedBnlj = scala.collection.mutable.Set[String]()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sf0001)
      val all = nodes(df.queryExecution.executedPlan)
      all.foreach {
        case _: CartesianProductExec =>
          failures += s"$name: CartesianProduct in the plan"
        case w: WindowExec if w.partitionSpec.isEmpty =>
          flaggedWindows += name
          if (!bounded(w.child))
            failures += s"$name: partition-less window over a structurally UNBOUNDED child:\n${w.child.treeString.take(2000)}"
          if (!globalWindowBounded.contains(name))
            failures += s"$name: partition-less window but no boundedness justification — partition it, bound it, or whitelist it with a 100 TB argument"
        case j: BroadcastNestedLoopJoinExec =>
          flaggedBnlj += name
          val build = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          if (!bounded(build) && !nestedLoopBounded.contains(name))
            failures += s"$name: BNLJ build side neither structurally bounded nor whitelisted:\n${build.treeString.take(2000)}"
        case _ =>
      }
    }
    // stale whitelist entries can't outlive their hazard
    (globalWindowBounded.keySet -- flaggedWindows).toSeq.sorted.foreach { n =>
      failures += s"stale globalWindowBounded entry: $n no longer has a partition-less window"
    }
    (nestedLoopBounded.keySet -- flaggedBnlj).toSeq.sorted.foreach { n =>
      failures += s"stale nestedLoopBounded entry: $n no longer plans a BNLJ"
    }
    assert(failures.isEmpty, failures.mkString("\n---\n"))
  }

  test("q232: the calendar-bound claim is machine-checked by SF-invariance of the window input") {
    // The one whitelisted global window with a >1M-row input. Its bound
    // is days² (calendar), NOT corpus size — so 10× the data must not
    // move the windowed row count materially. If a future edit feeds it
    // a data-sized relation, this 10×-growth gate trips.
    def windowInputRows(dir: String): Long = {
      val df = SparkEntry.queries("q232_theil_sen")(spark, dir)
      df.queryExecution.toRdd.count()
      val wins = nodes(df.queryExecution.executedPlan)
        .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(wins.nonEmpty, "q232 lost its global window — update this test and the whitelist")
      wins.map { w =>
        nodes(w.child).collectFirst {
          case c if c.metrics.contains("numOutputRows") => c.metrics("numOutputRows").value
        }.getOrElse(fail(s"no row metric beneath q232's window in $dir"))
      }.max
    }
    val small = windowInputRows(sf0001)
    val big = windowInputRows("/root/testdata/sf0.01")
    assert(small > 0, "degenerate fixture")
    assert(big.toDouble / small.toDouble <= 2.0,
      s"q232 window input grew ${big.toDouble / small}× for 10× data — no longer calendar-bounded ($small -> $big)")
  }
}
