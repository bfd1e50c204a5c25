package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import graft.ext.Text
import QueryDef.tbl

/** Round-9 sixteenth batch: rank statistics, collaborative filtering,
  * link prediction, resampling inference, and classifier evaluation —
  * six operators a recommendation / evaluation pipeline runs at scale.
  *
  *  - q283 Spearman rank correlation (tie-averaged ranks, per group).
  *  - q284 item-item collaborative filtering: cosine top-k neighbors
  *    over co-purchase baskets with a hot-user guard.
  *  - q285 Adamic–Adar link prediction between users through RARE
  *    shared parts (df-bounded, never all-pairs).
  *  - q286 delete-1 jackknife bias/SE of a ratio estimator — the
  *    closed-form resampling scheme (no replicate materialization).
  *  - q287 longest consecutive-day activity streaks (gaps-and-islands
  *    on integer day numbers; no engine-specific date arithmetic).
  *  - q288 multi-class confusion matrix + per-class P/R/F1 + macro-F1
  *    of the q33 n-gram language-ID heuristic against gold labels.
  *
  * Determinism: ranks and counts are integers (Spearman's moment sums
  * are exact DECIMAL), cosine/precision/recall divide exact integers
  * (IEEE-deterministic), and every transcendental term (ln in
  * Adamic–Adar, the jackknife's per-row ratio) is ROUNDED to 12 dp then
  * accumulated as DECIMAL — the q189/q127 ln-parity pattern — so
  * cross-engine libm and summation-order differences cannot reach the
  * hash.
  */
object Extended50 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** Hot-user guard for the CF basket join: users with more than this
    * many distinct parts are dropped before the per-user pair explosion
    * (quadratic in basket size). The q36 `maxDf` pattern: at 100 TB the
    * whale baskets (bots, wholesale accounts) would otherwise dominate
    * the shuffle; dropping them is also the statistically standard move
    * (they carry no preference signal).
    */
  private val MaxBasket = 100

  /** Minimum co-occurrence support for a CF neighbor pair. co = 1 pairs
    * are cosine noise (1/√(nᵃnᵇ) from a single shared shopper) yet at
    * 10× scale they were ~90% of the 240M-row symmetrized relation the
    * top-k window had to sort — the sf1 smoke measured 20× for 10× data
    * before this prune, 6× after. The standard production-CF support
    * threshold, applied right after the pair aggregation (it cannot go
    * earlier — support IS the aggregation's output).
    */
  private val MinCo = 2

  /** Rare-part bound for Adamic–Adar: only parts bought by 2..MaxDf
    * users generate user pairs, capping the per-part fan-out at
    * MaxDf²/2 and keeping total candidates O(parts · MaxDf²) — the same
    * df-guard that makes shared-shingle dedup joins scale.
    */
  private val AaMaxDf = 30

  val all: Seq[QueryDef] = Seq(

    // ----- q283: Spearman rank correlation --------------------------
    // Tie-averaged ranks via rank() + (tie_count-1)/2 (exact half-integer
    // arithmetic), then Pearson over the ranks from exact DECIMAL moment
    // sums. SCALE SHAPE: `rank() OVER (PARTITION BY g ...)` with the
    // 3-value returnflag is an N/3 single-task sort at 100 TB. But
    // SQL rank() is 1 + (# rows strictly below), so tie-averaged ranks
    // are a pure function of the (g, value) FREQUENCY ROLLUP — which
    // saturates at the value domain (quantity: 50 distinct; price:
    // ~100k, the q165 argument): rank = 1 + exclusive prefix sum of the
    // rollup counts (PrefixSum over the rollup — no data-sized window
    // anywhere), joined back to rows only to pair rx with ry for the
    // cross moment.
    QueryDef(
      "q283_spearman",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem").select(
          col("l_returnflag").as("g"),
          col("l_quantity").as("x"),
          col("l_extendedprice").as("y"))
        def ranks(v: String, out: String) = {
          val cnt = li.groupBy(col("g"), col(v)).agg(count(lit(1)).as("__c"))
          graft.ops.PrefixSum.exclusiveSum(
              cnt, Seq("g"), col(v), ascending = true, Nil, col("__c"), "__lt")
            .select(col("g"), col(v),
              ((col("__lt") + 1L).cast("double") +
                (col("__c") - 1L).cast("double") / 2.0).as(out))
        }
        val dec = DecimalType(38, 4)
        val ranked = li
          .join(ranks("x", "rx"), Seq("g", "x"))
          .join(ranks("y", "ry"), Seq("g", "y"))
        val m = ranked.groupBy(col("g")).agg(
          count(lit(1)).as("n"),
          sum(col("rx").cast(dec)).as("sx"),
          sum(col("ry").cast(dec)).as("sy"),
          sum((col("rx") * col("ry")).cast(dec)).as("sxy"),
          sum((col("rx") * col("rx")).cast(dec)).as("sxx"),
          sum((col("ry") * col("ry")).cast(dec)).as("syy"))
        def d(c: String) = col(c).cast("double")
        val nn = col("n").cast("double")
        val num = nn * d("sxy") - d("sx") * d("sy")
        val den = sqrt(nn * d("sxx") - d("sx") * d("sx")) *
          sqrt(nn * d("syy") - d("sy") * d("sy"))
        m.select(col("g").as("l_returnflag"), col("n"),
            R(num / den, 6).as("spearman_r"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH t AS (
              |  SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y
              |  FROM lineitem),
              |rk AS (
              |  SELECT g,
              |    RANK() OVER (PARTITION BY g ORDER BY x)
              |      + (COUNT(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS rx,
              |    RANK() OVER (PARTITION BY g ORDER BY y)
              |      + (COUNT(*) OVER (PARTITION BY g, y) - 1) / 2.0 AS ry
              |  FROM t),
              |m AS (
              |  SELECT g, COUNT(*) AS n,
              |    CAST(SUM(CAST(rx AS DECIMAL(38,4))) AS DOUBLE) AS sx,
              |    CAST(SUM(CAST(ry AS DECIMAL(38,4))) AS DOUBLE) AS sy,
              |    CAST(SUM(CAST(rx * ry AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
              |    CAST(SUM(CAST(rx * rx AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
              |    CAST(SUM(CAST(ry * ry AS DECIMAL(38,4))) AS DOUBLE) AS syy
              |  FROM rk GROUP BY g)
              |SELECT g AS l_returnflag, n,
              |  ${rs("(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))", 6)} AS spearman_r
              |FROM m ORDER BY l_returnflag""".stripMargin)),

    // ----- q284: item-item collaborative filtering ------------------
    // Distinct (customer, part) baskets → per-user pair generation
    // (basket-capped) → pair co-counts → cosine c/√(nᵃ·nᵇ) → top-3
    // neighbors per part. Three shuffles (basket distinct, pair count,
    // per-part top-k window) — each keyed, none all-pairs. cosine
    // divides exact integers (IEEE-deterministic), ranking uses the raw
    // value with the neighbor key as tiebreak. Distinct from q225's
    // association rules: CF ranks symmetric cosine neighborhoods, not
    // directional support/confidence.
    QueryDef(
      "q284_item_cf",
      (s, dir) => {
        // Ckpt (r16): the basket relation feeds the eager pair-count
        // sizing action AND (via bb) three branches of the final plan —
        // without a materialization point the orders⋈lineitem distinct
        // recomputed up to 7× per run. Pay the fact join once.
        val b = graft.ops.Ckpt(tbl(s, dir, "orders")
          .join(tbl(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("u"), col("l_partkey").as("p"))
          .distinct())
        val sizes = b.groupBy(col("u"))
          .agg(count(lit(1)).as("bs"))
          .filter(col("bs") <= MaxBasket)
        val keep = sizes.select(col("u"))
        // Size the co-occurrence shuffle from basket stats, not the
        // session default: pair volume is Σ bs·(bs−1)/2 — LINEAR in users
        // (baskets are capped) but ~10× the input rows, so at a fixed
        // 32-partition knob each hash-agg partition grows with the data
        // and spills (measured: 22.2 s at sf1 → 439 s at sf10, 19.8×,
        // with the JVM in GC/spill churn at 1.03 B pairs). One extra
        // 1-row scan over the basket-size rollup buys a data-proportional
        // partition count (~4M pairs/partition, floor 32); the groupBy
        // reuses the repartition layout, so no second shuffle.
        val nPairs = sizes
          .agg(coalesce(sum(expr("bs * (bs - 1) div 2")), lit(0L)))
          .head().getLong(0)
        val pairParts = math.max(32L, math.min(4096L, nPairs / 4000000L)).toInt
        // bb is consumed three times (np, both self-join sides) —
        // materialize the capped basket relation once as well
        val bb = graft.ops.Ckpt(b.join(keep, "u"))
        val np = bb.groupBy(col("p")).agg(count(lit(1)).as("np"))
        val pairs = bb.select(col("u"), col("p").as("pa"))
          .join(bb.select(col("u"), col("p").as("pb")), Seq("u"))
          .filter(col("pa") < col("pb"))
          .repartition(pairParts, col("pa"), col("pb"))
          .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("co"))
          .filter(col("co") >= MinCo)
        val sym = pairs.unionByName(pairs.select(
          col("pb").as("pa"), col("pa").as("pb"), col("co")))
        val scored = sym
          .join(np.select(col("p").as("pa"), col("np").as("na")), "pa")
          .join(np.select(col("p").as("pb"), col("np").as("nb")), "pb")
          .withColumn("cosine",
            col("co") / sqrt((col("na") * col("nb")).cast("double")))
        val w = Window.partitionBy(col("pa"))
          .orderBy(col("cosine").desc, col("pb"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("pa").as("part"), col("rn"), col("pb").as("neighbor"),
            col("co").as("n_common_users"), R(col("cosine"), 6).as("cosine_r"))
          .orderBy("part", "rn")
      },
      Some(s"""WITH b AS (
              |  SELECT DISTINCT o_custkey AS u, l_partkey AS p
              |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
              |keep AS (
              |  SELECT u FROM b GROUP BY u HAVING COUNT(*) <= $MaxBasket),
              |bb AS (SELECT b.u, b.p FROM b JOIN keep ON b.u = keep.u),
              |np AS (SELECT p, COUNT(*) AS np FROM bb GROUP BY p),
              |pairs AS (
              |  SELECT a.p AS pa, c.p AS pb, COUNT(*) AS co
              |  FROM bb a JOIN bb c ON a.u = c.u AND a.p < c.p
              |  GROUP BY a.p, c.p
              |  HAVING COUNT(*) >= $MinCo),
              |sym AS (
              |  SELECT pa, pb, co FROM pairs
              |  UNION ALL SELECT pb, pa, co FROM pairs),
              |scored AS (
              |  SELECT sym.pa, sym.pb, sym.co,
              |    sym.co / sqrt(CAST(na.np * nb.np AS DOUBLE)) AS cosine
              |  FROM sym
              |  JOIN np na ON na.p = sym.pa
              |  JOIN np nb ON nb.p = sym.pb),
              |ranked AS (
              |  SELECT pa, pb, co, cosine,
              |    ROW_NUMBER() OVER (PARTITION BY pa ORDER BY cosine DESC, pb) AS rn
              |  FROM scored)
              |SELECT pa AS part, rn, pb AS neighbor, co AS n_common_users,
              |  ${rs("cosine", 6)} AS cosine_r
              |FROM ranked WHERE rn <= 3
              |ORDER BY part, rn""".stripMargin)),

    // ----- q285: Adamic–Adar link prediction ------------------------
    // Candidate user pairs arise ONLY through rare parts (2..AaMaxDf
    // buyers); each contributes 1/ln(n_p), down-weighting popular items.
    // The ln term is rounded to 12 dp then DECIMAL-accumulated (libm
    // parity), the final score re-rounded to 6. Top-20 pairs.
    QueryDef(
      "q285_adamic_adar",
      (s, dir) => {
        // Ckpt (r16): b feeds the part-frequency rollup and both sides of
        // the pair self-join (via bp) — the orders⋈lineitem distinct
        // otherwise recomputed 3×; bp (rare-part rows only) feeds both
        // self-join sides
        val b = graft.ops.Ckpt(tbl(s, dir, "orders")
          .join(tbl(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("u"), col("l_partkey").as("p"))
          .distinct())
        val np = b.groupBy(col("p")).agg(count(lit(1)).as("np"))
          .filter(col("np") >= 2 && col("np") <= AaMaxDf)
        val bp = graft.ops.Ckpt(b.join(np, "p"))
        val terms = bp.select(col("p"), col("u").as("u1"), col("np"))
          .join(bp.select(col("p"), col("u").as("u2")), Seq("p"))
          .filter(col("u1") < col("u2"))
          .select(col("u1"), col("u2"),
            R(lit(1.0) / log(col("np").cast("double")), 12)
              .cast(DecimalType(24, 12)).as("term"))
        terms.groupBy(col("u1"), col("u2"))
          .agg(count(lit(1)).as("n_common"), sum(col("term")).as("aa"))
          .select(col("u1"), col("u2"), col("n_common"),
            R(col("aa").cast("double"), 6).as("aa_r"))
          .orderBy(col("aa_r").desc, col("u1"), col("u2"))
          .limit(20)
      },
      Some(s"""WITH b AS (
              |  SELECT DISTINCT o_custkey AS u, l_partkey AS p
              |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
              |np AS (
              |  SELECT p, COUNT(*) AS np FROM b GROUP BY p
              |  HAVING COUNT(*) BETWEEN 2 AND $AaMaxDf),
              |bp AS (SELECT b.u, b.p, np.np FROM b JOIN np ON b.p = np.p),
              |terms AS (
              |  SELECT a.u AS u1, c.u AS u2,
              |    CAST(${rs("1.0 / ln(a.np)", 12)} AS DECIMAL(24,12)) AS term
              |  FROM bp a JOIN bp c ON a.p = c.p AND a.u < c.u)
              |SELECT u1, u2, COUNT(*) AS n_common,
              |  ${rs("CAST(SUM(term) AS DOUBLE)", 6)} AS aa_r
              |FROM terms GROUP BY u1, u2
              |ORDER BY aa_r DESC, u1, u2
              |LIMIT 20""".stripMargin)),

    // ----- q286: delete-1 jackknife for a ratio estimator -----------
    // θ = Σrev/Σqty per returnflag; each leave-one-out replicate is the
    // CLOSED FORM (S_r − r_i)/(S_q − q_i) off two broadcast group
    // totals — O(n) with no replicate materialization, the way
    // resampling runs at 100 TB. The accumulated quantity is the
    // DEVIATION θ̂₍ᵢ₎ − θ (O(10⁻²), so 12 dp rounding sits far inside
    // double precision — rounding the raw ~10³-scale replicate would
    // not: its 12th decimal falls beyond the 15.9 significant digits a
    // double carries, where Spark's shortest-string and DuckDB's
    // binary-expansion double→DECIMAL casts disagree). bias =
    // (n−1)·Σdev/n, variance via Σdev² with the mean re-centering term.
    QueryDef(
      "q286_jackknife",
      (s, dir) => {
        val t = tbl(s, dir, "lineitem").select(
          col("l_returnflag").as("g"),
          R(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("r"),
          col("l_quantity").as("q"))
        // jackknife is undefined at n=1 (the lone replicate divides by
        // sq − q = 0, and Spark's null-on-DECIMAL-overflow vs DuckDB's
        // IEEE Inf would split the engines) — drop singleton groups in
        // BOTH plans
        val tot = t.groupBy(col("g")).agg(
          count(lit(1)).as("n"),
          sum(col("r").cast(DecimalType(18, 4))).cast("double").as("sr"),
          sum(col("q").cast(DecimalType(18, 4))).cast("double").as("sq"))
          .filter(col("n") >= 2)
        val dec = DecimalType(28, 12)
        val loo = t.join(broadcast(tot), "g")
          .withColumn("dev",
            (col("sr") - col("r")) / (col("sq") - col("q")) -
              col("sr") / col("sq"))
          .select(col("g"), col("n"), col("sr"), col("sq"),
            R(col("dev"), 12).cast(dec).as("t1"),
            R(col("dev") * col("dev"), 12).cast(dec).as("t2"))
        val m = loo.groupBy(col("g"), col("n"), col("sr"), col("sq")).agg(
          sum(col("t1")).cast("double").as("st"),
          sum(col("t2")).cast("double").as("st2"))
        val nn = col("n").cast("double")
        val theta = col("sr") / col("sq")
        val varJ = (nn - 1) / nn * (col("st2") - col("st") * col("st") / nn)
        m.select(col("g").as("l_returnflag"), col("n"),
            R(theta, 6).as("theta_r"),
            R((nn - 1) * col("st") / nn, 10).as("jack_bias_r"),
            R(sqrt(varJ), 8).as("jack_se_r"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH t AS (
              |  SELECT l_returnflag AS g,
              |    ${rs("l_extendedprice * (1 - l_discount)", 4)} AS r,
              |    l_quantity AS q
              |  FROM lineitem),
              |tot AS (
              |  SELECT g, COUNT(*) AS n,
              |    CAST(SUM(CAST(r AS DECIMAL(18,4))) AS DOUBLE) AS sr,
              |    CAST(SUM(CAST(q AS DECIMAL(18,4))) AS DOUBLE) AS sq
              |  FROM t GROUP BY g HAVING COUNT(*) >= 2),
              |dv AS (
              |  SELECT t.g, tot.n, tot.sr, tot.sq,
              |    (tot.sr - t.r) / (tot.sq - t.q) - tot.sr / tot.sq AS dev
              |  FROM t JOIN tot ON t.g = tot.g),
              |loo AS (
              |  SELECT g, n, sr, sq,
              |    CAST(${rs("dev", 12)} AS DECIMAL(28,12)) AS t1,
              |    CAST(${rs("dev * dev", 12)} AS DECIMAL(28,12)) AS t2
              |  FROM dv),
              |m AS (
              |  SELECT g, n, sr, sq,
              |    CAST(SUM(t1) AS DOUBLE) AS st, CAST(SUM(t2) AS DOUBLE) AS st2
              |  FROM loo GROUP BY g, n, sr, sq)
              |SELECT g AS l_returnflag, n,
              |  ${rs("sr / sq", 6)} AS theta_r,
              |  ${rs("(n - 1.0) * st / n", 10)} AS jack_bias_r,
              |  ${rs("sqrt((n - 1.0) / n * (st2 - st * st / n))", 8)} AS jack_se_r
              |FROM m ORDER BY l_returnflag""".stripMargin)),

    // ----- q287: longest consecutive-day activity streaks -----------
    // Gaps-and-islands on INTEGER day numbers (⌊epoch_us/86400e6⌋ — no
    // engine-specific date arithmetic): day − dense_rank is constant
    // exactly within a consecutive run. Two keyed shuffles (distinct
    // days, island agg) + one per-user window; top-50 streakiest users.
    QueryDef(
      "q287_streaks",
      (s, dir) => {
        val d = tbl(s, dir, "events")
          .select(col("user_id"),
            floor(unix_micros(col("ts")) / lit(86400000000L)).as("day"))
          .distinct()
        val rn = dense_rank().over(
          Window.partitionBy(col("user_id")).orderBy(col("day")))
        val runs = d.withColumn("island", col("day") - rn)
          .groupBy(col("user_id"), col("island"))
          .agg(count(lit(1)).as("len"))
        runs.groupBy(col("user_id"))
          .agg(max(col("len")).as("longest_streak"),
            sum(col("len")).as("n_active_days"),
            count(lit(1)).as("n_streaks"))
          .orderBy(col("longest_streak").desc, col("user_id"))
          .limit(50)
      },
      Some("""WITH d AS (
             |  SELECT DISTINCT user_id,
             |    CAST(floor(epoch_us(ts) / 86400e6) AS BIGINT) AS day
             |  FROM events),
             |isl AS (
             |  SELECT user_id,
             |    day - DENSE_RANK() OVER (PARTITION BY user_id ORDER BY day) AS island
             |  FROM d),
             |runs AS (
             |  SELECT user_id, island, COUNT(*) AS len
             |  FROM isl GROUP BY user_id, island)
             |SELECT user_id, MAX(len) AS longest_streak,
             |  CAST(SUM(len) AS BIGINT) AS n_active_days, COUNT(*) AS n_streaks
             |FROM runs GROUP BY user_id
             |ORDER BY longest_streak DESC, user_id
             |LIMIT 50""".stripMargin)),

    // ----- q288: confusion matrix + macro-F1 of the q33 lang-ID ------
    // Evaluates the n-gram language-ID heuristic against the gold
    // `lang` column: per-class precision/recall/F1 over the confusion
    // counts (classes = union of gold and predicted labels, so a
    // never-predicted or spurious class still gets its row), plus the
    // broadcast macro-F1 scalar on every row. All ratios divide exact
    // integer counts.
    QueryDef(
      "q288_confusion",
      (s, dir) => {
        val pred = tbl(s, dir, "documents")
          .withColumn("__t", Text.tokensNorm(col("text")))
          .select(col("lang").as("actual"),
            Text.langIdFromTokens(col("__t"), col("text")).as("pred"))
        val cm = pred.groupBy(col("actual"), col("pred"))
          .agg(count(lit(1)).as("n"))
        val act = cm.groupBy(col("actual")).agg(sum(col("n")).as("n_actual"))
        val prd = cm.groupBy(col("pred")).agg(sum(col("n")).as("n_pred"))
        val tp = cm.filter(col("actual") === col("pred"))
          .select(col("actual").as("cls"), col("n").as("tp"))
        val classes = act.select(col("actual").as("cls"))
          .unionByName(prd.select(col("pred").as("cls"))).distinct()
        val per = classes
          .join(act.withColumnRenamed("actual", "cls"), Seq("cls"), "left")
          .join(prd.withColumnRenamed("pred", "cls"), Seq("cls"), "left")
          .join(tp, Seq("cls"), "left")
          .select(col("cls"),
            coalesce(col("n_actual"), lit(0L)).as("n_actual"),
            coalesce(col("n_pred"), lit(0L)).as("n_pred"),
            coalesce(col("tp"), lit(0L)).as("tp"))
          .withColumn("prec",
            col("tp").cast("double") / nullif(col("n_pred"), lit(0)).cast("double"))
          .withColumn("rec",
            col("tp").cast("double") / nullif(col("n_actual"), lit(0)).cast("double"))
          .withColumn("f1",
            lit(2.0) * col("prec") * col("rec") /
              nullif(col("prec") + col("rec"), lit(0.0)))
        // macro-F1 = DECIMAL sum of the 6dp-ROUNDED per-class F1s over the
        // class count (order-independent; engine-native AVG would re-sum
        // doubles) — tiny relation, but the determinism recipe is uniform.
        val macroF1 = per.agg(
          R(sum(R(coalesce(col("f1"), lit(0.0)), 6).cast(DecimalType(18, 6)))
              .cast("double") / count(lit(1)),
            6).as("macro_f1_r"))
        per.crossJoin(broadcast(macroF1))
          .select(col("cls"), col("n_actual"), col("n_pred"), col("tp"),
            R(col("prec"), 6).as("precision_r"),
            R(col("rec"), 6).as("recall_r"),
            R(col("f1"), 6).as("f1_r"),
            col("macro_f1_r"))
          .orderBy("cls")
      },
      Some(s"""WITH sc AS (
              |  SELECT lang AS actual,
              |    ${TextQueries.scoreSql(Text.stopwordsEn)} AS s_en,
              |    ${TextQueries.scoreSql(Text.stopwordsDe)} AS s_de,
              |    ${TextQueries.scoreSql(Text.stopwordsFr)} AS s_fr,
              |    ${TextQueries.scoreSql(Text.stopwordsEs)} AS s_es,
              |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS s_zh
              |  FROM documents),
              |pr AS (
              |  SELECT actual,
              |    CASE WHEN s_zh > 0 THEN 'zh'
              |         WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
              |         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              |         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              |         WHEN s_fr >= s_es THEN 'fr'
              |         ELSE 'es' END AS pred
              |  FROM sc),
              |cm AS (SELECT actual, pred, COUNT(*) AS n FROM pr GROUP BY actual, pred),
              |act AS (SELECT actual, SUM(n) AS n_actual FROM cm GROUP BY actual),
              |prd AS (SELECT pred, SUM(n) AS n_pred FROM cm GROUP BY pred),
              |tp AS (SELECT actual AS cls, n AS tp FROM cm WHERE actual = pred),
              |classes AS (
              |  SELECT actual AS cls FROM act
              |  UNION SELECT pred AS cls FROM prd),
              |per AS (
              |  SELECT c.cls,
              |    CAST(coalesce(act.n_actual, 0) AS BIGINT) AS n_actual,
              |    CAST(coalesce(prd.n_pred, 0) AS BIGINT) AS n_pred,
              |    CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp
              |  FROM classes c
              |  LEFT JOIN act ON act.actual = c.cls
              |  LEFT JOIN prd ON prd.pred = c.cls
              |  LEFT JOIN tp ON tp.cls = c.cls),
              |pm AS (
              |  SELECT cls, n_actual, n_pred, tp,
              |    CAST(tp AS DOUBLE) / nullif(n_pred, 0) AS prec,
              |    CAST(tp AS DOUBLE) / nullif(n_actual, 0) AS rec
              |  FROM per),
              |pf AS (
              |  SELECT cls, n_actual, n_pred, tp, prec, rec,
              |    2.0 * prec * rec / nullif(prec + rec, 0.0) AS f1
              |  FROM pm),
              |mac AS (
              |  SELECT ${rs(s"CAST(SUM(CAST(${rs("coalesce(f1, 0.0)", 6)} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)", 6)} AS macro_f1_r
              |  FROM pf)
              |SELECT cls, n_actual, n_pred, tp,
              |  ${rs("prec", 6)} AS precision_r,
              |  ${rs("rec", 6)} AS recall_r,
              |  ${rs("f1", 6)} AS f1_r,
              |  macro_f1_r
              |FROM pf CROSS JOIN mac
              |ORDER BY cls""".stripMargin))
  )
}
