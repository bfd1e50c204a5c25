package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 seventeenth batch: game-theoretic attribution, honest model
  * evaluation, rank association between series, and session engagement —
  *
  *  - q289 EXACT Shapley-value attribution over journey channel sets:
  *    the axiomatic closer of the attribution family (q185/q214/q220
  *    split heuristically, q268 models removal effects; Shapley is the
  *    unique split satisfying efficiency/symmetry/additivity). With 4
  *    channels the coalition lattice has 16 nodes, so the EXACT value
  *    is a bounded computation: integer coalition counts, integer
  *    factorial weights scaled by n! = 24 — one float division at the
  *    very end.
  *  - q290 5-fold cross-validated MSE of the per-flag OLS fit — the
  *    eval q228's in-sample R² can't give. Train-fold coefficients come
  *    from TOTAL-minus-fold moment arithmetic (exact DECIMALs), test
  *    MSE from the closed-form expansion of Σ(y−a−bx)² — the whole CV
  *    is ONE moment aggregate, no per-fold passes.
  *  - q291 Kendall tau-b between monthly quantity and revenue series
  *    per flag: concordant/discordant/tie counts over the
  *    calendar-bounded month-pair join (≤ months²/2 pairs at ANY
  *    corpus size) — the rank-association companion to q283's
  *    Spearman (q217's Mann–Kendall is tau against TIME).
  *  - q292 session engagement by entry event: q29's 30-minute
  *    sessionization summarized per ENTRY TYPE — sessions, bounce rate
  *    (single-event sessions), mean depth and duration.
  *
  * Determinism: q289/q291/q292 are integer arithmetic to the last
  * division; q290's moments are exact DECIMALs with IEEE-deterministic
  * closed forms on top.
  */
object Extended51 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** Channel → bit, alphabetical: the fixed universe of non-purchase
    * event types. Shapley weights below hardcode n = 4.
    */
  private val ChannelBits = Seq("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)

  val all: Seq[QueryDef] = Seq(

    // ----- q289: exact Shapley-value attribution --------------------
    // v(S) = converting users whose pre-purchase channel set ⊆ S.
    // φ_c = Σ_{S∌c} |S|!(3−|S|)!/4! · [v(S∪{c}) − v(S)]; the 4!-scaled
    // weights are the integers {6,2,2,6}, so φ·24 is an exact integer
    // sum. Shape: one user agg → ≤16-row mask counts → all lattice
    // work on broadcast 16-row relations. Efficiency axiom (Σφ =
    // v(full) − v(∅)) is reported in-row as an exact-integer check.
    QueryDef(
      "q289_shapley_attribution",
      (s, dir) => {
        val e = tbl(s, dir, "events")
        val pm = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("pt"))
        val bitCase = ChannelBits.foldLeft(lit(null).cast("int")) {
          case (acc, (name, bit)) =>
            when(col("event_type") === name, lit(bit)).otherwise(acc)
        }
        val tb = e.filter(col("event_type") =!= "purchase")
          .join(pm, "user_id")
          .filter(unix_micros(col("ts")) < col("pt"))
          .select(col("user_id"), bitCase.as("bit"))
          .distinct()
        val mk = tb.groupBy(col("user_id")).agg(sum(col("bit")).as("mask"))
        val cm = pm.join(mk, Seq("user_id"), "left")
          .select(coalesce(col("mask"), lit(0L)).cast("int").as("mask"))
        // The mask-count relation is 2^n-bounded (≤16 rows) but its
        // LINEAGE is the full events aggregation — and the lattice below
        // references it four times (v twice in φ, twice in the totals).
        // Materialize it once: the sf1 smoke measured 27× for 10× data
        // when each reference re-executed the corpus pipeline, ~1× after.
        // (Bounded-relation collect, the battery's documented scalar
        // exception — same class as the .head() scalar sites.)
        val cntRows = cm.groupBy(col("mask")).agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
        val cnt = s.createDataFrame(cntRows).toDF("mask", "c")
        val ss = s.range(16).select(col("id").cast("int").as("S"))
        val v = ss.join(broadcast(cnt),
            (col("mask").bitwiseAND(lit(15) - col("S"))) === 0, "left")
          .groupBy(col("S"))
          .agg(coalesce(sum(col("c")), lit(0L)).as("v"))
        val chans = s.range(ChannelBits.size.toLong).select(
          element_at(
            array(ChannelBits.map(c => lit(c._1)): _*),
            col("id").cast("int") + 1).as("channel"),
          expr("shiftleft(1, CAST(id AS INT))").as("bit"))
        val pr = chans.crossJoin(broadcast(ss))
          .filter((col("S").bitwiseAND(col("bit"))) === 0)
          .withColumn("w",
            when(expr("bit_count(S)") === 1 || expr("bit_count(S)") === 2, lit(2L))
              .otherwise(lit(6L)))
        val phi = pr
          .join(broadcast(v).select(col("S"), col("v").as("va")), "S")
          .join(broadcast(v).select((col("S")).as("Sb"), col("v").as("vb")),
            col("Sb") === col("S") + col("bit"))
          .groupBy(col("channel"))
          .agg(sum(col("w") * (col("vb") - col("va"))).as("num"))
        val tot = v.filter(col("S") === 15).select(col("v").as("n_conv"))
          .crossJoin(v.filter(col("S") === 0).select(col("v").as("n_no_touch")))
        phi.crossJoin(broadcast(tot))
          .select(col("channel"),
            R(col("num") / 24.0, 6).as("phi_r"),
            col("num").as("phi_num_24"),
            col("n_conv"), col("n_no_touch"))
          .orderBy("channel")
      },
      Some(s"""WITH pm AS (
              |  SELECT user_id, min(epoch_us(ts)) AS pt FROM events
              |  WHERE event_type = 'purchase' GROUP BY user_id),
              |tb AS (
              |  SELECT DISTINCT e.user_id,
              |    CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
              |         WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END AS bit
              |  FROM events e JOIN pm ON e.user_id = pm.user_id
              |  WHERE e.event_type <> 'purchase' AND epoch_us(e.ts) < pm.pt),
              |mk AS (SELECT user_id, CAST(SUM(bit) AS INT) AS mask FROM tb GROUP BY user_id),
              |cm AS (
              |  SELECT coalesce(mk.mask, 0) AS mask
              |  FROM pm LEFT JOIN mk ON pm.user_id = mk.user_id),
              |cnt AS (SELECT mask, COUNT(*) AS c FROM cm GROUP BY mask),
              |ss AS (SELECT CAST(i AS INT) AS S FROM range(0, 16) t(i)),
              |v AS (
              |  SELECT S, CAST(coalesce(SUM(c), 0) AS BIGINT) AS v
              |  FROM ss LEFT JOIN cnt ON (cnt.mask & (15 - ss.S)) = 0
              |  GROUP BY S),
              |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
              |       ('signup', 4), ('view', 8)) AS t(channel, bit)),
              |pr AS (
              |  SELECT ch.channel, ch.bit, ss.S,
              |    CASE WHEN bit_count(ss.S) IN (1, 2) THEN 2 ELSE 6 END AS w
              |  FROM ch CROSS JOIN ss WHERE (ss.S & ch.bit) = 0),
              |phi AS (
              |  SELECT channel,
              |    CAST(SUM(w * (vb.v - va.v)) AS BIGINT) AS num
              |  FROM pr
              |  JOIN v va ON va.S = pr.S
              |  JOIN v vb ON vb.S = pr.S + pr.bit
              |  GROUP BY channel),
              |tot AS (
              |  SELECT (SELECT v FROM v WHERE S = 15) AS n_conv,
              |    (SELECT v FROM v WHERE S = 0) AS n_no_touch)
              |SELECT channel, ${rs("num / 24.0", 6)} AS phi_r,
              |  num AS phi_num_24, n_conv, n_no_touch
              |FROM phi CROSS JOIN tot
              |ORDER BY channel""".stripMargin)),

    // ----- q290: 5-fold cross-validated regression MSE --------------
    // ONE moment aggregate per (flag, fold); train-fold coefficients
    // from total-minus-fold arithmetic; test MSE from the closed-form
    // Σ(y−a−bx)² = Syy − 2aSy − 2bSxy + 2abSx + a²n + b²Sxx. No
    // second data pass at any scale. Moments are exact INTEGER
    // (cent-unit) DECIMAL(38,0) sums — see the in-code note on why
    // fractional-scale decimals break cross-engine double casts.
    QueryDef(
      "q290_cv_mse",
      (s, dir) => {
        val dec = DecimalType(38, 0)
        // ALL moments are exact INTEGERS (x integral units, y integral
        // cents): a DECIMAL(38,0)/HUGEINT → DOUBLE cast is one correctly-
        // rounded conversion on both engines, whereas a scale-4 decimal
        // cast is two roundings in DuckDB (unscaled→double, ÷10⁴) vs one
        // in Spark — a 1-ulp split that q290's first draft hit on syy.
        // The q228 OLS recipe; slope/intercept/MSE rescale from cents at
        // the end by deterministic double divides.
        val t = tbl(s, dir, "lineitem").select(
          col("l_returnflag").as("flag"),
          pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(5L)).as("fold"),
          col("l_quantity").as("x"),
          R(col("l_extendedprice") * 100.0, 0).as("y"))
        val fm = t.groupBy(col("flag"), col("fold")).agg(
          count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"),
          sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"))
        val w = Window.partitionBy(col("flag"))
        val wt = fm
          .withColumn("tn", sum(col("n")).over(w))
          .withColumn("tsx", sum(col("sx")).over(w))
          .withColumn("tsy", sum(col("sy")).over(w))
          .withColumn("tsxy", sum(col("sxy")).over(w))
          .withColumn("tsxx", sum(col("sxx")).over(w))
        def d(c: String) = col(c).cast("double")
        // complements subtract AS DOUBLES (after exact-decimal casts):
        // Spark's DECIMAL(38,4)−DECIMAL(38,4) wants precision 39 and
        // sheds the 4th decimal on the rebound to 38, while DuckDB keeps
        // it — the double path is bit-identical on both engines.
        val cn = (col("tn") - col("n")).cast("double")
        val csx = d("tsx") - d("sx")
        val csy = d("tsy") - d("sy")
        val csxy = d("tsxy") - d("sxy")
        val csxx = d("tsxx") - d("sxx")
        val b = (cn * csxy - csx * csy) / (cn * csxx - csx * csx)
        val a = (csy - b * csx) / cn
        val nn = col("n").cast("double")
        val mse = (d("syy") - lit(2.0) * col("a") * d("sy") -
          lit(2.0) * col("b") * d("sxy") +
          lit(2.0) * col("a") * col("b") * d("sx") +
          col("a") * col("a") * nn + col("b") * col("b") * d("sxx")) / nn
        val perFold = wt
          .withColumn("b", b).withColumn("a", a)
          .withColumn("mse_r", R(mse / 10000.0, 6))
        val cv = Window.partitionBy(col("flag"))
        perFold
          .withColumn("cv_mse_r",
            R(sum(col("mse_r").cast(DecimalType(28, 6))).over(cv)
              .cast("double") / count(lit(1)).over(cv), 6))
          .select(col("flag").as("l_returnflag"), col("fold"),
            col("n").as("n_test"),
            R(col("b") / 100.0, 6).as("slope_r"),
            R(col("a") / 100.0, 4).as("intercept_r"),
            col("mse_r"), col("cv_mse_r"))
          .orderBy("l_returnflag", "fold")
      },
      Some(s"""WITH t AS (
              |  SELECT l_returnflag AS flag,
              |    (l_orderkey * 7 + l_linenumber) % 5 AS fold,
              |    l_quantity AS x, ${rs("l_extendedprice * 100.0", 0)} AS y
              |  FROM lineitem),
              |fm AS (
              |  SELECT flag, fold, COUNT(*) AS n,
              |    SUM(CAST(x AS DECIMAL(38,0))) AS sx,
              |    SUM(CAST(y AS DECIMAL(38,0))) AS sy,
              |    SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
              |    SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
              |    SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
              |  FROM t GROUP BY flag, fold),
              |wt AS (
              |  SELECT *,
              |    SUM(n) OVER (PARTITION BY flag) AS tn,
              |    SUM(sx) OVER (PARTITION BY flag) AS tsx,
              |    SUM(sy) OVER (PARTITION BY flag) AS tsy,
              |    SUM(sxy) OVER (PARTITION BY flag) AS tsxy,
              |    SUM(sxx) OVER (PARTITION BY flag) AS tsxx
              |  FROM fm),
              |dd AS (
              |  SELECT *, CAST(tn - n AS DOUBLE) AS cn,
              |    CAST(tsx AS DOUBLE) - CAST(sx AS DOUBLE) AS csx,
              |    CAST(tsy AS DOUBLE) - CAST(sy AS DOUBLE) AS csy,
              |    CAST(tsxy AS DOUBLE) - CAST(sxy AS DOUBLE) AS csxy,
              |    CAST(tsxx AS DOUBLE) - CAST(sxx AS DOUBLE) AS csxx
              |  FROM wt),
              |co AS (
              |  SELECT *, (cn * csxy - csx * csy) / (cn * csxx - csx * csx) AS b
              |  FROM dd),
              |ab AS (
              |  SELECT *, (csy - b * csx) / cn AS a
              |  FROM co),
              |pf AS (
              |  SELECT flag, fold, n, a, b,
              |    ${rs(
                 "(CAST(syy AS DOUBLE) - 2.0 * a * CAST(sy AS DOUBLE) - 2.0 * b * CAST(sxy AS DOUBLE) + 2.0 * a * b * CAST(sx AS DOUBLE) + a * a * CAST(n AS DOUBLE) + b * b * CAST(sxx AS DOUBLE)) / CAST(n AS DOUBLE) / 10000.0",
                 6)} AS mse_r
              |  FROM ab)
              |SELECT flag AS l_returnflag, fold, n AS n_test,
              |  ${rs("b / 100.0", 6)} AS slope_r, ${rs("a / 100.0", 4)} AS intercept_r, mse_r,
              |  ${rs(
                 "CAST(SUM(CAST(mse_r AS DECIMAL(28,6))) OVER (PARTITION BY flag) AS DOUBLE) / COUNT(*) OVER (PARTITION BY flag)",
                 6)} AS cv_mse_r
              |FROM pf
              |ORDER BY l_returnflag, fold""".stripMargin)),

    // ----- q291: Kendall tau-b between two series -------------------
    // Monthly (quantity, revenue) per flag; every month pair classified
    // concordant / discordant / x-tie / y-tie. The pair join is
    // calendar-bounded (months²/2 at any corpus size) and broadcast.
    // tau-b's tie-corrected denominator √((n₀−n₁)(n₀−n₂)) divides
    // exact integers.
    QueryDef(
      "q291_kendall_tau",
      (s, dir) => {
        val monthly = tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag").as("flag"),
            date_format(col("l_shipdate"), "yyyy-MM").as("m"))
          .agg(
            sum(col("l_quantity").cast(DecimalType(18, 0))).cast("long").as("q"),
            sum(R(col("l_extendedprice") * 100.0, 0).cast(DecimalType(18, 0)))
              .cast("long").as("r"))
        val a = monthly.select(col("flag"), col("m").as("m1"),
          col("q").as("q1"), col("r").as("r1"))
        val b = monthly.select(col("flag"), col("m").as("m2"),
          col("q").as("q2"), col("r").as("r2"))
        val pairs = a.join(broadcast(b), Seq("flag")).filter(col("m1") < col("m2"))
        val cls = pairs.groupBy(col("flag")).agg(
          count(lit(1)).as("n0"),
          count(when((col("q1") < col("q2") && col("r1") < col("r2")) ||
            (col("q1") > col("q2") && col("r1") > col("r2")), 1)).as("cc"),
          count(when((col("q1") < col("q2") && col("r1") > col("r2")) ||
            (col("q1") > col("q2") && col("r1") < col("r2")), 1)).as("dd"),
          count(when(col("q1") === col("q2"), 1)).as("n1"),
          count(when(col("r1") === col("r2"), 1)).as("n2"))
        val nm = monthly.groupBy(col("flag")).agg(count(lit(1)).as("n_months"))
        cls.join(broadcast(nm), "flag")
          .select(col("flag").as("l_returnflag"), col("n_months"),
            col("cc").as("concordant"), col("dd").as("discordant"),
            col("n1").as("x_ties"), col("n2").as("y_ties"),
            R((col("cc") - col("dd")).cast("double") /
              sqrt(((col("n0") - col("n1")) * (col("n0") - col("n2"))).cast("double")),
              6).as("tau_b_r"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH monthly AS (
              |  SELECT l_returnflag AS flag, strftime(l_shipdate, '%Y-%m') AS m,
              |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS BIGINT) AS q,
              |    CAST(SUM(CAST(${rs("l_extendedprice * 100.0", 0)} AS DECIMAL(18,0))) AS BIGINT) AS r
              |  FROM lineitem GROUP BY flag, m),
              |pairs AS (
              |  SELECT a.flag, a.q AS q1, a.r AS r1, b.q AS q2, b.r AS r2
              |  FROM monthly a JOIN monthly b
              |    ON a.flag = b.flag AND a.m < b.m),
              |cls AS (
              |  SELECT flag, COUNT(*) AS n0,
              |    COUNT(CASE WHEN (q1 < q2 AND r1 < r2) OR (q1 > q2 AND r1 > r2)
              |          THEN 1 END) AS cc,
              |    COUNT(CASE WHEN (q1 < q2 AND r1 > r2) OR (q1 > q2 AND r1 < r2)
              |          THEN 1 END) AS dd,
              |    COUNT(CASE WHEN q1 = q2 THEN 1 END) AS n1,
              |    COUNT(CASE WHEN r1 = r2 THEN 1 END) AS n2
              |  FROM pairs GROUP BY flag),
              |nm AS (SELECT flag, COUNT(*) AS n_months FROM monthly GROUP BY flag)
              |SELECT cls.flag AS l_returnflag, nm.n_months,
              |  cc AS concordant, dd AS discordant, n1 AS x_ties, n2 AS y_ties,
              |  ${rs("CAST(cc - dd AS DOUBLE) / sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE))", 6)} AS tau_b_r
              |FROM cls JOIN nm ON nm.flag = cls.flag
              |ORDER BY l_returnflag""".stripMargin)),

    // ----- q292: session engagement by entry event ------------------
    // q29's 30-minute gap sessionization, summarized per entry type:
    // bounce rate (1-event sessions), mean depth, mean duration. Entry
    // row selected by packed (ts, event_id) struct-min — deterministic
    // under duplicate timestamps. One user-keyed window + two aggs;
    // all means are DECIMAL sums over counts.
    QueryDef(
      "q292_bounce_sessions",
      (s, dir) => {
        val e = tbl(s, dir, "events").select(
          col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        val wUser = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val marked = e
          .withColumn("prev", lag(col("us"), 1).over(wUser))
          .withColumn("is_new",
            when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1)
              .otherwise(0))
          .withColumn("sid", sum(col("is_new")).over(
            wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val sess = marked.groupBy(col("user_id"), col("sid")).agg(
          count(lit(1)).as("n_events"),
          (max(col("us")) - min(col("us"))).as("dur_us"),
          min(struct(col("us"), col("event_id"), col("event_type")))
            .getField("event_type").as("entry_type"))
        sess.groupBy(col("entry_type")).agg(
            count(lit(1)).as("n_sessions"),
            count(when(col("n_events") === 1, 1)).as("n_bounce"),
            R(count(when(col("n_events") === 1, 1)).cast("double") /
              count(lit(1)), 6).as("bounce_rate_r"),
            R(sum(col("n_events").cast(DecimalType(18, 0))).cast("double") /
              count(lit(1)), 4).as("avg_depth_r"),
            R(sum(col("dur_us").cast(DecimalType(28, 0))).cast("double") /
              count(lit(1)) / 1000000.0, 4).as("avg_dur_s_r"))
          .orderBy("entry_type")
      },
      Some(s"""WITH e AS (
              |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
              |  FROM events),
              |mk AS (
              |  SELECT *, CASE WHEN lag(us, 1) OVER w IS NULL
              |      OR us - lag(us, 1) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
              |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
              |sd AS (
              |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
              |    ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM mk),
              |sess AS (
              |  SELECT user_id, sid, COUNT(*) AS n_events,
              |    MAX(us) - MIN(us) AS dur_us,
              |    first(event_type ORDER BY us, event_id) AS entry_type
              |  FROM sd GROUP BY user_id, sid)
              |SELECT entry_type,
              |  COUNT(*) AS n_sessions,
              |  COUNT(CASE WHEN n_events = 1 THEN 1 END) AS n_bounce,
              |  ${rs("CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE) / COUNT(*)", 6)} AS bounce_rate_r,
              |  ${rs("CAST(SUM(CAST(n_events AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*)", 4)} AS avg_depth_r,
              |  ${rs("CAST(SUM(CAST(dur_us AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) / 1000000.0", 4)} AS avg_dur_s_r
              |FROM sess GROUP BY entry_type
              |ORDER BY entry_type""".stripMargin))
  )
}
