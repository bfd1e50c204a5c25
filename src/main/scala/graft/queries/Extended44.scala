package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 seventeenth batch: Markov-chain (removal-effect) attribution —
  * the model-based closer of the attribution family (q185 last-touch,
  * q214 linear, q220 position are all heuristic splits; this one asks
  * the counterfactual "how much conversion disappears if channel c is
  * deleted from the journey graph?").
  *
  * Journeys: per user, events up to and including the first purchase
  * (CONV); non-purchasers terminate in NULL. First-order transition
  * probabilities feed an absorption iteration v_{k+1}(s) = Σ_t
  * P(s,t)·v_k(t) run a FIXED 24 steps with 12-dp rounding per step —
  * the Holt/DTW house contract for iterative math: both engines walk
  * the identical rounded state sequence, so convergence tolerance never
  * enters the comparison. Removal scenarios redirect a channel's inbound
  * mass to NULL (no renormalization — the standard removal-effect
  * definition).
  *
  * Scale shape: the transition matrix is a ≤30-row relation regardless
  * of corpus size (one shuffle to build it); all five scenario
  * iterations run as ONE codegen'd `aggregate` HOF over a 5-row frame —
  * no driver loop, no per-iteration job, no collect.
  */
object Extended44 {

  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  private val Channels = Seq("click", "error", "signup", "view")
  private val Transients = "START" +: Channels
  private val K = 24

  /** Shared per-step update formula for transient state `s`, with the
    * probability lookup and the running-vector lookup abstracted so the
    * SAME term order (CONV first, then channels alphabetically) renders
    * into the Spark fold and the DuckDB recursion — identical IEEE
    * evaluation on both engines.
    */
  private def newV(s: String, p: (String, String) => String,
      v: String => String): String = {
    val terms = p(s, "CONV") +: Channels.map(t => s"${p(s, t)} * ${v(t)}")
    Num.roundSql(terms.mkString(" + "), 12)
  }

  // Spark: probabilities live in a per-scenario map column `pm`
  // ('src|dst' → p); the running vector is `v` (1-based array over
  // Transients order).
  private def pSpark(s: String, t: String) =
    s"coalesce(element_at(pm, '$s|$t'), cast(0 as double))"
  private def vSpark(t: String) =
    s"element_at(v, ${Transients.indexOf(t) + 1})"

  private val foldExpr = {
    val step = Transients.map(s => newV(s, pSpark, vSpark)).mkString(",\n  ")
    s"""aggregate(
       |  sequence(1, $K),
       |  transform(sequence(1, ${Transients.length}), x -> cast(0 as double)),
       |  (v, k) -> array($step))""".stripMargin
  }

  // DuckDB: probabilities are pivoted columns p_<src>_<dst> on `mat`;
  // the running vector is columns v_<state> on the recursive relation.
  private def pSql(s: String, t: String) = s"p_${s.toLowerCase}_${t.toLowerCase}"
  private def vSql(t: String) = s"v_${t.toLowerCase}"

  private val matCols = (for {
    s <- Transients
    t <- Channels :+ "CONV"
  } yield s"    coalesce(max(CASE WHEN src = '$s' AND dst = '$t' THEN p END), 0e0) AS ${pSql(s, t)}")
    .mkString(",\n")

  private val recStep =
    Transients.map(s => s"    ${newV(s, pSql, vSql)} AS ${vSql(s)}").mkString(",\n")

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q268_markov_attribution",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val e2 = tbl(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(w))
        val fpu = e2.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("rn")).as("fp"))
        val kept = e2.join(fpu, Seq("user_id"), "left")
          .filter(col("fp").isNull || col("rn") <= col("fp"))
          .withColumn("state",
            when(col("event_type") === "purchase", lit("CONV"))
              .otherwise(col("event_type")))
        val wk = Window.partitionBy(col("user_id")).orderBy(col("rn"))
        val steps = kept
          .withColumn("src", coalesce(lag(col("state"), 1).over(wk), lit("START")))
          .select(col("src"), col("state").as("dst"))
        val terminal = kept.filter(col("fp").isNull)
          .groupBy(col("user_id"))
          .agg(max_by(col("state"), col("rn")).as("src"))
          .select(col("src"), lit("NULL").as("dst"))
        val trans = steps.unionByName(terminal)
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
          .withColumn("tot", sum(col("c")).over(Window.partitionBy(col("src"))))
          .select(col("src"), col("dst"),
            (col("c").cast("double") / col("tot").cast("double")).as("p"))
        val scen = ("none" +: Channels).toDF("scen")
        // removal: drop the channel's outgoing rows; redirect its inbound
        // mass to NULL (≤2-term sums — commutative, engine-safe)
        val strans = scen.crossJoin(trans)
          .filter(col("src") =!= col("scen"))
          .withColumn("dst2",
            when(col("dst") === col("scen"), lit("NULL")).otherwise(col("dst")))
          .groupBy(col("scen"), col("src"), col("dst2").as("dst"))
          .agg(sum(col("p")).as("p"))
        val pm = strans.groupBy(col("scen"))
          .agg(map_from_entries(collect_list(
            struct(concat_ws("|", col("src"), col("dst")), col("p")))).as("pm"))
        val conv = pm.withColumn("vk", expr(foldExpr))
          .select(col("scen"), expr("element_at(vk, 1)").as("conv"))
        val base = conv.filter(col("scen") === "none")
          .select(col("conv").as("base"))
        val eff = conv.filter(col("scen") =!= "none")
          .crossJoin(broadcast(base))
          .withColumn("effect", col("base") - col("conv"))
        val tot = eff.agg(sum(Num.roundTo(col("effect"), 10)
          .cast(DecimalType(20, 10))).as("efftot"))
        eff.crossJoin(broadcast(tot))
          .select(col("scen").as("channel"),
            Num.roundTo(col("base"), 6).as("base_cvr_r"),
            Num.roundTo(col("conv"), 6).as("removed_cvr_r"),
            Num.roundTo(col("effect"), 6).as("effect_r"),
            Num.roundTo(Num.roundTo(col("effect"), 10) /
              col("efftot").cast("double"), 6).as("share_r"))
          .orderBy(col("channel"))
      },
      Some(s"""WITH RECURSIVE e2 AS (
              |  SELECT user_id, event_type, ts, event_id,
              |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              |  FROM events),
              |fpu AS (
              |  SELECT user_id, min(rn) AS fp FROM e2
              |  WHERE event_type = 'purchase' GROUP BY 1),
              |kept AS (
              |  SELECT e2.*, fpu.fp,
              |    CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS state
              |  FROM e2 LEFT JOIN fpu USING (user_id)
              |  WHERE fpu.fp IS NULL OR e2.rn <= fpu.fp),
              |steps AS (
              |  SELECT coalesce(lag(state) OVER (PARTITION BY user_id ORDER BY rn),
              |      'START') AS src, state AS dst
              |  FROM kept),
              |terminal AS (
              |  SELECT max_by(state, rn) AS src, 'NULL' AS dst
              |  FROM kept WHERE fp IS NULL GROUP BY user_id),
              |trans AS (
              |  SELECT src, dst, count(*) AS c,
              |    sum(count(*)) OVER (PARTITION BY src) AS tot
              |  FROM (SELECT * FROM steps UNION ALL SELECT * FROM terminal)
              |  GROUP BY src, dst),
              |tp AS (
              |  SELECT src, dst, CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS p
              |  FROM trans),
              |scen AS (
              |  SELECT unnest(['none', ${Channels.map("'" + _ + "'").mkString(", ")}]) AS scen),
              |strans AS (
              |  SELECT scen, src,
              |    CASE WHEN dst = scen THEN 'NULL' ELSE dst END AS dst,
              |    sum(p) AS p
              |  FROM scen CROSS JOIN tp
              |  WHERE src <> scen
              |  GROUP BY 1, 2, 3),
              |mat AS (
              |  SELECT scen,
              |$matCols
              |  FROM strans GROUP BY scen),
              |it AS (
              |  SELECT scen, 0 AS k,
              |    ${Transients.map(s => s"0e0 AS ${vSql(s)}").mkString(", ")}
              |  FROM mat
              |  UNION ALL
              |  SELECT it.scen, k + 1,
              |$recStep
              |  FROM it JOIN mat ON mat.scen = it.scen
              |  WHERE k < $K),
              |conv AS (
              |  SELECT scen, v_start AS conv FROM it WHERE k = $K),
              |base AS (SELECT conv AS base FROM conv WHERE scen = 'none'),
              |eff AS (
              |  SELECT scen, conv, base, base - conv AS effect
              |  FROM conv CROSS JOIN base WHERE scen <> 'none'),
              |tot AS (
              |  SELECT sum(CAST(${rs("effect", 10)} AS DECIMAL(20,10))) AS efftot
              |  FROM eff)
              |SELECT scen AS channel,
              |  ${rs("base", 6)} AS base_cvr_r,
              |  ${rs("conv", 6)} AS removed_cvr_r,
              |  ${rs("effect", 6)} AS effect_r,
              |  ${rs(s"${rs("effect", 10)} / CAST(efftot AS DOUBLE)", 6)} AS share_r
              |FROM eff CROSS JOIN tot
              |ORDER BY channel""".stripMargin)
    )
  )
}
