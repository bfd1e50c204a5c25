package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Text
import graft.ops.Num
import QueryDef.tbl

/** Round-9 ninth batch: sampling design (Neyman optimal allocation —
  * the step BEFORE q75's stratified sample picks its rates), bloom
  * filter sizing (the m/k/FPR closed forms that parameterize
  * Scale.bloomSemiJoin — q215's skew advisor for the bloom path), and a
  * consistent-hashing rebalance audit (the sharding property — remove a
  * node, only its keys move — measured, not assumed).
  */
object Extended36 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // ----- q244: Neyman optimal allocation ------------------------------
    // Allocate a 10,000-row sample budget across brand strata ∝ N_h·S_h
    // (Neyman) vs ∝ N_h (proportional), with the variance ratio
    // (ΣW_h·S_h)² / ΣW_h·S_h² that says how much the optimal design
    // buys. Exactness: per-stratum moments are exact DECIMAL cent
    // integers; S_h enters through one shared sqrt shape; allocations
    // are rounded-term DECIMAL-weighted shares over the bounded stratum
    // relation (floor to integers + deterministic largest-remainder is
    // q173's job — here the design readout keeps 2-dp fractional
    // allocations). Shape: one lineitem hash agg → 25-row stratum
    // relation → bounded windows; scales as a scan.
    QueryDef(
      "q244_neyman_allocation",
      (s, dir) => {
        val dec38 = DecimalType(38, 0)
        val pc = R(col("l_extendedprice") * 100.0, 0).cast(dec38)
        val strata = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("stratum"))
          .agg(count(lit(1)).as("nh"),
            sum(pc).as("sy"), sum(pc * pc).as("syy"))
        val d = (c: Column) => c.cast("double")
        val nD = d(col("nh"))
        val sdDollars = sqrt((nD * d(col("syy")) - d(col("sy")) * d(col("sy"))) /
          (nD * (nD - 1.0))) / 100.0
        val dec = DecimalType(28, 10)
        val tot = Window.partitionBy()
        // NORMALIZED (weight-scaled) terms: w_h·S and w_h·S² stay bounded
        // by S² regardless of corpus size — unnormalized N_h·S² terms
        // blow past Num.roundTo's long-floor range (see Num scaladoc) at
        // large SF. Division order pinned: w_h first, then ·S.
        val g0 = strata.withColumn("sd", sdDollars)
          .withColumn("n_all", sum(col("nh")).over(tot))
        val wH = nD / d(col("n_all"))
        val g = g0
          .withColumn("ws_t", R(wH * col("sd"), 10).cast(dec))
          .withColumn("wss_t", R(wH * col("sd") * col("sd"), 6).cast(dec))
          .withColumn("sum_ws", sum(col("ws_t")).over(tot).cast("double"))
          .withColumn("sum_wss", sum(col("wss_t")).over(tot).cast("double"))
        val wNey = wH * col("sd") / col("sum_ws")
        val varRatio = col("sum_ws") * col("sum_ws") / col("sum_wss")
        g.select(col("stratum"), col("nh"),
            R(d(col("sy")) / nD / 100.0, 4).as("mean_r"),
            R(col("sd"), 4).as("sd_r"),
            R(wNey * 10000.0, 2).as("neyman_n_r"),
            R(wH * 10000.0, 2).as("prop_n_r"),
            R(varRatio, 6).as("neyman_var_ratio_r"))
          .orderBy("stratum")
      },
      Some(s"""WITH strata AS (
              |  SELECT p_brand AS stratum, count(*) AS nh,
              |    sum(CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT)) AS sy,
              |    sum(CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT)
              |      * CAST(${rs("l_extendedprice * 100.0", 0)} AS HUGEINT)) AS syy
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  GROUP BY 1),
              |c AS (
              |  SELECT *, sqrt((CAST(nh AS DOUBLE) * CAST(syy AS DOUBLE)
              |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
              |    / (CAST(nh AS DOUBLE) * (CAST(nh AS DOUBLE) - 1.0))) / 100.0 AS sd,
              |    CAST(sum(nh) OVER () AS BIGINT) AS n_all
              |  FROM strata),
              |t AS (
              |  SELECT *,
              |    CAST(${rs("CAST(nh AS DOUBLE) / CAST(n_all AS DOUBLE) * sd", 10)} AS DECIMAL(28,10)) AS ws_t,
              |    CAST(${rs("CAST(nh AS DOUBLE) / CAST(n_all AS DOUBLE) * sd * sd", 6)} AS DECIMAL(28,10)) AS wss_t
              |  FROM c),
              |g AS (
              |  SELECT *,
              |    CAST(sum(ws_t) OVER () AS DOUBLE) AS sum_ws,
              |    CAST(sum(wss_t) OVER () AS DOUBLE) AS sum_wss
              |  FROM t)
              |SELECT stratum, nh,
              |  ${rs("CAST(sy AS DOUBLE) / CAST(nh AS DOUBLE) / 100.0", 4)} AS mean_r,
              |  ${rs("sd", 4)} AS sd_r,
              |  ${rs("CAST(nh AS DOUBLE) / CAST(n_all AS DOUBLE) * sd / sum_ws * 10000.0", 2)} AS neyman_n_r,
              |  ${rs("CAST(nh AS DOUBLE) / CAST(n_all AS DOUBLE) * 10000.0", 2)} AS prop_n_r,
              |  ${rs("sum_ws * sum_ws / sum_wss", 6)} AS neyman_var_ratio_r
              |FROM g ORDER BY stratum""".stripMargin)),

    // ----- q245: bloom filter sizing advisor ----------------------------
    // For the urgent-order key set q74's bloom semi-join actually
    // builds: at 8/12/16/20 bits per key, the optimal hash count
    // k = ⌊ln 2 · m/n + 0.5⌋ and the resulting false-positive rate
    // (1 − e^{−kn/m})^k; recommend the smallest budget meeting 1%.
    // Sizing decides whether the prefilter pays for itself at 100 TB —
    // an oversized filter wastes broadcast bytes, an undersized one
    // lets the shuffle through. Exactness: n is one exact distinct
    // count; k is an integer from a shared floor shape; FPR is one
    // shared double shape on the 4-row literal grid. Shape: one orders
    // agg + bounded grid explode — scales as a scan.
    QueryDef(
      "q245_bloom_fpr",
      (s, dir) => {
        val base = tbl(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .agg(countDistinct(col("o_orderkey")).as("n_keys"))
        val g = base.select(explode(array(lit(8L), lit(12L), lit(16L), lit(20L)))
          .as("bits_per_key"), col("n_keys"))
        val ratio = col("bits_per_key").cast("double")
        val k = floor(log(lit(2.0)) * ratio + lit(0.5)).cast("long")
        val kD = k.cast("double")
        val fpr = pow(lit(1.0) - exp(-kD / ratio), kD)
        val g2 = g.withColumn("k_opt", k).withColumn("fpr", fpr)
          .withColumn("meets_1pct", col("fpr") <= 0.01)
        val best = min(when(col("meets_1pct"), col("bits_per_key")))
          .over(Window.partitionBy())
        g2.select(col("bits_per_key"), col("n_keys"),
            (col("bits_per_key") * col("n_keys")).as("m_bits"),
            col("k_opt"),
            R(col("fpr"), 8).as("fpr_r"),
            col("meets_1pct"),
            (col("bits_per_key") === best).as("recommended"))
          .orderBy("bits_per_key")
      },
      Some(s"""WITH base AS (
              |  SELECT count(DISTINCT o_orderkey) AS n_keys FROM orders
              |  WHERE o_orderpriority = '1-URGENT'),
              |grid AS (
              |  SELECT CAST(b.bits AS BIGINT) AS bits_per_key, n_keys
              |  FROM base CROSS JOIN (VALUES (8), (12), (16), (20)) AS b(bits)),
              |c AS (
              |  SELECT *,
              |    CAST(floor(ln(2.0) * CAST(bits_per_key AS DOUBLE) + 0.5) AS BIGINT) AS k_opt
              |  FROM grid),
              |f AS (
              |  SELECT *,
              |    pow(1.0 - exp(-CAST(k_opt AS DOUBLE) / CAST(bits_per_key AS DOUBLE)), CAST(k_opt AS DOUBLE)) AS fpr
              |  FROM c),
              |g AS (
              |  SELECT *, fpr <= 0.01 AS meets_1pct,
              |    min(CASE WHEN fpr <= 0.01 THEN bits_per_key END) OVER () AS best
              |  FROM f)
              |SELECT bits_per_key, n_keys, bits_per_key * n_keys AS m_bits, k_opt,
              |  ${rs("fpr", 8)} AS fpr_r,
              |  meets_1pct,
              |  bits_per_key = best AS recommended
              |FROM g ORDER BY bits_per_key""".stripMargin)),

    // ----- q246: consistent-hashing rebalance audit ---------------------
    // Assign customer keys to 8 nodes via a 256-point hash ring (32
    // virtual nodes each, engine-neutral md5 positions), then remove
    // node 7 and measure the rebalance. Consistent hashing's defining
    // property — ONLY the removed node's keys move, everyone else's
    // assignment is untouched — is reported as moved_keys per node and
    // spec-pinned. Exactness: ring positions and key hashes are exact
    // md5-derived integers; the successor choice is an integer min over
    // (position ‖ node)-encoded longs — no floats anywhere. Shape: the
    // 256-row ring broadcasts; each key scans it map-side (a bounded
    // BNLJ against a literal-sized dimension, the q213 pattern) and
    // min-aggregates immediately; output is the 8-row node relation.
    QueryDef(
      "q246_consistent_hashing",
      (s, dir) => {
        // ring: node 0..7 × replica 0..31, position = md5-hash32
        val ring = s.range(8).select(col("id").as("node"))
          .crossJoin(s.range(32).select(col("id").as("rep")))
          .select(col("node"),
            Text.tokenHash32(concat(lit("node"), col("node"), lit("#"), col("rep")))
              .as("vh"))
          .select(col("node"), col("vh"), (col("vh") * 100L + col("node")).as("enc"))
        val keys = tbl(s, dir, "customer")
          .select(col("c_custkey"),
            Text.tokenHash32(col("c_custkey").cast("string")).as("kh"))
        def assign(r: DataFrame, alias: String): DataFrame = {
          val rr = broadcast(r.select(col("vh").as(s"vh_$alias"), col("enc").as(s"enc_$alias")))
          val wrap = broadcast(r.agg(min(col("enc")).as(s"wrap_$alias")))
          keys.join(rr, col(s"vh_$alias") >= col("kh"), "left")
            .groupBy(col("c_custkey"), col("kh"))
            .agg(min(col(s"enc_$alias")).as(s"succ_$alias"))
            .crossJoin(wrap)
            .select(col("c_custkey"), col("kh"),
              pmod(coalesce(col(s"succ_$alias"), col(s"wrap_$alias")), lit(100L))
                .as(s"node_$alias"))
        }
        val before = assign(ring, "b")
        val after = assign(ring.filter(col("node") =!= 7), "a")
        val j = before.join(after.select(col("c_custkey").as("ck2"), col("node_a")),
          col("c_custkey") === col("ck2"))
        val perNode = j.groupBy(col("node_b").as("node"))
          .agg(count(lit(1)).as("n_before"),
            sum(when(col("node_a") =!= col("node_b"), 1L).otherwise(0L)).as("moved"))
        val tot = Window.partitionBy()
        perNode
          .withColumn("n_total", sum(col("n_before")).over(tot))
          .select(col("node"), col("n_before"),
            R(col("n_before").cast("double") / col("n_total").cast("double"), 6)
              .as("share_r"),
            col("moved"),
            (col("moved") === when(col("node") === 7, col("n_before")).otherwise(0L))
              .as("only_removed_moves"))
          .orderBy("node")
      },
      Some {
        val h32 = (e: String) => s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"
        s"""WITH ring AS (
           |  SELECT n.node, ${h32("'node' || n.node || '#' || r.rep")} AS vh
           |  FROM (SELECT CAST(range AS BIGINT) AS node FROM range(8)) n
           |  CROSS JOIN (SELECT CAST(range AS BIGINT) AS rep FROM range(32)) r),
           |ring2 AS (SELECT node, vh, vh * 100 + node AS enc FROM ring),
           |keys AS (
           |  SELECT c_custkey, ${h32("CAST(c_custkey AS VARCHAR)")} AS kh FROM customer),
           |bef AS (
           |  SELECT k.c_custkey, k.kh,
           |    COALESCE(min(r.enc), (SELECT min(enc) FROM ring2)) % 100 AS node_b
           |  FROM keys k LEFT JOIN ring2 r ON r.vh >= k.kh
           |  GROUP BY 1, 2),
           |aft AS (
           |  SELECT k.c_custkey,
           |    COALESCE(min(r.enc), (SELECT min(enc) FROM ring2 WHERE node <> 7)) % 100 AS node_a
           |  FROM keys k LEFT JOIN ring2 r ON r.vh >= k.kh AND r.node <> 7
           |  GROUP BY 1),
           |j AS (
           |  SELECT bef.*, aft.node_a FROM bef JOIN aft USING (c_custkey)),
           |pn AS (
           |  SELECT node_b AS node, count(*) AS n_before,
           |    CAST(sum(CASE WHEN node_a <> node_b THEN 1 ELSE 0 END) AS BIGINT) AS moved
           |  FROM j GROUP BY 1),
           |g AS (SELECT *, CAST(sum(n_before) OVER () AS BIGINT) AS n_total FROM pn)
           |SELECT node, n_before,
           |  ${rs("CAST(n_before AS DOUBLE) / CAST(n_total AS DOUBLE)", 6)} AS share_r,
           |  moved,
           |  moved = CASE WHEN node = 7 THEN n_before ELSE 0 END AS only_removed_moves
           |FROM g ORDER BY node""".stripMargin
      })
  )
}
