package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Num
import QueryDef.tbl

/** Round-9 fifteenth batch: three unsupervised-structure operators the
  * board lacked —
  *
  *  - q263 grid-density clustering (DBSCAN's scalable cousin): summarize
  *    points into a FIXED bounded grid (240 cells at any data size), call
  *    a cell dense when its count clears a RELATIVE threshold (1.5× the
  *    mean non-empty cell — an absolute count would make the screen
  *    vacuous or total as SF moves), then connect dense cells through
  *    8-adjacency into clusters. The 100 TB shape: ONE count agg over the
  *    raw points, then all graph work happens on ≤240 summary rows —
  *    density clustering without a single point-to-point distance.
  *  - q264 isotonic calibration via the minimax formula: fitted(i) =
  *    max_{j≤i} min_{k≥i} mean(y over bins j..k) — the closed-form twin
  *    of pool-adjacent-violators (no sequential pooling loop), exact on
  *    integer bin sums, O(B³) on B=20 bins regardless of row count.
  *  - q265 changepoint detection (binary segmentation, first split): the
  *    split of a daily series maximizing the variance-reduction gain,
  *    from prefix sums of exact DECIMAL daily totals — one window pass,
  *    one top-1; no per-candidate rescan.
  */
object Extended42 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  /** 48-bit md5 fraction in [0,1) — engine-neutral deterministic uniform
    * (q254's recipe).
    */
  private def mdFrac(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10)
      .cast("double") / lit(2.81474976710656E14)

  private def mdFracSql(e: String): String =
    s"CAST(('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 12)) AS BIGINT) / 2.81474976710656E14"

  val all: Seq[QueryDef] = Seq(

    // ----- q263: grid-density clustering --------------------------------
    // Points: (clipped event value, hash-uniform y). Cells: 10 × 0.125
    // over [0,300)×[0,1) → cx∈0..29, cy∈0..7, id = cx·8+cy. Exactness:
    // counts are integers, the density threshold compares n against
    // 1.5·(exact-int-sum / exact count), components take MIN ids —
    // no float accumulation anywhere past the one threshold division.
    QueryDef(
      "q263_grid_dbscan",
      (s, dir) => {
        // Ckpt (r16): the cell rollup — a full events scan with per-row
        // md5 — feeds the threshold agg, the dense relation (3 consumers)
        // and the noise rollup; it otherwise recomputed ~5×.
        // width 1 (r17): the rollup is GRID-bounded (≤ 30×8 = 240 cells
        // by construction at any corpus size), so one block — block count
        // scales with the relation's bound, not the cluster width
        // (materializing ≤240 rows as 32 blocks cost a 32-task round in
        // every consumer)
        val cells = graft.ops.Ckpt(tbl(s, dir, "events")
          .select(least(col("value"), lit(299.99)).as("x"),
            mdFrac(col("event_id")).as("y"))
          .groupBy(floor(col("x") / 10.0).cast("long").as("cx"),
            floor(col("y") / 0.125).cast("long").as("cy"))
          .agg(count(lit(1)).as("n")), width = 1)
        val thr = cells.agg((sum(col("n")).cast("double") /
          count(lit(1)).cast("double")).as("a"))
        val dense = cells.crossJoin(broadcast(thr))
          .filter(col("n").cast("double") >= lit(1.5) * col("a"))
          .select((col("cx") * 8 + col("cy")).as("id"),
            col("cx"), col("cy"), col("n"))
        // the dense-cell adjacency graph is GEOMETRY-bounded (≤ 30×8 =
        // 240 cells by grid construction at any data scale) — driver CC
        // over the collected cells (TinyGraph decision rule), min-label
        // components identical to Dedup.connectedComponents
        val denseCells = graft.ops.TinyGraph.collectBounded(dense, "q263 dense cells")
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val label = scala.collection.mutable.Map(
          denseCells.map { case (id, _, _) => id -> id }.toSeq: _*)
        var changed = true
        while (changed) {
          changed = false
          for ((ia, xa, ya) <- denseCells; (ib, xb, yb) <- denseCells
               if ia < ib && math.abs(xa - xb) <= 1 && math.abs(ya - yb) <= 1) {
            val m = math.min(label(ia), label(ib))
            if (label(ia) != m) { label(ia) = m; changed = true }
            if (label(ib) != m) { label(ib) = m; changed = true }
          }
        }
        val labRows: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(denseCells.map { case (id, _, _) =>
            org.apache.spark.sql.Row(id, label(id)): org.apache.spark.sql.Row
          }: _*)
        val labeled = s.createDataFrame(labRows,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("label",
              org.apache.spark.sql.types.LongType))))
        val lab = dense.join(broadcast(labeled), Seq("id"), "left")
          .select(col("id"), coalesce(col("label"), col("id")).as("cluster"),
            col("cx"), col("cy"), col("n"))
        val clusters = lab.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_points"),
            min(col("cx")).as("min_cx"), max(col("cx")).as("max_cx"),
            min(col("cy")).as("min_cy"), max(col("cy")).as("max_cy"))
        val noise = cells.crossJoin(broadcast(thr))
          .filter(col("n").cast("double") < lit(1.5) * col("a"))
          .agg(lit(-1L).as("cluster"), count(lit(1)).as("n_cells"),
            sum(col("n")).as("n_points"),
            min(col("cx")).as("min_cx"), max(col("cx")).as("max_cx"),
            min(col("cy")).as("min_cy"), max(col("cy")).as("max_cy"))
        clusters.unionByName(noise)
          .orderBy(col("n_points").desc, col("cluster"))
      },
      Some(s"""WITH RECURSIVE p AS (
              |  SELECT least(value, 299.99) AS x, ${mdFracSql("event_id")} AS y
              |  FROM events),
              |c AS (
              |  SELECT CAST(floor(x / 10.0) AS BIGINT) AS cx,
              |         CAST(floor(y / 0.125) AS BIGINT) AS cy, count(*) AS n
              |  FROM p GROUP BY 1, 2),
              |s AS (SELECT CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS a FROM c),
              |d AS (
              |  SELECT cx * 8 + cy AS id, cx, cy, n FROM c, s
              |  WHERE CAST(n AS DOUBLE) >= 1.5 * a),
              |e AS (
              |  SELECT d1.id AS src, d2.id AS dst
              |  FROM d d1 JOIN d d2
              |    ON abs(d1.cx - d2.cx) <= 1 AND abs(d1.cy - d2.cy) <= 1
              |   AND d1.id <> d2.id),
              |reach(a, b) AS (
              |  SELECT id, id FROM d
              |  UNION
              |  SELECT reach.a, e.dst FROM reach JOIN e ON e.src = reach.b),
              |lab AS (SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a),
              |cl AS (
              |  SELECT cluster, count(*) AS n_cells, CAST(sum(n) AS BIGINT) AS n_points,
              |    min(cx) AS min_cx, max(cx) AS max_cx,
              |    min(cy) AS min_cy, max(cy) AS max_cy
              |  FROM d JOIN lab USING (id) GROUP BY cluster),
              |noise AS (
              |  SELECT CAST(-1 AS BIGINT) AS cluster, count(*) AS n_cells,
              |    CAST(sum(n) AS BIGINT) AS n_points,
              |    min(cx) AS min_cx, max(cx) AS max_cx,
              |    min(cy) AS min_cy, max(cy) AS max_cy
              |  FROM c, s WHERE CAST(n AS DOUBLE) < 1.5 * a)
              |SELECT * FROM cl UNION ALL SELECT * FROM noise
              |ORDER BY n_points DESC, cluster""".stripMargin),
    ),

    // ----- q264: isotonic calibration (minimax form of PAVA) ------------
    // Score: hash-uniform in [0,1) from event_id (20 equal bins, all
    // populated at every SF); label: value > 100. The raw per-bin rates
    // fluctuate around a flat truth, so pooling provably fires. All
    // segment means are ratios of integer sums → bit-identical doubles;
    // min/max over them is order-free.
    QueryDef(
      "q264_isotonic",
      (s, dir) => {
        val bins = tbl(s, dir, "events")
          .select(floor(((col("event_id") * 2654435761L) % 1000L)
              .cast("double") / 50.0).cast("long").as("b"),
            when(col("value") > 100.0, 1L).otherwise(0L).as("y"))
          .groupBy(col("b"))
          .agg(count(lit(1)).as("w"), sum(col("y")).as("sy"))
        val wc = Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pre = bins.select(col("b"), col("w"), col("sy"),
          sum(col("w")).over(wc).as("cw"), sum(col("sy")).over(wc).as("cs"))
        val seg = pre.as("j").join(pre.as("k"), col("j.b") <= col("k.b"))
          .select(col("j.b").as("j"), col("k.b").as("k"),
            ((col("k.cs") - col("j.cs") + col("j.sy")).cast("double") /
              (col("k.cw") - col("j.cw") + col("j.w")).cast("double")).as("m"))
        val fit = pre.select(col("b"), col("w"), col("sy"))
          .join(seg, col("j") <= col("b") && col("k") >= col("b"))
          .groupBy(col("b"), col("w"), col("sy"), col("j"))
          .agg(min(col("m")).as("mn"))
          .groupBy(col("b"), col("w"), col("sy"))
          .agg(max(col("mn")).as("fit"))
        fit.select(col("b"), col("w"),
            R(col("sy").cast("double") / col("w").cast("double"), 6).as("raw_r"),
            R(col("fit"), 6).as("fit_r"))
          .orderBy(col("b"))
      },
      Some(s"""WITH bins AS (
              |  SELECT CAST(floor(CAST((event_id * 2654435761) % 1000 AS DOUBLE) / 50.0) AS BIGINT) AS b,
              |    count(*) AS w,
              |    sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS sy
              |  FROM events GROUP BY 1),
              |pre AS (
              |  SELECT b, w, sy,
              |    sum(w) OVER (ORDER BY b) AS cw,
              |    sum(sy) OVER (ORDER BY b) AS cs
              |  FROM bins),
              |seg AS (
              |  SELECT j.b AS j, k.b AS k,
              |    CAST(k.cs - j.cs + j.sy AS DOUBLE) /
              |    CAST(k.cw - j.cw + j.w AS DOUBLE) AS m
              |  FROM pre j JOIN pre k ON j.b <= k.b),
              |inner_min AS (
              |  SELECT p.b, p.w, p.sy, seg.j, min(seg.m) AS mn
              |  FROM pre p JOIN seg ON seg.j <= p.b AND seg.k >= p.b
              |  GROUP BY p.b, p.w, p.sy, seg.j),
              |fit AS (
              |  SELECT b, w, sy, max(mn) AS fit
              |  FROM inner_min GROUP BY b, w, sy)
              |SELECT b, w,
              |  ${rs("CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)", 6)} AS raw_r,
              |  ${rs("fit", 6)} AS fit_r
              |FROM fit ORDER BY b""".stripMargin),
    ),

    // ----- q265: changepoint (binary segmentation, first split) ---------
    // Daily value totals as DECIMAL(18,2) (exact, order-free); gain(t) =
    // SSE_total − SSE_left(1..t) − SSE_right(t+1..N) from prefix sums of
    // x and x² (x² as DECIMAL(38,4), still exact). The argmax ties break
    // toward the earliest day on the 4-dp-rounded gain. One shuffle to
    // days, one ordered window, one TakeOrdered(1).
    QueryDef(
      "q265_changepoint",
      (s, dir) => {
        val daily = tbl(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(sum(R(col("value"), 2).cast(DecimalType(18, 2)))
            .cast(DecimalType(18, 2)).as("x"))
        val wc = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pre = daily.select(col("day"),
            row_number().over(Window.orderBy(col("day"))).cast("long").as("t"),
            sum(col("x")).over(wc).as("p"),
            sum((col("x") * col("x")).cast(DecimalType(38, 4))).over(wc).as("q"))
        val tot = pre.agg(max(col("t")).as("nn"),
          max_by(col("p"), col("t")).as("pn"), max_by(col("q"), col("t")).as("qn"))
        val d = (c: Column) => c.cast("double")
        val cand = pre.crossJoin(broadcast(tot))
          .filter(col("t") < col("nn"))
          .select(col("day"), col("t"), col("nn"),
            (d(col("qn")) - d(col("pn")) * d(col("pn")) / d(col("nn")) -
              (d(col("q")) - d(col("p")) * d(col("p")) / d(col("t"))) -
              (d(col("qn")) - d(col("q")) -
                (d(col("pn")) - d(col("p"))) * (d(col("pn")) - d(col("p"))) /
                  (d(col("nn")) - d(col("t"))))).as("gain"),
            (d(col("p")) / d(col("t"))).as("ml"),
            ((d(col("pn")) - d(col("p"))) / (d(col("nn")) - d(col("t")))).as("mr"))
        cand.select(col("day").as("split_day"), col("t"), col("nn").as("n_days"),
            R(col("gain"), 4).as("gain_r"),
            R(col("ml"), 4).as("mean_left_r"), R(col("mr"), 4).as("mean_right_r"))
          .orderBy(col("gain_r").desc, col("t"))
          .limit(1)
      },
      Some(s"""WITH daily AS (
              |  SELECT strftime(ts, '%Y-%m-%d') AS day,
              |    CAST(sum(CAST(${rs("value", 2)} AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
              |  FROM events GROUP BY 1),
              |pre AS (
              |  SELECT day,
              |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
              |    sum(x) OVER (ORDER BY day) AS p,
              |    sum(CAST(x * x AS DECIMAL(38,4))) OVER (ORDER BY day) AS q
              |  FROM daily),
              |tot AS (
              |  SELECT max(t) AS nn, max_by(p, t) AS pn, max_by(q, t) AS qn
              |  FROM pre),
              |cand AS (
              |  SELECT day, t, nn,
              |    CAST(qn AS DOUBLE) - CAST(pn AS DOUBLE) * CAST(pn AS DOUBLE) / CAST(nn AS DOUBLE)
              |      - (CAST(q AS DOUBLE) - CAST(p AS DOUBLE) * CAST(p AS DOUBLE) / CAST(t AS DOUBLE))
              |      - (CAST(qn AS DOUBLE) - CAST(q AS DOUBLE)
              |         - (CAST(pn AS DOUBLE) - CAST(p AS DOUBLE)) * (CAST(pn AS DOUBLE) - CAST(p AS DOUBLE))
              |           / (CAST(nn AS DOUBLE) - CAST(t AS DOUBLE))) AS gain,
              |    CAST(p AS DOUBLE) / CAST(t AS DOUBLE) AS ml,
              |    (CAST(pn AS DOUBLE) - CAST(p AS DOUBLE)) / (CAST(nn AS DOUBLE) - CAST(t AS DOUBLE)) AS mr
              |  FROM pre, tot WHERE t < nn)
              |SELECT day AS split_day, t, nn AS n_days,
              |  ${rs("gain", 4)} AS gain_r,
              |  ${rs("ml", 4)} AS mean_left_r,
              |  ${rs("mr", 4)} AS mean_right_r
              |FROM cand
              |ORDER BY gain_r DESC, t LIMIT 1""".stripMargin),
    )
  )
}
