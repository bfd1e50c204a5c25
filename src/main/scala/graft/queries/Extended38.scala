package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Similarity
import graft.ops.Num
import QueryDef.tbl

/** Round-9 eleventh batch: clustering-quality evaluation (simplified
  * silhouette over the IVF cell layout — the acceptance gate before
  * trusting cell-bounded dedup/ANN; the full pairwise silhouette is
  * O(N²), the centroid form is the only one that survives corpus scale)
  * and statistically-sized histograms (Freedman–Diaconis auto-binning —
  * q134 splits by equal MASS, this derives the equal-WIDTH bin count the
  * data's spread actually supports).
  */
object Extended38 {

  private def R(c: Column, n: Int) = Num.roundTo(c, n)
  private def rs(e: String, n: Int) = Num.roundSql(e, n)

  val all: Seq[QueryDef] = Seq(

    // ----- q252: simplified silhouette of the IVF cells -----------------
    // Per cell: mean cohesion a (distance to own centroid), mean
    // separation b (distance to nearest other centroid), mean
    // silhouette s = (b−a)/max(a,b) — plus the global mean attached
    // over the cell-bounded relation. Same deterministic pipeline as
    // q40/q123 (stride-50 seed, 2 Lloyd iterations), so the oracle
    // unrolls the IDENTICAL training and scores every point with the
    // same shapes — the whole clustering-quality readout sits under
    // the hash gate. Exactness: per-point a/b/s are shared double
    // shapes; cell means accumulate ROUNDED-term DECIMALs. Shape: one
    // N × C broadcast scan (never pairwise), cell-bounded windows.
    QueryDef(
      "q252_silhouette",
      (s, dir) => {
        // grade the PRODUCTION cell layout (√N stride, q302's rule): the
        // old fixed stride=50 grew centroids as N/50, making the N×C
        // scoring scan O(N²/50) — measured 14.8× for 10× data in the
        // round-10 full-battery scale smoke; √N cells keep it O(N^1.5),
        // the accepted IVF assignment cost
        val emb = tbl(s, dir, "embeddings")
        val pts = Similarity.simplifiedSilhouette(
          emb, "vec_id", "embedding",
          stride = Similarity.sqrtStride(graft.Tables.cachedCount(s, dir, "embeddings")), trainIters = 2)
        val dec = DecimalType(24, 10)
        val cells = pts.groupBy(col("cent_id"))
          .agg(count(lit(1)).as("n_points"),
            sum(R(col("a"), 10).cast(dec)).cast("double").as("sa"),
            sum(R(col("b"), 10).cast(dec)).cast("double").as("sb"),
            sum(R(col("s"), 10).cast(dec)).cast("double").as("ss"))
        val tot = Window.partitionBy()
        val d = (c: Column) => c.cast("double")
        cells
          .withColumn("np", d(col("n_points")))
          .withColumn("g_ss", sum(R(col("ss"), 10).cast(dec)).over(tot).cast("double"))
          .withColumn("g_n", sum(col("n_points")).over(tot))
          .select(col("cent_id"), col("n_points"),
            R(col("sa") / col("np"), 6).as("mean_a_r"),
            R(col("sb") / col("np"), 6).as("mean_b_r"),
            R(col("ss") / col("np"), 6).as("mean_s_r"),
            R(col("g_ss") / d(col("g_n")), 6).as("global_s_r"))
          .orderBy("cent_id")
      },
      Some {
        val normCte = EmbeddingQueries.normCte
        val l1 = EmbeddingQueries.lloydIter("cent0", "a1", "m1", "cent1")
        val l2 = EmbeddingQueries.lloydIter("cent1", "a2", "m2", "cent2")
        s"""WITH $normCte,
           |c AS (SELECT e.vec_id cid, e.embedding ce, n.nrm cn
           |      FROM embeddings e JOIN n ON n.vec_id = e.vec_id),
           |st AS (SELECT greatest(1, CAST(round(sqrt(count(*))) AS BIGINT)) AS sv
           |       FROM embeddings),
           |cent0 AS (SELECT cid AS cent_id, CAST(ce AS DOUBLE[]) AS cent_e, cn AS cent_n
           |          FROM c WHERE cid % (SELECT sv FROM st) = 0),
           |$l1,
           |$l2,
           |d3 AS (SELECT cid, cent_id,
           |         sum(CAST(ce[i] AS DOUBLE) * cent_e[i]) / (cn * cent_n) AS cos
           |       FROM c CROSS JOIN cent2 CROSS JOIN range(1, 65) t(i)
           |       GROUP BY cid, cent_id, cn, cent_n),
           |rk AS (SELECT cid, cent_id, cos,
           |         row_number() OVER (PARTITION BY cid ORDER BY cos DESC, cent_id) AS rn
           |       FROM d3),
           |ab AS (
           |  SELECT cid,
           |    max(CASE WHEN rn = 1 THEN cent_id END) AS cent_id,
           |    max(CASE WHEN rn = 1 THEN 1.0 - cos END) AS a,
           |    min(CASE WHEN rn > 1 THEN 1.0 - cos END) AS b
           |  FROM rk GROUP BY cid),
           |pts AS (
           |  SELECT *, CASE WHEN greatest(a, b) > 0
           |    THEN (b - a) / greatest(a, b) ELSE 0.0 END AS s
           |  FROM ab),
           |cells AS (
           |  SELECT cent_id, count(*) AS n_points,
           |    CAST(sum(CAST(${rs("a", 10)} AS DECIMAL(24,10))) AS DOUBLE) AS sa,
           |    CAST(sum(CAST(${rs("b", 10)} AS DECIMAL(24,10))) AS DOUBLE) AS sb,
           |    CAST(sum(CAST(${rs("s", 10)} AS DECIMAL(24,10))) AS DOUBLE) AS ss
           |  FROM pts GROUP BY 1),
           |g AS (
           |  SELECT *,
           |    CAST(sum(CAST(${rs("ss", 10)} AS DECIMAL(24,10))) OVER () AS DOUBLE) AS g_ss,
           |    CAST(sum(n_points) OVER () AS BIGINT) AS g_n
           |  FROM cells)
           |SELECT cent_id, n_points,
           |  ${rs("sa / CAST(n_points AS DOUBLE)", 6)} AS mean_a_r,
           |  ${rs("sb / CAST(n_points AS DOUBLE)", 6)} AS mean_b_r,
           |  ${rs("ss / CAST(n_points AS DOUBLE)", 6)} AS mean_s_r,
           |  ${rs("g_ss / CAST(g_n AS DOUBLE)", 6)} AS global_s_r
           |FROM g ORDER BY cent_id""".stripMargin
      }),

    // ----- q253: Freedman–Diaconis auto-binned histogram ----------------
    // The statistically-sized equal-width histogram: bin width
    // h = 2·IQR/n^(1/3) (robust to outliers where Scott's rule is not),
    // bin count ⌈(max−min)/h⌉, then the histogram at that width with
    // boundary values clamped into the last bin identically on both
    // engines. q134 is the equal-DEPTH sibling; this answers "how many
    // equal-width bars does this data support". Exactness: IQR rides
    // the q47 percentile parity; h/edges are shared double shapes; bin
    // ids are integer floors. Shape: one scalar agg (broadcast back) +
    // one hash agg — two scans, output bounded by the derived bin
    // count (~n^(1/3)).
    QueryDef(
      "q253_fd_histogram",
      (s, dir) => {
        val v = col("o_totalprice")
        val stats = tbl(s, dir, "orders").agg(
          count(lit(1)).as("n"),
          percentile(v, lit(0.25)).as("q1"),
          percentile(v, lit(0.75)).as("q3"),
          min(v).as("mn"), max(v).as("mx"))
        val h = lit(2.0) * (col("q3") - col("q1")) / cbrt(col("n").cast("double"))
        val nbins = ceil((col("mx") - col("mn")) / h).cast("long")
        val withH = stats.withColumn("h", h).withColumn("n_bins", nbins)
        val binned = tbl(s, dir, "orders").select(v.as("v"))
          .crossJoin(broadcast(withH))
          .withColumn("bin",
            least(col("n_bins") - 1L,
              floor((col("v") - col("mn")) / col("h")).cast("long")))
        binned.groupBy(col("bin"), col("n_bins"), col("h"), col("mn"))
          .agg(count(lit(1)).as("n_rows"))
          .select(col("bin"),
            R(col("mn") + col("bin").cast("double") * col("h"), 2).as("lo_r"),
            R(col("mn") + (col("bin") + 1L).cast("double") * col("h"), 2).as("hi_r"),
            col("n_rows"), col("n_bins"),
            R(col("h"), 4).as("bin_width_r"))
          .orderBy("bin")
      },
      Some(s"""WITH stats AS (
              |  SELECT count(*) AS n,
              |    quantile_cont(o_totalprice, 0.25) AS q1,
              |    quantile_cont(o_totalprice, 0.75) AS q3,
              |    min(o_totalprice) AS mn, max(o_totalprice) AS mx
              |  FROM orders),
              |wh AS (
              |  SELECT *, 2.0 * (q3 - q1) / cbrt(CAST(n AS DOUBLE)) AS h
              |  FROM stats),
              |wb AS (
              |  SELECT *, CAST(ceil((mx - mn) / h) AS BIGINT) AS n_bins FROM wh),
              |binned AS (
              |  SELECT least(n_bins - 1,
              |      CAST(floor((o_totalprice - mn) / h) AS BIGINT)) AS bin,
              |    n_bins, h, mn
              |  FROM orders CROSS JOIN wb)
              |SELECT bin,
              |  ${rs("mn + CAST(bin AS DOUBLE) * h", 2)} AS lo_r,
              |  ${rs("mn + CAST(bin + 1 AS DOUBLE) * h", 2)} AS hi_r,
              |  count(*) AS n_rows, n_bins,
              |  ${rs("h", 4)} AS bin_width_r
              |FROM binned GROUP BY bin, n_bins, h, mn
              |ORDER BY bin""".stripMargin))
  )
}
