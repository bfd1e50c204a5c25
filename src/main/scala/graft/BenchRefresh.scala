package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side refresh-cost measurement for the persisted IVF(+PQ)
  * index: one base index is built on the 90% "old" sub-corpus
  * (vec_id % 10 ≠ 9 — the q328 split), then each delta spec is refreshed
  * into a fresh COPY of that base (so every measurement appends to an
  * identical artifact) and timed.
  *
  * The two claims this prices (BENCH_SF1 "refresh" section):
  *   - LINEAR IN ΔN: within one fixture, vary the delta fraction — wall
  *     time should track delta rows.
  *   - INDEPENDENT OF ACCUMULATED DATA (up to the quantizer's √N centroid
  *     count): across fixtures, hold the delta ABSOLUTE size fixed
  *     (`abs:<rows>`) — a 10× corpus should cost ~√10 ≈ 3.2× (the
  *     centroid broadcast the assignment scans), never 10×, and nothing
  *     should scan the existing inverted lists.
  *
  * Delta specs: `0.05` = every (0.1/0.05)=2nd vector of the 10% pool
  * (≈5% of the corpus); `abs:2000` = ≈2000 pool vectors by stride;
  * `pairs:<frac>` additionally maintains the SemDeDup pair artifact;
  * `compact` times the one-file-per-cell rewrite after a full-pool
  * refresh; `rebuild` times [[graft.ext.IvfIndex.rebuild]] on the union.
  *
  * Usage: runMain graft.BenchRefresh <sfDir> [spec1,spec2,...]
  *        (default "0.01,0.02,0.05,0.1")
  */
object BenchRefresh {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val specs = (if (args.length > 1) args(1) else "0.01,0.02,0.05,0.1").split(",").toSeq
    val spark = BenchSession.build()
    val host0 = Host.sample()

    val emb = Tables.load(spark, dir, "embeddings")
    val old = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val pool = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
    val nOld = old.count()
    val nPool = pool.count()
    val stride = graft.ext.Similarity.sqrtStride(nOld)
    val trainStride = math.max(1L, nOld / (4L * stride))
    val root = java.nio.file.Files.createTempDirectory("graft_bench_refresh")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.queries.QueryDef.rmTree(root)))
    val base = root.resolve("base")
    val tBuild0 = System.nanoTime()
    graft.ext.IvfIndex.build(old, "vec_id", "embedding",
      stride = stride, trainIters = 1,
      trainOn = Some(old.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
      nSub = graft.ext.IvfIndex.Cache.nSub, subDim = graft.ext.IvfIndex.Cache.subDim,
      codeStride = math.max(1L, nOld / 64), outDir = base.toString)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9

    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      val s = java.nio.file.Files.walk(src)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach { p =>
          val t = dst.resolve(src.relativize(p))
          if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
          else java.nio.file.Files.copy(p, t)
          ()
        }
      } finally s.close()
    }

    specs.zipWithIndex.foreach { case (spec, i) =>
      val work = root.resolve(s"w$i")
      copyTree(base, work)
      if (spec == "compact") {
        // compact cost: refresh the full 10% pool in first, then time the
        // one-file-per-cell rewrite (O(N) once, amortized over R appends)
        graft.ext.IvfIndex.refresh(spark, work.toString, pool, "vec_id", "embedding",
          nSub = graft.ext.IvfIndex.Cache.nSub, subDim = graft.ext.IvfIndex.Cache.subDim)
        val t0 = System.nanoTime()
        graft.ext.IvfIndex.compact(spark, work.toString)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"ivf_compact","dir":"$dir","n_old":$nOld,"cells":$stride,"compact_sec":$sec%.2f,"build_sec":$buildSec%.2f}""")
      } else if (spec == "rebuild") {
        // rebuild cost: the policy response the monitor schedules — one
        // full build's work (retrain + reassign + re-encode) re-derived
        // from the accumulated corpus, plus the verified swap. Refresh
        // the 10% pool in first so the rebuilt N is the union (the state
        // a real rebuild fires from).
        graft.ext.IvfIndex.refresh(spark, work.toString, pool, "vec_id", "embedding",
          nSub = graft.ext.IvfIndex.Cache.nSub, subDim = graft.ext.IvfIndex.Cache.subDim)
        val t0 = System.nanoTime()
        graft.ext.IvfIndex.rebuild(spark, work.toString,
          graft.ext.IvfIndex.Cache.nSub, graft.ext.IvfIndex.Cache.subDim)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"ivf_rebuild","dir":"$dir","n_union":${nOld + nPool},"rebuild_sec":$sec%.2f,"build_sec":$buildSec%.2f}""")
      } else {
        // pool keep-stride: every mth pool vector → ≈ nPool/m delta rows;
        // a "pairs:" prefix additionally maintains the SemDeDup pair
        // artifact through the refresh (q331's marginal cost — requires
        // the within-cell join of the delta against the existing lists)
        val withPairs = spec.startsWith("pairs:")
        val frac = spec.stripPrefix("pairs:")
        val m =
          if (frac.startsWith("abs:")) math.max(1L, nPool / frac.stripPrefix("abs:").toLong)
          else math.max(1L, math.round(0.1 / frac.toDouble))
        val delta = pool.filter(pmod(col("vec_id"), lit(10L * m)) === 9L)
        val nDelta = delta.count()
        if (withPairs)
          graft.ext.IvfIndex.buildPairs(spark, work.toString,
            graft.ext.IvfIndex.Cache.pairThreshold)
        val t0 = System.nanoTime()
        graft.ext.IvfIndex.refresh(spark, work.toString, delta, "vec_id", "embedding",
          nSub = graft.ext.IvfIndex.Cache.nSub, subDim = graft.ext.IvfIndex.Cache.subDim,
          pairThreshold =
            if (withPairs) Some(graft.ext.IvfIndex.Cache.pairThreshold) else None)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"ivf_refresh","dir":"$dir","n_old":$nOld,"cells":$stride,"spec":"$spec","delta_rows":$nDelta,"refresh_sec":$sec%.2f,"build_sec":$buildSec%.2f}""")
      }
    }
    println(Host.line("refresh_sweep", host0, Host.sample()))
    spark.stop()
  }
}
