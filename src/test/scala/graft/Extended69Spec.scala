package graft

import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Similarity}

/** q328/q329: the persisted index's incremental REFRESH path. The DuckDB
  * oracle pins the serve identity (refresh(old ∪ Δ) ≡ from-scratch
  * assignment of the union against the old-trained quantizer, 3 SFs);
  * these tests pin the refresh MECHANICS the relation-level gate can't
  * see: append-only file behavior, exactly-once coverage, losslessness
  * through a refresh, and batch-order independence.
  */
class Extended69Spec extends SparkSuite {

  private val nSub = IvfIndex.Cache.nSub
  private val subDim = IvfIndex.Cache.subDim

  /** A small (≤`bound`-vector) corpus split 90/10, with an index built on
    * the old 90% under `dir` — the shared setup of every test here.
    */
  private def smallSplit(bound: Int) = {
    val emb = Tables.load(spark, sf0001, "embeddings").filter(col("vec_id") < bound)
    val old = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
    (emb, old, delta)
  }

  private def buildOld(old: org.apache.spark.sql.DataFrame, nOld: Long, dir: String): Unit =
    IvfIndex.build(old, "vec_id", "embedding",
      stride = Similarity.sqrtStride(nOld), trainIters = 1, trainOn = Some(old),
      nSub = nSub, subDim = subDim,
      codeStride = math.max(1L, nOld / 64), outDir = dir)

  /** Committed data files of the inverted file, relative path → length
    * (part files only — the _SUCCESS marker and checksum siblings are
    * job-level artifacts an append legitimately rewrites).
    */
  private def invfileParts(dir: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(s"$dir/invfile")
    val s = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString -> java.nio.file.Files.size(p))
        .toMap
    } finally s.close()
  }

  test("refresh appends: every pre-existing inverted-file part is byte-identical after; coverage is exactly-once") {
    val (emb, old, delta) = smallSplit(400)
    val dir = java.nio.file.Files.createTempDirectory("graft_rx_append")
    try {
      buildOld(old, old.count(), dir.toString)
      val before = invfileParts(dir.toString)
      IvfIndex.refresh(spark, dir.toString, delta, "vec_id", "embedding", nSub, subDim)
      val after = invfileParts(dir.toString)
      before.foreach { case (f, len) =>
        assert(after.get(f).contains(len),
          s"pre-existing inverted-file part $f was rewritten by refresh")
      }
      assert(after.size > before.size, "refresh added no files for a non-empty delta")
      // exactly-once coverage of the union corpus, delta included
      val ids = spark.read.parquet(s"$dir/invfile").select("cid")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.size == ids.distinct.size, "a vector appears in two inverted lists")
      assert(ids.toSet == emb.select("vec_id").collect().map(_.getLong(0)).toSet,
        "refreshed inverted file does not cover the union corpus exactly")
    } finally graft.queries.QueryDef.rmTree(dir)
  }

  test("refreshed index is lossless: exhaustive-probe serve ≡ brute force over the UNION corpus") {
    val (emb, old, delta) = smallSplit(400)
    val dir = java.nio.file.Files.createTempDirectory("graft_rx_lossless")
    try {
      buildOld(old, old.count(), dir.toString)
      IvfIndex.refresh(spark, dir.toString, delta, "vec_id", "embedding", nSub, subDim)
      val q = emb.filter(col("vec_id") < 10)
      val nCells = spark.read.parquet(s"$dir/centroids").count().toInt
      val served = IvfIndex
        .serveTopK(spark, dir.toString, q, "vec_id", "embedding", k = 5, nProbe = nCells)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(served == bf,
        "exhaustive-probe serve after refresh diverged from union brute force — a delta vector was dropped, duplicated, or mis-coded")
    } finally graft.queries.QueryDef.rmTree(dir)
  }

  test("refresh is batch-order independent: two half-delta refreshes ≡ one refresh (codes included)") {
    // pins that nothing in a refresh depends on the BATCH it arrived in —
    // in particular that delta codes come from the persisted codebook,
    // never from codewords re-derived over the delta itself (a
    // delta-derived codebook is deterministic and plausible but would
    // make the two-batch index diverge from the one-batch index)
    val (_, old, delta) = smallSplit(400)
    val dirA = java.nio.file.Files.createTempDirectory("graft_rx_once")
    val dirB = java.nio.file.Files.createTempDirectory("graft_rx_twice")
    try {
      val nOld = old.count()
      buildOld(old, nOld, dirA.toString)
      buildOld(old, nOld, dirB.toString)
      IvfIndex.refresh(spark, dirA.toString, delta, "vec_id", "embedding", nSub, subDim)
      IvfIndex.refresh(spark, dirB.toString, delta.filter(col("vec_id") < 200),
        "vec_id", "embedding", nSub, subDim)
      IvfIndex.refresh(spark, dirB.toString, delta.filter(col("vec_id") >= 200),
        "vec_id", "embedding", nSub, subDim)
      def rows(dir: java.nio.file.Path) = spark.read.parquet(s"$dir/invfile")
        .select(Seq(col("cid"), col("cent_id")) ++ (0 until nSub).map(i => col(s"code_$i")): _*)
        .collect().map(_.toSeq).toSet
      assert(rows(dirA) == rows(dirB),
        "refreshing the same delta in two batches produced a different inverted file")
    } finally {
      graft.queries.QueryDef.rmTree(dirA)
      graft.queries.QueryDef.rmTree(dirB)
    }
  }

  test("pair maintenance is exhaustive: build+refresh pairs ≡ from-scratch pairs on the refreshed index") {
    // threshold -1.0 keeps EVERY within-cell pair — the strongest
    // structural check (the 0.4 production filter is q331's hash gate)
    val (_, old, delta) = smallSplit(400)
    val inc = java.nio.file.Files.createTempDirectory("graft_px_inc")
    val scratch = java.nio.file.Files.createTempDirectory("graft_px_scratch")
    try {
      val nOld = old.count()
      buildOld(old, nOld, inc.toString)
      IvfIndex.buildPairs(spark, inc.toString, threshold = -1.0)
      IvfIndex.refresh(spark, inc.toString, delta, "vec_id", "embedding",
        nSub, subDim, pairThreshold = Some(-1.0))
      // the from-scratch reference: same index, pairs recomputed whole
      // AFTER the refresh (q327's posture)
      buildOld(old, nOld, scratch.toString)
      IvfIndex.refresh(spark, scratch.toString, delta, "vec_id", "embedding", nSub, subDim)
      IvfIndex.buildPairs(spark, scratch.toString, threshold = -1.0)
      def pairSet(d: java.nio.file.Path) = spark.read.parquet(s"$d/pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val (got, want) = (pairSet(inc), pairSet(scratch))
      assert(got.size == got.distinct.size,
        "incremental pair maintenance wrote a duplicate pair (delta×existing double-counted?)")
      assert(got.toSet == want.toSet,
        "incrementally maintained pairs diverge from a from-scratch pair scan of the refreshed index")
      // and the served decision tables agree end to end
      val emb = Tables.load(spark, sf0001, "embeddings").filter(col("vec_id") < 400)
      val fromPairs = IvfIndex.serveSemDedupFromPairs(spark, inc.toString, emb, "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val fromScan = IvfIndex.serveSemDedup(spark, scratch.toString, emb, "vec_id", threshold = -1.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(fromPairs == fromScan,
        "decision table from the pair artifact diverges from the pair-scan serve")
    } finally {
      graft.queries.QueryDef.rmTree(inc)
      graft.queries.QueryDef.rmTree(scratch)
    }
  }

  test("pair maintenance is batch-order independent: two half-delta refreshes ≡ one refresh") {
    val (_, old, delta) = smallSplit(400)
    val dirA = java.nio.file.Files.createTempDirectory("graft_px_once")
    val dirB = java.nio.file.Files.createTempDirectory("graft_px_twice")
    try {
      val nOld = old.count()
      for (d <- Seq(dirA, dirB)) {
        buildOld(old, nOld, d.toString)
        IvfIndex.buildPairs(spark, d.toString, threshold = -1.0)
      }
      IvfIndex.refresh(spark, dirA.toString, delta, "vec_id", "embedding",
        nSub, subDim, pairThreshold = Some(-1.0))
      IvfIndex.refresh(spark, dirB.toString, delta.filter(col("vec_id") < 200),
        "vec_id", "embedding", nSub, subDim, pairThreshold = Some(-1.0))
      IvfIndex.refresh(spark, dirB.toString, delta.filter(col("vec_id") >= 200),
        "vec_id", "embedding", nSub, subDim, pairThreshold = Some(-1.0))
      def pairSet(d: java.nio.file.Path) = spark.read.parquet(s"$d/pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val (a, b) = (pairSet(dirA), pairSet(dirB))
      assert(b.size == b.distinct.size,
        "two-batch pair maintenance double-counted a pair (batch1×batch2 must pair exactly once, as delta×existing)")
      assert(a.toSet == b.toSet,
        "pair artifact depends on delta batching")
    } finally {
      graft.queries.QueryDef.rmTree(dirA)
      graft.queries.QueryDef.rmTree(dirB)
    }
  }

  test("pair maintenance fails fast when pairs/ is absent or was built at a different threshold") {
    // ADVICE r14 (medium): an append into a missing or differently-
    // thresholded pairs/ silently yields a wrong decision table — the
    // contract is now enforced, not just documented
    val (_, old, delta) = smallSplit(400)
    val dir = java.nio.file.Files.createTempDirectory("graft_px_guard")
    try {
      buildOld(old, old.count(), dir.toString)
      val noPairs = intercept[RuntimeException] {
        IvfIndex.refresh(spark, dir.toString, delta, "vec_id", "embedding",
          nSub, subDim, pairThreshold = Some(0.4))
      }
      assert(noPairs.getMessage.contains("buildPairs"),
        s"missing-pairs error should direct to buildPairs: ${noPairs.getMessage}")
      IvfIndex.buildPairs(spark, dir.toString, threshold = 0.4)
      val wrongTh = intercept[IllegalArgumentException] {
        IvfIndex.refresh(spark, dir.toString, delta, "vec_id", "embedding",
          nSub, subDim, pairThreshold = Some(0.5))
      }
      assert(wrongTh.getMessage.contains("0.4"),
        s"threshold-mismatch error should name the baked threshold: ${wrongTh.getMessage}")
      // neither failed call may have touched the inverted file (both must
      // throw BEFORE any append) — and the matching threshold proceeds
      assert(spark.read.parquet(s"$dir/invfile").count() == old.count(),
        "a failed pair-maintenance refresh partially applied its append")
      IvfIndex.refresh(spark, dir.toString, delta, "vec_id", "embedding",
        nSub, subDim, pairThreshold = Some(0.4))
    } finally graft.queries.QueryDef.rmTree(dir)
  }

  test("compact: one file per cell after, rows and serve results identical, cellStats unchanged") {
    val (emb, old, delta) = smallSplit(400)
    val dir = java.nio.file.Files.createTempDirectory("graft_cx")
    try {
      buildOld(old, old.count(), dir.toString)
      IvfIndex.refresh(spark, dir.toString, delta, "vec_id", "embedding", nSub, subDim)
      def partsPerCell: Map[String, Int] = invfileParts(dir.toString).keys
        .groupBy(_.split('/').head).view.mapValues(_.size).toMap
      // build layout pin (round 14): one file per cell, not tasks×cells —
      // a cell dir with >2 files here means build lost its
      // repartition(cent_id) and the small-files tax is back
      assert(partsPerCell.values.forall(_ <= 2),
        s"build+1 refresh should leave ≤2 files per cell: $partsPerCell")
      assert(partsPerCell.values.exists(_ > 1),
        "setup: refresh should have left some cell with >1 part file")
      val q = emb.filter(col("vec_id") < 10)
      def served = IvfIndex
        .serveTopK(spark, dir.toString, q, "vec_id", "embedding", k = 5, nProbe = 3)
        .select(col("qid"), col("cid"), col("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def rows = spark.read.parquet(s"$dir/invfile")
        .select(Seq(col("cid"), col("cent_id")) ++ (0 until nSub).map(i => col(s"code_$i")): _*)
        .collect().map(_.toSeq).toSet
      val (servedBefore, rowsBefore) = (served, rows)
      // histogram columns must survive a compact unchanged; the FILE
      // columns must not (that drop is the operation's whole point)
      val histCols = Seq("n_cells", "n_vecs", "max_load", "pair_sum", "avg_load_r", "imbalance_r")
      def stats = IvfIndex.cellStats(spark, dir.toString).collect().head
      val statsBefore = stats
      assert(statsBefore.getAs[Long]("max_files_per_cell") == 2L,
        "setup: build + 1 refresh should leave max 2 files in some cell")
      IvfIndex.compact(spark, dir.toString)
      assert(partsPerCell.values.forall(_ == 1),
        s"compact left a cell with >1 part file: $partsPerCell")
      assert(rows == rowsBefore, "compact changed the inverted file's content")
      assert(served == servedBefore, "compact changed serve results")
      val statsAfter = stats
      histCols.foreach { c =>
        assert(statsAfter.getAs[Any](c) == statsBefore.getAs[Any](c),
          s"compact changed cell-histogram stat $c")
      }
      assert(statsAfter.getAs[Long]("max_files_per_cell") == 1L,
        "compact did not reset max_files_per_cell to 1")
      assert(statsAfter.getAs[Long]("n_files") == statsAfter.getAs[Long]("n_cells"),
        "after compact, files should equal cells exactly")
    } finally graft.queries.QueryDef.rmTree(dir)
  }

  test("compact trigger: compact_due fires after compactAfter refreshes and clears after compact") {
    // the monitor's COMPACT half (q330's policy bit): each refresh adds
    // one file to every touched cell, so after R refreshes some cell
    // holds R+1 files; with compactAfter = R the bit must flip on, and a
    // compact must clear it
    val (_, old, delta) = smallSplit(400)
    val dir = java.nio.file.Files.createTempDirectory("graft_ctrig")
    try {
      buildOld(old, old.count(), dir.toString)
      val r = 4
      // replay the same delta in 4 quarter-batches — each touches the
      // hottest cells, so the max grows by 1 per refresh
      (0 until r).foreach { i =>
        IvfIndex.refresh(spark, dir.toString,
          delta.filter(pmod(col("vec_id"), lit(r)) === i),
          "vec_id", "embedding", nSub, subDim)
      }
      def stats(after: Int) = IvfIndex
        .cellStats(spark, dir.toString, compactAfter = after).collect().head
      // files accumulate (some cell was touched by the build and 2+ of
      // the 4 batches); the policy threshold is set one below the
      // measured max so the assertion is about the TRIGGER, not about
      // which cells this particular delta happened to hit
      val mf = stats(Int.MaxValue).getAs[Long]("max_files_per_cell")
      assert(mf >= 3L, s"4 refreshes should accumulate ≥3 files in some cell, got $mf")
      val th = (mf - 1).toInt
      assert(stats(th).getAs[Boolean]("compact_due"),
        s"compact_due should fire at max_files_per_cell=$mf > compactAfter=$th")
      val s4 = stats(th)
      IvfIndex.compact(spark, dir.toString)
      val after = stats(th)
      assert(!after.getAs[Boolean]("compact_due"), "compact_due should clear after a compact")
      assert(after.getAs[Long]("max_files_per_cell") == 1L)
      // histogram invariant across the whole cycle
      assert(after.getAs[Long]("n_vecs") == s4.getAs[Long]("n_vecs"))
    } finally graft.queries.QueryDef.rmTree(dir)
  }

  test("cellStats: n_vecs covers the union corpus; pair_sum matches the hand-counted histogram") {
    val (emb, old, delta) = smallSplit(400)
    val dir = java.nio.file.Files.createTempDirectory("graft_stats")
    try {
      buildOld(old, old.count(), dir.toString)
      IvfIndex.refresh(spark, dir.toString, delta, "vec_id", "embedding", nSub, subDim)
      val s = IvfIndex.cellStats(spark, dir.toString).collect().head
      assert(s.getAs[Long]("n_vecs") == emb.count(), "n_vecs != union corpus size")
      val hist = spark.read.parquet(s"$dir/invfile")
        .groupBy(col("cent_id")).count().collect().map(_.getLong(1))
      assert(s.getAs[Long]("n_cells") == hist.length.toLong)
      assert(s.getAs[Long]("max_load") == hist.max)
      assert(s.getAs[Long]("pair_sum") == hist.map(m => m * (m - 1) / 2).sum)
      val avg = hist.sum.toDouble / hist.length
      assert(math.abs(s.getAs[Double]("imbalance_r") - hist.max / avg) < 1e-3)
    } finally graft.queries.QueryDef.rmTree(dir)
  }

  test("q328/q329 return a dense top-5 per query and agree on their shared shortlist ordering source") {
    val flat = SparkEntry.queries("q328_ivf_incremental_refresh")(spark, sf0001)
    val adc = SparkEntry.queries("q329_ivfpq_refresh_serve")(spark, sf0001)
    Seq(("q328", flat), ("q329", adc)).foreach { case (n, df) =>
      val perQ = df.groupBy(col("qid"))
        .agg(count(lit(1)).as("n"), max(col("rn")).as("mx"), min(col("rn")).as("mn"))
      assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5L || col("mn") =!= 1L).count() == 0L,
        s"$n: some query did not produce a dense top-5")
    }
    // both serve the SAME refreshed artifact: q329's exact-reranked
    // cosine must match q328's for every (qid, cid) they share
    val j = adc.select(col("qid"), col("cid"), col("cos_r").as("adc_cos"))
      .join(flat.select(col("qid"), col("cid"), col("cos_r")), Seq("qid", "cid"))
      .filter(col("adc_cos") =!= col("cos_r"))
    assert(j.count() == 0L, "q328/q329 disagree on the exact cosine of a shared candidate")
  }
}
