package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, DecimalType}

import Similarity.{normalizedRel, assignToCells, centroidsOf, dot, toDouble}

/** Persisted IVF(+PQ) index: the production serving layout the lazy
  * [[Similarity.ivfTopK]]/[[Similarity.ivfPqTopK]] subplans stand in for
  * inside the oracle harness. At 100 TB an index is built ONCE (sampled
  * k-means training — [[Similarity.centroidsOf]] with `trainOn`, the
  * FAISS recipe q323 pins), written to storage, and every query batch
  * pays ONLY probe + candidate-scan + rerank; the N×√N assignment pass
  * and the Lloyd training never recur. q324/q326 put that serve path —
  * against real persisted parquet, with the build excluded — under the
  * hash gate and the decade measurements.
  *
  * On-disk layout (all parquet, all exact IEEE round-trips, so persisted
  * serve ≡ the lazy pipeline bit-for-bit):
  *   - `centroids/`: (cent_id, cent_e double[], cent_e_n) — the trained
  *     coarse quantizer, √N rows, broadcast at serve time.
  *   - `invfile/`, PARTITIONED BY cent_id: (cid, ce double[], ce_n,
  *     code_0..code_{nSub-1}) — the inverted lists, vectors AND PQ codes
  *     inline, so a probe reads ONLY its cells' directories (partition
  *     pruning does the candidate cut at the SCAN, before any join).
  *   - `codebook/`: (code_id, cbe double[]) — the PQ codebook for
  *     serve-time lookup tables, nCodewords rows, broadcast.
  */
object IvfIndex {

  /** Build the index and persist it under `outDir` (q323's sampled-train
    * recipe when `trainOn` is set). One full corpus scan for assignment +
    * one for the PQ encode — the one-time cost production amortizes.
    *
    * `cbTrainOn`: optional bounded sample for PER-SUBSPACE PQ codebook
    * training ([[Similarity.trainSubCodebooks]] — the FAISS recipe, one
    * Lloyd iteration per subquantizer on the sample). Default None keeps
    * the strided-corpus-sample codewords (the exact-oracle form
    * q125/q326 pin); q332 gates the trained form. Either way the
    * persisted layout is identical and the inverted lists' codes are
    * encoded against whichever codebook was persisted.
    */
  def build(
      corpus: DataFrame, idCol: String, embCol: String,
      stride: Int, trainIters: Int, trainOn: Option[DataFrame],
      nSub: Int, subDim: Int, codeStride: Long, outDir: String,
      cbTrainOn: Option[DataFrame] = None): Unit = {
    val spark = corpus.sparkSession
    centroidsOf(corpus, idCol, embCol, stride, trainIters, trainOn)
      .write.mode("overwrite").parquet(s"$outDir/centroids")
    // assignment reads the PERSISTED centroids back (cheaper than
    // recomputing the training subplan inside this job, and exactly what
    // a production build resuming from a trained quantizer does)
    val cent = spark.read.parquet(s"$outDir/centroids")
    val c = normalizedRel(corpus, idCol, embCol, "cid", "ce")
    // the codebook is persisted FIRST and the encode reads it back, so
    // the inverted lists' codes always live in the persisted codebook's
    // space — trained or strided, the same resume-from-artifact posture
    // as the centroid read above
    val seedCb = corpus.filter(pmod(col(idCol), lit(codeStride)) === 0)
      .select(col(idCol).as("code_id"), toDouble(col(embCol)).as("cbe"))
    cbTrainOn
      .map(t => Similarity.trainSubCodebooks(
        t.select(col(idCol).as("vid"), toDouble(col(embCol)).as("ve")),
        seedCb, nSub, subDim))
      .getOrElse(seedCb)
      .write.mode("overwrite").parquet(s"$outDir/codebook")
    val codes = Similarity.pqEncodeAgainst(
      corpus.select(col(idCol).as("vid"), toDouble(col(embCol)).as("ve")),
      spark.read.parquet(s"$outDir/codebook").select(col("code_id"), col("cbe").as("ce")),
      nSub, subDim)
      .drop("recon")
    // Repartition by the PARTITION column before the partitioned write:
    // the join output is hash-distributed by cid, so without this every
    // task holds rows of most cells and writes a file into every cell
    // directory — ~tasks×cells small files (13.5k at sf10; measured as
    // the dominant cost of whole-invfile consumers — q327's pair scan,
    // cellStats' listing). One shuffle at build time buys one file per
    // cell, the layout compact() restores after refreshes.
    assignToCells(c, cent)
      .join(codes, col("cid") === col("vid")).drop("vid")
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$outDir/invfile")
  }

  /** [[build]]'s RESIDUAL-PQ variant — the full IVFADC recipe (Jégou et
    * al. 2011 §IV: "the residual is quantized"): codes encode
    * `x − centroid(cell(x))` instead of `x` itself. On clustered data —
    * the regime real embedding corpora live in — raw-vector PQ spends its
    * entire bit budget re-encoding the cluster CENTER all members share,
    * so the quantization error is the same magnitude as the intra-cluster
    * spread being ranked and raw ADC rank resolution is noise-bound at
    * ANY codebook size (measured on the clustered fixture: pre-rerank
    * recall 0.084 at 64 codewords, 0.072 at 256 — the round-16 axis sweep
    * that motivated this path). Residual coding spends the same bytes on
    * exactly the component that distinguishes neighbors; RecallSpec pins
    * the pre-rerank recall it buys.
    *
    * On-disk layout is [[build]]'s plus a `_PQ_RESIDUAL` sidecar (the
    * codebook lives in residual space — a serve must add the cell
    * centroid's contribution back, [[servePqResidualTopK]]); the
    * inverted lists and centroids are byte-compatible, so IVF-Flat serve
    * ([[serveTopK]]) works unchanged on either layout.
    *
    * Scale shape: one extra broadcast join (√N centroids) to form
    * residuals, assignment checkpointed so the N×√N pass is paid once
    * (it feeds both the strided-residual codebook and the invfile write).
    */
  def buildResidual(
      corpus: DataFrame, idCol: String, embCol: String,
      stride: Int, trainIters: Int, trainOn: Option[DataFrame],
      nSub: Int, subDim: Int, codeStride: Long, outDir: String): Unit = {
    val spark = corpus.sparkSession
    centroidsOf(corpus, idCol, embCol, stride, trainIters, trainOn)
      .write.mode("overwrite").parquet(s"$outDir/centroids")
    val cent = spark.read.parquet(s"$outDir/centroids")
    val c = normalizedRel(corpus, idCol, embCol, "cid", "ce")
    val assigned = graft.ops.Ckpt(
      assignToCells(c, cent)
        .join(broadcast(cent.select(col("cent_id"), col("cent_e"))), "cent_id")
        .withColumn("res", zip_with(col("ce"), col("cent_e"), (a, b) => a - b))
        .drop("cent_e"))
    // the seed codebook is the strided sample's RESIDUALS — same stride
    // rule as build's, same oracle-replayable determinism, but the
    // codewords live in the residual space the codes quantize
    assigned.filter(pmod(col("cid"), lit(codeStride)) === 0)
      .select(col("cid").as("code_id"), col("res").as("cbe"))
      .write.mode("overwrite").parquet(s"$outDir/codebook")
    val codes = Similarity.pqEncodeAgainst(
      assigned.select(col("cid").as("vid"), col("res").as("ve")),
      spark.read.parquet(s"$outDir/codebook").select(col("code_id"), col("cbe").as("ce")),
      nSub, subDim)
      .drop("recon")
    assigned.drop("res")
      .join(codes, col("cid") === col("vid")).drop("vid")
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$outDir/invfile")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/_PQ_RESIDUAL"), "1".getBytes("UTF-8"))
    ()
  }

  /** Whether `indexDir` was written by [[buildResidual]] — its codebook
    * and codes live in residual space. The `_PQ_RESIDUAL` sidecar is the
    * contract every lifecycle operation keys on: serve picks the ADC
    * decomposition ([[servePqResidualTopK]] vs [[servePqTopK]], each
    * refusing the other's layout), [[refresh]] picks the encode space for
    * delta codes, [[rebuild]] picks the staging builder. Centroids,
    * inverted lists, and the inline vectors are byte-compatible either
    * way, so the IVF-Flat and SemDeDup paths never consult it.
    */
  def isResidual(indexDir: String): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$indexDir/_PQ_RESIDUAL"))

  /** IVF+PQ ADC serve against a RESIDUAL-coded index ([[buildResidual]]):
    * the candidate's approximate dot decomposes as
    * `dot(q, x̂) = dot(q, centroid(cell)) + dot(q, residual-codeword)` —
    * the first term is one bounded probe-pair computation (≤ maxProbePairs
    * rows against the broadcast √N centroid table), the second is the
    * same nSub LUT lookups as [[servePqTopK]], summed in DECIMAL. Rerank
    * stays exact-cosine over the shortlist's inline vectors. Refuses a
    * non-residual index (the sidecar is the contract).
    */
  def servePqResidualTopK(
      spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, embCol: String, k: Int, nSub: Int, subDim: Int,
      nProbe: Int, maxProbePairs: Int = 1000000): DataFrame = {
    require(isResidual(indexDir),
      s"$indexDir was not built by buildResidual — its codes live in raw-vector " +
        "space; use servePqTopK")
    val (probes, cells) = collectedProbes(
      spark, indexDir, queries, idCol, embCol, nProbe, maxProbePairs)
    val inv = prunedInvfile(spark, indexDir, cells)
    val q = normalizedRel(queries, idCol, embCol, "qid", "qe")
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val cent = spark.read.parquet(s"$indexDir/centroids")
    val off = (col("s") * subDim + 1).cast("int")
    val lut = q.select(col("qid"), col("qe"))
      .withColumn("s", explode(sequence(lit(0), lit(nSub - 1))))
      .crossJoin(broadcast(cb))
      .select(col("qid"), col("s"), col("code_id"),
        dot(slice(col("qe"), off, lit(subDim)), slice(col("cbe"), off, lit(subDim))).as("v"))
    // dot(q, centroid) per probed (qid, cent_id) — bounded by the probe
    // pair list; computed fresh (not un-normalized from the probe cosine:
    // a multiply-back would be a different IEEE op than never dividing)
    val centDot = broadcast(probes)
      .join(q.select(col("qid"), col("qe")), "qid")
      .join(broadcast(cent.select(col("cent_id"), col("cent_e"))), "cent_id")
      .select(col("qid"), col("cent_id"), dot(col("qe"), col("cent_e")).as("cdot"))
    val candCodes = broadcast(probes)
      .join(inv, "cent_id")
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), col("cent_id"),
        explode(array((0 until nSub).map(i =>
          struct(lit(i).as("s"), col(s"code_$i").as("code_id"))): _*)).as("sc"))
      .select(col("qid"), col("cid"), col("cent_id"),
        col("sc.s").as("s"), col("sc.code_id").as("code_id"))
    val adc = candCodes.join(broadcast(lut), Seq("qid", "s", "code_id"))
      .groupBy(col("qid"), col("cid"), col("cent_id"))
      .agg(sum(col("v").cast(DecimalType(38, 18))).cast("double").as("radc"))
      .join(broadcast(centDot), Seq("qid", "cent_id"))
      .select(col("qid"), col("cid"), (col("radc") + col("cdot")).as("adc"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("cid").asc)
    val top = adc.withColumn("rn", row_number().over(wTop).cast("bigint"))
      .filter(col("rn") <= k)
    broadcast(top)
      .join(inv.select(col("cid"), col("ce"), col("ce_n")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"), col("rn"), col("adc"),
        (dot(col("qe"), col("ce")) / (col("qe_n") * col("ce_n"))).as("cos"))
  }

  /** Incremental index refresh — the operation a growing corpus runs per
    * ingest batch, completing the lifecycle (build once / refresh per
    * batch / serve per query): assign ONLY the ΔN new vectors against the
    * PERSISTED centroids (no retrain — the coarse quantizer is frozen at
    * build time, the standard IVF posture), PQ-encode them against the
    * PERSISTED codebook (codes must live in the same space as the
    * existing lists), and APPEND them into the partitioned inverted file.
    * Existing cells' files are never rewritten (parquet append adds new
    * files under the cent_id directories — Extended69Spec pins the
    * pre-existing file set unchanged), so the cost is O(ΔN × √N) for the
    * assignment scan plus O(ΔN) writes: linear in the delta, independent
    * of the existing corpus SIZE (the √N factor is the centroid count, a
    * property of the frozen quantizer, not of the accumulated data; even
    * at 10^11 vectors that √N centroid table is ~160 MB of doubles —
    * still a broadcast, shared by build, refresh, and serve).
    * After refresh, serving the index ≡ serving a from-scratch build of
    * the union corpus with the same trained centroids (q328/q329 put that
    * identity under the hash gate at three SFs).
    *
    * `pairThreshold` additionally maintains the SemDeDup pair artifact
    * ([[buildPairs]]) through the refresh: only pairs TOUCHING the delta
    * are computed — delta × same-cell existing rows plus delta × delta
    * within a cell — and appended, so the recurring exact-pair cost drops
    * from the N^1.5 floor q327 prices (every within-cell pair, every
    * refresh) to O(ΔN × cellLoad): linear in the delta. Ordering matters
    * and is owned here: delta-touching pairs are computed against the
    * inverted file BEFORE the delta is appended to it (so delta×existing
    * pairs appear exactly once), and the delta assignment is checkpointed
    * so the ΔN×√N scan is paid once, not twice. q331 hash-gates the
    * result against from-scratch SemDeDup on the union corpus.
    *
    * Deliberately NOT handled here: centroid drift. A delta whose
    * distribution departs from the training sample degrades cell balance
    * and recall over successive refreshes; the production answer is to
    * monitor [[cellStats]] (q330) and schedule a REBUILD when imbalance
    * crosses a threshold — retraining inside refresh would silently
    * invalidate every existing assignment.
    */
  def refresh(
      spark: SparkSession, indexDir: String, delta: DataFrame,
      idCol: String, embCol: String, nSub: Int, subDim: Int,
      pairThreshold: Option[Double] = None): Unit = {
    recover(indexDir)
    val residual = isResidual(indexDir)
    val cent = spark.read.parquet(s"$indexDir/centroids")
    val cb = spark.read.parquet(s"$indexDir/codebook")
      .select(col("code_id"), col("cbe").as("ce"))
    val d = normalizedRel(delta, idCol, embCol, "cid", "ce")
    val assignedRaw = assignToCells(d, cent)
    // pair maintenance reads the assignment twice (pairs + append), and
    // the residual encode reads it once more (codes need cent_id):
    // checkpoint so the ΔN×√N assignment scan runs once
    val assigned =
      if (pairThreshold.isDefined || residual) graft.ops.Ckpt(assignedRaw)
      else assignedRaw
    pairThreshold.foreach { th =>
      // Fail fast on a maintenance call that would corrupt the artifact:
      // appending to a pairs/ that buildPairs never created (or created
      // with a DIFFERENT baked threshold) yields an incomplete or
      // mixed-threshold set that serveSemDedupFromPairs would serve as a
      // wrong decision table with no error (ADVICE r14, medium).
      // Migration (ADVICE r15): a pairs/ dir WITHOUT the sidecar is a
      // durable artifact written before the sidecar existed — adopt it
      // once by writing the sidecar from the caller's threshold (with a
      // warning; the caller owned the threshold contract alone in the
      // pre-sidecar format, so its value is the only record there is)
      // instead of forcing a full buildPairs rebuild of a valid artifact.
      val baked = pairsThresholdOf(indexDir).orElse {
        val pdir = java.nio.file.Paths.get(s"$indexDir/pairs")
        if (java.nio.file.Files.isDirectory(pdir)) {
          System.err.println(
            s"[graft] adopting pre-sidecar pairs/ artifact at $indexDir: writing " +
              s"_THRESHOLD=$th from this call's threshold (the pre-sidecar format " +
              "kept no record; future refreshes validate against it)")
          java.nio.file.Files.write(
            pdir.resolve("_THRESHOLD"), th.toString.getBytes("UTF-8"))
          Some(th)
        } else None
      }.getOrElse(sys.error(
        s"refresh(pairThreshold=$th): $indexDir/pairs does not exist — " +
          "run buildPairs on this index before maintaining pairs"))
      require(baked == th,
        s"refresh(pairThreshold=$th): pairs/ was built at threshold $baked — " +
          "maintaining it at a different threshold would mix pair sets; " +
          "rebuild the artifact (buildPairs) at the new threshold instead")
      val inv = spark.read.parquet(s"$indexDir/invfile")
        .select(col("cid"), col("ce"), col("ce_n"), col("cent_id"))
      // The delta side is an ingest BATCH — small relative to the corpus
      // by contract — so broadcast it and stream the inverted file past
      // it once: without the hint Spark shuffles the WHOLE inverted file
      // by cent_id for this join (measured 36 s vs 29 s for the refresh
      // itself at sf10), which re-pays corpus-sized work on every batch.
      // Broadcast only under a BYTE bound — rows × vector width, not a
      // fixed row count (ADVICE r14: 100k rows of 64-dim doubles is
      // ~55 MB, but the same rows at 1024 dims would be ~850 MB); an
      // outsized delta falls back to the shuffle join rather than OOMing
      // an executor — production chunks its ingest batches anyway.
      val nDelta = assigned.count() // cheap: assigned is checkpointed
      val dim =
        if (nDelta == 0) 0
        else assigned.select(size(col("ce"))).head().getInt(0) // limit-1 job on the checkpoint
      val deltaBytes = nDelta * (dim.toLong * 8 + 48) // ce doubles + cid/ce_n/cent_id + array header
      val dSide = if (deltaBytes <= 64L * 1024 * 1024) broadcast(assigned) else assigned
      // delta × existing: the invfile holds no delta row yet, so each pair
      // appears exactly once; ids canonicalized a_id < b_id (cos is
      // symmetric — same index-ascending products either way)
      val dOld = dSide.as("a")
        .join(inv.as("b"),
          col("a.cent_id") === col("b.cent_id") && col("a.cid") =!= col("b.cid"))
        .select(
          least(col("a.cid"), col("b.cid")).as("a_id"),
          greatest(col("a.cid"), col("b.cid")).as("b_id"),
          (dot(col("a.ce"), col("b.ce")) / (col("a.ce_n") * col("b.ce_n"))).as("cos"))
      val dNew = assigned.as("a")
        .join(dSide.as("b"),
          col("a.cent_id") === col("b.cent_id") && col("a.cid") < col("b.cid"))
        .select(col("a.cid").as("a_id"), col("b.cid").as("b_id"),
          (dot(col("a.ce"), col("b.ce")) / (col("a.ce_n") * col("b.ce_n"))).as("cos"))
      dOld.union(dNew).filter(col("cos") >= th).select(col("a_id"), col("b_id"))
        .write.mode("append").parquet(s"$indexDir/pairs")
    }
    // Delta codes must live in the space the PERSISTED codebook
    // quantizes: raw vectors for a [[build]] index, x − centroid(cell(x))
    // for a [[buildResidual]] one ([[isResidual]] — the sidecar is the
    // contract). Encoding the delta raw against a residual-space codebook
    // would append codes that decode as garbage ADC scores with no error
    // anywhere — the exact-rerank vectors (`ce`) are unaffected, which is
    // precisely what would keep it silent. q338 hash-gates this branch
    // (its oracle forms every corpus vector's residual, delta included).
    val toEncode =
      if (residual)
        assigned
          .join(broadcast(cent.select(col("cent_id"), col("cent_e"))), "cent_id")
          .select(col("cid").as("vid"),
            zip_with(col("ce"), col("cent_e"), (a, b) => a - b).as("ve"))
      else delta.select(col(idCol).as("vid"), toDouble(col(embCol)).as("ve"))
    val codes = Similarity.pqEncodeAgainst(toEncode, cb, nSub, subDim).drop("recon")
    // same one-file-per-cell rule as build: the append adds at most ONE
    // file per touched cell per refresh instead of tasks×cells
    assigned
      .join(codes, col("cid") === col("vid")).drop("vid")
      .repartition(col("cent_id"))
      .write.mode("append").partitionBy("cent_id").parquet(s"$indexDir/invfile")
    pairStats.remove(indexDir) // the cell histogram changed
    ()
  }

  /** [[refresh]] fed by STRUCTURED STREAMING micro-batches — the
    * north-star "stream ingestion" mode wired into the index lifecycle:
    * each micro-batch of `delta` becomes one [[refresh]] call (pair
    * maintenance included) via `foreachBatch`, which Spark runs
    * sequentially with exactly-once batch semantics against this sink
    * (the refresh append is idempotent per batch only at the file level,
    * so the one-writer contract refresh already carries extends to the
    * stream: one streaming query owns the index). Because refresh is
    * batch-order independent and exactly-once per row (Extended69Spec),
    * the drained stream leaves the index IDENTICAL to a single batch
    * refresh of the whole delta — q333 puts that identity under the hash
    * gate by serving the streamed artifact against q328's oracle.
    *
    * The harness writes `delta` to a temp dir as `nSourceFiles` parquet
    * files and replays them `filesPerBatch` per trigger
    * (Trigger.AvailableNow — drain everything, then stop), the same
    * file-replay mechanics as the q151/q322 streaming battery; a
    * production deployment points `readStream` at its landing zone (or
    * Kafka, when a connector jar exists) instead.
    */
  def refreshStream(
      spark: SparkSession, indexDir: String, delta: DataFrame,
      idCol: String, embCol: String, nSub: Int, subDim: Int,
      pairThreshold: Option[Double] = None, nSourceFiles: Int = 3,
      filesPerBatch: Int = 1): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("graft_ix_stream_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ix_stream_ck")
    try {
      delta.repartition(nSourceFiles).write.mode("overwrite").parquet(src.toString)
      val q = spark.readStream
        .schema(delta.schema)
        .option("maxFilesPerTrigger", filesPerBatch)
        .parquet(src.toString)
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          refresh(spark, indexDir, b, idCol, embCol, nSub, subDim, pairThreshold)
        }
        .start()
      q.awaitTermination()
    } finally {
      graft.queries.QueryDef.rmTree(src)
      graft.queries.QueryDef.rmTree(ckpt)
    }
  }

  /** The probe stage, executed EXACTLY ONCE: run
    * [[Similarity.probeNearestCells]] (the ONE probe definition, shared
    * with the lazy pipelines) slim — (qid, cent_id) only — over the
    * read-back centroid artifact, collect the bounded pair list, and
    * return it both ways the serve plans consume it: as a LOCAL relation
    * (the returned plan joins these driver-side pairs instead of
    * re-running the probe subplan — previously the crossJoin executed
    * twice, once for the pruning collect and once when the served plan
    * ran) and as the sorted distinct cell-id array that becomes the
    * partition-pruning IN-list.
    *
    * Guard order: the query count is bounded BEFORE the probe job
    * launches (one limit+count on the query relation's id column — an
    * oversized batch fails before paying the nQueries × nCells probe
    * scan, not after), and the collect re-asserts the same bound as a
    * defensive invariant. The pair list also bounds the ADC path's
    * broadcast-LUT breadth, since pairs ≥ distinct qids.
    */
  private def collectedProbes(
      spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, embCol: String, nProbe: Int,
      maxProbePairs: Int): (DataFrame, Array[Long]) = {
    recover(indexDir)
    val qBound = math.max(1, maxProbePairs / math.max(1, nProbe))
    val nQ = queries.select(col(idCol)).limit(qBound + 1).count()
    require(nQ <= qBound,
      s"persisted-index serve: >$qBound query vectors x nProbe=$nProbe exceeds " +
        s"maxProbePairs=$maxProbePairs — use serveTopKChunked or raise the bound")
    val slim = Similarity.probeNearestCells(
      normalizedRel(queries, idCol, embCol, "qid", "qe"),
      spark.read.parquet(s"$indexDir/centroids"), nProbe, carryQuery = false)
    val rows = slim.limit(maxProbePairs + 1).collect()
    require(rows.length <= maxProbePairs,
      s"persisted-index serve probes exceed maxProbePairs=$maxProbePairs after the pre-check")
    val local = spark.createDataFrame(java.util.Arrays.asList(rows: _*), slim.schema)
    (local, rows.map(_.getLong(1)).distinct.sorted)
  }

  /** The probed slice of the inverted file, partition-pruned AT THE SCAN:
    * the bounded probe-cell ids become a literal IN-list over the
    * PARTITION column — the scan reads only the probed cells'
    * directories, never the corpus. The partition column comes back as
    * the inferred directory type (int for small ids), so the IN-list is
    * typed to match BEFORE the long-cast — a cast around the partition
    * attribute would defeat the pruning.
    */
  private def prunedInvfile(
      spark: SparkSession, indexDir: String, cells: Array[Long]): DataFrame = {
    val sorted = cells.distinct.sorted
    val inv = spark.read.parquet(s"$indexDir/invfile")
    val pruned = inv.schema("cent_id").dataType match {
      case IntegerType => inv.filter(col("cent_id").isin(sorted.map(_.toInt).toIndexedSeq: _*))
      case _ => inv.filter(col("cent_id").isin(sorted.toIndexedSeq: _*))
    }
    pruned.withColumn("cent_id", col("cent_id").cast("long"))
  }

  /** IVF-Flat serve against a persisted index: probe → partition-pruned
    * candidate scan → exact cosine top-k via [[Similarity.topKByCosine]]
    * (the same tie-break rule as [[Similarity.ivfTopK]]'s serve stage,
    * shared code — so serving from the persisted artifact returns the
    * identical relation). No training, no corpus-wide assignment, no
    * full-corpus scan anywhere in the plan.
    */
  def serveTopK(
      spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, embCol: String, k: Int, nProbe: Int,
      maxProbePairs: Int = 1000000): DataFrame = {
    val (pairs, cells) = collectedProbes(
      spark, indexDir, queries, idCol, embCol, nProbe, maxProbePairs)
    // scoring needs qe/qe_n on the candidate rows: re-attach them by
    // joining the local pair relation back to the query side (exact — the
    // pair list is the probe stage's own output, computed once)
    val probes = broadcast(pairs)
      .join(normalizedRel(queries, idCol, embCol, "qid", "qe"), "qid")
    val inv = prunedInvfile(spark, indexDir, cells)
    Similarity.topKByCosine(probes.join(inv, "cent_id"), k)
  }

  /** Production chunk loop around [[serveTopK]]: splits a query batch
    * whose nQueries × nProbe exceeds `maxProbePairs` into deterministic
    * hash-pmod chunks, serves each within the bound, and unions the
    * results. Per-query top-k is chunk-independent (the window partitions
    * by qid), so the union equals the unchunked relation exactly
    * (Extended68Spec pins it across the boundary). Hash chunking can't
    * bound its own imbalance a priori, so the chunk count is VERIFIED:
    * one rollup measures the actual max chunk load and the count doubles
    * until every chunk fits (one attempt in practice — the initial count
    * targets half-full chunks). Costs one count + one histogram job per
    * attempt plus one bounded probe job per chunk.
    */
  def serveTopKChunked(
      spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, embCol: String, k: Int, nProbe: Int,
      maxProbePairs: Int = 1000000): DataFrame = {
    val qBound = math.max(1L, maxProbePairs.toLong / math.max(1, nProbe))
    val nQ = queries.count()
    if (nQ <= qBound)
      return serveTopK(spark, indexDir, queries, idCol, embCol, k, nProbe, maxProbePairs)
    def chunkOf = pmod(hash(col(idCol)), _: Column)
    def maxLoad(nc: Int): Long = queries
      .groupBy(chunkOf(lit(nc)).as("__chunk")).agg(count(lit(1)).as("m"))
      .agg(max(col("m"))).head().getLong(0)
    var nChunks = math.max(2L, (2L * nQ + qBound - 1) / qBound).toInt
    var tries = 0
    while (maxLoad(nChunks) > qBound) {
      tries += 1
      require(tries <= 16, // 2^16 chunks past target = ids colliding in hash itself
        s"could not balance $nQ queries into chunks of <= $qBound (hash collisions?)")
      nChunks *= 2
    }
    (0 until nChunks).map { i =>
      serveTopK(spark, indexDir, queries.filter(chunkOf(lit(nChunks)) === i),
        idCol, embCol, k, nProbe, maxProbePairs)
    }.reduce(_ union _)
  }

  /** IVF+PQ ADC serve against a persisted index (the billion-vector
    * serving plan of [[Similarity.ivfPqTopK]], build excluded): probe →
    * per-query LUT over the persisted codebook → candidates scored by
    * nSub code lookups (the pruned inverted file supplies codes, no float
    * vectors touched) → exact rerank of the k·queries short list using
    * the vectors carried INLINE in the probed cells. DECIMAL-accumulated
    * ADC sum and id tie-breaks mirror ivfPqTopK exactly.
    */
  def servePqTopK(
      spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, embCol: String, k: Int, nSub: Int, subDim: Int,
      nProbe: Int, maxProbePairs: Int = 1000000): DataFrame = {
    // the symmetric contract to servePqResidualTopK's: raw ADC against
    // residual-space codes would score dot(q, x − centroid) with no
    // centroid term — plausible numbers, silently wrong ranks
    require(!isResidual(indexDir),
      s"$indexDir was built by buildResidual — its codes live in residual " +
        "space; use servePqResidualTopK")
    // the ADC path rebuilds its LUT and rerank from the query relation
    // directly, so the slim (qid, cent_id) pair relation is all it needs
    val (probes, cells) = collectedProbes(
      spark, indexDir, queries, idCol, embCol, nProbe, maxProbePairs)
    val inv = prunedInvfile(spark, indexDir, cells)
    val q = normalizedRel(queries, idCol, embCol, "qid", "qe")
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val off = (col("s") * subDim + 1).cast("int")
    val lut = q.select(col("qid"), col("qe"))
      .withColumn("s", explode(sequence(lit(0), lit(nSub - 1))))
      .crossJoin(broadcast(cb))
      .select(col("qid"), col("s"), col("code_id"),
        dot(slice(col("qe"), off, lit(subDim)), slice(col("cbe"), off, lit(subDim))).as("v"))
    val candCodes = broadcast(probes)
      .join(inv, "cent_id")
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        explode(array((0 until nSub).map(i =>
          struct(lit(i).as("s"), col(s"code_$i").as("code_id"))): _*)).as("sc"))
      .select(col("qid"), col("cid"), col("sc.s").as("s"), col("sc.code_id").as("code_id"))
    val adc = candCodes.join(broadcast(lut), Seq("qid", "s", "code_id"))
      .groupBy(col("qid"), col("cid"))
      .agg(sum(col("v").cast(DecimalType(38, 18))).cast("double").as("adc"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("cid").asc)
    val top = adc.withColumn("rn", row_number().over(wTop).cast("bigint"))
      .filter(col("rn") <= k)
    // rerank reads the short list's full vectors from the probed cells
    // (every shortlist cid lives in a probed cell by construction)
    broadcast(top)
      .join(inv.select(col("cid"), col("ce"), col("ce_n")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"), col("rn"), col("adc"),
        (dot(col("qe"), col("ce")) / (col("qe_n") * col("ce_n"))).as("cos"))
  }

  /** SemDeDup's recurring term served from the persisted assignment: the
    * within-cell pair scan + connected components + min-id keeper over
    * the inverted file alone — no training and no assignment pass in the
    * plan, completing the SemDeDup cost decomposition the battery
    * measures (train O(N) sampled = q325; one N×√N assignment = the
    * persisted build; THIS — the exact pair term, the N^1.5 floor for
    * exact SemDeDup — is what a 100 TB deployment re-pays per corpus
    * refresh). `corpus` supplies the id universe for the decision table
    * (an id-only column-pruned scan); pair semantics are exactly
    * [[Similarity.semanticPairs]]' (cell equi-join, cid tie-break,
    * threshold on the carried-norm cosine), so with the same build
    * parameters the decision table is identical to
    * [[Similarity.semanticDedup]]'s.
    */
  /** Memoized Σ m·(m−1)/2 over the invfile's cell histogram — the pair
    * volume [[serveSemDedup]] sizes its shuffle from. One rollup over the
    * PARTITION column only (≤√N groups, no data columns read); memoized
    * per index dir because plan-only consumers construct the serve plan
    * repeatedly (the BatteryPlanSpec sweeps), and invalidated by
    * [[refresh]] since appends change the histogram.
    */
  private val pairStats = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def invfilePairCount(spark: SparkSession, indexDir: String): Long =
    pairStats.computeIfAbsent(indexDir, { d =>
      java.lang.Long.valueOf(
        spark.read.parquet(s"$d/invfile")
          .groupBy(col("cent_id")).agg(count(lit(1)).as("m"))
          .agg(coalesce(sum(expr("m * (m - 1) div 2")), lit(0L)))
          .head().getLong(0))
    }).longValue()

  def serveSemDedup(
      spark: SparkSession, indexDir: String, corpus: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    recover(indexDir)
    decisionTable(cellPairs(spark, indexDir, threshold), corpus, idCol)
  }

  /** Every within-cell pair of the inverted file at or above `threshold`
    * — [[Similarity.semanticPairs]]' semantics (cell equi-join, cid
    * tie-break, carried-norm cosine) over the persisted assignment.
    * The self-join width is sized from the invfile's cell histogram, not
    * the session default (q284's lesson, Extended50.scala): per-cell pair
    * volume grows linearly in N at √N cells, so a fixed session width
    * saturates a decade past where it was tuned. ~4M pairs per partition,
    * floor 32; the equi-join reuses the repartition layout, so the sizing
    * costs no extra shuffle.
    */
  private def cellPairs(
      spark: SparkSession, indexDir: String, threshold: Double): DataFrame = {
    val width = math.max(32L,
      math.min(4096L, invfilePairCount(spark, indexDir) / 4000000L)).toInt
    val inv = spark.read.parquet(s"$indexDir/invfile")
      .select(col("cid"), col("ce"), col("ce_n"), col("cent_id"))
      .repartition(width, col("cent_id"))
    inv.as("a")
      .join(inv.as("b"),
        col("a.cent_id") === col("b.cent_id") && col("a.cid") < col("b.cid"))
      .select(
        col("a.cid").as("a_id"), col("b.cid").as("b_id"),
        (dot(col("a.ce"), col("b.ce")) / (col("a.ce_n") * col("b.ce_n"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Pair set → SemDeDup decision table: connected components over the
    * duplicate graph, min-id keeper, full-corpus id universe.
    */
  private def decisionTable(
      pairs: DataFrame, corpus: DataFrame, idCol: String): DataFrame = {
    val clusters = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("id"), col("cluster_id"))
    corpus.select(col(idCol).as("id"))
      .join(clusters, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .withColumn("keep", col("id") === col("cluster_id"))
  }

  /** Materialize the thresholded within-cell pair set as a `pairs/`
    * artifact alongside the index — the one-time companion of [[build]]
    * that makes SemDeDup's recurring term INCREMENTAL: q327's serve
    * recomputes every within-cell pair per run (the N^1.5 floor), whereas
    * with the artifact each [[refresh]] appends only the delta-touching
    * pairs (O(ΔN × cellLoad)) and [[serveSemDedupFromPairs]] reads the
    * accumulated set — the superlinear cost is paid once, at build.
    * The threshold is baked into the artifact (pairs below it are never
    * stored); callers must refresh with the same value.
    */
  def buildPairs(spark: SparkSession, indexDir: String, threshold: Double): Unit = {
    cellPairs(spark, indexDir, threshold).select(col("a_id"), col("b_id"))
      .write.mode("overwrite").parquet(s"$indexDir/pairs")
    // Bake the threshold INTO the artifact (underscore prefix → invisible
    // to parquet readers): pairs below it were never stored, so a refresh
    // maintaining the set with a different threshold would silently
    // produce a mixed-threshold artifact and a wrong decision table.
    // refresh() validates against this sidecar and fails fast instead
    // (ADVICE r14, medium).
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$indexDir/pairs/_THRESHOLD"),
      threshold.toString.getBytes("UTF-8"))
    ()
  }

  /** The threshold [[buildPairs]] baked into `pairs/`, from its sidecar. */
  private def pairsThresholdOf(indexDir: String): Option[Double] = {
    val p = java.nio.file.Paths.get(s"$indexDir/pairs/_THRESHOLD")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toDouble)
    else None
  }

  /** SemDeDup decision table from the persisted `pairs/` artifact alone:
    * connected components + min-id keeper, NO pair scan in the plan — the
    * recurring cost is the duplicate-graph size, not the within-cell pair
    * count. With [[buildPairs]] at build time and `pairThreshold` on every
    * [[refresh]], this equals [[serveSemDedup]] on the same index exactly
    * (pair maintenance is exhaustive — q331 hash-gates the identity
    * against from-scratch SemDeDup on the union corpus).
    */
  def serveSemDedupFromPairs(
      spark: SparkSession, indexDir: String, corpus: DataFrame,
      idCol: String): DataFrame = {
    recover(indexDir)
    decisionTable(
      spark.read.parquet(s"$indexDir/pairs"), corpus, idCol)
  }

  /** Index health monitor — BOTH maintenance triggers [[refresh]]'s
    * contract defers to, as one row of cell-histogram rollups over the
    * inverted file's PARTITION and metadata columns only (no data pages
    * read; ≤√N groups).
    *
    * REBUILD trigger: `imbalance_r` (max cell load over mean) — the
    * quantizer is frozen at build time, so successive deltas that drift
    * from the training distribution show up exactly here, and a rebuild
    * (retrain + reassign) is scheduled when it crosses a policy
    * threshold. `pair_sum` is the exact-SemDeDup recurring-term volume
    * ([[invfilePairCount]]'s value, exposed).
    *
    * COMPACT trigger: every refresh appends one file per touched cell,
    * so `max_files_per_cell` climbs by ~1 per refresh and a serve pays
    * that many file opens per probed cell — the small-files tax
    * [[compact]] exists to reset. `compact_due` fires when it exceeds
    * `compactAfter` (the policy knob: how many refreshes between
    * compactions a deployment tolerates). File identity comes from the
    * scan's `_metadata.file_path` — a constant per file, so the distinct
    * count per cell is the cell directory's live file count without a
    * separate listing job.
    */
  def cellStats(
      spark: SparkSession, indexDir: String, compactAfter: Int = 4): DataFrame = {
    recover(indexDir)
    val avg = col("n_vecs").cast("double") / col("n_cells")
    spark.read.parquet(s"$indexDir/invfile")
      .select(col("cent_id"), col("_metadata.file_path").as("__f"))
      .groupBy(col("cent_id"))
      .agg(count(lit(1)).as("m"), countDistinct(col("__f")).as("nf"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("m")).as("n_vecs"),
        max(col("m")).as("max_load"),
        sum(expr("m * (m - 1) div 2")).as("pair_sum"),
        sum(col("nf")).as("n_files"),
        max(col("nf")).as("max_files_per_cell"))
      .select(col("n_cells"), col("n_vecs"), col("max_load"), col("pair_sum"),
        graft.ops.Num.roundTo(avg, 4).as("avg_load_r"),
        graft.ops.Num.roundTo(col("max_load").cast("double") / avg, 4).as("imbalance_r"),
        col("n_files"), col("max_files_per_cell"),
        (col("max_files_per_cell") > compactAfter).as("compact_due"))
  }

  /** Compact the inverted file in place: every [[refresh]] appends one
    * file per touched cell directory, so after R refreshes a serve reads
    * up to R+1 files per probed cell — at 100 TB that is the classic
    * small-files tax (per-file open/footer cost at the scan, listing
    * pressure on the metadata layer). Rewrites each cell's accumulated
    * files into one file per cell (rows hash to one shuffle partition per
    * cell; the partitioned write splits per directory) and atomically
    * swaps the directory. Content is bit-identical (parquet round-trips
    * the doubles and codes exactly), so serve plans are unchanged —
    * Extended69Spec pins serve-identity across a compact. The cell
    * histogram is unchanged too, so the memoized pair count stands.
    * `maxRecordsPerFile` > 0 re-splits oversized cells (a skew-era cell
    * can outgrow one task's comfort zone) at the parquet writer level.
    *
    * The swap is two local renames; on an object store the equivalent is
    * a staged write + catalog pointer flip — same one-writer contract as
    * [[refresh]] (concurrent serves reading the old listing finish
    * against intact files; local FS keeps open fds valid across rename).
    */
  def compact(
      spark: SparkSession, indexDir: String, maxRecordsPerFile: Long = 0): Unit = {
    recover(indexDir)
    val staged = s"$indexDir/invfile__staged"
    val srcRows = spark.read.parquet(s"$indexDir/invfile").count() // footer-only
    spark.read.parquet(s"$indexDir/invfile")
      .repartition(col("cent_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("cent_id").parquet(staged)
    // Sanity-gate the swap (ADVICE r14): a compacted tree that silently
    // dropped rows must never replace the source, and the source must not
    // be deleted until the replacement is verified. Both counts are local
    // footer reads — nearly free.
    val dstRows = spark.read.parquet(staged).count()
    require(dstRows == srcRows,
      s"compact wrote $dstRows rows for a $srcRows-row inverted file — aborting before the swap; " +
        s"the original invfile is untouched and $staged can be deleted")
    swapStaged(indexDir, Seq("invfile"))
  }

  /** Marker file for in-place artifact swaps ([[compact]]/[[rebuild]]):
    * written (with the component list) before the first rename, deleted
    * only once every component is in place. Its presence means a swap was
    * interrupted and [[recover]] must run before the index is used.
    */
  private val swapMarker = "_SWAP_IN_PROGRESS"
  private def markerPath(indexDir: String) =
    java.nio.file.Paths.get(indexDir, swapMarker)

  /** Crash recovery for an interrupted swap (ADVICE r15: the old compact
    * had a window between its two renames where the index had NO invfile
    * and recovery was a documented manual move). Rolls the index BACK to
    * the retired (pre-swap) artifacts — always safe, because retired
    * copies are deleted only after the marker, so a marker's presence
    * guarantees every component is recoverable; the interrupted
    * compact/rebuild simply re-runs. Invoked automatically at every
    * serve/maintenance entry point (one Files.exists when healthy).
    * Returns true if a recovery was performed.
    */
  def recover(indexDir: String): Boolean = {
    val m = markerPath(indexDir)
    if (!java.nio.file.Files.exists(m)) return false
    val comps = new String(java.nio.file.Files.readAllBytes(m), "UTF-8")
      .trim.split(",").filter(_.nonEmpty)
    System.err.println(
      s"[graft] interrupted swap detected at $indexDir (${comps.mkString(",")}) — " +
        "restoring the pre-swap artifacts")
    val root = java.nio.file.Paths.get(indexDir)
    comps.foreach { name =>
      val retired = root.resolve(s"${name}__retired")
      if (java.nio.file.Files.exists(retired)) {
        val live = root.resolve(name)
        if (java.nio.file.Files.exists(live)) graft.queries.QueryDef.rmTree(live)
        java.nio.file.Files.move(retired, live,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      val staged = root.resolve(s"${name}__staged")
      if (java.nio.file.Files.exists(staged)) graft.queries.QueryDef.rmTree(staged)
    }
    java.nio.file.Files.delete(m)
    pairStats.remove(indexDir)
    true
  }

  /** Swap verified staged components (`<name>__staged`) into place under
    * the recovery marker: retire each live dir, promote its staged
    * replacement, then — only after EVERY component is live — delete the
    * marker and the retired copies. A crash anywhere inside the window
    * leaves the marker, and [[recover]] restores the complete pre-swap
    * index; a crash after the marker delete leaves at worst orphaned
    * `__retired` garbage, which the next swap clears.
    */
  private def swapStaged(indexDir: String, components: Seq[String]): Unit = {
    val root = java.nio.file.Paths.get(indexDir)
    def retiredOf(n: String) = root.resolve(s"${n}__retired")
    // leftover retired dirs from a crash AFTER a previous marker delete
    // are confirmed garbage (the marker outlives every recoverable state)
    components.foreach { n =>
      if (java.nio.file.Files.exists(retiredOf(n)))
        graft.queries.QueryDef.rmTree(retiredOf(n))
    }
    java.nio.file.Files.write(
      markerPath(indexDir), components.mkString(",").getBytes("UTF-8"))
    components.foreach { n =>
      val live = root.resolve(n)
      if (java.nio.file.Files.exists(live))
        java.nio.file.Files.move(live, retiredOf(n),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      java.nio.file.Files.move(root.resolve(s"${n}__staged"), live,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    java.nio.file.Files.delete(markerPath(indexDir))
    components.foreach { n =>
      if (java.nio.file.Files.exists(retiredOf(n)))
        graft.queries.QueryDef.rmTree(retiredOf(n))
    }
  }

  /** REBUILD — the monitor's other trigger promoted to a first-class
    * lifecycle operator (round-15 verdict item 5: BenchDrift demonstrated
    * the drift → rebuild cycle inline but the library had no callable
    * target). Retrains the coarse quantizer on the CURRENT accumulated
    * corpus, reassigns and re-encodes every vector, rebuilds the pairs
    * artifact if one exists (at its baked threshold), and swaps all
    * components in atomically under the recovery marker — the old index
    * stays fully readable until the flip.
    *
    * The corpus is read from the index's own inverted file (cid, ce): the
    * invfile carries every vector as the exact `toDouble` of the original
    * embedding (parquet round-trips IEEE doubles), so a rebuild is
    * BIT-IDENTICAL to a fresh [[build]] over the accumulated corpus with
    * the same derived parameters — the identity q335 hash-gates (serve
    * after build(90%)+refresh(10%)+rebuild ≡ q324's fresh-build oracle on
    * the full corpus) and BenchDrift measures the recall value of. No
    * separate corpus copy is scanned: at 100 TB the index IS the
    * authoritative vector store, and rebuild costs exactly one build
    * (O(N·√N) assignment + O(N) encode) plus the pairs term when present.
    *
    * Parameterization is re-derived from the CURRENT corpus size — that
    * is the point of a rebuild: √N' cells, ~4√N' training sample, one
    * Lloyd iteration (the q323 recipe), N'/nCodewords codebook. Pass
    * `cbTrain = true` for the per-subspace-trained codebook (q332's
    * FAISS recipe) when the original build used one.
    */
  def rebuild(
      spark: SparkSession, indexDir: String, nSub: Int, subDim: Int,
      trainIters: Int = 1, nCodewords: Int = 64, cbTrain: Boolean = false): Unit = {
    recover(indexDir)
    // A residual-coded index must stage through buildResidual: rebuilding
    // it with raw codes while the live _PQ_RESIDUAL sidecar survives the
    // swap (components move; sidecars stay) would leave an index
    // servePqResidualTopK still ACCEPTS but whose codes lost their
    // centroid offset — silent ADC corruption. q339 hash-gates the
    // residual staging; Extended72Spec pins the sidecar round-trip.
    val residual = isResidual(indexDir)
    require(!(cbTrain && residual),
      "rebuild(cbTrain=true) on a residual-coded index: buildResidual has no " +
        "per-subspace-trained form — its codebook is the strided residual seed")
    val corpus = spark.read.parquet(s"$indexDir/invfile")
      .select(col("cid").as("vec_id"), col("ce").as("embedding"))
    val n = corpus.count()
    val stride = Similarity.sqrtStride(n)
    val trainStride = math.max(1L, n / (4L * stride))
    val sample = corpus.filter(pmod(col("vec_id"), lit(trainStride)) === 0)
    val staging = s"$indexDir/__rebuild"
    if (residual)
      buildResidual(corpus, "vec_id", "embedding",
        stride = stride, trainIters = trainIters, trainOn = Some(sample),
        nSub = nSub, subDim = subDim,
        codeStride = math.max(1L, n / nCodewords), outDir = staging)
    else
      build(corpus, "vec_id", "embedding",
        stride = stride, trainIters = trainIters, trainOn = Some(sample),
        nSub = nSub, subDim = subDim,
        codeStride = math.max(1L, n / nCodewords), outDir = staging,
        cbTrainOn = if (cbTrain) Some(sample) else None)
    val pairsTh = pairsThresholdOf(indexDir)
    pairsTh.foreach(th => buildPairs(spark, staging, th))
    // same verification gate as compact: a staged tree that dropped rows
    // must never replace the live index
    val stagedRows = spark.read.parquet(s"$staging/invfile").count()
    require(stagedRows == n,
      s"rebuild staged $stagedRows rows for a $n-row corpus — aborting before the swap; " +
        s"the live index is untouched and $staging can be deleted")
    val comps = Seq("centroids", "codebook", "invfile") ++
      pairsTh.map(_ => "pairs").toSeq
    val root = java.nio.file.Paths.get(indexDir)
    comps.foreach { c =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(staging, c), root.resolve(s"${c}__staged"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    graft.queries.QueryDef.rmTree(java.nio.file.Paths.get(staging))
    swapStaged(indexDir, comps)
    pairStats.remove(indexDir)
    pairStats.remove(staging)
    ()
  }

  /** Battery-side index cache: ONE build per (fixture dir) per JVM, under
    * a shutdown-hook-cleaned temp root. This is how q324/q326 measure the
    * serve path in isolation without a side-channel artifact store: Bench
    * takes the min over reps, so rep 1 pays the (memoized) build and the
    * recorded min is the pure persisted-serve cost — the production
    * steady state, where the index is a pre-existing artifact. Verify
    * correctness is unaffected (the build is deterministic, and parquet
    * round-trips doubles exactly, so serve ≡ the lazy q323 pipeline).
    *
    * Parameters are the battery's production rule: stride = √N cells,
    * Lloyd trained 1 iteration on a ~4√N sample (q323), PQ nSub=4 ×
    * subDim=16 with a FIXED 64-codeword codebook (q125).
    */
  object Cache {
    val nSub = 4
    val subDim = 16
    private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()
    private lazy val root: java.nio.file.Path = {
      val p = java.nio.file.Files.createTempDirectory("graft_ivf_index")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graft.queries.QueryDef.rmTree(p)))
      p
    }

    def indexFor(spark: SparkSession, dir: String): String =
      built.computeIfAbsent(dir, { d =>
        val emb = graft.Tables.load(spark, d, "embeddings")
        val n = graft.Tables.cachedCount(spark, d, "embeddings")
        val stride = Similarity.sqrtStride(n)
        val trainStride = math.max(1L, n / (4L * stride))
        val out = java.nio.file.Files.createTempDirectory(root, "ix").toString
        build(emb, "vec_id", "embedding",
          stride = stride, trainIters = 1,
          trainOn = Some(emb.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
          nSub = nSub, subDim = subDim,
          codeStride = math.max(1L, n / 64), outDir = out)
        out
      })

    /** [[indexFor]]'s twin with a PER-SUBSPACE-TRAINED PQ codebook
      * ([[Similarity.trainSubCodebooks]] on the same ~4√N sample that
      * trains the coarse quantizer — the FAISS recipe end to end), for
      * q332: the one serve path whose QUALITY (quantization error, ADC
      * recall) the strided-sample codebook left unmeasured. Same coarse
      * quantizer, same inverted-list layout; only the codebook (and
      * therefore the codes and the ADC scores) differs.
      */
    def trainedIndexFor(spark: SparkSession, dir: String): String =
      trainedBuilt.computeIfAbsent(dir, { d =>
        val emb = graft.Tables.load(spark, d, "embeddings")
        val n = graft.Tables.cachedCount(spark, d, "embeddings")
        val stride = Similarity.sqrtStride(n)
        val trainStride = math.max(1L, n / (4L * stride))
        val sample = emb.filter(pmod(col("vec_id"), lit(trainStride)) === 0)
        val out = java.nio.file.Files.createTempDirectory(root, "tx").toString
        build(emb, "vec_id", "embedding",
          stride = stride, trainIters = 1, trainOn = Some(sample),
          nSub = nSub, subDim = subDim,
          codeStride = math.max(1L, n / 64), outDir = out,
          cbTrainOn = Some(sample))
        out
      })
    private val trainedBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** The HI-RESOLUTION PQ geometry for q334 — the codebook-size axis of
      * the ADC quality story. The battery's 64-codeword × nSub=4 config
      * (q125's oracle-pinned rule) tie-saturates raw ADC within a cluster
      * (measured pre-rerank recall 0.012, BENCH_SF1 r15): 4 subspaces ×
      * 64 codewords cannot distinguish members of a tight cluster, so PQ
      * COMPRESSION was demonstrated but PQ RANKING was not. 256 codewords
      * × nSub=8 × subDim=8 is the standard FAISS geometry (8-bit codes);
      * finer subspaces + a 4× codeword domain give raw ADC real
      * within-cluster rank resolution — BenchRecall sweeps the axis and
      * RecallSpec pins hi-res pre-rerank ≥ the production config's.
      */
    val nSubHi = 8
    val subDimHi = 8
    val nCodewordsHi = 256

    /** [[indexFor]]'s hi-res-PQ twin (same coarse quantizer recipe; only
      * the PQ geometry differs), for q334.
      */
    def hiResIndexFor(spark: SparkSession, dir: String): String =
      hiResBuilt.computeIfAbsent(dir, { d =>
        val emb = graft.Tables.load(spark, d, "embeddings")
        val n = graft.Tables.cachedCount(spark, d, "embeddings")
        val stride = Similarity.sqrtStride(n)
        val trainStride = math.max(1L, n / (4L * stride))
        val out = java.nio.file.Files.createTempDirectory(root, "hx").toString
        build(emb, "vec_id", "embedding",
          stride = stride, trainIters = 1,
          trainOn = Some(emb.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
          nSub = nSubHi, subDim = subDimHi,
          codeStride = math.max(1L, n / nCodewordsHi), outDir = out)
        out
      })
    private val hiResBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** [[hiResIndexFor]]'s RESIDUAL-coded twin ([[buildResidual]] at the
      * same hi-res geometry) for q337 — the full IVFADC recipe, and the
      * lever that actually buys pre-rerank rank resolution (the raw
      * hi-res axis measured flat; see buildResidual's scaladoc).
      */
    def residualIndexFor(spark: SparkSession, dir: String): String =
      residualBuilt.computeIfAbsent(dir, { d =>
        val emb = graft.Tables.load(spark, d, "embeddings")
        val n = graft.Tables.cachedCount(spark, d, "embeddings")
        val stride = Similarity.sqrtStride(n)
        val trainStride = math.max(1L, n / (4L * stride))
        val out = java.nio.file.Files.createTempDirectory(root, "px").toString
        buildResidual(emb, "vec_id", "embedding",
          stride = stride, trainIters = 1,
          trainOn = Some(emb.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
          nSub = nSubHi, subDim = subDimHi,
          codeStride = math.max(1L, n / nCodewordsHi), outDir = out)
        out
      })
    private val residualBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** [[refreshedIndexFor]]'s RESIDUAL twin for q338: [[buildResidual]]
      * on the 90% old corpus (hi-res geometry, all parameters derived
      * from the OLD count), then [[IvfIndex.refresh]] with the 10% delta.
      * The refresh must notice the `_PQ_RESIDUAL` sidecar and encode the
      * delta's RESIDUALS against the persisted residual-space codebook —
      * a raw encode (the [[build]]-index behavior) is a hash mismatch in
      * every delta candidate's ADC score under q338's oracle, which forms
      * residuals for the FULL corpus while restricting the codebook seed
      * to the old sub-corpus (mirroring q329's codebook-provenance gate).
      */
    def residualRefreshedIndexFor(spark: SparkSession, dir: String): String =
      residualRefreshedBuilt.computeIfAbsent(dir, { d =>
        val emb = graft.Tables.load(spark, d, "embeddings")
        val old = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
        val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
        val nOld = oldCount(spark, d)
        val stride = Similarity.sqrtStride(nOld)
        val trainStride = math.max(1L, nOld / (4L * stride))
        val out = java.nio.file.Files.createTempDirectory(root, "prx").toString
        buildResidual(old, "vec_id", "embedding",
          stride = stride, trainIters = 1,
          trainOn = Some(old.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
          nSub = nSubHi, subDim = subDimHi,
          codeStride = math.max(1L, nOld / nCodewordsHi), outDir = out)
        refresh(spark, out, delta, "vec_id", "embedding", nSubHi, subDimHi)
        out
      })
    private val residualRefreshedBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** [[rebuiltIndexFor]]'s RESIDUAL twin for q339 — the residual
      * lifecycle's close: buildResidual(90%) → refresh(10%) → rebuild.
      * rebuild stages through buildResidual at parameters re-derived from
      * the union count, so the swapped-in index must equal a FRESH
      * [[buildResidual]] on the full corpus — q339 reuses q337's oracle
      * verbatim (the identity q335 pins for the raw lifecycle).
      */
    def residualRebuiltIndexFor(spark: SparkSession, dir: String): String =
      residualRebuiltBuilt.computeIfAbsent(dir, { d =>
        val emb = graft.Tables.load(spark, d, "embeddings")
        val old = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
        val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
        val nOld = oldCount(spark, d)
        val stride = Similarity.sqrtStride(nOld)
        val trainStride = math.max(1L, nOld / (4L * stride))
        val out = java.nio.file.Files.createTempDirectory(root, "brx").toString
        buildResidual(old, "vec_id", "embedding",
          stride = stride, trainIters = 1,
          trainOn = Some(old.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
          nSub = nSubHi, subDim = subDimHi,
          codeStride = math.max(1L, nOld / nCodewordsHi), outDir = out)
        refresh(spark, out, delta, "vec_id", "embedding", nSubHi, subDimHi)
        rebuild(spark, out, nSubHi, subDimHi, nCodewords = nCodewordsHi)
        out
      })
    private val residualRebuiltBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** The full-lifecycle index for q335/q336: build on the 90% old
      * corpus + pairs + refresh with the 10% delta (exactly
      * [[refreshedIndexFor]]'s recipe, but in its OWN directory — rebuild
      * mutates in place and the shared refreshed index must stay pristine
      * for q328–q331), then [[IvfIndex.rebuild]]. Because rebuild
      * re-derives every parameter from the accumulated corpus size (= the
      * full fixture) and the invfile round-trips the vectors exactly, the
      * rebuilt index must equal a FRESH [[build]] on the full corpus —
      * q335 serves it against q324's oracle verbatim, and q336 gates the
      * rebuilt pairs artifact against q327's.
      */
    def rebuiltIndexFor(spark: SparkSession, dir: String): String =
      rebuiltBuilt.computeIfAbsent(dir, { d =>
        val emb = graft.Tables.load(spark, d, "embeddings")
        val old = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
        val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
        val nOld = oldCount(spark, d)
        val stride = Similarity.sqrtStride(nOld)
        val trainStride = math.max(1L, nOld / (4L * stride))
        val out = java.nio.file.Files.createTempDirectory(root, "bx").toString
        build(old, "vec_id", "embedding",
          stride = stride, trainIters = 1,
          trainOn = Some(old.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
          nSub = nSub, subDim = subDim,
          codeStride = math.max(1L, nOld / 64), outDir = out)
        buildPairs(spark, out, pairThreshold)
        refresh(spark, out, delta, "vec_id", "embedding", nSub, subDim,
          pairThreshold = Some(pairThreshold))
        rebuild(spark, out, nSub, subDim)
        out
      })
    private val rebuiltBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** The battery's SemDeDup threshold (q111/q325/q327/q331's rule) —
      * baked into the cached pairs artifact, so every consumer must agree.
      */
    val pairThreshold = 0.4

    /** The lifecycle twin of [[indexFor]]: ONE refreshed index per
      * (fixture dir) per JVM, for q328–q331. The corpus splits 90/10 by
      * `vec_id % 10` — the index is BUILT on the 90% "old" corpus (its
      * own √N stride, ~4√N training sample, and N/64 codebook, all sized
      * from the OLD count, exactly as a deployment that trained before
      * the delta arrived), its SemDeDup pair artifact materialized
      * ([[buildPairs]]), and then [[refresh]]ed with the 10% delta, pair
      * maintenance included. Serving it must equal serving the union
      * corpus against the old-trained quantizer — the oracle replays that
      * in SQL.
      */
    def refreshedIndexFor(spark: SparkSession, dir: String): String =
      refreshedBuilt.computeIfAbsent(dir, { d =>
        val emb = graft.Tables.load(spark, d, "embeddings")
        val old = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
        val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
        val nOld = oldCount(spark, d)
        val stride = Similarity.sqrtStride(nOld)
        val trainStride = math.max(1L, nOld / (4L * stride))
        val out = java.nio.file.Files.createTempDirectory(root, "rx").toString
        build(old, "vec_id", "embedding",
          stride = stride, trainIters = 1,
          trainOn = Some(old.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
          nSub = nSub, subDim = subDim,
          codeStride = math.max(1L, nOld / 64), outDir = out)
        buildPairs(spark, out, pairThreshold)
        refresh(spark, out, delta, "vec_id", "embedding", nSub, subDim,
          pairThreshold = Some(pairThreshold))
        out
      })
    private val refreshedBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** [[refreshedIndexFor]]'s STREAMING twin for q333: identical 90/10
      * split and old-corpus build, but the 10% delta arrives as
      * structured-streaming micro-batches ([[refreshStream]], three
      * source files replayed one per trigger), pair maintenance included.
      * Refresh is batch-order independent and exactly-once, so the
      * drained index must serve identically to the single-batch refresh —
      * q333 reuses q328's oracle verbatim on that ground.
      */
    def streamRefreshedIndexFor(spark: SparkSession, dir: String): String =
      streamRefreshedBuilt.computeIfAbsent(dir, { d =>
        val emb = graft.Tables.load(spark, d, "embeddings")
        val old = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
        val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
        val nOld = oldCount(spark, d)
        val stride = Similarity.sqrtStride(nOld)
        val trainStride = math.max(1L, nOld / (4L * stride))
        val out = java.nio.file.Files.createTempDirectory(root, "sx").toString
        build(old, "vec_id", "embedding",
          stride = stride, trainIters = 1,
          trainOn = Some(old.filter(pmod(col("vec_id"), lit(trainStride)) === 0)),
          nSub = nSub, subDim = subDim,
          codeStride = math.max(1L, nOld / 64), outDir = out)
        buildPairs(spark, out, pairThreshold)
        refreshStream(spark, out, delta, "vec_id", "embedding", nSub, subDim,
          pairThreshold = Some(pairThreshold))
        out
      })
    private val streamRefreshedBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
    private val oldCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

    /** Memoized count of the 90% "old" sub-corpus — the refreshed-index
      * builders derive their √N parameterization from it at
      * plan-construction time (same rationale as Tables.cachedCount).
      */
    def oldCount(spark: SparkSession, dir: String): Long =
      oldCounts.computeIfAbsent(dir, { d =>
        java.lang.Long.valueOf(graft.Tables.load(spark, d, "embeddings")
          .filter(pmod(col("vec_id"), lit(10)) =!= 9).count())
      }).longValue()
  }
}
