package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    */
  def build(
      corpus: DataFrame, idCol: String, embCol: String,
      stride: Int, trainIters: Int, trainOn: Option[DataFrame],
      nSub: Int, subDim: Int, codeStride: Long, outDir: String): Unit = {
    val spark = corpus.sparkSession
    centroidsOf(corpus, idCol, embCol, stride, trainIters, trainOn)
      .write.mode("overwrite").parquet(s"$outDir/centroids")
    // assignment reads the PERSISTED centroids back (cheaper than
    // recomputing the training subplan inside this job, and exactly what
    // a production build resuming from a trained quantizer does)
    val cent = spark.read.parquet(s"$outDir/centroids")
    val c = normalizedRel(corpus, idCol, embCol, "cid", "ce")
    val codes = Similarity
      .pqEncode(corpus, idCol, embCol, nSub, subDim, codeStride)
      .drop("recon")
    assignToCells(c, cent)
      .join(codes, col("cid") === col("vid")).drop("vid")
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$outDir/invfile")
    corpus.filter(pmod(col(idCol), lit(codeStride)) === 0)
      .select(col(idCol).as("code_id"), toDouble(col(embCol)).as("cbe"))
      .write.mode("overwrite").parquet(s"$outDir/codebook")
  }

  /** nProbe nearest persisted cells per query vector: (qid, qe, qe_n,
    * cent_id) — [[Similarity.probeNearestCells]] (the ONE probe
    * definition, shared with the lazy pipelines) over the read-back
    * centroid artifact.
    */
  private def probeCells(
      spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, embCol: String, nProbe: Int,
      carryQuery: Boolean): DataFrame =
    Similarity.probeNearestCells(
      normalizedRel(queries, idCol, embCol, "qid", "qe"),
      spark.read.parquet(s"$indexDir/centroids"), nProbe, carryQuery)

  /** The probed cell ids as a driver-side array — the ONE eager job a
    * persisted serve pays at plan-build time, and the thing that makes
    * scan-time pruning possible at all. Bounded DIRECTLY at the collect:
    * the distinct runs over (qid, cent_id) PAIRS (≤ nQueries × nProbe
    * rows — which also bounds the ADC path's broadcast-LUT breadth,
    * since pairs ≥ distinct qids) with a limit + typed require, but only
    * the cent_id column is materialized to the driver, so the query-id
    * type never crosses the collect. Note the enforcement point: the
    * bound trips at the probe job's collect, i.e. AFTER the probe
    * crossJoin runs — it guards driver memory and the LUT, not the probe
    * job's own cost.
    */
  private def probedCellIds(probes: DataFrame, maxProbePairs: Int): Array[Long] = {
    val rows = probes.select(col("qid"), col("cent_id")).distinct()
      .limit(maxProbePairs + 1)
      .select(col("cent_id")).collect()
    require(rows.length <= maxProbePairs,
      s"persisted-index serve probes exceed maxProbePairs=$maxProbePairs " +
        "(nQueries x nProbe driver-side rows) — chunk the query batch")
    rows.map(_.getLong(0)).distinct.sorted
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
    val probes = probeCells(spark, indexDir, queries, idCol, embCol, nProbe,
      carryQuery = true) // scoring needs qe/qe_n on the candidate rows
    val inv = prunedInvfile(spark, indexDir, probedCellIds(probes, maxProbePairs))
    Similarity.topKByCosine(probes.join(inv, "cent_id"), k)
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
    // slim probes: the ADC path rebuilds its LUT and rerank from the
    // query relation directly, so the probe window must not shuffle
    // nQueries x nCells embedding arrays it would immediately drop
    val probes = probeCells(spark, indexDir, queries, idCol, embCol, nProbe,
      carryQuery = false)
    val inv = prunedInvfile(spark, indexDir, probedCellIds(probes, maxProbePairs))
    val q = normalizedRel(queries, idCol, embCol, "qid", "qe")
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val off = (col("s") * subDim + 1).cast("int")
    val lut = q.select(col("qid"), col("qe"))
      .withColumn("s", explode(sequence(lit(0), lit(nSub - 1))))
      .crossJoin(broadcast(cb))
      .select(col("qid"), col("s"), col("code_id"),
        dot(slice(col("qe"), off, lit(subDim)), slice(col("cbe"), off, lit(subDim))).as("v"))
    val candCodes = probes
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
  def serveSemDedup(
      spark: SparkSession, indexDir: String, corpus: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    val inv = spark.read.parquet(s"$indexDir/invfile")
      .select(col("cid"), col("ce"), col("ce_n"), col("cent_id"))
    val pairs = inv.as("a")
      .join(inv.as("b"),
        col("a.cent_id") === col("b.cent_id") && col("a.cid") < col("b.cid"))
      .select(
        col("a.cid").as("a_id"), col("b.cid").as("b_id"),
        (dot(col("a.ce"), col("b.ce")) / (col("a.ce_n") * col("b.ce_n"))).as("cos"))
      .filter(col("cos") >= threshold)
    val clusters = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("id"), col("cluster_id"))
    corpus.select(col(idCol).as("id"))
      .join(clusters, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .withColumn("keep", col("id") === col("cluster_id"))
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
  }
}
