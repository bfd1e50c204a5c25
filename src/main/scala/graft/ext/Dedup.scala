package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash groups), n-gram Jaccard (exact similarity over
  * shingle sets), MinHash+LSH (approximate candidate generation at scale),
  * SimHash (bit-sketch near-dup), and embedding-cosine near-dup (see
  * Similarity).
  *
  * Scale design: nothing here compares all pairs. Exact dedup is one
  * hash aggregate; Jaccard joins on shared shingles (a pair appears only
  * if it shares ≥1 shingle); MinHash/LSH buckets by band signature so
  * candidate generation is O(docs × bands), and only candidates get exact
  * verification; SimHash blocks on 16-bit chunks (pigeonhole: hamming ≤ 3
  * ⇒ some chunk equal). All joins are shuffle-hash/SMJ on computed keys —
  * embarrassingly partitionable at 100 TB.
  */
object Dedup {

  /** Exact-duplicate groups by md5 of normalized text: (fp, keep_id =
    * smallest doc id, n_docs). Group-then-min keeps one deterministic
    * representative.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(Text.fingerprintMd5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Rows that survive exact dedup (the deterministic representative per
    * fingerprint).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, idCol)
  }

  /** (doc_id, shingle) relation — distinct k-gram shingles exploded. */
  def shingleRel(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(Text.shingles(col(textCol), k)).as("shingle"))
      .filter(col("shingle") =!= "")

  /** Exact n-gram Jaccard near-dup pairs (a_id < b_id, jaccard ≥
    * threshold). Pairs materialize only via the shared-shingle join, so
    * disjoint documents never meet.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, k: Int, threshold: Double): DataFrame = {
    val sh = shingleRel(df, idCol, textCol, k)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x")
      .join(sh.as("y"), col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("n_sh", "n_a"), col("a_id") === col("doc_id")).drop("doc_id")
      .join(sizes.withColumnRenamed("n_sh", "n_b"), col("b_id") === col("doc_id")).drop("doc_id")
      .withColumn(
        "jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** MinHash signatures: per doc, min of xxhash64(seed, shingle) for each
    * of `numHashes` seeded hash functions — one aggregate over the shingle
    * relation, signature materialized as an array column.
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String, k: Int, numHashes: Int): DataFrame = {
    val sh = shingleRel(df, idCol, textCol, k)
    val mins = (0 until numHashes).map(s => min(xxhash64(lit(s), col("shingle"))).as(s"h$s"))
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(s => col(s"h$s")): _*).as("sig"))
  }

  /** LSH banding: candidate pairs whose signatures collide in ≥1 band of
    * `rowsPerBand` consecutive signature slots, then EXACT Jaccard
    * verification of candidates only. With numHashes=64, rowsPerBand=4
    * (16 bands), pairs at jaccard 0.5 are caught with p ≈ 1-(1-0.5^4)^16
    * ≈ 0.65 per band structure — tune bands/rows per corpus; the verify
    * step keeps precision exact either way.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String, k: Int,
      numHashes: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    val sig = minhashSignatures(df, idCol, textCol, k, numHashes)
    val bands = sig.select(
      col("doc_id"),
      explode(transform(
        sequence(lit(0), lit(numBands - 1)),
        b => struct(b.as("band"), xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bh"))))
        .as("x"))
      .select(col("doc_id"), col("x.band"), col("x.bh"))
    val cand = bands.as("p")
      .join(bands.as("q"),
        col("p.band") === col("q.band") && col("p.bh") === col("q.bh") &&
          col("p.doc_id") < col("q.doc_id"))
      .select(col("p.doc_id").as("a_id"), col("q.doc_id").as("b_id"))
      .distinct()
    // exact verification restricted to candidates
    val sh = shingleRel(df, idCol, textCol, k)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    cand
      .join(sh.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sh.as("sb"), col("b_id") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("n_sh", "n_a"), col("a_id") === col("doc_id")).drop("doc_id")
      .join(sizes.withColumnRenamed("n_sh", "n_b"), col("b_id") === col("doc_id")).drop("doc_id")
      .withColumn(
        "jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** 64-bit SimHash over the token multiset: per bit, majority vote of
    * xxhash64(token) bits, weighted by occurrence. Computed as 64 sum
    * aggregates (one shuffle), reassembled into a LongType sketch.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"), explode(Text.tokensNorm(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .withColumn("h", xxhash64(col("t")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v$b")
    }
    val agg = tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sim = (0 until 64)
      .map(b => when(col(s"v$b") > 0, lit(1L) * lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist (≤ 3 is exact
    * under 4-chunk blocking; larger maxDist becomes a recall-bounded
    * heuristic). Blocking: 4 × 16-bit chunks — a pair differing in ≤ 3
    * bits must agree on ≥ 1 chunk.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame = {
    val sim = simhash64(df, idCol, textCol)
    val chunks = sim.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"), shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("cv"))): _*))
        .as("x"))
      .select(col("doc_id"), col("simhash"), col("x.chunk"), col("x.cv"))
    chunks.as("p")
      .join(chunks.as("q"),
        col("p.chunk") === col("q.chunk") && col("p.cv") === col("q.cv") &&
          col("p.doc_id") < col("q.doc_id"))
      .select(
        col("p.doc_id").as("a_id"), col("q.doc_id").as("b_id"),
        bit_count(col("p.simhash").bitwiseXOR(col("q.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
