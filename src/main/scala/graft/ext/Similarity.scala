package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Math is done in DOUBLE via higher-order functions (zip_with multiply,
  * sequential aggregate fold) — codegen'd, deterministic, and
  * cross-engine-exact, which is what lets the brute-force path be
  * oracle-checked against DuckDB. The scale path is IVF: a coarse
  * centroid quantizer prunes candidates to nProbe cells, turning
  * O(queries × corpus) into O(queries × corpus/nCells × nProbe) — all as
  * ordinary broadcast + shuffle joins, no driver-side loops over vectors.
  */
object Similarity {

  /** Array[Float] → Array[Double] (promote BEFORE any arithmetic, so both
    * engines multiply the same doubles).
    */
  def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential left-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for each query vector (excluding
    * self). Queries are broadcast; the corpus streams by once. rn is the
    * neighbor rank (1 = closest), deterministically tie-broken by id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), toDouble(col(embCol)).as("qe"))
    val c = corpus.select(col(idCol).as("cid"), toDouble(col(embCol)).as("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
  }

  /** IVF (inverted-file) approximate top-k: centroids are a deterministic
    * corpus sample (every strideth vector — stand-in for k-means, which
    * would train the same structure); each corpus vector is assigned to
    * its nearest centroid cell once; each query probes its nProbe nearest
    * cells and brute-forces only those. Recall is tunable via
    * nProbe/stride; Spec asserts recall vs bruteForceTopK.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, stride: Int, nProbe: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), toDouble(col(embCol)).as("ce"))
    val cent = corpus
      .filter(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).as("cent_id"), toDouble(col(embCol)).as("cent_e"))
    // assign: nearest centroid per corpus vector (rank-1 over the
    // broadcast centroid set)
    val wAssign = Window.partitionBy(col("cid")).orderBy(col("d").desc, col("cent_id").asc)
    val assigned = c.crossJoin(broadcast(cent))
      .select(col("cid"), col("ce"), col("cent_id"), cosine(col("ce"), col("cent_e")).as("d"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("cid"), col("ce"), col("cent_id"))
    // probe: nProbe nearest cells per query
    val q = queries.select(col(idCol).as("qid"), toDouble(col(embCol)).as("qe"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cent_id").asc)
    val probes = q.crossJoin(broadcast(cent))
      .select(col("qid"), col("qe"), col("cent_id"), cosine(col("qe"), col("cent_e")).as("d"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qe"), col("cent_id"))
    // search only the probed cells
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    probes
      .join(assigned, "cent_id")
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
      .withColumn("rn", row_number().over(wTop).cast("bigint"))
      .filter(col("rn") <= k)
  }

  /** Embedding-cosine near-duplicate pairs, blocked on `blockCol` (e.g. a
    * label, an LSH bucket, or an IVF cell id) so only same-block pairs
    * are scored.
    */
  def nearDupPairs(df: DataFrame, idCol: String, embCol: String, blockCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(blockCol).as("blk"), toDouble(col(embCol)).as("e"))
    v.as("a")
      .join(v.as("b"), col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("a_id"), col("b.id").as("b_id"),
        cosine(col("a.e"), col("b.e")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
