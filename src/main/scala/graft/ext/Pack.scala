package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: greedily pack documents into
  * fixed-capacity context windows ("bins") so short documents share a
  * window instead of wasting padding tokens.
  *
  * The packing itself is inherently sequential, so it runs PER BUCKET: a
  * deterministic bucket key spreads documents over independent groups,
  * each group is packed greedily in document-id order, and bin ids are
  * scoped to the bucket. At 100 TB the bucket count scales with the data
  * (pick buckets ≈ corpus_tokens / tokens-a-core-should-pack) — every
  * bucket packs in parallel with bounded memory, no global sequential
  * pass and no driver involvement. A doc longer than the capacity gets a
  * bin of its own (truncation/splitting is the tokenizer's job, not the
  * packer's).
  *
  * Greedy rule (matches the recursive-CTE oracle in q77): walk docs in
  * ascending id order, keep a running fill; if fill + n_tokens exceeds
  * the capacity, open a new bin.
  */
object Pack {

  /** (doc_id, bucket, bin_id, n_tokens) — bin_id is 0-based within the
    * bucket. Input columns: idCol (unique long), nTokCol (long token
    * count), bucketCol (long group key).
    */
  def packGreedy(
      docs: DataFrame, idCol: String, nTokCol: String, bucketCol: String,
      capacity: Long): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(bucketCol).cast("long"), col(idCol).cast("long"),
        col(nTokCol).cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (bucket, rows) =>
        // one bucket fits in memory by construction (bucket count is the
        // scale knob); sort here = deterministic greedy order
        val sorted = rows.toSeq.sortBy(_._2)
        var bin = 0L
        var fill = 0L
        var first = true
        sorted.iterator.map { case (_, id, n) =>
          if (first) { fill = n; first = false }
          else if (fill + n <= capacity) { fill += n }
          else { bin += 1; fill = n }
          (id, bucket, bin, n)
        }
      }
      .toDF(idCol, bucketCol, "bin_id", nTokCol)
  }
}
