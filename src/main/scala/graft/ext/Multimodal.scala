package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * BINARY columns with a typed metadata struct, and run batch feature
  * extraction with `Dataset.mapPartitions` (the Scala/JVM equivalent of a
  * PySpark mapInPandas batch UDF: one iterator per partition, amortized
  * per-batch setup, no per-row driver involvement).
  *
  * The DECODE STEP IS A STUB: real codecs (JPEG/PNG/FLAC/mp4) are not in
  * this container, so `fakeDecode` produces deterministic pseudo-features
  * from the raw bytes. The Spark-side contract — schema, partitioning,
  * batch iterator shape, feature struct — is real and tested; swapping
  * `fakeDecode` for an actual codec is a local change inside one
  * function.
  */
object Multimodal {

  /** Typed feature row produced per asset. */
  final case class AssetFeatures(
      asset_id: Long,
      n_bytes: Long,
      byte_mean: Double,
      byte_hist: Array[Long], // 16-bucket histogram of byte values
      frames_sampled: Int,
      decode_ok: Boolean)

  /** Fixture adapter: manufacture a binary "asset" column from text (the
    * container ships no real media; the engine only sees bytes either
    * way) plus a metadata struct of the kind a real ingest would carry.
    */
  def withBinaryAsset(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      encode(col(payloadCol), "UTF-8").as("asset"),
      struct(
        lit("blob").as("kind"),
        length(col(payloadCol)).cast("long").as("n_chars"),
        octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"))
        .as("meta"))

  /** STUB decode — stands in for an image/audio codec. Deterministic in
    * the bytes; returns (frames, ok). A real implementation would replace
    * only this body (??? semantics, kept runnable for tests).
    */
  private def fakeDecode(bytes: Array[Byte], nFrames: Int): (Array[Array[Byte]], Boolean) = {
    if (bytes.isEmpty) (Array.empty, false)
    else {
      val stride = math.max(1, bytes.length / nFrames)
      val frames = (0 until math.min(nFrames, bytes.length))
        .map(i => bytes.slice(i * stride, math.min(i * stride + stride, bytes.length)))
        .filter(_.nonEmpty)
        .toArray
      (frames, true)
    }
  }

  /** Batch feature extraction over the binary column. Partition-iterator
    * shape: per-partition (not per-row) setup cost, streaming through
    * rows — the pattern that scales to 100 TB of blobs (each task
    * processes its partition independently; no shuffle).
    */
  def extractFeatures(assets: DataFrame, nFrames: Int = 4): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("asset_id"), col("asset"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would open the codec once here
        it.map { case (id, bytes) =>
          val (frames, ok) = fakeDecode(bytes, nFrames)
          val hist = new Array[Long](16)
          var sum = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            hist(b >> 4) += 1
            sum += b
            i += 1
          }
          AssetFeatures(
            asset_id = id,
            n_bytes = bytes.length.toLong,
            byte_mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
            byte_hist = hist,
            frames_sampled = frames.length,
            decode_ok = ok)
        }
      }
  }
}
