package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * BINARY columns with a typed metadata struct, and run batch feature
  * extraction with `Dataset.mapPartitions` (the Scala/JVM equivalent of a
  * PySpark mapInPandas batch UDF: one iterator per partition, amortized
  * per-batch setup, no per-row driver involvement).
  *
  * Image payloads are decoded FOR REAL with the JDK's `javax.imageio`
  * (PNG/JPEG/GIF/BMP — no extra dependency): width/height, a
  * deterministic scanline sample, and a luminance mean come out of the
  * decoded pixels. Non-image bytes (audio/video codecs are not in the
  * JDK) fall back to deterministic byte-level features with
  * decode_ok=false — the plumbing (schema, partitioning, batch iterator
  * shape) is identical either way, and swapping in an audio/video codec
  * is a local change inside [[decode]].
  */
object Multimodal {

  /** Typed feature row produced per asset. Image-only fields are None
    * when the payload did not decode as an image.
    */
  final case class AssetFeatures(
      asset_id: Long,
      n_bytes: Long,
      byte_mean: Double,
      byte_hist: Array[Long], // 16-bucket histogram of byte values
      frames_sampled: Int,
      decode_ok: Boolean,
      width: Option[Int],
      height: Option[Int],
      pix_mean: Option[Double]) // mean luminance over the sampled rows

  /** Fixture adapter: manufacture a binary "asset" column from text (the
    * fixtures ship no real media; the engine only sees bytes either
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

  private[ext] final case class Decoded(
      framesSampled: Int, ok: Boolean,
      width: Option[Int], height: Option[Int], pixMean: Option[Double])

  /** Decode one payload. Image bytes (anything `ImageIO` has a reader
    * for) are fully decoded; `nFrames` evenly-spaced scanlines are
    * sampled and their pixels averaged as luminance ((r+g+b)/3) — the
    * "frame-sample then featurize" shape a video pipeline uses, applied
    * to rows of a still. Non-image bytes take the deterministic
    * byte-stride fallback (frames = byte slices, no pixel stats).
    */
  private[ext] def decode(bytes: Array[Byte], nFrames: Int): Decoded = {
    if (bytes.isEmpty) return Decoded(0, ok = false, None, None, None)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img != null && img.getWidth > 0 && img.getHeight > 0) {
      val (w, h) = (img.getWidth, img.getHeight)
      val rows = math.min(nFrames, h)
      val rowStride = math.max(1, h / rows)
      var lumSum = 0.0
      var nPix = 0L
      var sampled = 0
      var y = 0
      while (y < h && sampled < rows) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          lumSum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
          nPix += 1
          x += 1
        }
        sampled += 1
        y += rowStride
      }
      Decoded(sampled, ok = true, Some(w), Some(h),
        Some(if (nPix == 0) 0.0 else lumSum / nPix))
    } else {
      // not an image: deterministic byte-stride pseudo-frames
      val stride = math.max(1, bytes.length / nFrames)
      val frames = (0 until math.min(nFrames, bytes.length))
        .count(i => i * stride < bytes.length)
      Decoded(frames, ok = false, None, None, None)
    }
  }

  /** Typed feature row per AUDIO asset. Populated fields require a valid
    * RIFF/WAVE PCM payload; anything else yields decode_ok=false with
    * byte-level stats only.
    */
  final case class AudioFeatures(
      asset_id: Long,
      n_bytes: Long,
      decode_ok: Boolean,
      sample_rate: Option[Int],
      channels: Option[Int],
      bits: Option[Int],
      n_frames: Option[Long], // samples per channel
      duration_s: Option[Double],
      rms: Option[Double], // full-scale-normalized RMS over all samples
      peak: Option[Double])

  private[ext] final case class Wav(
      sampleRate: Int, channels: Int, bits: Int,
      nFrames: Long, durationS: Double, rms: Double, peak: Double)

  /** Parse a RIFF/WAVE payload (the container format is public and
    * fixed-layout; no codec library needed for PCM16). Walks the chunk
    * list for `fmt ` and `data`, then computes RMS/peak over the PCM16
    * samples — the audio twin of [[decode]]'s scanline sampling.
    * Compressed codecs (mp3/aac/opus) are NOT decoded — they return None
    * here and keep byte-level features, exactly like non-image blobs on
    * the image path; swapping a codec in is a local change.
    */
  private[ext] def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 44) return None
    def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
    if (ascii(0) != "RIFF" || ascii(8) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // audioFormat, channels, rate, bits
    var data: Option[(Int, Int)] = None // offset, size
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = ascii(off)
      val size = bb.getInt(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16)
        fmt = Some((bb.getShort(off + 8) & 0xffff, bb.getShort(off + 10) & 0xffff,
          bb.getInt(off + 12), bb.getShort(off + 22) & 0xffff))
      else if (id == "data") data = Some((off + 8, size))
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, ch, rate, 16)), Some((dOff, dSize)))
          if ch > 0 && rate > 0 && dSize >= 2 =>
        val nSamples = dSize / 2
        var sumSq = 0.0
        var pk = 0.0
        var i = 0
        while (i < nSamples) {
          val s = bb.getShort(dOff + 2 * i) / 32768.0
          sumSq += s * s
          if (math.abs(s) > pk) pk = math.abs(s)
          i += 1
        }
        val nFrames = nSamples.toLong / ch
        Some(Wav(rate, ch, 16, nFrames, nFrames.toDouble / rate,
          math.sqrt(sumSq / nSamples), pk))
      case _ => None
    }
  }

  /** Batch audio feature extraction — same partition-iterator shape as
    * [[extractFeatures]]; one streaming pass per partition, no shuffle.
    */
  def extractAudioFeatures(assets: DataFrame): Dataset[AudioFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("asset_id"), col("asset"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeWav(bytes) match {
            case Some(w) => AudioFeatures(id, bytes.length.toLong, decode_ok = true,
              Some(w.sampleRate), Some(w.channels), Some(w.bits), Some(w.nFrames),
              Some(w.durationS), Some(w.rms), Some(w.peak))
            case None => AudioFeatures(id, bytes.length.toLong, decode_ok = false,
              None, None, None, None, None, None, None)
          }
        }
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
        // per-partition setup: ImageIO plugin scan happens once per JVM;
        // disable its disk cache so decode stays in-memory per task
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val d = decode(bytes, nFrames)
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
            frames_sampled = d.framesSampled,
            decode_ok = d.ok,
            width = d.width,
            height = d.height,
            pix_mean = d.pixMean)
        }
      }
  }
}
