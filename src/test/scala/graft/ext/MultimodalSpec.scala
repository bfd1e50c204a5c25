package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  /** Synthesize a real PNG in memory: solid color + one distinct row. */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("binary asset plumbing: schema, metadata, batch feature extraction") {
    val docs = graft.Tables.load(spark, sf0001, "documents").limit(50)
    val assets = Multimodal.withBinaryAsset(docs, "doc_id", "text")
    // schema contract: opaque binary + typed metadata struct
    assert(assets.schema("asset").dataType.typeName == "binary")
    assert(assets.schema("meta").dataType.typeName == "struct")

    val feats = Multimodal.extractFeatures(assets, nFrames = 4)
    val rows = feats.collect()
    assert(rows.length == 50)
    // text payloads are NOT images: decode honestly fails, byte-level
    // fallback features still come out deterministic
    assert(rows.forall(f => !f.decode_ok && f.width.isEmpty && f.pix_mean.isEmpty))
    assert(rows.forall(f => f.byte_hist.sum == f.n_bytes)) // histogram covers every byte
    assert(rows.forall(f => f.frames_sampled > 0 && f.frames_sampled <= 4))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(assets, nFrames = 4).collect()
    assert(rows.map(f => (f.asset_id, f.byte_mean)).toSet ==
      again.map(f => (f.asset_id, f.byte_mean)).toSet)
  }

  test("real PNG decode: width/height/pixel stats via javax.imageio") {
    // 8×6 mid-gray (0x808080) and 16×4 white — known dimensions and
    // luminance; runs through the same mapPartitions batch path
    val assets = Seq(
      (1L, pngBytes(8, 6, 0x808080)),
      (2L, pngBytes(16, 4, 0xffffff))).toDF("asset_id", "asset")
    val f = Multimodal.extractFeatures(assets, nFrames = 4).collect()
      .map(r => r.asset_id -> r).toMap
    assert(f(1L).decode_ok && f(2L).decode_ok)
    assert(f(1L).width.contains(8) && f(1L).height.contains(6))
    assert(f(2L).width.contains(16) && f(2L).height.contains(4))
    // solid-color images: sampled-row luminance mean is exact
    assert(math.abs(f(1L).pix_mean.get - 128.0) < 1e-9)
    assert(math.abs(f(2L).pix_mean.get - 255.0) < 1e-9)
    // nFrames=4 scanline samples, bounded by image height
    assert(f(1L).frames_sampled == 4 && f(2L).frames_sampled == 4)
  }

  test("mixed partition: images and non-images coexist in one batch") {
    val assets = Seq(
      (1L, pngBytes(4, 4, 0x000000)),
      (2L, "just some text bytes".getBytes("UTF-8"))).toDF("asset_id", "asset")
    val f = Multimodal.extractFeatures(assets).collect().map(r => r.asset_id -> r).toMap
    assert(f(1L).decode_ok && f(1L).pix_mean.contains(0.0))
    assert(!f(2L).decode_ok && f(2L).width.isEmpty)
    assert(f(2L).n_bytes == 20L)
  }

  test("binaryFile source feeds the extraction pipeline (real file ingest)") {
    // land some files, read them back as binary blobs — the ingest path
    // a real image/audio corpus takes into the same extractFeatures
    val dir = java.nio.file.Files.createTempDirectory("graft_blobs")
    (1 to 3).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"asset_$i.bin"),
        Array.fill[Byte](100 * i)((i % 127).toByte))
    }
    val blobs = spark.read.format("binaryFile").load(dir.toString)
      .select(
        org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("path"))).as("asset_id"),
        org.apache.spark.sql.functions.col("content").as("asset"))
    val feats = Multimodal.extractFeatures(blobs).collect()
    assert(feats.length == 3)
    assert(feats.forall(f => !f.decode_ok)) // raw byte runs are not images
    assert(feats.map(_.n_bytes).sorted.toSeq == Seq(100L, 200L, 300L))
  }

  test("empty payload: decode_ok=false, zeroed features (no crash)") {
    val df = Seq((1L, "")).toDF("id", "payload")
    val f = Multimodal.extractFeatures(Multimodal.withBinaryAsset(df, "id", "payload")).head()
    assert(!f.decode_ok && f.n_bytes == 0L && f.byte_mean == 0.0)
  }

  /** Minimal valid RIFF/WAVE PCM16 payload built from first principles. */
  private def wavBytes(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("WAV PCM16 decode: header fields, duration, RMS and peak exact") {
    // 8 kHz mono, 0.5 s square wave at half full scale: rms = peak = 0.5
    val square = Array.tabulate[Short](4000)(i => if (i % 2 == 0) 16384 else -16384)
    val silent = Array.fill[Short](800)(0) // 0.1 s of silence
    val df = Seq(
      (1L, wavBytes(8000, 1, square)),
      (2L, wavBytes(8000, 1, silent)),
      (3L, "not audio at all".getBytes("UTF-8"))).toDF("asset_id", "asset")
    val f = Multimodal.extractAudioFeatures(df).collect().map(a => a.asset_id -> a).toMap
    val w1 = f(1L)
    assert(w1.decode_ok && w1.sample_rate.contains(8000) && w1.channels.contains(1))
    assert(w1.bits.contains(16) && w1.n_frames.contains(4000L))
    assert(w1.duration_s.contains(0.5))
    assert(w1.rms.contains(0.5) && w1.peak.contains(0.5))
    val w2 = f(2L)
    assert(w2.decode_ok && w2.rms.contains(0.0) && w2.peak.contains(0.0))
    assert(w2.duration_s.contains(0.1))
    assert(!f(3L).decode_ok && f(3L).sample_rate.isEmpty)
  }

  test("WAV decode: stereo frame accounting and truncated/corrupt payload safety") {
    // 4 kHz stereo, 100 interleaved sample pairs → 100 frames, 0.025 s
    val stereo = Array.tabulate[Short](200)(i => (i * 50).toShort)
    val ok = Multimodal.decodeWav(wavBytes(4000, 2, stereo)).get
    assert(ok.channels == 2 && ok.nFrames == 100L && ok.durationS == 0.025)
    // corrupt: declared chunk size overruns the payload → None, no throw
    val truncated = wavBytes(8000, 1, Array.fill[Short](100)(5)).dropRight(50)
    assert(Multimodal.decodeWav(truncated).isEmpty)
    assert(Multimodal.decodeWav(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }
}
