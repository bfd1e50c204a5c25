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
}
