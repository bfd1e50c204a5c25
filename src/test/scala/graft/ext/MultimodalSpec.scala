package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("binary asset plumbing: schema, metadata, batch feature extraction") {
    val docs = graft.Tables.load(spark, sf0001, "documents").limit(50)
    val assets = Multimodal.withBinaryAsset(docs, "doc_id", "text")
    // schema contract: opaque binary + typed metadata struct
    assert(assets.schema("asset").dataType.typeName == "binary")
    assert(assets.schema("meta").dataType.typeName == "struct")

    val feats = Multimodal.extractFeatures(assets, nFrames = 4)
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.decode_ok))
    assert(rows.forall(f => f.byte_hist.sum == f.n_bytes)) // histogram covers every byte
    assert(rows.forall(f => f.frames_sampled > 0 && f.frames_sampled <= 4))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(assets, nFrames = 4).collect()
    assert(rows.map(f => (f.asset_id, f.byte_mean)).toSet ==
      again.map(f => (f.asset_id, f.byte_mean)).toSet)
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
    assert(feats.forall(_.decode_ok))
    assert(feats.map(_.n_bytes).sorted.toSeq == Seq(100L, 200L, 300L))
  }

  test("empty payload: decode_ok=false, zeroed features (no crash)") {
    val df = Seq((1L, "")).toDF("id", "payload")
    val f = Multimodal.extractFeatures(Multimodal.withBinaryAsset(df, "id", "payload")).head()
    assert(!f.decode_ok && f.n_bytes == 0L && f.byte_mean == 0.0)
  }
}
