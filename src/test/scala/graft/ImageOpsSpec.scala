package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.images.{ImageChecks, ImageOps, SyntheticImages}

/** Multimodal transforms: real image resize/feature-extract, stubbed
  * audio/video kernels with real plumbing. */
class ImageOpsSpec extends SparkSpec {

  test("resize: output decodes at the target dimensions, garbage bytes -> null") {
    val imgs = SyntheticImages.generateWithId(spark, 50)
    val resized = ImageOps.resizeTable(imgs, 16, 16)
    val rows = resized.select("bytes", "w", "h").collect()
    assert(rows.forall(_.getInt(1) == 16))
    val decodable = rows.filter(!_.isNullAt(0)).map(r => ImageChecks.decode(r.getAs[Array[Byte]](0)))
    assert(decodable.nonEmpty && decodable.forall(d => d.ok && d.w == 16 && d.h == 16))
    // undecodable bytes resize to null, not an exception
    assert(ImageOps.resizeKernel(Array[Byte](1, 2, 3), "png", 16, 16) == null)
  }

  test("image feature vectors: 64-dim, deterministic, identical images collide, usable by ANN") {
    val imgs = SyntheticImages.generateWithId(spark, 60).filter(col("row_id") =!= 8)
    val withEmb = ImageOps.withImageEmbedding(imgs)
    val rows = withEmb.select("row_id", "embedding").collect()
    assert(rows.forall(r => !r.isNullAt(1) && r.getSeq[Float](1).size == 64))
    // ANN over the extracted features: an image's nearest neighbor (itself
    // excluded) has high cosine for a re-render of the same pattern
    val q = ImageOps.featureKernel(
      SyntheticImages.encode(SyntheticImages.renderPattern(3L, 24 + 3 * 8, 24), "png")
    ).map(_.toDouble).toSeq
    val top = Ann.bruteForceTopK(withEmb, col("embedding"), col("row_id"), q, 1).head()
    assert(top.getLong(0) == 4L) // row_id = id+1; id=3 renders that exact pattern
    assert(top.getDouble(1) > 0.999)
  }

  test("audio stub: deterministic features with the real output contract") {
    val imgs = SyntheticImages.generateWithId(spark, 10)
    val a1 = ImageOps.audioFeaturesStub(imgs).select("row_id", "audio_features").collect()
    val a2 = ImageOps.audioFeaturesStub(imgs).select("row_id", "audio_features").collect()
    assert(a1.map(_.toString).toSeq == a2.map(_.toString).toSeq)
    val feats = a1.head.getStruct(1)
    assert(feats.getSeq[Float](2).size == 16)
  }

  test("video frame-sample stub: n frames per row, deterministic offsets") {
    val imgs = SyntheticImages.generateWithId(spark, 5)
    val frames = ImageOps.sampleFramesStub(imgs, 4)
    assert(frames.count() == 20)
    val idx = frames.groupBy("frame_idx").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(idx == Map(0 -> 5, 1 -> 5, 2 -> 5, 3 -> 5))
  }
}
