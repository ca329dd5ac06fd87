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

  test("audio features: REAL WAV/PCM decode (duration, rms, zcr), garbage -> null") {
    import spark.implicits._
    val rows = (0L until 8L).map(i => (i, ImageOps.syntheticWav(i, millis = 200, sampleRate = 8000))) :+
      (99L, Array[Byte](1, 2, 3, 4)) // undecodable payload
    val df = rows.toDF("id", "bytes")
    val out = ImageOps.withAudioFeatures(df).select("id", "audio_features").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
    assert(out(99L) == null) // violation semantics, no exception
    val f0 = out(0L)
    assert(f0.getLong(0) == 200L)  // duration_ms
    assert(f0.getInt(1) == 8000)   // sample_rate
    assert(f0.getInt(2) == 1)      // channels
    // a 200 Hz sine at 8 kHz crosses zero ~2*200 times/sec -> zcr ~0.05
    assert(math.abs(f0.getFloat(4) - 0.05f) < 0.005f)
    // rms of a sine with amplitude a is a/sqrt(2); id=0 -> a=0.5
    assert(math.abs(f0.getFloat(3) - 0.5f / math.sqrt(2).toFloat) < 0.01f)
    // deterministic across runs
    val again = ImageOps.withAudioFeatures(df).select("id", "audio_features").collect()
    assert(again.map(_.toString).sorted.toSeq == ImageOps.withAudioFeatures(df)
      .select("id", "audio_features").collect().map(_.toString).sorted.toSeq)
  }

  test("video frame-sample stub: n frames per row, deterministic offsets") {
    val imgs = SyntheticImages.generateWithId(spark, 5)
    val frames = ImageOps.sampleFramesStub(imgs, 4)
    assert(frames.count() == 20)
    val idx = frames.groupBy("frame_idx").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(idx == Map(0 -> 5, 1 -> 5, 2 -> 5, 3 -> 5))
  }
}
