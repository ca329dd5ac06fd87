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

  test("audio: syntheticWavBlock features are EXACTLY the closed form (the q72 oracle's arithmetic)") {
    for (id <- Seq(0L, 3L, 37L, 99L, 123L)) {
      val f = ImageOps.audioFeatureKernel(ImageOps.syntheticWavBlock(id))
      val a = 1000 + (id % 100) * 300
      val b = 1 + id % 4
      assert(f.duration_ms == 150L && f.sample_rate == 8000 && f.channels == 1)
      // rms and peak are exact: every |sample| = A, perfect-square sqrt,
      // power-of-two divide — bit-for-bit equality, no tolerance
      assert(f.rms == (a / 32768.0).toFloat, s"id=$id rms")
      assert(f.peak == (a / 32768.0).toFloat, s"id=$id peak")
      assert(math.round(f.zero_crossing_rate.toDouble * 1199) == 1200 / b - 1, s"id=$id crossings")
    }
  }

  test("video: MJPEG demux splits exactly the encoded frame boundaries") {
    val payload = ImageOps.syntheticMjpeg(7L, frames = 10)
    val ranges = ImageOps.splitJpegFrames(payload)
    assert(ranges.length == 10)
    assert(ranges.head._1 == 0)
    // contiguous, exhaustive cover of the payload
    assert(ranges.sliding(2).forall { case Seq((o1, l1), (o2, _)) => o1 + l1 == o2; case _ => true })
    assert(ranges.last._1 + ranges.last._2 == payload.length)
    // each range is independently decodable at the synthetic dims
    val (off, len) = ranges(3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload, off, len))
    assert(img.getWidth == 64 && img.getHeight == 48)
  }

  test("video: sampled frames are decoded (dims + luma), evenly spaced, deterministic") {
    import spark.implicits._
    val df = Seq((0L, ImageOps.syntheticMjpeg(0L, 12)), (1L, ImageOps.syntheticMjpeg(1L, 12)))
      .toDF("id", "bytes")
    val frames = ImageOps.sampleFrames(df, 4)
    assert(frames.count() == 8) // 4 per video
    val rows = frames.select("id", "frame_idx", "frame_w", "frame_h", "frame_mean_luma")
      .orderBy("id", "frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9, 0, 3, 6, 9)) // i*12/4
    assert(rows.forall(r => r.getInt(2) == 64 && r.getInt(3) == 48))
    assert(rows.forall(r => r.getFloat(4) > 0f && r.getFloat(4) < 1f))
    // frame patterns vary per frame → sampled lumas differ within one video
    assert(rows.take(4).map(_.getFloat(4)).distinct.length > 1)
    // deterministic across runs
    assert(ImageOps.sampleFrames(df, 4).select("id", "frame_idx", "frame_w", "frame_h", "frame_mean_luma")
      .orderBy("id", "frame_idx").collect().toSeq == rows.toSeq)
  }

  test("video: undecodable payload yields zero frames (violation semantics)") {
    import spark.implicits._
    val df = Seq((0L, Array[Byte](1, 2, 3)), (1L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes")
    assert(ImageOps.sampleFrames(df, 4).count() == 0)
    // fewer frames than requested: every frame returned once
    val short = Seq((9L, ImageOps.syntheticMjpeg(9L, 2))).toDF("id", "bytes")
    assert(ImageOps.sampleFrames(short, 5).count() == 2)
  }

  test("aspectBucket: exact integer argmin, ladder ties to earlier entry, null/zero dims excluded") {
    import spark.implicits._
    val dims = Seq(
      (1L, 512, 512),   // exactly 1:1
      (2L, 1024, 768),  // exactly 4:3
      (3L, 768, 1024),  // exactly 3:4
      (4L, 1920, 1080), // exactly 16:9
      (5L, 1080, 1920), // exactly 9:16
      (6L, 1500, 1000), // exactly 3:2
      (7L, 35, 24),     // between 4:3 (1.333) and 3:2 (1.5): 1.458 -> 3:2
      (8L, 34, 24),     // 1.4167: |1.4167-1.3333|=.0833 vs |1.5-1.4167|=.0833 — TIE,
                        // exact integers: 34*3-24*4=6, m=48 -> 288; 34*2-24*3=-4, m=72 -> 288
                        // earlier ladder entry (4:3) wins
      (9L, 0, 100), (10L, 100, 0)
    ).toDF("id", "w", "h")
    val withNull = dims.union(
      Seq((11L, null.asInstanceOf[Integer], Integer.valueOf(5))).toDF("id", "w", "h"))
    val got = withNull
      .filter(col("w").isNotNull && col("h").isNotNull && col("w") > 0 && col("h") > 0)
      .select(col("id"), ImageOps.aspectBucket(col("w"), col("h")).as("b"))
      .select(col("id"), col("b.bucket_w"), col("b.bucket_h"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    assert(got == Map(1L -> (1, 1), 2L -> (4, 3), 3L -> (3, 4), 4L -> (16, 9),
      5L -> (9, 16), 6L -> (3, 2), 7L -> (3, 2), 8L -> (4, 3)))
    // counts wrapper filters nulls/zeros itself and aggregates
    val counts = ImageOps.aspectBucketCounts(withNull, col("w"), col("h"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(counts.values.sum == 8 && counts((3, 2)) == 2 && counts((4, 3)) == 2)
  }
}
