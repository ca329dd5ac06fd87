package graft.images

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column transforms for training-data pipelines: image decode /
  * resize / feature-extract, audio feature extraction, video frame sampling.
  *
  * The Spark-side plumbing — schema, partitioning, per-row kernel shape,
  * violation-friendly null handling — is real and tested. Image ops are REAL
  * (JDK ImageIO + Java2D). Audio/video decode is STUBBED with a
  * clearly-marked deterministic fake: this container ships no audio/video
  * codecs; swap `AudioStub`/`VideoStub` kernels for real decoders (e.g.
  * javacv) without touching the DataFrame plumbing.
  */
object ImageOps {

  /** Bilinear resize + re-encode. Returns null on decode failure (violation
    * rows surface via ImageChecks, not exceptions). */
  def resizeKernel(bytes: Array[Byte], fmt: String, w: Int, h: Int): Array[Byte] = {
    val d = ImageChecks.decode(bytes)
    if (!d.ok) return null
    val src = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    if (src == null) return null
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.setRenderingHint(
      java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR
    )
    g.drawImage(src, 0, 0, w, h, null)
    g.dispose()
    SyntheticImages.encode(dst, if (fmt == "jpeg") "jpeg" else "png")
  }

  /** 64-dim image feature vector: 8×8 grayscale block means, normalised to
    * [0,1] — a real, deterministic embedding usable by the ANN operators. */
  def featureKernel(bytes: Array[Byte]): Array[Float] = {
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val bw = math.max(img.getWidth / 8, 1)
    val bh = math.max(img.getHeight / 8, 1)
    val out = new Array[Float](64)
    var i = 0
    while (i < 64) {
      val bx = (i % 8) * bw; val by = (i / 8) * bh
      var sum = 0.0; var n = 0
      var y = by
      while (y < math.min(by + bh, img.getHeight)) {
        var x = bx
        while (x < math.min(bx + bw, img.getWidth)) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          n += 1; x += 1
        }
        y += 1
      }
      out(i) = if (n > 0) (sum / n / 255.0).toFloat else 0f
      i += 1
    }
    out
  }

  private val resizeUdf = udf((b: Array[Byte], fmt: String, w: Int, h: Int) => resizeKernel(b, fmt, w, h))
  private val featureUdf = udf((b: Array[Byte]) => featureKernel(b))

  /** Resize the `bytes` column to (w, h); updates bytes/w/h in place,
    * preserving the input-table shape. Decode failures → null bytes. */
  def resizeTable(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("bytes", resizeUdf(col("bytes"), col("fmt"), lit(w), lit(h)))
      .withColumn("w", lit(w))
      .withColumn("h", lit(h))

  /** Add a 64-dim `embedding` column extracted from image bytes. */
  def withImageEmbedding(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("embedding", featureUdf(col(bytesCol)))

  // --------------------------------------------------------------------
  // STUBBED modalities — deterministic fakes, real plumbing.
  // --------------------------------------------------------------------

  /** STUB: audio feature extraction. A real implementation decodes PCM and
    * computes e.g. MFCC frames; no audio codec ships in this container, so
    * the kernel derives a deterministic pseudo-spectrum from the payload
    * bytes. Output schema (duration_ms, sample_rate, features[16]) is the
    * real contract. */
  def audioFeaturesStub(df: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val u = udf { (b: Array[Byte]) =>
      if (b == null || b.isEmpty) null
      else {
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < b.length) { h = (h ^ b(i)) * 0x100000001b3L; i += 1 }
        val feats = Array.tabulate(16) { k =>
          val z = h ^ (k.toLong * 0x9e3779b97f4a7c15L)
          ((z >>> 11).toDouble / (1L << 53).toDouble).toFloat
        }
        (b.length.toLong * 8 / 256, 16000, feats) // fake duration @ fake bitrate
      }
    }
    df.withColumn("audio_features", u(col(bytesCol)))
  }

  /** STUB: video frame sampling. A real implementation demuxes and decodes
    * n evenly-spaced frames; here each "frame" is a deterministic slice
    * descriptor (frame_idx, byte_offset, frame_hash). The explode/partition
    * shape matches the real operator. */
  def sampleFramesStub(df: DataFrame, n: Int, bytesCol: String = "bytes"): DataFrame = {
    val u = udf { (b: Array[Byte]) =>
      if (b == null || b.isEmpty) Seq.empty[(Int, Long, Long)]
      else
        (0 until n).map { i =>
          val off = (b.length.toLong * i) / n
          var h = 0xcbf29ce484222325L ^ off
          val end = math.min(off + 64, b.length.toLong).toInt
          var j = off.toInt
          while (j < end) { h = (h ^ b(j)) * 0x100000001b3L; j += 1 }
          (i, off, h)
        }
    }
    df.withColumn("_frames", u(col(bytesCol)))
      .withColumn("frame", explode(col("_frames")))
      .drop("_frames")
      .withColumn("frame_idx", col("frame._1"))
      .withColumn("frame_offset", col("frame._2"))
      .withColumn("frame_hash", col("frame._3"))
      .drop("frame")
  }
}
