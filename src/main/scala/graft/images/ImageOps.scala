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
  * (JDK ImageIO + Java2D). Audio is REAL for WAV/PCM (JDK
  * javax.sound.sampled). Video decode alone is STUBBED with a clearly-marked
  * deterministic fake: no video codec ships in this container; swap the
  * kernel for a real demuxer (e.g. javacv) without touching the plumbing.
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
  // Audio: REAL for WAV/PCM (JDK javax.sound.sampled — no external codec).
  // Compressed formats (mp3/ogg) would need a codec jar; the WAV path is
  // the real kernel, the same plumbing carries any decoder.
  // --------------------------------------------------------------------

  final case class AudioFeatures(
      duration_ms: Long,
      sample_rate: Int,
      channels: Int,
      rms: Float,
      zero_crossing_rate: Float,
      peak: Float
  )

  /** REAL audio decode+features for WAV/PCM payloads: parse with
    * javax.sound.sampled, decode to 16-bit samples, compute duration, RMS
    * loudness, zero-crossing rate, and peak amplitude. Returns null for
    * undecodable payloads (violation semantics, like image decode). */
  def audioFeatureKernel(bytes: Array[Byte]): AudioFeatures = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (frames <= 0 || fmt.getSampleSizeInBits != 16) return null
        val data = in.readAllBytes()
        val be = fmt.isBigEndian
        val n = data.length / 2
        var i = 0
        var sumSq = 0.0
        var crossings = 0L
        var prevNeg = false
        var peak = 0
        while (i < n) {
          val lo = data(2 * i + (if (be) 1 else 0)) & 0xff
          val hi = data(2 * i + (if (be) 0 else 1))
          val s = (hi << 8) | lo
          sumSq += s.toDouble * s
          val neg = s < 0
          if (i > 0 && neg != prevNeg) crossings += 1
          prevNeg = neg
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 1
        }
        AudioFeatures(
          duration_ms = (frames * 1000L / fmt.getFrameRate.toLong),
          sample_rate = fmt.getSampleRate.toInt,
          channels = fmt.getChannels,
          rms = (math.sqrt(sumSq / math.max(n, 1)) / 32768.0).toFloat,
          zero_crossing_rate = if (n > 1) crossings.toFloat / (n - 1) else 0f,
          peak = peak / 32768.0f
        )
      } finally in.close()
    } catch { case _: Exception => null }
  }

  private val audioUdf = udf((b: Array[Byte]) => Option(audioFeatureKernel(b)))

  /** Add an `audio_features` struct column (real WAV/PCM decode). */
  def withAudioFeatures(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("audio_features", audioUdf(col(bytesCol)))

  /** Deterministic 16-bit mono WAV payload (sine mix), for tests/benches —
    * the audio analogue of SyntheticImages. */
  def syntheticWav(id: Long, millis: Int = 200, sampleRate: Int = 8000): Array[Byte] = {
    val n = sampleRate * millis / 1000
    val freq = 200.0 + (id % 20) * 50.0
    val samples = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val amp = 0.5 + 0.3 * math.sin(id.toDouble) // deterministic per id
      val v = (math.sin(2 * math.Pi * freq * i / sampleRate) * amp * 32767).toInt
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(new ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
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
