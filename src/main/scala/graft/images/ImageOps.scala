package graft.images

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column transforms for training-data pipelines: image decode /
  * resize / feature-extract, audio feature extraction, video frame sampling.
  *
  * The Spark-side plumbing — schema, partitioning, per-row kernel shape,
  * violation-friendly null handling — is real and tested, and so are the
  * kernels: image ops via JDK ImageIO + Java2D, audio via JDK
  * javax.sound.sampled (WAV/PCM), video via an MJPEG segment-walking demux
  * + ImageIO frame decode. Inter-frame codecs (H.264/VP9) need an external
  * decoder jar the container doesn't ship; the demux/sample/explode plumbing
  * carries any decoder unchanged.
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

  /** Deterministic square-wave WAV whose features are CLOSED-FORM integer
    * arithmetic in `id` — the audio fixture a SQL oracle can restate
    * exactly (the q32 injection-arithmetic technique):
    *  - amplitude A = 1000 + (id%100)*300 (≤ 30700 < 2^15), samples
    *    alternate +A / −A in blocks of b = 1 + id%4;
    *  - rms = peak = A/32768 EXACTLY (every |sample| = A; n·A² < 2^53 so
    *    the mean is exact, sqrt of a perfect square is exact, /2^15 is
    *    exact in float and double);
    *  - zero crossings = n/b − 1 (n divisible by every b ∈ 1..4);
    *  - duration_ms = n·1000/sampleRate, an integer by construction. */
  def syntheticWavBlock(id: Long, n: Int = 1200, sampleRate: Int = 8000): Array[Byte] = {
    val a = (1000 + (id % 100) * 300).toInt
    val b = (1 + id % 4).toInt
    val samples = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = if ((i / b) % 2 == 0) a else -a
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

  // --------------------------------------------------------------------
  // Video: REAL for MJPEG-style streams (concatenated JPEG frames) — the
  // demux walks the JPEG segment structure (no codec needed; baseline JPEG
  // decode is JDK ImageIO). Inter-frame codecs (H.264/VP9) would need an
  // external decoder jar; the demux→sample→decode→explode plumbing here is
  // the operator, and it carries any decoder unchanged.
  // --------------------------------------------------------------------

  /** Byte ranges of each JPEG frame in a concatenated-JPEG stream, found by
    * walking the segment structure (marker + length; entropy-coded scan data
    * ends at a non-stuffed, non-restart marker). Returns empty on anything
    * that is not a clean JPEG stream (violation semantics, not exceptions). */
  private[graft] def splitJpegFrames(b: Array[Byte]): IndexedSeq[(Int, Int)] = {
    if (b == null || b.length < 4) return IndexedSeq.empty
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var p = 0
    while (p + 1 < b.length) {
      if ((b(p) & 0xff) != 0xff || (b(p + 1) & 0xff) != 0xd8) return IndexedSeq.empty
      val start = p
      p += 2
      var done = false
      while (!done) {
        if (p + 1 >= b.length) return IndexedSeq.empty // truncated frame
        if ((b(p) & 0xff) != 0xff) return IndexedSeq.empty
        while (p + 2 < b.length && (b(p + 1) & 0xff) == 0xff) p += 1 // FF fill bytes
        val marker = b(p + 1) & 0xff
        p += 2
        marker match {
          case 0xd9 => // EOI
            out += ((start, p - start)); done = true
          case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
            () // standalone marker, no payload
          case 0xda => // SOS: skip header, then entropy data until real marker
            if (p + 1 >= b.length) return IndexedSeq.empty
            val len = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
            p += len
            var inScan = true
            while (inScan) {
              if (p + 1 >= b.length) return IndexedSeq.empty
              if ((b(p) & 0xff) == 0xff) {
                val m = b(p + 1) & 0xff
                if (m == 0x00 || (m >= 0xd0 && m <= 0xd7)) p += 2 // stuffing / restart
                else inScan = false // next segment marker (incl. EOI)
              } else p += 1
            }
          case _ => // framed segment with 2-byte big-endian length
            if (p + 1 >= b.length) return IndexedSeq.empty
            val len = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
            if (len < 2) return IndexedSeq.empty
            p += len
        }
      }
    }
    out.result()
  }

  final case class VideoFrame(
      frame_idx: Int,
      frame_offset: Long,
      width: Int,
      height: Int,
      mean_luma: Float
  )

  /** Demux + decode + sample: n evenly-spaced frames per video payload,
    * each decoded (ImageIO) to (dims, mean luma). Undecodable payloads →
    * zero frames. */
  def sampleFramesKernel(bytes: Array[Byte], n: Int): Seq[VideoFrame] = {
    val frames = splitJpegFrames(bytes)
    if (frames.isEmpty || n <= 0) return Seq.empty
    val picks =
      if (frames.length <= n) frames.indices
      else (0 until n).map(i => i * frames.length / n)
    picks.flatMap { fi =>
      val (off, len) = frames(fi)
      val img =
        try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes, off, len))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        var sum = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some(VideoFrame(fi, off.toLong, img.getWidth, img.getHeight,
          (sum / (img.getWidth.toLong * img.getHeight) / 255.0).toFloat))
      }
    }
  }

  private val framesUdf = udf((b: Array[Byte], n: Int) => sampleFramesKernel(b, n))

  /** Explode a video `bytes` column into n sampled, DECODED frames per row
    * (frame_idx, frame_offset, width, height, mean_luma). Real MJPEG demux +
    * JPEG decode; rows with undecodable payloads disappear (filter the
    * zero-frame case upstream for violation reporting). */
  def sampleFrames(df: DataFrame, n: Int, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("frame", explode(framesUdf(col(bytesCol), lit(n))))
      .withColumn("frame_idx", col("frame.frame_idx"))
      .withColumn("frame_offset", col("frame.frame_offset"))
      .withColumn("frame_w", col("frame.width"))
      .withColumn("frame_h", col("frame.height"))
      .withColumn("frame_mean_luma", col("frame.mean_luma"))
      .drop("frame")

  /** Deterministic MJPEG payload: `frames` JPEG-encoded gradient frames
    * (pattern varies per frame → per-frame luma differs), concatenated.
    * The video analogue of SyntheticImages/syntheticWav. */
  def syntheticMjpeg(id: Long, frames: Int, w: Int = 64, h: Int = 48): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      bos.write(SyntheticImages.encode(SyntheticImages.renderPattern(id * 1000 + f * 7, w, h), "jpeg"))
      f += 1
    }
    bos.toByteArray
  }

  // ---------------------------------------------------------------------
  // Aspect-ratio bucketing (SDXL-style multi-aspect training batches)
  // ---------------------------------------------------------------------

  /** The default aspect-ratio bucket ladder: square, photo, portrait,
    * widescreen and their transposes — the shape of the SDXL/NovelAI
    * multi-aspect bucket lists. */
  val defaultAspectBuckets: Seq[(Int, Int)] =
    Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16), (3, 2), (2, 3))

  /** Assigns each image to the bucket whose aspect ratio is closest to
    * w/h — the batching step of multi-aspect diffusion training (images in
    * one batch must share a bucket). Distance is compared EXACTLY in
    * integers: |w/h − bw/bh| ∝ |w·bh − h·bw| / bh for fixed (w, h), so
    * multiplying each bucket's |w·bh − h·bw| by L/bh (L = lcm of the
    * bucket heights) makes the comparison a pure-long argmin — no float
    * rounding, bit-identical in any engine. Ties go to the earlier bucket
    * in the ladder. Returns a `struct(bucket_w, bucket_h)` column built
    * as `array_min` over one (metric, ladder_idx, w, h) struct per bucket
    * — struct ordering compares fields in order, so the min IS the
    * argmin with earlier-entry tie-break, and the expression tree is
    * LINEAR in the ladder (a when-chain fold that reuses its accumulator
    * twice per step doubles per entry — a 25-bucket real-world ladder
    * would blow past the codegen method limit). Per-row integer
    * arithmetic only, no UDF, no shuffle — at 10^12 images this is a
    * free rider on any metadata scan. */
  def aspectBucket(w: Column, h: Column, buckets: Seq[(Int, Int)] = defaultAspectBuckets): Column = {
    require(buckets.nonEmpty, "empty bucket ladder")
    def lcm(a: Long, b: Long): Long = a / java.math.BigInteger.valueOf(a).gcd(java.math.BigInteger.valueOf(b)).longValue() * b
    val l = buckets.map(_._2.toLong).reduce(lcm)
    def metric(b: (Int, Int)): Column =
      abs(w.cast("long") * b._2 - h.cast("long") * b._1) * lit(l / b._2)
    val entries = buckets.zipWithIndex.map { case (b, i) =>
      struct(metric(b).as("m"), lit(i).as("i"),
        lit(b._1).as("bucket_w"), lit(b._2).as("bucket_h"))
    }
    val best = array_min(array(entries: _*))
    struct(best.getField("bucket_w").as("bucket_w"),
      best.getField("bucket_h").as("bucket_h"))
  }

  /** Per-bucket population counts over an image metadata table — the
    * capacity-planning view a multi-aspect batch sampler needs (buckets
    * with fewer images than a batch get dropped or upsampled). One
    * codegen'd projection + one tiny aggregation (≤ ladder-size groups). */
  def aspectBucketCounts(df: DataFrame, w: Column, h: Column,
                         buckets: Seq[(Int, Int)] = defaultAspectBuckets): DataFrame =
    df.filter(w.isNotNull && h.isNotNull && w > 0 && h > 0)
      .select(aspectBucket(w, h, buckets).as("b"))
      .groupBy(col("b.bucket_w").as("bucket_w"), col("b.bucket_h").as("bucket_h"))
      .agg(count(lit(1)).as("cnt"))
}
