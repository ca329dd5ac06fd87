package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR at the
  * parallelism given by SPARK_GRAFT_CPUS, prints ONE JSON line.
  *
  * The same binary at two parallelism levels (SPARK_GRAFT_CPUS=8 vs 32) on
  * identical input is the sandbox proxy for the north rule's N vs 4N executor
  * scaling-efficiency criterion (see BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      // AQE's default 64MB coalesce target strangles reduce-side parallelism
      // at local data sizes; 4MB keeps all cores busy (no-op at real scale)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      // local proxy for many-block tables at scale: without this the ~10MB
      // test parquet files become ONE scan partition and nothing parallelises
      .config("spark.sql.files.maxPartitionBytes", String.valueOf(2 * 1024 * 1024))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.queries.head._2(spark, sfDir).count()
    catch { case _: Throwable => () }
    // pre-materialize EVERY cached store outside any timed region: the
    // stored image table and the LSH/IVF/kNN stores are one-time setup, not
    // workload — the r2 driver numbers paid these builds inside the first
    // sample of q32/q30/q42 (q32 read 10.7s driver vs 1.9s warm)
    try {
      graft.images.SyntheticImages.materialized(spark, SparkEntry.imageCount(sfDir))
      SparkEntry.lshStore(spark, sfDir)
      SparkEntry.ivfStore(spark, sfDir)
      SparkEntry.knnStore(spark, sfDir)
      SparkEntry.knnIvfStore(spark, sfDir)
    } catch { case _: Throwable => () }

    // min-of-N with per-sample values: the sandbox host shows one-off
    // multi-second CPU-steal stalls (observed 78s on a query whose twin ran
    // in 5s; BENCH.md documents identical jobs varying 2.6x) — the min of N
    // runs is the representative number and the samples are printed so a
    // stolen sample is visible instead of silently poisoning the round.
    val samples = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "3").toInt
    // iteration aid: SPARK_GRAFT_BENCH_ONLY=q74,q81 times just those queries
    // (comma-separated name prefixes); unset = the full driver protocol
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSeq)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      val xs = (1 to samples).map(_ => once())
      (name, xs.min, xs)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qsSamples = results
      .map { case (k, _, xs) => "\"" + k + "\":[" + xs.mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // headline throughput: validated lineitem rows/sec on the multi-check
    // single-pass query (the engine's core operation)
    val liRows =
      try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      catch { case _: Throwable => 0L }
    val mcTime = results.find(_._1 == "q14_multicheck_summary").map(_._2).getOrElse(Double.NaN)
    val rps = if (mcTime > 0) liRows / mcTime else 0.0

    // image+caption validation throughput on a STORED table (the target
    // workload): generation/encode is setup, not validation — materialize the
    // synthetic table to parquet once, then time the full validation pass
    // (decode + dims/fmt + caption + uniqueness) reading it back.
    val imgN = if (sfDir.contains("0.1")) 50000L else if (sfDir.contains("0.01")) 10000L else 2000L
    val imgPath = s"${System.getProperty("java.io.tmpdir")}/graft_bench_images_$imgN"
    if (!new java.io.File(imgPath, "_SUCCESS").exists())
      graft.images.SyntheticImages
        .generateWithId(spark, imgN)
        .write.mode("overwrite").parquet(imgPath)
    val stored = spark.read.parquet(imgPath)
    var imgViolTotal = 0L
    def imgPass(): Double = {
      val t0 = System.nanoTime()
      val imgViol = graft.images.ImageChecks
        .violations(stored, org.apache.spark.sql.functions.col("row_id"))
        .count()
      val metaViol = {
        import org.apache.spark.sql.functions.col
        graft.runner.ValidationRunner
          .plan(
            stored.drop("bytes").withColumnRenamed("row_id", "_rid"),
            graft.schema.TableSchema(
              Seq(graft.schema.Field("image_id", constraints = graft.schema.FieldConstraints(unique = true)))
            ),
            graft.runner.ValidationConfig(rowNumberCol = "_rid")
          )
          .violations
          .count()
      }
      imgViolTotal = imgViol + metaViol
      (System.nanoTime() - t0) / 1e9
    }
    val imgSamples = (1 to samples).map(_ => imgPass())
    val imgTime = imgSamples.min // min-of-N (host stalls)
    val imgRps = imgN / imgTime

    // scale throughput: a 20M-row synthetic image+caption METADATA table
    // (pure Catalyst expressions, ~1% injected violations — the north-metric
    // workload shape at a locally-feasible size) validated through the
    // engine: single-pass row checks + image_id uniqueness shuffle. This is
    // the number to compare across SPARK_GRAFT_CPUS=8 vs 32 for the N→4N
    // scaling-efficiency criterion.
    val scaleSamples = (1 to samples).map { _ =>
      scaleThroughput(spark, 20000000L, cpus.toInt)
    }
    val scaleRows = scaleSamples.head._1
    val scaleViol = scaleSamples.head._3
    val scaleSec = scaleSamples.map(_._2).min // min-of-N
    val scaleRps = scaleRows / scaleSec

    println(
      s"""{"metric":"total","value":$total,"unit":"sec","samples":$samples,"rows_per_sec_multicheck":$rps,"image_rows":$imgN,"image_validation_sec":$imgTime,"image_samples":[${imgSamples.mkString(",")}],"image_rows_per_sec":$imgRps,"image_violations":$imgViolTotal,"scale_rows":$scaleRows,"scale_sec":$scaleSec,"scale_samples":[${scaleSamples.map(_._2).mkString(",")}],"scale_rows_per_sec":$scaleRps,"scale_violations":$scaleViol,"cpus":$cpus,"queries":$qs,"queries_samples":$qsSamples,"sf":"$sfDir"}"""
    )
    spark.stop()
  }

  /** Validate an expression-generated image-metadata table of `n` rows with
    * ~1% injected violations (wrong dims, bad fmt, empty caption, duplicate
    * image_id) through the full engine. Returns (rows, seconds, violations).
    * `slices` fixes the input partitioning INDEPENDENT of thread count so
    * scaling runs compare identical plans (like a cluster: same splits, more
    * executors). */
  def scaleThroughput(
      spark: SparkSession,
      n: Long,
      cpus: Int,
      slices: Int = 64,
      withUniqueness: Boolean = true,
      uniquenessSalts: Int = 0
  ): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    import graft.runner.{ValidationConfig, ValidationRunner}
    import graft.schema.{Field, FieldConstraints, TableSchema}

    val fcU = FieldConstraints(unique = true)
    val df = spark
      .range(0, n, 1, slices)
      .select(
        (col("id") + 1).as("_rid"),
        concat(
          lit("img_"),
          lpad(when(col("id") % 1000 === 7, greatest(col("id") - 1000, lit(0))).otherwise(col("id")).cast("string"), 12, "0")
        ).as("image_id"),
        when(col("id") % 100 === 13, lit(-1)).otherwise(lit(24) + (col("id") % 5) * 8).cast("int").as("w"),
        (lit(24) + (col("id") % 3) * 8).cast("int").as("h"),
        when(col("id") % 100 === 41, lit("bmp"))
          .otherwise(when(col("id") % 2 === 0, "png").otherwise("jpeg")).as("fmt"),
        when(col("id") % 100 === 29, lit(""))
          .otherwise(concat(lit("caption for image "), col("id").cast("string"))).as("caption"),
        xxhash64(col("id")).as("phash")
      )
    val schema = TableSchema(
      fields = Seq(
        Field("image_id", constraints = if (withUniqueness) fcU else FieldConstraints()),
        Field("w", "integer", constraints = FieldConstraints(minimum = Some(1), maximum = Some(16384))),
        Field("h", "integer", constraints = FieldConstraints(minimum = Some(1), maximum = Some(16384))),
        Field("fmt", constraints = FieldConstraints(enumVals = Some(Seq("png", "jpeg")))),
        Field("caption", constraints = FieldConstraints(required = true, maxLength = Some(200)))
      )
    )
    val t0 = System.nanoTime()
    val viol = ValidationRunner
      .plan(df, schema, ValidationConfig(rowNumberCol = "_rid", uniquenessSalts = uniquenessSalts))
      .violations
      .count()
    ((n, (System.nanoTime() - t0) / 1e9, viol))
  }

  /** Scaling workload #2 — the embedding near-dup suite: n pseudo-random
    * 16-dim vectors (splitmix64-mixed components: uniform directions, no
    * trigonometric aliasing), with every 100th row a 0.5-scaled copy of the
    * row 100 before it (planted exact-direction dups, ~1%). Runs
    * `Dedup.embeddingCosinePairsLsh` (2 tables, bits scaled with log2(n):
    * 24 at the 2M ScalingBench size) and counts verified pairs. Cost
    * profile: codegen'd signature computation (CPU-bound, scales with
    * cores) + bucket-join shuffle + native-expression cosine verification.
    * Returns (vectors, seconds, pairs).
    *
    * Signature bits MUST scale with n, like the kNN-join workload's: with
    * fixed bits, bucket occupancy grows linearly and the within-bucket
    * candidate-PAIR count grows quadratically — a 10× scale-up measured
    * ~50 GB of candidate shuffle before the fix. Planted copies are
    * sign-invariant (exact-direction), so more bits never lose them. */
  def embeddingThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val numBits = 24 + math.max(0, math.ceil(math.log(n / 2000000.0) / math.log(2)).toInt)
    val df = syntheticVectors(spark, n, slices)
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup
      .embeddingCosinePairsLsh(df, col("embedding"), col("vec_id"),
        threshold = 0.99, numBits = numBits, tables = 2)
      .count()
    (n, (System.nanoTime() - t0) / 1e9, pairs)
  }

  /** SemDeDup throughput at the REALISTIC corpus shape: mass-duplicated
    * embeddings (templated/boilerplate docs embed identically), 64 clusters
    * × 200 distinct vectors repeated across n rows — so the within-cluster
    * pair stage rides [[graft.dedup.Dedup.embeddingCosinePairs]]' identical-
    * vector collapse and stays bounded (≤200 distinct per cluster) while
    * assignment + component labeling + election scale with n. Centroids are
    * the 64 cluster base directions (driver-computed, broadcast closure).
    * Returns (rows, seconds, outputRows). */
  def semDedupThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val dim = 16
    def baseDir(c: Int): Array[Double] =
      Array.tabulate(dim)(d => math.sin(c * 17.0 + d) * 10.0)
    val bases = Array.tabulate(64)(baseDir)
    val gen = udf { (id: Long) =>
      val b = bases((id % 64L).toInt)
      val v = ((id / 64L) % 200L).toInt
      Array.tabulate(dim)(d => (b(d) + math.sin(v * 7.0 + d) * 0.4).toFloat)
    }
    val df = spark.range(0, n, 1, slices).select(col("id").as("vec_id"), gen(col("id")).as("embedding"))
    val centroids = IndexedSeq.tabulate(64)(c => baseDir(c).toIndexedSeq)
    val t0 = System.nanoTime()
    val out = graft.dedup.Dedup
      .semDedup(df, col("embedding"), col("vec_id"), centroids, eps = 0.995)
      .count()
    (n, (System.nanoTime() - t0) / 1e9, out)
  }

  /** Scaling workload — exact integer two-sample KS (q96 machinery):
    * 2n synthetic rows over ~1M distinct values, the full
    * groupBy(value)-collapse + two-phase prefix scan. Returns
    * (2n rows, seconds, ks_num). */
  def ksExactThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val a = spark.range(0, n, 1, slices)
      .select((col("id") * lit(2654435761L) % lit(1000003L)).as("v"))
    val b = spark.range(0, n, 1, slices)
      .select(((col("id") * lit(2654435761L) + lit(7L)) % lit(1000003L) + lit(50L)).as("v"))
    val t0 = System.nanoTime()
    val r = graft.stats.Drift.ksExact(a, col("v"), b, col("v")).head()
    (2 * n, (System.nanoTime() - t0) / 1e9, r.getLong(0))
  }

  /** Scaling workload — integer Lloyd k-means (q100 machinery): synthetic
    * dim-16 fixed-point vectors around 64 well-separated bases, k=64, two
    * assignment passes + one update. Measures the broadcast assign kernel
    * and the map-side partial-sum update round (driver traffic = k·dim
    * longs per partition; no n·dim explode shuffle anywhere). Returns
    * (rows, seconds, distinct clusters). */
  def kmeansThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val dim = 16
    val gen = udf { (id: Long) =>
      val c = (id % 64L).toInt
      val v = ((id / 64L) % 200L).toInt
      Array.tabulate(dim)(d =>
        math.floor((math.sin(c * 17.0 + d) * 10.0 + math.sin(v * 7.0 + d) * 0.4) * 1000.0 + 0.5).toLong)
    }
    val df = spark.range(0, n, 1, slices).select(col("id"), gen(col("id")).as("v"))
    val t0 = System.nanoTime()
    val out = graft.ann.KMeans.fitAssign(df, col("v"), col("id"), k = 64, iters = 2)
      .groupBy("cluster").count().count()
    (n, (System.nanoTime() - t0) / 1e9, out)
  }

  /** Scaling workload #5 — the IMAGE-axis validation pass: the stored
    * synthetic image table (materialized once OUTSIDE timing; real PNG/JPEG
    * payloads), full validation = decode checks (payload decodability,
    * decoded dims/fmt vs metadata, caption equality) + image_id uniqueness.
    * The per-row kernel is the actual ImageIO decode (CPU-bound; reader
    * instances reused per thread, no result caching — every pass re-decodes,
    * so cross-parallelism comparisons measure real work). Returns
    * (images, seconds, violations). */
  def imageThroughput(spark: SparkSession, n: Long): (Long, Double, Long) = {
    import org.apache.spark.sql.functions.col
    val imgPath = s"${System.getProperty("java.io.tmpdir")}/graft_bench_images_$n"
    if (!new java.io.File(imgPath, "_SUCCESS").exists())
      graft.images.SyntheticImages.generateWithId(spark, n).write.mode("overwrite").parquet(imgPath)
    val stored = spark.read.parquet(imgPath)
    val t0 = System.nanoTime()
    val imgViol = graft.images.ImageChecks.violations(stored, col("row_id")).count()
    val metaViol = graft.runner.ValidationRunner
      .plan(
        stored.drop("bytes").withColumnRenamed("row_id", "_rid"),
        graft.schema.TableSchema(
          Seq(graft.schema.Field("image_id", constraints = graft.schema.FieldConstraints(unique = true)))
        ),
        graft.runner.ValidationConfig(rowNumberCol = "_rid")
      )
      .violations
      .count()
    (n, (System.nanoTime() - t0) / 1e9, imgViol + metaViol)
  }

  /** Scaling workload #4 — text near-dup (MinHash+LSH): n synthetic
    * 50-token documents (splitmix64 token ids over a 50k vocabulary), with
    * every 100th doc in odd blocks a near-copy of the doc 100 before it
    * (ONE mid-document token replaced → 3 of 48 shingles change, Jaccard
    * ≈ 0.88 — a true NEAR-dup, above the 0.8 threshold but never an
    * identical-set collapse). Runs `Dedup.minHashPairs` (3-word shingles,
    * 32 hashes × 8 bands) and counts verified pairs (expected ≈ n/200).
    * Cost profile: per-row shingle+minhash kernels (CPU-bound, scales with
    * cores) + id-only banding shuffle + exact-Jaccard verify on deduped
    * candidates. Returns (docs, seconds, pairs). */
  def textThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val gen = udf { (id: Long) =>
      val planted = id % 100 == 7 && (id / 100) % 2 == 1
      val base = if (planted) id - 100 else id
      val sb = new java.lang.StringBuilder(360)
      var j = 0
      while (j < 50) {
        var z = base * 1315423911L + j.toLong + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        val tok = if (planted && j == 25) -1L else math.floorMod(z, 50000L)
        sb.append('t').append(tok)
        if (j < 49) sb.append(' ')
        j += 1
      }
      sb.toString
    }
    val df = spark.range(0, n, 1, slices).select(col("id").as("doc_id"), gen(col("id")).as("text"))
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup
      .minHashPairs(df, col("text"), col("doc_id"),
        shingleWords = 3, numHashes = 32, bands = 8, threshold = 0.8)
      .count()
    (n, (System.nanoTime() - t0) / 1e9, pairs)
  }

  /** n pseudo-random 16-dim vectors (splitmix64-mixed components: uniform
    * directions, no trigonometric aliasing); every other 100th row is a
    * 0.5-scaled copy of the row 100 before it (planted exact-direction dups,
    * ~0.5%). Only ODD blocks plant — otherwise copies chain transitively
    * (107→7, 207→107, …) and every id ≡ 7 (mod 100) collapses into ONE
    * mega-cluster whose bucket join is quadratic. Isolated pairs are the
    * realistic shape. */
  def syntheticVectors(spark: SparkSession, n: Long, slices: Int = 64) = {
    import org.apache.spark.sql.functions._
    val gen = udf { (id: Long) =>
      val planted = id % 100 == 7 && (id / 100) % 2 == 1
      val base = if (planted) id - 100 else id
      val scale = if (planted) 0.5f else 1.0f
      val arr = new Array[Float](16)
      var d = 0
      while (d < 16) {
        var z = base + (d.toLong << 32) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        arr(d) = (z.toDouble / Long.MaxValue.toDouble).toFloat * scale
        d += 1
      }
      arr
    }
    spark.range(0, n, 1, slices).select(col("id").as("vec_id"), gen(col("id")).as("embedding"))
  }

  /** Scaling workload #3 — the batch kNN JOIN: an n-row vector store (sig
    * computed with the store geometry knnJoin derives from the same seed)
    * probed by its ~n/200 planted scaled copies as the query batch, k=5.
    * Cost profile: two codegen'd signature scans + the 8-byte sig equi-join
    * + per-query window top-k. Returns (storeRows, seconds, resultRows).
    *
    * Signature bits SCALE WITH log2(n) (16 at 2M rows — the ScalingBench
    * size — 20 at 20M): with fixed bits, bucket occupancy grows linearly in
    * n and candidate verification per query grows with it, turning a 10×
    * data scale-up into ~100× join work (measured: 44k vec/s at 20M with 16
    * bits vs ~200k at 2M). Sizing bits to hold occupancy ~constant is
    * exactly what a real deployment does when it sizes an LSH index. */
  def knnJoinThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    import graft.ann.Ann
    val numBits = math.max(12, math.ceil(math.log(n.toDouble) / math.log(2)).toInt - 5)
    val df = syntheticVectors(spark, n, slices)
    val planes = Ann.hyperplanes(numBits, 16)
    val store = df.select(col("vec_id").as("id"), col("embedding"),
      Ann.lshSignature(col("embedding").cast("array<double>"), planes).as("sig"))
    // NB: `/` on longs is DOUBLE division in Spark — use floor for the
    // integer block index or the odd-block test silently matches nothing
    val queries = df.filter(col("vec_id") % 100 === 7 && floor(col("vec_id") / 100) % 2 === 1)
    val t0 = System.nanoTime()
    val out = Ann
      .knnJoin(queries, col("embedding"), col("vec_id"), store,
        k = 5, numBits = numBits, probeHamming = 1)
      .count()
    (n, (System.nanoTime() - t0) / 1e9, out)
  }

  /** Scaling workload #6 — connected components over a planted pair graph:
    * n nodes in chains of 10 (edge (id-1, id) whenever id % 10 != 0, i.e.
    * 0.9n edges, diameter 9 — deliberately the WORST cluster shape for
    * min-label propagation, whose round count is O(distance-to-min-node);
    * realistic dedup clusters are star-ish and converge faster). Runs
    * `Dedup.connectedComponentsStats` and reports the measured round count
    * to stderr alongside the timing — the evidence that O(diameter) holds
    * and the point at which a small-star/large-star variant would be
    * warranted. Returns (edges, seconds, components). */
  def ccThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val pairs = spark.range(0, n, 1, slices)
      .filter(col("id") % 10 =!= 0)
      .select((col("id") - 1).as("id_a"), col("id").as("id_b"))
    val edges = n - (n + 9) / 10 // ids with id % 10 != 0
    val t0 = System.nanoTime()
    val r = graft.dedup.Dedup.connectedComponentsStats(pairs, col("id_a"), col("id_b"))
    val comps = r.labels.select(countDistinct(col("comp"))).head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    System.err.println(s"[cc] edges=$edges rounds=${r.iterations} converged=${r.converged} components=$comps")
    (edges, sec, comps)
  }

  /** Scaling workload #6b — small-star/large-star connected components over
    * DEEP chains (length 10 000, diameter 9 999): the regime where
    * min-label propagation is unusable (it would need ~10 000 rounds; the
    * chain-of-10 workload above measured exactly diameter+1). Star
    * contraction must converge in O(log n) rounds regardless of diameter —
    * the measured round count is the evidence. Returns
    * (edges, seconds, components). */
  def ccStarsThroughput(spark: SparkSession, n: Long, chainLen: Long = 10000L, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val pairs = spark.range(0, n, 1, slices)
      .filter(col("id") % chainLen =!= 0)
      .select((col("id") - 1).as("id_a"), col("id").as("id_b"))
    val edges = n - (n + chainLen - 1) / chainLen
    val t0 = System.nanoTime()
    val r = graft.dedup.Dedup.connectedComponentsStars(pairs, col("id_a"), col("id_b"))
    val comps = r.labels.select(countDistinct(col("comp"))).head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    System.err.println(s"[ccstars] edges=$edges chainLen=$chainLen rounds=${r.iterations} converged=${r.converged} components=$comps")
    (edges, sec, comps)
  }

  /** Scaling workload #7 — benchmark decontamination with a benchmark side
    * TOO LARGE TO BROADCAST: corpus = n synthetic 50-token docs (the text
    * workload's generator), benchmark = the first n/10 of them re-generated
    * (every benchmark doc IS in the corpus, so hits are dense). At n/10
    * benchmark docs the distinct-shingle set is ~(n/10)×48 8-byte hashes —
    * far past the 10 MB broadcast threshold — so the plan must degrade to
    * the shuffle hash/sort-merge join on the 8-byte shingle hash the
    * operator's scaladoc promises; the observed join strategy is printed to
    * stderr so the degradation is evidence, not a claim. Returns
    * (corpusDocs, seconds, contaminatedDocs). */
  def contaminationThroughput(
      spark: SparkSession,
      n: Long,
      slices: Int = 64,
      bloom: Boolean = false,
      sparseBench: Boolean = false
  ): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val corpus = syntheticDocs(spark, n, slices)
    val nb = math.max(n / 10, 1L)
    // dense fixture: every benchmark doc IS a corpus doc (hit rate 10% of
    // the corpus — stresses the join). sparse fixture: benchmark seeds are
    // disjoint from the corpus except every 100th (hit rate 0.1% — the
    // realistic decontamination shape, where a bloom prefilter can drop
    // ~99% of the corpus side before the shuffle)
    val bench =
      if (!sparseBench) syntheticDocs(spark, nb, slices).select(col("text"))
      else
        spark
          .range(0, nb, 1, slices)
          .select(docTextUdf(
            when(col("id") % 100 === 0, (col("id") / 100 * 997) % n)
              .otherwise(col("id") + 2 * n)).as("text"))
    val out = graft.text.TextOps
      .contaminatedDocs(corpus, col("text"), col("doc_id"), bench, col("text"), minOverlap = 3,
        bloomThreshold = if (bloom) 0L else Long.MaxValue)
    val t0 = System.nanoTime()
    val hits = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val plan = out.queryExecution.executedPlan.toString
    val strategy =
      if (plan.contains("BroadcastHashJoin")) "broadcast"
      else if (plan.contains("SortMergeJoin")) "sort-merge"
      else if (plan.contains("ShuffledHashJoin")) "shuffled-hash"
      else "other"
    System.err.println(
      s"[contamination] corpus=$n bench=$nb sparse=$sparseBench bloom=$bloom join=$strategy hits=$hits")
    (n, sec, hits)
  }

  /** Scaling workload #8 — the Hamming kNN JOIN under mass-duplication
    * skew: an n-row signature store where every 5th row belongs to one of
    * 1 000 mega-clusters (identical signature; cluster size n/5000 GROWS
    * with n — at 20M rows each duplicated signature has 4 000 carriers,
    * the web-corpus shape) and the rest are distinct splitmix signatures
    * with planted 1-3-bit neighbors. Queries = every 200th row. Flat
    * per-row cost across a 10× scale-up is the evidence that the
    * distinct-signature pre-collapse works — without it the mega-cluster
    * join keys would grow candidate work quadratically in cluster size.
    * Returns (storeRows, seconds, resultRows). */
  def hammingKnnThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val mixU = udf { (id: Long) =>
      var z = id + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val sig = when(col("id") % 5 === 0, mixU(col("id") % 1000))
      .otherwise(
        // distinct region with planted 1-bit neighbors every 10th row
        when(col("id") % 10 === 7, mixU(col("id") - 1).bitwiseXOR(expr("shiftleft(1L, cast(id % 64 as int))")))
          .otherwise(mixU(col("id"))))
    val store = spark.range(0, n, 1, slices).select(col("id"), sig.as("sig"))
    // query mix: distinct-region rows (self + planted neighbors) PLUS
    // mega-cluster members (id % 2000 == 0 → all carry the SAME cluster
    // signature), so both the store-side and query-side collapse paths and
    // the capped member expansion are exercised
    val queries = store.filter(col("id") % 200 === 3 || col("id") % 2000 === 0)
    val t0 = System.nanoTime()
    val out = graft.ann.Ann
      .hammingKnnJoin(queries, col("sig"), col("id"), store, col("sig"), col("id"),
        k = 5, bands = 4, maxDistance = 3)
      .count()
    (n, (System.nanoTime() - t0) / 1e9, out)
  }

  /** Deterministic 50-token document text for a seed id (splitmix64 token
    * ids over a 50k vocabulary) — the text-workload generator as a reusable
    * UDF so workloads can plant copies by reusing seeds. */
  private[graft] val docTextUdf = {
    import org.apache.spark.sql.functions.udf
    udf { (seed: Long) =>
      val sb = new java.lang.StringBuilder(360)
      var j = 0
      while (j < 50) {
        var z = seed * 1315423911L + j.toLong + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        sb.append('t').append(math.floorMod(z, 50000L))
        if (j < 49) sb.append(' ')
        j += 1
      }
      sb.toString
    }
  }

  /** The text workload's synthetic 50-token documents, exposed for
    * workloads that need the corpus without the planted near-dups aligned
    * the same way. */
  def syntheticDocs(spark: SparkSession, n: Long, slices: Int = 64) = {
    import org.apache.spark.sql.functions._
    spark.range(0, n, 1, slices).select(col("id").as("doc_id"), docTextUdf(col("id")).as("text"))
  }

  /** Scaling workload #9 — incremental dedup against the persisted MinHash
    * index: an n-doc corpus is indexed ONCE (untimed, cached on disk like
    * the image table — index build is one-time setup, not per-batch work);
    * the timed region is screening an n/10-doc ingestion batch, half of
    * whose docs are exact copies of corpus docs (seed reuse). The
    * comparison number is the full-corpus recompute at n + n/10 docs
    * (`textThroughput`) — the cost an engine WITHOUT an incremental index
    * pays on every ingestion. Returns (batchDocs, seconds, pairs). */
  def incrementalThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bench_mhstore_$n"
    if (!new java.io.File(s"$path/banded/_SUCCESS").exists())
      graft.dedup.MinHashStore.write(
        syntheticDocs(spark, n, slices), col("text"), col("doc_id"), path)
    val nb = math.max(n / 10, 1L)
    // batch ids live above the corpus range; even batch rows reuse a corpus
    // seed (spread over the corpus by the *10 stride) → exact-dup pairs
    val batch = spark.range(n, n + nb, 1, slices).select(
      col("id").as("doc_id"),
      docTextUdf(when(col("id") % 2 === 0, ((col("id") - n) * 10) % n).otherwise(col("id"))).as("text"))
    val t0 = System.nanoTime()
    val pairs = graft.dedup.MinHashStore
      .minHashPairsIncremental(spark, batch, col("text"), col("doc_id"), path)
      .count()
    (nb, (System.nanoTime() - t0) / 1e9, pairs)
  }

  /** Scaling workload — incremental EXACT dedup against the persisted
    * bucketed fingerprint store ([[graft.dedup.ExactStore]]): an n-doc
    * corpus is fingerprinted + bucketed ONCE per session (untimed —
    * one-time setup like the MinHash index); the timed region is screening
    * an n/10-doc batch, half exact copies of corpus docs (seed reuse),
    * half novel. The comparison number is `Dedup.exact` over
    * corpus ∪ batch — the full-recompute cost an engine without the store
    * pays per ingestion. Returns (batchDocs, seconds, dups). */
  def exactIncrementalThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val table = s"graft_bench_exactstore_$n"
    if (!spark.catalog.tableExists(table))
      graft.dedup.ExactStore.write(
        syntheticDocs(spark, n, slices), col("text"), col("doc_id"), table)
    // batch = n / GRAFT_EXACTINCR_BATCH_DIV (default 10). The scaling
    // protocol needs the TIMED region in the tens of seconds at the low
    // level — div=1 sizes the batch like the corpus without paying a
    // bigger store build per pinned session.
    val div = sys.env.get("GRAFT_EXACTINCR_BATCH_DIV").map(_.toLong).getOrElse(10L)
    val nb = math.max(n / div, 1L)
    val batch = spark.range(n, n + nb, 1, slices).select(
      col("id").as("doc_id"),
      docTextUdf(when(col("id") % 2 === 0, ((col("id") - n) * 10) % n).otherwise(col("id"))).as("text"))
    val t0 = System.nanoTime()
    val dups = graft.dedup.ExactStore
      .incrementalExactDups(batch, col("text"), col("doc_id"), table)
      .count()
    (nb, (System.nanoTime() - t0) / 1e9, dups)
  }

  /** Scaling workload #10 — STREAMING admission dedup: n synthetic docs
    * (10% planted exact dups via seed reuse) written ONCE to parquet
    * (untimed, like the image table), then streamed through
    * [[graft.streaming.StreamingChecks.streamingExactDedup]] with
    * Trigger.AvailableNow into a noop sink. The timed region is the whole
    * streaming run: scan → codegen'd fingerprint → stateful
    * flatMapGroupsWithState against the state store (one state row per
    * distinct doc) → commit. A fresh checkpoint dir per run keeps the
    * query from resuming into an empty batch. Returns (docs, seconds,
    * batches). */
  def streamingThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bench_streamdocs_$n"
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      spark
        .range(0, n, 1, slices)
        .select(col("id").as("doc_id"),
          docTextUdf(when(col("id") % 10 === 7, col("id") - 1).otherwise(col("id"))).as("text"))
        .write.mode("overwrite").parquet(path)
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(path)
    val out = graft.streaming.StreamingChecks.streamingExactDedup(stream, col("text"), col("doc_id"))
    val t0 = System.nanoTime()
    val q = out.writeStream
      .format("noop")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$path/_ckpt_${System.nanoTime()}")
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.length.toLong
    (n, (System.nanoTime() - t0) / 1e9, batches)
  }

  /** Scaling workload #11 — corpus-level LINE dedup: n docs of 4 lines
    * each (a unique 50-token body, a per-doc unique id line, and two of
    * five rotating boilerplate footers — so each footer is a hot key
    * carried by ~2n/5 docs, the map-side-combine stress). The timed
    * aggregation consumes the reassembled text (sum of lengths) so the
    * assemble kernel cannot be pruned away (count() would skip it).
    * Returns (docs, seconds, totalKeptChars). */
  /** Shared synthetic corpus for the bpe/tokenids scale modes: n docs of
    * 20 words over a ~36k-word vocabulary with a quadratic (Zipf-ish)
    * rank skew — low ranks drawn far more often. ONE definition so both
    * scale points measure the identical corpus. */
  private def skewedVocabDocs(spark: SparkSession, n: Long, slices: Int) = {
    import org.apache.spark.sql.functions._
    val wordsPerDoc = 20
    val genU = udf { (id: Long) =>
      val sb = new java.lang.StringBuilder(160)
      var j = 0
      while (j < wordsPerDoc) {
        val h = java.lang.Long.rotateLeft(id * 2654435761L + j * 40503L, 17)
        val r = java.lang.Math.floorMod(h, 6000000L)
        // quadratic rank map: low ranks drawn far more often (Zipf-ish)
        val rank = r * r / 1000000000L // 0 .. 35999
        sb.append('w').append(java.lang.Long.toString(rank, 36))
        if (j < wordsPerDoc - 1) sb.append(' ')
        j += 1
      }
      sb.toString
    }
    spark.range(0, n, 1, slices)
      .select(col("id").as("doc_id"), genU(col("id")).as("text"))
  }

  /** Scaling workload — BPE merge-pair counting (q108 machinery): n docs
    * of 20 synthetic words drawn from a deterministic ~36k-word skewed
    * vocabulary (quadratic rank map — head words orders of magnitude
    * hotter, the natural-text shape). `naive = true` expands char pairs
    * over EVERY token occurrence (20·n kernel invocations + a
    * corpus-sized pair shuffle) instead of over the DISTINCT-word
    * frequency table (vocab-sized kernel + shuffle) — the comparison the
    * scaladoc claim rests on. Returns (tokens, seconds, distinctPairs). */
  def bpeThroughput(spark: SparkSession, n: Long, naive: Boolean = false,
      slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val wordsPerDoc = 20
    val docs = skewedVocabDocs(spark, n, slices)
    val pairsU = udf { (s: String) =>
      if (s == null || s.length < 2) Seq.empty[String]
      else {
        val out = new Array[String](s.length - 1)
        var i = 0
        while (i < s.length - 1) { out(i) = s.substring(i, i + 2); i += 1 }
        out.toSeq
      }
    }
    val t0 = System.nanoTime()
    val pairs =
      if (naive)
        docs.select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
          .select(explode(pairsU(col("w"))).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("cnt"))
      else graft.text.TextOps.bpeMergePairs(docs, col("text"), k = Int.MaxValue)
    val distinct = pairs.count()
    (n * wordsPerDoc, (System.nanoTime() - t0) / 1e9, distinct)
  }

  /** Scaling workload — PQ compressed-domain scan (q109 machinery):
    * dim-64 fixed-point vectors around 16 bases, PQ m=8 × k=16 planted
    * codebooks. The encoded codes table (or, `brute = true`, the full
    * vectors) is materialized to parquet ONCE untimed — the stored-store
    * discipline of the image/LSH modes, since PQ's premise is that codes
    * are encoded once and scanned per query. The timed region is the
    * query-side scan: read + per-row distance + global min/count. ADC
    * reads 8 longs and does 8 table lookups per row; brute reads 64 longs
    * and does 64 mul-adds — the 8× IO + compute gap IS the operator's
    * 100-TB claim. Returns (rows, seconds, minDist). */
  def pqThroughput(spark: SparkSession, n: Long, brute: Boolean = false,
      slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val dim = 64; val m = 8; val k = 16
    val cbVecs = Array.tabulate(k)(c =>
      Array.tabulate(dim)(d => math.floor(math.sin(c * 13.0 + d) * 1000.0 + 0.5).toLong))
    val cbs = graft.ann.Pq.sliceCodebooks(cbVecs, m)
    val gen = udf { (id: Long) =>
      val c = (id % 16L).toInt
      val w = ((id / 16L) % 50L).toInt
      Array.tabulate(dim)(d =>
        math.floor(math.sin(c * 13.0 + d) * 1000.0 + 0.5).toLong + (w * (d % 3)).toLong)
    }
    val tmp = System.getProperty("java.io.tmpdir")
    val path = if (brute) s"$tmp/graft_bench_pqvecs_$n" else s"$tmp/graft_bench_pqcodes_$n"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val vecs = spark.range(0, n, 1, slices).select(col("id"), gen(col("id")).as("v"))
      val stored =
        if (brute) vecs
        else graft.ann.Pq.encode(vecs, col("v"), col("id"), cbs)
      stored.write.mode("overwrite").parquet(path)
    }
    val query = cbVecs(3)
    val exactDist = udf { (v: Seq[Long]) =>
      var dd = 0L; var j = 0
      while (j < query.length) { val t = v(j) - query(j); dd += t * t; j += 1 }
      dd
    }
    val stored = spark.read.parquet(path)
    val t0 = System.nanoTime()
    val minD =
      if (brute) stored.agg(min(exactDist(col("v")))).head().getLong(0)
      else stored.agg(min(graft.ann.Pq.adcDist(col("codes"), query, cbs))).head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, minD)
  }

  /** PQ recall measurement on a CLUSTERED corpus with TRAINED codebooks —
    * the counterpoint to q111's deliberately adversarial planted fixture
    * (random directions + 4 planted words → recall 0.08): clusters of
    * exactly 100 members whose bases have PRODUCT structure — each
    * 8-dim subspace takes one of 16 dictionary words, cluster id =
    * the digit tuple — which is precisely the generative model PQ
    * assumes (Jégou et al. §II: the vector as a concatenation of
    * independently quantizable subvectors). Trained per-subspace
    * k-means (m=8, k=16) must recover the dictionaries, making ADC
    * resolve the exact top-100 (= one cluster) from 32-bit codes.
    * Together with q111's 0.08 this BRACKETS the operator: near-1 on
    * product-structured data, near-0 on unstructured random
    * directions at the same code budget. Full ADC scan vs the exact
    * integer top-100, both tie-broken by id. Returns
    * (rows, seconds, hits@100). */
  def pqRecallThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    import graft.ann.{Pq, Recall}
    val dim = 64
    val nc = math.max(16L, n / 100L) // needs nc <= 16^8 distinct digit tuples
    val gen = udf { (id: Long) =>
      // multiplicative scramble (gcd(K, nc) = 1 → exactly n/nc members per
      // cluster) so ANY id prefix — the trainer's init pool included —
      // sees digit-diverse clusters
      val c = (id * 2654435761L) % nc
      val w = ((id / nc) % 40L).toInt
      Array.tabulate(dim) { j =>
        val s = j / 8
        val digit = ((c >> (4 * s)) & 15L).toInt
        math.floor(math.sin(digit * 31.0 + s * 97.0 + j) * 1000.0 + 0.5).toLong +
          ((w + j) % 7).toLong
      }
    }
    val df = spark.range(0, n, 1, slices).select(col("id"), gen(col("id")).as("v"))
    val t0 = System.nanoTime()
    val sample = df.filter(col("id") < 100000L)
    val cbs = Pq.trainCodebooks(sample, col("v"), col("id"), m = 8, k = 16, iters = 2)
    val q = df.filter(col("id") === 777L) // a mid-corpus vector (cluster 9, w=3)
      .select("v").head().getSeq[Long](0).toArray
    val approx = Pq.encode(df, col("v"), col("id"), cbs)
      .select(col("id"), Pq.adcDist(col("codes"), q, cbs).as("a"))
      .orderBy(col("a"), col("id")).limit(100)
    val exact = df.select(col("id"), Pq.l2Dist(col("v"), q).as("d"))
      .orderBy(col("d"), col("id")).limit(100)
    val hits = Recall.atK(approx, col("id"), exact, col("id"), k = 100)
      .head().getLong(1)
    (n, (System.nanoTime() - t0) / 1e9, hits)
  }

  /** Scaling workload — tokenizer apply (q113 machinery): the bpe
    * synthetic corpus (n docs × 20 words, ~36k skewed vocab) encoded to
    * token ids against a 10k-rank vocabulary derived from the corpus
    * itself. Exercises the full shape: explode → vocab-bounded rank
    * window → token-keyed join → per-doc ordered reassembly
    * (array_sort(collect_list) + native field extraction). The timed
    * consumer sums the position-weighted checksum so the reassembly
    * cannot be pruned. Returns (docs, seconds, totalOov). */
  def tokenIdsThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val docs = skewedVocabDocs(spark, n, slices)
    val t0 = System.nanoTime()
    val enc = graft.text.TextOps.tokenIds(docs, col("text"), col("doc_id"),
      docs, col("text"), vocabSize = 10000)
    val r = enc
      .select(col("oov"), posexplode(col("ids")).as(Seq("p", "tid")))
      .agg(sum(col("tid") * (col("p") + 1)),
        sum(when(col("p") === 0, col("oov")).otherwise(0L))).head()
    (n, (System.nanoTime() - t0) / 1e9, r.getLong(1))
  }

  def lineDedupThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val docs = spark
      .range(0, n, 1, slices)
      .select(col("id").as("doc_id"),
        concat_ws("\n",
          docTextUdf(col("id")),
          concat(lit("doc id line "), col("id").cast("string")),
          concat(lit("boilerplate footer variant "), (col("id") % 5).cast("string")),
          concat(lit("boilerplate footer variant "), ((col("id") + 2) % 5).cast("string"))
        ).as("text"))
    val out = graft.dedup.Dedup.dedupLines(docs, col("text"), col("doc_id"))
    val t0 = System.nanoTime()
    val chars = out.agg(sum(length(col("text")))).head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, chars)
  }

  /** Scaling workload — span-level duplication stats
    * (`Dedup.duplicatedSpanStats`, token 8-grams): n docs of ~60 tokens —
    * a 50-token doc-unique body, a doc-unique marker, and one of 1000
    * shared 13-token boilerplate sentences (hot duplicated spans repeated
    * in n/1000 docs each; map-side combine keeps the hot keys to one row
    * per partition per shuffle). Slices scale with n so per-task gram
    * volume stays bounded (~56 grams/doc — 10× docs at fixed slices was
    * measured 2× worse per gram from partial-agg spill alone). Returns
    * (docs, seconds, totalDupNgrams). */
  def spanDedupThroughput(spark: SparkSession, n: Long, slices: Int = 0): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val sl = if (slices > 0) slices else math.min(512L, math.max(64L, n / 50000L)).toInt
    val docs = spark
      .range(0, n, 1, sl)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          docTextUdf(col("id")),
          concat(lit("docmarker"), col("id").cast("string")),
          concat(lit("shared trailing boilerplate sentence number "),
            (col("id") % 1000).cast("string"),
            lit(" about terms of service and cookie consent"))).as("text"))
    val out = graft.dedup.Dedup.duplicatedSpanStats(docs, col("text"), col("doc_id"), n = 8)
    val t0 = System.nanoTime()
    val dup = out.agg(sum(col("dup_ngrams"))).head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, dup)
  }

  /** Scaling workload #13 — image canonical ids at scale
    * (`Dedup.componentsBySignature`): n rows over n/100 distinct
    * signatures (mass-duplication: 100 members each, the web-corpus
    * shape), canonical id per EVERY row. CC runs on the distinct-signature
    * graph (n/100 nodes); the n-row side pays one membership join. The
    * aggregation consumes every label. Returns (rows, seconds,
    * componentCount). */
  def imageCanonicalThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val mixU = udf { (id: Long) =>
      var z = id + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val m = math.max(n / 100, 1L)
    val rows = spark.range(0, n, 1, slices)
      .select(col("id"), mixU(col("id") % m).as("sig"))
    val out = graft.dedup.Dedup.componentsBySignature(rows, col("id"), col("sig"))
    val t0 = System.nanoTime()
    val comps = out.agg(countDistinct(col("comp"))).head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, comps)
  }

  /** Scaling workload #12 — sequence packing at scale: bin assignment for
    * n docs with deterministic pseudo-random token weights. `naive = true`
    * times the textbook global-window plan (single-partition Exchange —
    * the scale killer `Packing.assignBins` exists to avoid) for the
    * comparison row. The aggregation consumes every bin id. Returns
    * (rows, seconds, binCount). */
  def packingThroughput(
      spark: SparkSession,
      n: Long,
      slices: Int = 64,
      naive: Boolean = false
  ): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val df = spark
      .range(0, n, 1, slices)
      .select(col("id"), (col("id") * 2654435761L % 97 + 1).as("w"))
    val out =
      if (!naive)
        graft.stats.Packing.assignBins(df, col("id"), col("id"), col("w"), budget = 4096L)
      else {
        import org.apache.spark.sql.expressions.Window
        val win = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.select(col("id"), (((sum(col("w")).over(win) - col("w")) / 4096L).cast("long")).as("bin"))
      }
    val t0 = System.nanoTime()
    val bins = out.agg(countDistinct(col("bin"))).head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, bins)
  }

  /** Packed-sequence materialization (q78's operator) over n synthetic docs
    * of 1–9 tokens each: prefix-sum bin assignment + the bin-keyed shuffle +
    * in-group assembly. Result = bin count; total tokens asserted equal to
    * the synthesized sum so a wrong shuffle can't pass silently. */
  def packedSeqThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val df = spark
      .range(0, n, 1, slices)
      .select(col("id"),
        trim(expr("repeat(concat('t', id % 1000, ' '), cast(id % 9 + 1 as int))")).as("text"))
    val t0 = System.nanoTime()
    val out = graft.stats.Packing.packedSequences(df, col("text"), col("id"), col("id"),
      graft.text.TextOps.tokenCount(col("text")), budget = 4096L)
    val r = out.agg(count(lit(1)), sum(col("total_tokens"))).head()
    val sec = (System.nanoTime() - t0) / 1e9
    val expectedTokens = (0L until 9L).map(k => (n / 9L) * (k + 1)).sum +
      (0L until n % 9L).map(k => k + 1).sum
    require(r.getLong(1) == expectedTokens, s"token sum ${r.getLong(1)} != $expectedTokens")
    (n, sec, r.getLong(0))
  }

  /** Oversized-doc splitting (q77's operator) over n synthetic 200-token
    * docs at budget 32 → 7 chunks each; counts output chunks (the kernel +
    * posexplode pipeline, no shuffle). */
  def splitDocsThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val df = spark
      .range(0, n, 1, slices)
      .select(col("id"), trim(expr("repeat(concat('w', id % 997, ' '), 200)")).as("text"))
    val t0 = System.nanoTime()
    val chunks = graft.text.TextOps.splitOversized(df, col("text"), col("id"), budget = 32)
      .agg(count(lit(1))).head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    require(chunks == n * 7, s"chunk count $chunks != ${n * 7}")
    (n, sec, chunks)
  }

  /** Scaling workload — DSIR importance scoring on the hashed-bucket scale
    * path: the model (target = n/20 shifted-seed docs, raw = the n-doc
    * corpus itself) is built and every corpus doc scored in the timed
    * region, features hashed into a 2^18-row table so the score join is a
    * broadcast no matter how large the corpus grows. Timed = both count
    * aggregations + the bounded driver head + the scoring explode/join/sum
    * — the full per-ingestion cost. Returns (docs, seconds, scoredDocs). */
  def dsirThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val corpus = syntheticDocs(spark, n, slices)
    // target = a small shifted-seed slice: token distribution overlaps the
    // corpus (same generator) but is offset, so weights are non-trivial
    val target = spark.range(0, math.max(n / 20, 1000L), 1, slices)
      .select(col("id").as("doc_id"), docTextUdf(col("id") * 7 + 3).as("text"))
    val t0 = System.nanoTime()
    val scored = graft.text.TextOps.dsirScore(
      corpus, col("text"), col("doc_id"),
      target, col("text"), corpus, col("text"), buckets = 1 << 18)
    val r = scored.agg(count(lit(1)), sum("score")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    require(r.getLong(0) == n, s"scored ${r.getLong(0)} != $n")
    (n, sec, r.getLong(0))
  }

  /** Scaling workload — URL-keyed dedup: five deterministic surface
    * variants per row (case/www/port+query/fragment/plain, the q116
    * geometry) over n/5 canonical groups; timed = canonicalization
    * projection + the single map-side-combined groupBy. Returns
    * (rows, seconds, canonicalUrls). */
  def urlDedupThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val groups = math.max(n / 5, 1L)
    val df = spark.range(0, n, 1, slices)
      .select(col("id"), (col("id") % groups).cast("string").as("k"))
      .select(col("id"), when(col("id") % 5 === 0,
          concat(lit("http://EXAMPLE"), col("k"), lit(".COM/page/"), col("k")))
        .when(col("id") % 5 === 1,
          concat(lit("http://www.example"), col("k"), lit(".com/page/"), col("k"), lit("/")))
        .when(col("id") % 5 === 2,
          concat(lit("http://example"), col("k"), lit(".com:80/page/"), col("k"),
            lit("?utm_source=feed&ref="), col("id").cast("string")))
        .when(col("id") % 5 === 3,
          concat(lit("http://example"), col("k"), lit(".com/page/"), col("k"),
            lit("#frag"), col("id").cast("string")))
        .otherwise(concat(lit("http://example"), col("k"), lit(".com/page/"), col("k"))).as("url"))
    val t0 = System.nanoTime()
    val out = graft.text.TextOps.urlDedup(df, col("url"), col("id"))
      .agg(count(lit(1)), sum("dups")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    require(out.getLong(1) == n, s"dups total ${out.getLong(1)} != $n")
    (n, sec, out.getLong(0))
  }

  /** Scaling workload — HTML text extraction: each synthetic doc wrapped in
    * the q117 boilerplate (script with a bare '<', style, comment, entity
    * traps); timed = the codegen'd strip/decode/collapse projection, forced
    * by a character-count aggregate. Pure scan+project: the no-shuffle
    * baseline every text kernel sits behind on raw crawl. Returns
    * (docs, seconds, visibleChars). */
  def htmlTextThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val html = spark.range(0, n, 1, slices).select(col("id"), concat(
      lit("<html><head><style>p{color:red}</style>" +
        "<script type=\"text/javascript\">var a = 1 < 2 && \"x\";</script></head><body><h1>Doc "),
      col("id").cast("string"),
      lit("</h1><p>"), docTextUdf(col("id")),
      lit("</p><!-- hidden "), col("id").cast("string"),
      lit(" --><p>Tom &amp; Jerry &lt;3 &quot;q&quot; &amp;lt; &nbsp;end</p></body></html>")).as("html"))
    val t0 = System.nanoTime()
    val chars = html.select(graft.text.TextOps.htmlText(col("html")).as("t"))
      .agg(sum(length(col("t")))).head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    (n, sec, chars)
  }

  /** Scaling workload — FastSS edit-distance pairs: n title rows drawn from
    * n/20 distinct strings (n/100 families × the five q118 surface
    * variants), exact dups pre-collapsing to the distinct set before any
    * neighborhood is built — the realistic shape (title fields on a crawl
    * are massively duplicated). Timed = collapse + neighborhood explode +
    * hash self-join + levenshtein verify. Returns (rows, seconds, pairs). */
  def editDistThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val fam = math.max(n / 100, 1L)
    val k = (col("id") % fam).cast("string")
    val df = spark.range(0, n, 1, slices).select(col("id"),
      when(col("id") % 5 === 1, concat(lit("title v"), k))
        .when(col("id") % 5 === 2, concat(lit("titlew"), k))
        .when(col("id") % 5 === 3, concat(lit("title ww"), k))
        .when(col("id") % 5 === 4, concat(lit("other "), k))
        .otherwise(concat(lit("title w"), k)).as("s"))
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.editDistancePairs(df, col("s"), col("id"), maxDist = 1).count()
    (n, (System.nanoTime() - t0) / 1e9, pairs)
  }

  /** Scaling workload — BPE tokenizer APPLY: merges trained ONCE on a small
    * fixed slice (untimed — training is a one-time vocabulary job, apply is
    * the per-corpus scan), then the timed region encodes every synthetic
    * doc and folds the 8 literal-replace merge projections + token count
    * into one whole-stage-codegen pass, aggregating total tokens. The
    * 100-TB shape under test: tokenizer apply must be a pure scan.
    * Returns (docs, seconds, totalTokens). */
  def bpeApplyThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    import graft.text.TextOps
    val merges = TextOps.bpeTrain(syntheticDocs(spark, math.min(n, 50000L), slices),
      col("text"), merges = 8).orderBy("step").collect().map(_.getString(1)).toIndexedSeq
    val docs = syntheticDocs(spark, n, slices)
    val t0 = System.nanoTime()
    val r = docs
      .select(TextOps.bpeTokenCount(
        TextOps.bpeApply(TextOps.bpeEncode(col("text")), merges)).as("nt"))
      .agg(count(lit(1)), sum("nt")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    require(r.getLong(0) == n, s"tokenized ${r.getLong(0)} != $n")
    (n, sec, r.getLong(1))
  }

  /** Scaling workload — corpus Zipf fit over the synthetic 50-token docs:
    * token count aggregation + the two-phase prefix-scan rank + the sum
    * pass. Vocabulary is corpus-bounded (~6M ranks at any n here), so the
    * marginal cost is the token explode. Returns (docs, seconds, vocab). */
  def zipfThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    val t0 = System.nanoTime()
    val r = graft.text.TextOps.zipfFit(syntheticDocs(spark, n, slices),
      org.apache.spark.sql.functions.col("text")).head()
    (n, (System.nanoTime() - t0) / 1e9, r.getLong(0))
  }

  /** Scaling workload — exact quantile buckets (q127 shape): n synthetic
    * rows with a heavy-tie integer value distribution (97 distinct values
    * — the token-count-after-truncation regime where a windowed rank would
    * hot-spot) pushed through the two-phase global rank into k=10 deciles,
    * reduced by a bucket census. The timed region is the whole op: range
    * exchange + two sorted passes + the P-long driver offsets. Returns
    * (rows, seconds, buckets). */
  def quantilesThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, n, 1, slices)
      .select(col("id"), pmod(col("id") * lit(2654435761L), lit(97L)).as("v"))
    val t0 = System.nanoTime()
    val buckets = graft.stats.Quantiles.exactBuckets(df, col("v"), col("id"), k = 10)
      .groupBy("bucket").count().count()
    val sec = (System.nanoTime() - t0) / 1e9
    require(buckets == 10L, s"expected 10 buckets, got $buckets")
    (n, sec, buckets)
  }

  /** Scaling workload — char-entropy quality scan + sequential-Poisson
    * weighted top-k in ONE pass over the synthetic docs: the entropy kernel
    * feeds the weight (favor high-entropy docs), the sample is the k
    * smallest hash/entropy keys via TakeOrderedAndProject — the zero-
    * shuffle "score and keep the best k" shape. Returns (docs, seconds, k). */
  def entropySampleThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val docs = syntheticDocs(spark, n, slices)
      .select(col("doc_id"), graft.text.TextOps.charEntropy(col("text")).as("ent"),
        pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)).as("h"))
    val t0 = System.nanoTime()
    val kept = graft.stats.Sampling
      .weightedSample(docs, col("ent"), col("h"), col("doc_id"), k = 10000).count()
    (n, (System.nanoTime() - t0) / 1e9, kept)
  }

  /** Scaling workload — CLIP-score-style alignment card over n synthetic
    * 64-dim pairs (every 7th a mismatched caption): one codegen'd cosine
    * projection + the 10-group rollup. Timed = card aggregation; vector
    * synthesis is part of the scan as it would be reading parquet arrays.
    * Returns (pairs, seconds, totalAligned). */
  def alignmentThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    // xxhash64 mixing: adjacent seeds must yield UNCORRELATED vectors (a
    // linear per-component shift leaves cosine ≈ 1 and no pair misaligns)
    def vec(seed: org.apache.spark.sql.Column) = array((0 until 64).map(d =>
      (pmod(xxhash64(seed, lit(d)), lit(2001L)) - 1000L).cast("double") / 1000.0): _*)
    val pairs = spark.range(0, n, 1, slices).select(
      (col("id") % 10).as("label"),
      vec(col("id")).as("img"),
      when(col("id") % 7 === 3, vec(col("id") + 1)).otherwise(vec(col("id"))).as("cap"))
    val t0 = System.nanoTime()
    val card = graft.ann.Ann
      .alignmentCard(pairs, col("label"), col("img"), col("cap"), threshold = 0.5)
      .agg(sum("n_aligned")).head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, card)
  }

  /** Scaling workload — as-of join (q134 shape): n probe events against
    * n/10 refs spread over n/2000 keys, epoch-style long times. Ref times
    * are per-key-unique by construction (sequence-index spacing + bounded
    * jitter — the operator's well-definedness contract). Timed = the
    * union-and-sweep join + a matched census. Returns (probes, sec, matched). */
  def asOfThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val keys = math.max(n / 2000L, 16L)
    val perKey = math.max(n / 10L / keys, 1L)
    // per-key sequence index: (id - id%keys)/keys — exact multiple/divisor
    def seqIdx(id: org.apache.spark.sql.Column) =
      ((id - pmod(id, lit(keys))) / lit(keys)).cast("long")
    val refs = spark.range(0, n / 10, 1, slices).select(
      pmod(col("id"), lit(keys)).as("k"),
      (seqIdx(col("id")) * 1000L + pmod(xxhash64(col("id")), lit(997L))).as("t"),
      col("id").as("v"))
    val probes = spark.range(0, n, 1, slices).select(
      pmod(col("id"), lit(keys)).as("k"),
      pmod(xxhash64(col("id"), lit(7)), lit(perKey * 1000L)).as("t"),
      col("id").as("pid"))
    val t0 = System.nanoTime()
    val matched = graft.stats.AsOfJoin
      .asOf(probes, col("k"), col("t"), col("pid"), refs, col("k"), col("t"), col("v"))
      .agg(count(col("asof_value"))).head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, matched)
  }

  /** Scaling workload — interval (range) join (q136 shape): n points vs
    * n/10 intervals over n/2000 keys; spans 100–500 on a per-key domain
    * sized for ~0.5 expected containments per point (the sessionization
    * regime, not a blow-up). Timed = bucketized join + pair census.
    * Returns (points, sec, pairs). */
  def rangeJoinThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val keys = math.max(n / 2000L, 16L)
    val perKey = math.max(n / 10L / keys, 1L)
    val domain = perKey * 1000L
    def seqIdx(id: org.apache.spark.sql.Column) =
      ((id - pmod(id, lit(keys))) / lit(keys)).cast("long")
    val intervals = spark.range(0, n / 10, 1, slices).select(
      pmod(col("id"), lit(keys)).as("k"),
      (seqIdx(col("id")) * 1000L + pmod(xxhash64(col("id")), lit(500L))).as("s"),
      col("id").as("iid"))
      .withColumn("e", col("s") + lit(100L) + pmod(col("iid"), lit(9L)) * 50L)
    val points = spark.range(0, n, 1, slices).select(
      pmod(col("id"), lit(keys)).as("k"),
      pmod(xxhash64(col("id"), lit(11)), lit(domain)).as("t"),
      col("id").as("pid"))
    val t0 = System.nanoTime()
    val pairs = graft.stats.RangeJoin
      .intervalJoin(points, col("k"), col("t"), col("pid"),
        intervals, col("k"), col("s"), col("e"), col("iid"), bucketWidth = 1000L)
      .count()
    (n, (System.nanoTime() - t0) / 1e9, pairs)
  }

  /** Scaling workload — sessionization (q137 shape): n events over n/2000
    * keys, inter-event gaps mixed so ~20% of events open a new session.
    * Timed = two-window sweep + session-card rollup census.
    * Returns (events, sec, sessions). */
  def sessionizeThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val keys = math.max(n / 2000L, 16L)
    def seqIdx(id: org.apache.spark.sql.Column) =
      ((id - pmod(id, lit(keys))) / lit(keys)).cast("long")
    // per-key event times: mostly 100-step gaps, every ~5th jumps 10000
    val ev = spark.range(0, n, 1, slices).select(
      pmod(col("id"), lit(keys)).as("k"),
      (seqIdx(col("id")) * 100L +
        when(pmod(xxhash64(col("id")), lit(5L)) === 0, seqIdx(col("id")) * lit(10000L))
          .otherwise(lit(0L))).as("t"),
      col("id").as("eid"))
    val t0 = System.nanoTime()
    val sessions = graft.stats.Sessionize
      .card(ev, col("k"), col("t"), col("eid"), gapMicros = 500L)
      .count()
    (n, (System.nanoTime() - t0) / 1e9, sessions)
  }

  /** Scaling workload — trailing-5 rolling stats (q138 shape): same event
    * table as sessionize, integer values; timed = one-Window pass + census.
    * Returns (events, sec, rows). */
  def rollingThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val keys = math.max(n / 2000L, 16L)
    val ev = spark.range(0, n, 1, slices).select(
      pmod(col("id"), lit(keys)).as("k"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000000L)).as("t"),
      col("id").as("eid"),
      pmod(col("id") * lit(2654435761L), lit(100000L)).as("v"))
    val t0 = System.nanoTime()
    val rows = graft.stats.Rolling
      .trailingAgg(ev, col("k"), col("t"), col("eid"), col("v"), k = 5)
      .agg(count(lit(1)), sum(col("roll_max"))).head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, rows)
  }

  /** Scaling workload — 3-step sequential funnel (q140 shape): n events
    * over n/2000 keys, 4 step types hash-assigned (~25% each, one a
    * non-step distractor). Timed = the conditional-min chain + a census.
    * Returns (events, sec, keysReached1). */
  def funnelThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val keys = math.max(n / 2000L, 16L)
    val ev = spark.range(0, n, 1, slices).select(
      pmod(col("id"), lit(keys)).as("k"),
      pmod(xxhash64(col("id"), lit(13)), lit(1000000L)).as("t"),
      element_at(array(lit("a"), lit("b"), lit("c"), lit("x")),
        (pmod(xxhash64(col("id"), lit(17)), lit(4L)) + 1).cast("int")).as("s"))
    val t0 = System.nanoTime()
    val reached = graft.stats.Funnel
      .card(ev, col("k"), col("t"), col("s"), Seq("a", "b", "c"))
      .head().getLong(0)
    (n, (System.nanoTime() - t0) / 1e9, reached)
  }

  /** Scaling workload — z-order rectangle probe vs brute scan: an n-row
    * (user_id ∈ [0,10k), value ∈ [0,1k)) table laid out as an 8×8 Morton
    * store (built once per size, cached on disk); the probe rectangle
    * covers 6 of 64 cells (~2% of rows). brute=true times the identical
    * rectangle on the UNPARTITIONED copy of the same data — the pair is
    * the file-skipping speedup artifact. Returns (rows, seconds, hits). */
  def zorderProbeThroughput(spark: SparkSession, n: Long, brute: Boolean = false,
                            slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val base = new java.io.File(s"target/zbench/n$n").getAbsolutePath
    val store = s"$base/store"
    val flat = s"$base/flat"
    val df = spark.range(0, n, 1, slices).select(
      col("id").as("event_id"),
      (col("id") % 10000L).as("user_id"),
      ((col("id") * 2654435761L % 100000L).cast("double") / 100.0).as("value"))
    if (!new java.io.File(s"$store/_zmeta/_SUCCESS").exists())
      graft.sources.ZOrderStore.write(df, col("user_id"), col("value"), store, bitsPerDim = 3)
    if (!new java.io.File(s"$flat/_SUCCESS").exists())
      df.write.mode("overwrite").parquet(flat)
    val t0 = System.nanoTime()
    val hits =
      if (brute)
        spark.read.parquet(flat)
          .filter(col("user_id").between(1000, 2000) && col("value").between(100.0, 300.0))
          .count()
      else
        graft.sources.ZOrderStore.rangeProbe(spark, store, 1000.0, 2000.0, 100.0, 300.0).count()
    (n, (System.nanoTime() - t0) / 1e9, hits)
  }

  /** Scaling workload — Tukey outlier card (q144 shape): n rows, 5
    * groups, integer cents in 0..9999 with a planted heavy tail (every
    * 1000th row spiked by +1 000 000 — far past any 3/2·IQR fence).
    * Self-verifies: per-group n must sum to rows and (at sizes where the
    * spikes are a negligible mass — the census check needs ≥100k rows, a
    * tiny group's quartiles can BE the spike) the outlier census must
    * equal the planted spike count, so a wrong rank or fence cannot post
    * a number. Card cost is ONE raw scan + distinct-value-bounded
    * (~20k values) downstream work. Returns (rows, sec, outliers). */
  def outlierThroughput(spark: SparkSession, n: Long, slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    val rows = spark.range(0, n, 1, slices)
      .select(
        concat(lit("g"), pmod(col("id"), lit(5L))).as("g"),
        (pmod(xxhash64(col("id")), lit(10000L)) +
          when(pmod(col("id"), lit(1000L)) === 0, lit(1000000L))
            .otherwise(lit(0L))).as("v"))
    val t0 = System.nanoTime()
    val card = graft.stats.Outliers.tukeyCard(rows, col("g"), col("v")).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val total = card.map(_.getLong(1)).sum
    require(total == n, s"per-group n sums to $total, expected $n")
    val outliers = card.map(r => r.getLong(4) + r.getLong(5)).sum
    val spikes = (n + 999) / 1000
    if (n >= 100000)
      require(outliers == spikes, s"outlier census $outliers != planted $spikes")
    (n, sec, outliers)
  }

  /** Scaling workload — prefix-filter set-similarity join (q141 shape):
    * n docs of 20 tokens split even/odd. Default fixture is the REALISTIC
    * Zipf-tail regime prefix filtering exploits: 15 common-tier tokens
    * (fixed 50k vocab — stopword-like, df grows with n, never in a
    * prefix) + 5 rare-tier tokens (vocab 20n — df ~1, the prefixes), so
    * candidates ≈ true matches. dense=true is the adversarial uniform
    * vocab (n/2, flat df ~40 — NO rare tail, candidate join dominates):
    * the bracket's worst case. Every 10th even/odd pair is a planted
    * near-dup differing in exactly 1 of 20 tokens (J = 19/21 ≥ τ = 9/10);
    * the rest are unrelated draws. Timed = full jaccardJoin (df agg →
    * set arrays → positional prefix join → exact verify) + census.
    * Returns (docs, sec, pairs ≈ n/20). */
  def setSimThroughput(spark: SparkSession, n: Long, dense: Boolean = false,
                       slices: Int = 64): (Long, Double, Long) = {
    import org.apache.spark.sql.functions._
    // seed: near-dup odds share the even sibling's seed; others draw fresh
    val seed = when(col("id") % 2 === 0, (col("id") - pmod(col("id"), lit(2L))) / 2)
      .otherwise(when(pmod((col("id") - 1) / 2, lit(10L)) === 0,
        (col("id") - 1) / 2).otherwise((col("id") + lit(3L * n))))
      .cast("long")
    def vocabAt(j: Int): Long =
      if (dense) math.max(n / 2, 1000L)
      else if (j < 15) 50000L else math.max(20L * n, 1000L)
    val toks = (0 until 20).map { j =>
      val base = concat(lit(if (!dense && j >= 15) "r" else "w"),
        pmod(xxhash64(col("_seed"), lit(j)), lit(vocabAt(j))))
      // the planted near-dup's single differing token: position 7
      if (j == 7)
        when(col("id") % 2 === 1 && pmod((col("id") - 1) / 2, lit(10L)) === 0,
          concat(lit("x"), col("id"))).otherwise(base)
      else base
    }
    val docs = spark.range(0, n, 1, slices)
      .withColumn("_seed", seed)
      .select(col("id"), concat_ws(" ", toks: _*).as("txt"))
    val t0 = System.nanoTime()
    val pairs = graft.dedup.SetSimJoin.jaccardJoin(
        docs.filter(col("id") % 2 === 0), col("id"), col("txt"),
        docs.filter(col("id") % 2 === 1), col("id"), col("txt"),
        tauNum = 9L, tauDen = 10L)
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    // census self-check: every planted pair must surface, minus the rare
    // fixture double-collision (a doc drawing the same token twice in two
    // positions drops its pair to J = 17/19 < 9/10 — measured ~1 in 500k);
    // chance pairs above τ = 9/10 between unrelated 20-token draws are
    // geometrically impossible at these vocab sizes, so planted is also
    // the UPPER bound. A recall regression cannot post a timing.
    val planted = if (n >= 2) (n - 2) / 20 + 1 else 0L
    val slack = math.max(2L, planted / 100000L)
    require(pairs <= planted && pairs >= planted - slack,
      s"setsim census $pairs outside [${planted - slack}, $planted]")
    (n, sec, pairs)
  }
}
