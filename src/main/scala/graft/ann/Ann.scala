package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a single scan computing the dot
  * product natively (`zip_with` + `aggregate`, fully codegen'd) followed by
  * `orderBy(desc).limit(k)`, which Spark executes as TakeOrderedAndProject:
  * per-partition top-k heaps + a driver merge, NO global sort and NO shuffle
  * of the vectors. That plan is already the right shape at 10^12 rows; the
  * scan is the cost.
  *
  * Scale path: random-hyperplane LSH — `numBits` sign bits against
  * deterministic pseudo-random hyperplanes form a bucket id; queries probe
  * only their bucket (and optionally neighboring buckets), turning the full
  * scan into a partition-pruned read when the table is written bucketed or
  * partitioned by signature prefix.
  */
object Ann {

  /** Row-local vector kernels. Implemented as tight Scala UDFs over primitive
    * loops: Catalyst's zip_with/aggregate higher-order functions are
    * CodegenFallback (interpreted per element) — measured ~10× slower for
    * dot products. The UDF is the whole per-row cost; everything around it
    * (scan, top-k, joins) stays native. */
  private[ann] def dotK(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
  private[ann] def normK(a: Seq[Double]): Double = math.sqrt(dotK(a, a))

  private val dotUdf = udf((a: Seq[Double], b: Seq[Double]) => dotK(a, b))
  private val normUdf = udf((a: Seq[Double]) => normK(a))
  private val cosineUdf = udf { (a: Seq[Double], b: Seq[Double]) =>
    dotK(a, b) / (normK(a) * normK(b))
  }

  /** Dot product of two numeric array columns. */
  def dot(a: Column, b: Column): Column =
    dotUdf(a.cast("array<double>"), b.cast("array<double>"))

  def l2norm(v: Column): Column = normUdf(v.cast("array<double>"))

  def cosine(a: Column, b: Column): Column =
    cosineUdf(a.cast("array<double>"), b.cast("array<double>"))

  /** Brute-force cosine top-k against a constant query vector. Output:
    * (id, cosine) ordered descending, k rows. Executes as
    * TakeOrderedAndProject (per-partition heaps, no shuffle of vectors). */
  def bruteForceTopK(df: DataFrame, vec: Column, id: Column, query: Seq[Double], k: Int): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val q = query.toIndexedSeq
    // null / zero-norm vectors score NaN, and Spark orders NaN ABOVE every
    // double — they would displace real neighbors at rank 1. Drop them.
    val scoreUdf = udf((v: Seq[Double]) => if (v == null) Double.NaN else dotK(v, q) / (normK(v) * qn))
    df.select(id.as("id"), scoreUdf(vec.cast("array<double>")).as("cosine"))
      .filter(!isnan(col("cosine")))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes: component h(i,d) derived from a
    * hash of (seed, i, d), mapped to [-1, 1). Reproducible across runs with
    * no stored model. */
  def hyperplanes(numBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until numBits).map { i =>
      (0 until dim).map { d =>
        // splitmix64-style scramble — public-domain bit mixer
        var z = seed + (i.toLong << 32) + d.toLong + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        (z.toDouble / Long.MaxValue.toDouble)
      }
    }

  /** Sign-bit LSH signature (as a long) for a vector column. */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        val pc = array(p.map(lit): _*)
        when(dot(vec, pc) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }
      .reduce((a, b) => a.bitwiseOR(b))

  /** All signatures within Hamming distance `maxH` of `qSig` over `numBits`
    * bits — the multi-probe set. C(numBits, ≤maxH) values; keep maxH small. */
  private[ann] def sigsWithin(qSig: Long, numBits: Int, maxH: Int): Seq[Long] =
    (0 to maxH).flatMap { h =>
      (0 until numBits).combinations(h).map(_.foldLeft(qSig)((s, b) => s ^ (1L << b))).toSeq
    }

  /** Materialize `df` as an LSH-bucketed store: parquet PARTITIONED by the
    * top `prefixBits` of the signature (directory per prefix), full signature
    * kept as a column. This is the scale path the query-time LSH promises:
    * probes become partition-pruned reads instead of full scans. One tiny job
    * reads the vector dimension; one job writes. */
  def writeLshBucketed(
      df: DataFrame,
      vec: Column,
      id: Column,
      path: String,
      numBits: Int = 8,
      prefixBits: Int = 4,
      seed: Long = 42L
  ): Unit = {
    require(prefixBits >= 1 && prefixBits <= numBits, "1 <= prefixBits <= numBits")
    val dim = df.select(size(vec.cast("array<double>"))).head().getInt(0)
    val planes = hyperplanes(numBits, dim, seed)
    df.select(id.as("id"), vec.as("embedding"), lshSignature(vec, planes).as("sig"))
      .withColumn("sig_prefix", shiftrightunsigned(col("sig"), numBits - prefixBits))
      .write
      .mode("overwrite")
      .partitionBy("sig_prefix")
      .parquet(path)
  }

  /** Top-k probe against a [[writeLshBucketed]] store: enumerate the
    * signatures within `probeHamming` of the query's, push their PREFIX set
    * into the partition filter (directory pruning — the scan never lists the
    * other buckets) and the exact signature set into a data filter, then
    * brute-force cosine over the surviving candidates. */
  def lshTopKStored(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      query: Seq[Double],
      k: Int,
      numBits: Int = 8,
      prefixBits: Int = 4,
      probeHamming: Int = 2,
      seed: Long = 42L
  ): DataFrame = {
    val planes = hyperplanes(numBits, query.size, seed)
    val qSig = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val probes = sigsWithin(qSig, numBits, probeHamming)
    val prefixes = probes.map(_ >>> (numBits - prefixBits)).distinct
    val q = array(query.map(lit): _*)
    val qn = math.sqrt(query.map(x => x * x).sum)
    spark.read
      .parquet(path)
      .filter(col("sig_prefix").isin(prefixes: _*)) // partition pruning
      .filter(col("sig").isin(probes: _*))
      .select(col("id"), (dot(col("embedding"), q) / (l2norm(col("embedding")) * lit(qn))).as("cosine"))
      .filter(!isnan(col("cosine")))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** LSH-bucketed top-k: compute the query's bucket, scan only rows whose
    * signature matches within `probeHamming` bits, brute-force inside.
    * Approximate: recall depends on numBits/probeHamming. Prefer
    * [[lshTopKStored]] — this variant still SCANS the full table (cheap
    * inner loop, full I/O); the stored variant prunes partitions. */
  def lshTopK(
      df: DataFrame,
      vec: Column,
      id: Column,
      query: Seq[Double],
      k: Int,
      numBits: Int = 16,
      probeHamming: Int = 2,
      seed: Long = 42L
  ): DataFrame = {
    val planes = hyperplanes(numBits, query.size, seed)
    val qSig = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val sig = lshSignature(vec, planes)
    val q = array(query.map(lit): _*)
    val qn = math.sqrt(query.map(x => x * x).sum)
    df.select(id.as("id"), vec.as("_v"), sig.as("_sig"))
      .filter(bit_count(col("_sig").bitwiseXOR(lit(qSig))) <= probeHamming)
      .select(col("id"), (dot(col("_v"), q) / (l2norm(col("_v")) * lit(qn))).as("cosine"))
      .filter(!isnan(col("cosine"))) // zero-norm guard (NaN sorts above all)
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}
