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

  /** Dot product of two float/double array columns — native, codegen'd. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(v: Column): Column = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k against a constant query vector. Output:
    * (id, cosine) ordered descending, k rows. Executes as
    * TakeOrderedAndProject (per-partition heaps, no shuffle). */
  def bruteForceTopK(df: DataFrame, vec: Column, id: Column, query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val qn = math.sqrt(query.map(x => x * x).sum)
    df.select(id.as("id"), (dot(vec, q) / (l2norm(vec) * lit(qn))).as("cosine"))
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

  /** LSH-bucketed top-k: compute the query's bucket, scan only rows whose
    * signature matches within `probeHamming` bits, brute-force inside.
    * Approximate: recall depends on numBits/probeHamming. */
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
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}
