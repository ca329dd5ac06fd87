package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication operators for training-data pipelines: exact, normalized,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Shared scale pattern: never window-sort the full corpus. Duplicate groups
  * are found with a partial-aggregating `groupBy(key)` (map-side combine makes
  * skewed keys cheap) and only the tiny duplicate-key set flows into the
  * join-back, which AQE turns into a broadcast join in the common case. First
  * occurrence (lowest id) is the kept representative, matching the
  * first-occurrence-wins semantics of the reference's uniqueness check
  * (reference: custom_checks.py:121-143).
  */
object Dedup {

  /** Rows that are duplicates (by `key`) of an earlier row. Output:
    * (id, kept_id) — `kept_id` is the representative (min id) of the group. */
  def duplicatesByKey(df: DataFrame, key: Column, id: Column): DataFrame = {
    val base = df.select(key.as("_key"), id.as("_id"))
    val groups = base
      .groupBy(col("_key"))
      .agg(count(lit(1)).as("_cnt"), min(col("_id")).as("kept_id"))
      .filter(col("_cnt") > 1)
      .drop("_cnt")
    base
      .join(groups, "_key")
      .filter(col("_id") > col("kept_id"))
      .select(col("_id").as("id"), col("kept_id"))
  }

  /** Exact dedup on the raw text (hash-groupBy on xxhash64 of the bytes —
    * the shuffle key is 8 bytes, never the document). For whitespace/case
    * tolerant exact dedup use [[TextOps.fingerprint]] as the key instead. */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    duplicatesByKey(df, xxhash64(text), id)

  /** Dedup on the sorted distinct token set (order/whitespace-insensitive). */
  def normalizedTokenSet(df: DataFrame, text: Column, id: Column): DataFrame =
    duplicatesByKey(df, array_join(array_sort(array_distinct(TextOps.tokens(text))), " "), id)

  /** SimHash dedup: exact 64-bit signature collision. For hamming-≤k matching
    * split the signature into k+1 bands (pigeonhole) and use [[minHashPairs]]'
    * band-join pattern. */
  def simhash(df: DataFrame, text: Column, id: Column): DataFrame =
    duplicatesByKey(df, TextOps.simhash64(text), id)

  /** splitmix64 scramble (public-domain bit mixer) — remixes one shingle
    * hash into the i-th hash family without re-hashing the string. */
  @inline private def scramble(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Exact Jaccard of two SORTED distinct long arrays — primitive merge. */
  private[dedup] def jaccardLong(a: Seq[Long], b: Seq[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    val na = a.length; val nb = b.length
    while (i < na && j < nb) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  private val jaccardUdf = udf((a: Seq[Long], b: Seq[Long]) => jaccardLong(a, b))

  /** MinHash signature over shingle hashes: `numHashes` minima of splitmix
    * remixes. Per-row compute kernel as a Scala UDF (Catalyst higher-order
    * functions are CodegenFallback/interpreted — measured ~40× slower). */
  def minhashSignature(shingleHashes: Column, numHashes: Int = 32): Column = {
    val k = numHashes
    val u = udf { (sh: Seq[Long]) =>
      val out = new Array[Long](k)
      var i = 0
      while (i < k) {
        val seed = (i + 1).toLong * 0xff51afd7ed558ccdL
        var mn = Long.MaxValue
        var j = 0
        while (j < sh.length) {
          val h = scramble(sh(j) ^ seed)
          if (h < mn) mn = h
          j += 1
        }
        out(i) = mn
        i += 1
      }
      out
    }
    u(shingleHashes)
  }

  /** MinHash+LSH candidate pairs with exact-Jaccard verification.
    *
    * Pipeline (each arrow one distributed op):
    * shingle → minhash signature (scan-local) → explode into `bands` band
    * hashes → groupBy band bucket (partial-agg shuffle) → pairs within
    * buckets (only buckets with ≥2 docs survive; bucket size capped to guard
    * against degenerate buckets) → exact Jaccard on the shingle sets →
    * filter ≥ `threshold` → distinct pairs.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    *
    * @param maxBucket skip pathological buckets larger than this (a single
    *   hot bucket would otherwise produce O(n²) pairs — the skew guard).
    */
  def minHashPairs(
      df: DataFrame,
      text: Column,
      id: Column,
      shingleWords: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.8,
      maxBucket: Int = 1000
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val shingles = TextOps.wordShingleHashes(text, shingleWords)
    val withSh = df.select(id.as("_id"), shingles.as("_sh"))
    val withSig = withSh.select(col("_id"), col("_sh"), minhashSignature(col("_sh"), numHashes).as("_sig"))
    // band structs built at plan time (Scala loop, not an interpreted HOF);
    // slice/cast/xxhash64 are all codegen'd expressions
    val bandCols = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(slice(col("_sig"), b * rows + 1, rows).cast("string")).as("bh")
      )
    }
    val banded = withSig
      .select(col("_id"), col("_sh"), explode(array(bandCols: _*)).as("_b"))
      .select(col("_id"), col("_sh"), col("_b.band"), col("_b.bh"))

    // bucket size guard: count per bucket with a partial agg, drop hot buckets
    val counts = banded.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("_bc"))
    val pruned = banded
      .join(counts.filter(col("_bc").between(2, maxBucket)), Seq("band", "bh"))

    val a = pruned.select(col("band"), col("bh"), col("_id").as("id_a"), col("_sh").as("_sh_a"))
    val b = pruned.select(col("band"), col("bh"), col("_id").as("id_b"), col("_sh").as("_sh_b"))
    val pairs = a
      .join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccardUdf(col("_sh_a"), col("_sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))
    pairs
  }

  /** Near-duplicate pairs by Hamming distance over 64-bit signatures
    * (phash / simhash): split each signature into `bands` contiguous bit
    * bands — pigeonhole guarantees any pair within `bands - 1` bit flips
    * shares at least one band — bucket-join on (band, value), verify the
    * true Hamming distance, emit (id_a, id_b, hamming). The shuffle carries
    * (id, sig, band value): 24 B/row × bands. `maxBucket` guards degenerate
    * buckets (e.g. all-zero signatures). */
  def hammingPairs(
      df: DataFrame,
      sig: Column,
      id: Column,
      maxHamming: Int,
      bands: Int = 8,
      maxBucket: Int = 10000
  ): DataFrame = {
    require(bands > maxHamming, s"need bands > maxHamming for full recall (pigeonhole): $bands <= $maxHamming")
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val base = df.select(id.as("_id"), sig.cast("long").as("_sig"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), shiftrightunsigned(col("_sig"), b * width).bitwiseAND(mask).as("bv"))
    }
    val banded = base
      .select(col("_id"), col("_sig"), explode(array(bandCols: _*)).as("_b"))
      .select(col("_id"), col("_sig"), col("_b.band"), col("_b.bv"))
    val counts = banded.groupBy(col("band"), col("bv")).agg(count(lit(1)).as("_bc"))
    val pruned = banded.join(counts.filter(col("_bc").between(2, maxBucket)), Seq("band", "bv"))
    val a = pruned.select(col("band"), col("bv"), col("_id").as("id_a"), col("_sig").as("_sa"))
    val b = pruned.select(col("band"), col("bv"), col("_id").as("id_b"), col("_sig").as("_sb"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bit_count(col("_sa").bitwiseXOR(col("_sb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Exact n-gram Jaccard similarity for all pairs within blocks (e.g. same
    * language) — quadratic within a block, so only for small/bounded blocks;
    * the scalable path is [[minHashPairs]]. Output: (id_a, id_b, jaccard). */
  def ngramJaccardPairs(
      df: DataFrame,
      text: Column,
      id: Column,
      block: Column,
      shingleWords: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    val base =
      df.select(block.as("_blk"), id.as("_id"), TextOps.wordShingleHashes(text, shingleWords).as("_sh"))
    val a = base.select(col("_blk"), col("_id").as("id_a"), col("_sh").as("_sh_a"))
    val b = base.select(col("_blk"), col("_id").as("id_b"), col("_sh").as("_sh_b"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccardUdf(col("_sh_a"), col("_sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding cosine near-duplicate pairs within blocks (e.g. same label or
    * same LSH bucket): (id_a, id_b, cosine) with cosine ≥ threshold. */
  def embeddingCosinePairs(
      df: DataFrame,
      vec: Column,
      id: Column,
      block: Column,
      threshold: Double = 0.95
  ): DataFrame = {
    import graft.ann.Ann
    // pre-normalise once per row (UDF kernel), pair score is then a pure dot
    val base = df.select(
      block.as("_blk"),
      id.as("_id"),
      vec.cast("array<double>").as("_v"),
      Ann.l2norm(vec).as("_n")
    )
    val a = base.select(col("_blk"), col("_id").as("id_a"), col("_v").as("_va"), col("_n").as("_na"))
    val b = base.select(col("_blk"), col("_id").as("id_b"), col("_v").as("_vb"), col("_n").as("_nb"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (Ann.dot(col("_va"), col("_vb")) / (col("_na") * col("_nb"))).as("cosine")
      )
      .filter(col("cosine") >= threshold)
  }
}
