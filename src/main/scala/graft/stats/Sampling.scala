package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-corpus curation: membership is a
  * pure function of a caller-supplied hash column, so samples are
  * reproducible across runs and clusters, resumable (re-running never
  * changes the verdict for a row), and composable (the same key + hash
  * always lands on the same side — joins between sampled tables stay
  * consistent). Spark's builtin `sample`/`sampleBy` are seeded-RNG per
  * partition: the sample CHANGES with partitioning, which is exactly what
  * a 100-TB pipeline cannot have.
  *
  * The hash column contract: a non-negative integer, uniform on
  * [0, hashMax). Callers choose the hash so downstream systems (or the
  * DuckDB oracle) can recompute membership — e.g. a multiplicative hash of
  * a numeric id is exactly reproducible in ANSI SQL, `xxhash64` is the
  * production-strength choice when only Spark needs to recompute it.
  */
object Sampling {

  /** Shuffle-free deterministic sample: keeps rows with
    * `hashCol < floor(rate * hashMax)`. The plan is a single codegen'd
    * filter — pushes down to the scan like any predicate; no shuffle, no
    * RNG, no partitioning sensitivity. */
  def rateSample(df: DataFrame, hashCol: Column, rate: Double, hashMax: Long = 1L << 32): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    df.filter(hashCol < lit((rate * hashMax).toLong))
  }

  /** Deterministic MIXTURE sampling — per-stratum rates in one pass (the
    * data-mixing step of corpus assembly: sample each source/language at
    * its own rate to hit a target mixture). Semantics per row: keep iff
    * its stratum has a listed rate r and `hashCol < floor(r * hashMax)`;
    * strata ABSENT from `rates` are dropped entirely — the rate map is a
    * whitelist. The NULL stratum cannot be listed (string keys) and is
    * always dropped; coalesce it to a sentinel upstream to mix it.
    *
    * Scale shape: the rate map compiles to ONE codegen'd CASE threshold —
    * a single filter, no shuffle, no RNG, partitioning-independent, and
    * pushable to the scan like any predicate. Same reproducibility
    * contract as [[rateSample]]: membership is a pure function of
    * (stratum, hash). */
  def mixtureSample(
      df: DataFrame,
      stratum: Column,
      hashCol: Column,
      rates: Map[String, Double],
      hashMax: Long = 1L << 32
  ): DataFrame = {
    require(rates.nonEmpty, "rates must list at least one stratum")
    rates.foreach { case (k, r) =>
      require(r >= 0.0 && r <= 1.0, s"rate for stratum '$k' must be in [0,1]: $r")
    }
    // disjoint conditions: fold order is irrelevant to the result
    val threshold = rates.foldLeft(lit(null).cast("long")) { case (acc, (k, r)) =>
      when(stratum <=> lit(k), lit((r * hashMax).toLong)).otherwise(acc)
    }
    // an unlisted stratum yields a NULL threshold; `hash < NULL` is NULL
    // and filter drops it — the whitelist semantics above
    df.filter(hashCol < threshold)
  }

  /** Deterministic per-stratum UPSAMPLING — the weights-above-1 sibling of
    * [[mixtureSample]] (corpus assembly runs some sources for MORE than
    * one epoch: LLaMA's sampling table gives Wikipedia 2.45 epochs and
    * books 2.23 while CommonCrawl stays ≤1, Touvron et al. 2023 §2.1).
    * A row in stratum s with weight w appears `floor(w)` times, plus once
    * more iff `hashCol < frac(w)·hashMax` — so the fractional epoch is the
    * SAME deterministic sub-corpus [[rateSample]] would select, membership
    * is a pure function of (stratum, hash) (reproducible across runs and
    * partitionings, stable as the corpus grows), and the extra-epoch sets
    * nest as weights grow. Strata absent from `weights` are dropped
    * (whitelist, as in [[mixtureSample]]); the NULL stratum is always
    * dropped. Output: input columns + `epoch` (0-based copy index) —
    * downstream shuffling/packing can tell copies apart.
    *
    * Scale shape: the weight map compiles to TWO codegen'd CASE columns
    * (whole epochs, fractional threshold); the fan-out is one Generate
    * (explode of a 0..copies-1 sequence) — no shuffle, no join, no RNG,
    * output size exactly sum(w_s·|s|) rows. */
  def upsample(
      df: DataFrame,
      stratum: Column,
      hashCol: Column,
      weights: Map[String, Double],
      hashMax: Long = 1L << 32
  ): DataFrame = {
    require(weights.nonEmpty, "weights must list at least one stratum")
    weights.foreach { case (k, w) =>
      require(w >= 0.0 && w <= 1000.0, s"weight for stratum '$k' must be in [0,1000]: $w")
    }
    val whole = weights.foldLeft(lit(null).cast("long")) { case (acc, (k, w)) =>
      when(stratum <=> lit(k), lit(math.floor(w).toLong)).otherwise(acc)
    }
    val fracThresh = weights.foldLeft(lit(null).cast("long")) { case (acc, (k, w)) =>
      when(stratum <=> lit(k), lit(((w - math.floor(w)) * hashMax).toLong)).otherwise(acc)
    }
    // unlisted stratum -> NULL whole -> NULL copies -> filter drops (the
    // whitelist); fracThresh 0 never fires (hash < 0 is false)
    val copies = whole + when(hashCol < fracThresh, lit(1L)).otherwise(lit(0L))
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }

  /** Temperature-BALANCED mixture sampling — computes the per-stratum
    * rates [[mixtureSample]] wants FROM the corpus itself: the
    * multilingual rebalancing trick of mT5/XLM-R (sample language l with
    * probability ∝ p_l^α), in its deterministic keep-smallest-intact
    * form at α = 1/2: rate_l = sqrt(n_min / n_l), so effective counts
    * become sqrt(n_min · n_l) — the geometric compromise between raw
    * frequency and uniform, with the rarest stratum kept whole. Every
    * arithmetic step (long→double conversion, division, sqrt, the ×2^32
    * threshold scale) is IEEE-correctly-rounded, so a SQL oracle
    * reproduces membership bit-exactly.
    *
    * Scale shape: one count-per-stratum aggregation (bounded output —
    * strata are languages/sources), rates computed on the driver, then the
    * single codegen'd CASE filter of [[mixtureSample]] — no shuffle on the
    * data pass, no RNG. Strata must be strings; NULL strata are dropped
    * (the [[mixtureSample]] whitelist). */
  def temperatureSample(
      df: DataFrame,
      stratum: Column,
      hashCol: Column,
      hashMax: Long = 1L << 32
  ): DataFrame = {
    val counts = df.groupBy(stratum.as("_st")).count()
      .collect()
      .collect { case r if !r.isNullAt(0) => r.getString(0) -> r.getLong(1) }
      .toMap
    require(counts.nonEmpty, "at least one non-null stratum required")
    val nMin = counts.values.min.toDouble
    val rates = counts.map { case (k, n) => k -> math.sqrt(nMin / n) }
    mixtureSample(df, stratum, hashCol, rates, hashMax)
  }

  /** EXACT deterministic top-`quota` rows per stratum, ordered by ascending
    * (hashCol, tie) — per-language / per-source / per-domain caps with
    * reproducible membership.
    *
    * Scale shape (never a full-corpus window): a giant stratum would make
    * `row_number() over (partition by stratum)` sort the whole stratum on
    * one task chain. Instead:
    *  1. per-stratum counts (one partial-agg groupBy, tiny result);
    *  2. hash-threshold PRE-FILTER at rate ≈ 2×quota/count (the ordering
    *     key IS the hash, so the quota smallest rows survive whenever at
    *     least `quota` rows pass — survivors ≈ 2×quota per stratum);
    *  3. strata whose survivor count fell below min(quota, count) — a
    *     vanishingly rare tail event of the uniform hash — fall back to
    *     their full row set, by union;
    *  4. the exact window runs over ~2×quota rows per stratum, not the
    *     corpus.
    * Result is EXACTLY the brute-force single-window answer (spec-pinned),
    * at the cost of two cheap aggregations. */
  def quotaSample(
      df: DataFrame,
      stratum: Column,
      hashCol: Column,
      tie: Column,
      quota: Int,
      hashMax: Long = 1L << 32
  ): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    import org.apache.spark.sql.expressions.Window
    // struct-wrap makes the stratum key NULL-SAFE through every equi-join
    // below (Spark compares complex types structurally, so struct(null) =
    // struct(null) matches) — a null stratum (e.g. missing lang) is a real
    // partition exactly as the brute-force window treats it
    val base = df.withColumn("_st", struct(stratum)).withColumn("_h", hashCol).withColumn("_tie", tie)
    val counts = base.groupBy(col("_st")).agg(count(lit(1)).as("_cnt"))
    // pre-filter threshold per stratum; rate capped at 1 keeps everything
    val withThresh = counts.select(
      col("_st"),
      col("_cnt"),
      least(lit(1.0), lit(2.0 * quota) / col("_cnt")).as("_rate"))
    val joined = base.join(broadcast(withThresh), Seq("_st"))
    val pre = joined.filter(col("_h") < (col("_rate") * lit(hashMax.toDouble)).cast("long"))
    // rare-undershoot fallback: strata where the pre-filter kept fewer than
    // min(quota, count) rows re-enter in full
    // LEFT join from the full stratum list: a stratum whose pre-filter kept
    // ZERO rows is absent from pre's groupBy and must still count as short
    val short = counts
      .join(pre.groupBy(col("_st")).agg(count(lit(1)).as("_kept")), Seq("_st"), "left")
      .filter(coalesce(col("_kept"), lit(0L)) < least(lit(quota.toLong), col("_cnt")))
      .select(col("_st"))
    // short strata re-enter WHOLE and leave the pre set entirely (anti/semi
    // on the same tiny key set) — never a distinct, which would collapse
    // genuinely duplicated input rows the brute-force window keeps
    val candidates = pre.join(broadcast(short), Seq("_st"), "left_anti").drop("_cnt", "_rate")
      .unionAll(joined.join(broadcast(short), Seq("_st"), "left_semi").drop("_cnt", "_rate"))
    val w = Window.partitionBy(col("_st")).orderBy(col("_h"), col("_tie"))
    candidates
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= quota)
      .drop("_st", "_h", "_tie", "_rk")
  }

  /** Deterministic TRAIN/VALIDATION/TEST split — the holdout-assignment
    * step of corpus assembly. Every row gets a `split` label from `splits`
    * (ordered (name, weight) fractions): split i owns the hash range
    * [floor(cum_{i-1}·hashMax), floor(cum_i·hashMax)), and the LAST split
    * absorbs any float-rounding remainder so the assignment is total.
    * Assignment is a pure function of the hash — reproducible across runs
    * and partitionings, and a row's split never changes when the corpus
    * grows (the property per-partition RNG splits lack, and the reason
    * test contamination can't creep in on re-ingestion).
    *
    * Scale shape: one codegen'd CASE projection, no shuffle, no RNG. */
  def hashSplit(
      df: DataFrame,
      hashCol: Column,
      splits: Seq[(String, Double)],
      hashMax: Long = 1L << 32
  ): DataFrame = {
    require(splits.nonEmpty, "splits must list at least one label")
    splits.foreach { case (k, w) => require(w > 0.0, s"weight for '$k' must be > 0: $w") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1: $total")
    val bounds = splits.scanLeft(0.0) { case (cum, (_, w)) => cum + w }.tail
    val label = splits.init.zip(bounds.init).foldRight(lit(splits.last._1)) {
      case (((name, _), cum), acc) => when(hashCol < lit((cum * hashMax).toLong), lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Leakage-safe holdout split — [[hashSplit]] assigned per NEAR-DUP
    * CLUSTER instead of per document. Plain per-doc hash splitting has a
    * silent failure mode every eval team eventually hits: two near-copies
    * of the same document hash to different splits, so the model trains on
    * (a paraphrase of) its own test set. Here the split hash is taken of
    * the cluster's CANONICAL id (connected components over `pairs`,
    * singletons keep their own id — [[graft.dedup.Dedup.components]]), so
    * every member of a near-dup cluster lands in the SAME split by
    * construction: cross-split leakage is zero, provably, not sampled-for.
    * Output: the corpus ids with (id, comp, split).
    *
    * Scale shape: the CC label join is the only work beyond components
    * itself; the split label is a codegen'd CASE projection of comp (no
    * extra shuffle). Determinism is total — same pairs, same splits →
    * same assignment on any partitioning, and membership is recomputable
    * in ANSI SQL (recursive-CTE closure + the same multiplicative hash),
    * which is how q126's oracle restates every row. */
  def leakageSafeSplit(
      corpus: DataFrame,
      id: Column,
      pairs: DataFrame,
      a: Column,
      b: Column,
      splits: Seq[(String, Double)],
      hashOf: Column => Column,
      hashMax: Long = 1L << 32
  ): DataFrame = {
    val canon = graft.dedup.Dedup.components(corpus, id, pairs, a, b)
    hashSplit(canon, hashOf(col("comp")), splits, hashMax)
  }

  /** Weighted sample WITHOUT replacement, probability (approximately)
    * proportional to weight — sequential Poisson sampling (Ohlsson 1998),
    * the deterministic order-sampling scheme survey statisticians use and
    * the right tool for "keep k docs, favoring high quality scores" corpus
    * mixing. Each row's priority key is `hash / weight` (smaller wins):
    * a uniform hash divided by a larger weight is stochastically smaller,
    * so heavy rows win proportionally more often; the scheme is exactly
    * πps as k grows. The key is ONE IEEE division of driver-free
    * per-row values — correctly rounded in every engine (the q97
    * discipline) — so a SQL oracle reproduces the selection bit-for-bit;
    * ties (possible: h1/w1 == h2/w2 exactly, e.g. doubled hash and
    * weight) break on `tie`.
    *
    * Scale shape: no shuffle at all — `orderBy(...).limit(k)` compiles to
    * TakeOrderedAndProject, a per-partition top-k heap reduced on the
    * driver: O(k) memory per partition, O(k·numPartitions) driver work,
    * the corpus is read once. Determinism is total: same input, same k →
    * same rows on any partitioning.
    *
    * Rows with NULL or non-positive weight are EXCLUDED before keying: a
    * zero weight means selection probability zero (πps semantics), a
    * negative one is undefined — and unguarded they would hijack the
    * sort (NULL keys sort FIRST ascending; negative weights produce the
    * smallest keys), filling the "top k" with exactly the rows the
    * weighting exists to deprioritize. */
  def weightedSample(
      df: DataFrame,
      weight: Column,
      hashCol: Column,
      tie: Column,
      k: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("_key", hashCol.cast("double") / weight.cast("double"))
      .orderBy(col("_key"), tie)
      .limit(k)
      .withColumnRenamed("_key", "key")
  }
}
