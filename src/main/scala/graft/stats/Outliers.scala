package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tukey-fence outlier detection — the classic distribution check a
  * validation run adds next to min/max/enum constraints: per group, exact
  * quartiles Q1/Q3 over an integer value column, fences at k·IQR beyond
  * them, and the count of rows outside each fence (reference analogue:
  * the summary statistics the reference report attaches per column;
  * beyond-reference the way SURVEY §2.8's drift/heavy-hitter cards are).
  *
  * Exactness discipline: values are caller-provided integers (cents,
  * counts, fixed-point scores), the quantile is the RATIONAL-rank
  * discrete quantile — Q_{a/b} = min v whose 1-based rank r satisfies
  * b·r ≥ a·n (percentile_disc semantics with zero float anywhere) — and
  * the fence test is cross-multiplied (kDen·v < kDen·Q1 − kNum·IQR), so a
  * SQL oracle restates every verdict bit-for-bit.
  *
  * Scale shape: ONE groupBy(group, v) partial-aggregating scan of the raw
  * rows; everything downstream — the rank window, the fence join, the
  * outlier sums — runs over DISTINCT (group, value) pairs, bounded by the
  * value domain (cents of a bounded metric), never by corpus size. The
  * rank window is partitioned by group ORDER BY value over those distinct
  * rows — the vocabulary-bounded window discipline, not a window over the
  * raw stream. Outlier counts come from the same distinct-pair frame
  * (sum of c beyond the fence): the raw table is scanned exactly once. */
object Outliers {

  /** Per-group exact quartile fences: (_gk, n, q1, q3) with Q1 = min v
    * where 4r ≥ n and Q3 = min v where 4r ≥ 3n over value-ordered ranks. */
  private def fences(counts: DataFrame): DataFrame = {
    val ranked = counts
      .withColumn("_r", sum(col("c")).over(Window.partitionBy("_gk").orderBy("v")))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("_gk")))
    ranked
      .groupBy("_gk")
      .agg(
        max(col("n")).as("n"),
        min(when(col("_r") * 4 >= col("n"), col("v"))).as("q1"),
        min(when(col("_r") * 4 >= col("n") * 3, col("v"))).as("q3"))
  }

  /** (g, n, q1, q3, n_low, n_high): per-group exact quartiles and the
    * number of rows strictly outside the Tukey fences
    * [Q1 − (kNum/kDen)·IQR, Q3 + (kNum/kDen)·IQR] (default k = 3/2).
    * Null group is a real stratum; null values are dropped. */
  def tukeyCard(
      df: DataFrame,
      group: Column,
      value: Column,
      kNum: Long = 3L,
      kDen: Long = 2L
  ): DataFrame = {
    require(kNum >= 0 && kDen > 0, s"fence multiplier must be >= 0: $kNum/$kDen")
    // struct-wrapped group key: a NULL stratum is a real group, and struct
    // equality matches nulls structurally where a bare equi-join would
    // silently drop it (the Sampling.quotaSample lesson)
    val counts = df
      .select(struct(group.as("g")).as("_gk"), value.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("_gk", "v")
      .agg(count(lit(1)).as("c"))
    val iqr = col("q3") - col("q1")
    counts
      // no broadcast HINT (r6): one fences row per group, but group
      // cardinality is caller-controlled — a forced broadcast of a
      // high-cardinality group column (an id, say) would build an
      // unbounded driver-side relation; AQE broadcasts it anyway whenever
      // the runtime size is actually small
      .join(fences(counts), "_gk")
      .groupBy("_gk", "n", "q1", "q3")
      .agg(
        sum(when(col("v") * kDen < col("q1") * kDen - iqr * kNum, col("c"))
          .otherwise(lit(0L))).as("n_low"),
        sum(when(col("v") * kDen > col("q3") * kDen + iqr * kNum, col("c"))
          .otherwise(lit(0L))).as("n_high"))
      .select(col("_gk.g").as("g"), col("n"), col("q1"), col("q3"),
        col("n_low"), col("n_high"))
  }
}
