package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed RANGE (interval) join — every (key, t) point matched to
  * every interval [start, end] of the same key that contains it: the
  * second time-series operator Spark's equi-join surface lacks (a raw
  * `ON p.t BETWEEN i.start AND i.end` plans as a per-key cartesian with a
  * post-filter). The validation-pipeline uses: "which maintenance window /
  * experiment / incident was this event inside", sessionization against
  * declared windows, joining metrics to SLA periods.
  *
  * Construction is BUCKETIZATION (the standard distributed interval-join
  * trick, e.g. Spark's own stream-stream range hints and GeoSpark-style
  * grids): pick a bucket width W, explode each interval to its covered
  * buckets (⌈len/W⌉ + 1 rows), map each point to ONE bucket, hash-join on
  * (key, bucket), then apply the exact `start <= t <= end` residual.
  * Correctness is bucket-independent (the residual is exact; buckets only
  * bound which pairs are examined) — W tunes the explode factor
  * (≈ avg_len/W rows per interval) against per-bucket fan-in, the usual
  * space/skew dial.
  *
  * Scale shape: ONE hash shuffle of each side on (key, bucket); the
  * residual filter runs inside the join's codegen. Never a cartesian —
  * asserted by spec. Times are caller-provided LONGS (epoch micros via
  * `unix_micros`, or any monotone integer clock) so the oracle arithmetic
  * is exact integer compare on both engines.
  *
  * Output: (point id, interval id, k, t) — one row per containment pair
  * (inner-join semantics; a point in no interval emits nothing).
  *
  * Times must satisfy |t| < 2^53: bucket assignment is floor division
  * computed as `(t - pmod(t, w)) / w` — the numerator is an exact multiple
  * of w, so the double division is IEEE-exact (true quotient is a
  * representable integer); a raw `(t / w).cast("long")` would round
  * through an inexact double and could misbucket boundary points, silently
  * DROPPING containment pairs. Epoch micros (~1.7e15) are well inside. */
object RangeJoin {

  /** Floor-exact bucket id for longs below 2^53 (pmod keeps it floor, not
    * truncate, for negative times). */
  private def bucket(t: Column, w: Column): Column =
    ((t - pmod(t, w)) / w).cast("long")

  def intervalJoin(
      points: DataFrame,
      pKey: Column,
      pTime: Column,
      pId: Column,
      intervals: DataFrame,
      iKey: Column,
      iStart: Column,
      iEnd: Column,
      iId: Column,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val p = points.select(pKey.as("k"), pTime.cast("long").as("t"), pId.as("p_id"))
      .withColumn("_pb", bucket(col("t"), w))
    val i = intervals
      .select(iKey.as("_ik"), iStart.cast("long").as("_s"), iEnd.cast("long").as("_e"),
        iId.as("i_id"))
      .filter(col("_s") <= col("_e"))
      .withColumn("_ib", explode(sequence(bucket(col("_s"), w), bucket(col("_e"), w))))
    p.join(i, col("k") === col("_ik") && col("_pb") === col("_ib"))
      .filter(col("_s") <= col("t") && col("t") <= col("_e"))
      .select(col("p_id"), col("i_id"), col("k"), col("t"))
  }
}
