package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for every probe row, the single reference row
  * with the greatest timestamp ≤ the probe's, per key: the time-series
  * operator Spark's join surface lacks (an inequality theta-join plans as
  * a cartesian range explosion), and the backbone of "which config /
  * threshold / dimension version was LIVE when this event happened"
  * validation passes.
  *
  * Construction is the classic UNION-AND-SWEEP: tag both sides, union,
  * sort within each key by (time, side) with the reference side FIRST at
  * equal timestamps (inclusive "at or before" semantics — identical to
  * SQL `ASOF JOIN ... ON probe.t >= ref.t`), and carry the last non-null
  * reference value forward with a running `last(..., ignoreNulls)` window.
  * Probes before any reference row get NULL (left-join semantics).
  *
  * Scale shape: ONE hash shuffle of each side on the key plus an
  * in-partition sort — never a range cross-product; the window is the
  * running-last form (rowsBetween unboundedPreceding→current), which
  * Spark evaluates streamingly in one pass, no per-row rescans. The
  * window partitions by the JOIN KEY, so distribution is key-bounded
  * (the q129 per-stratum argument); a pathologically hot key is a salting
  * candidate upstream, same as any keyed join. Reference rows sharing
  * (key, t) must be pre-deduplicated by the caller — "which of two
  * same-instant versions wins" is not well-defined in any engine (DuckDB's
  * ASOF picks arbitrarily); dedup first and the two engines agree.
  *
  * Output: every probe row's (key, t, probe id) plus the matched
  * reference value column (NULL when no reference is at-or-before). */
object AsOfJoin {

  def asOf(
      probes: DataFrame,
      pKey: Column,
      pTime: Column,
      pId: Column,
      refs: DataFrame,
      rKey: Column,
      rTime: Column,
      rValue: Column
  ): DataFrame = {
    val p = probes.select(
      pKey.as("k"), pTime.as("t"), pId.as("id"),
      lit(null).cast(refs.select(rValue).schema.head.dataType).as("_rv"),
      lit(1).as("_side"))
    val r = refs.select(
      rKey.as("k"), rTime.as("t"), lit(null).cast(probes.select(pId).schema.head.dataType).as("id"),
      rValue.as("_rv"),
      lit(0).as("_side"))
    // refs sort before probes at equal t => inclusive at-or-before match
    val w = Window
      .partitionBy("k")
      .orderBy(col("t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(r)
      .withColumn("asof_value", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("id"), col("k"), col("t"), col("asof_value"))
  }
}
