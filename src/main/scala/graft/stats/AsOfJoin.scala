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
    // the whole ref row rides the sweep as ONE struct (non-null even when
    // its VALUE is null): a newer NULL-valued reference must win the match
    // and yield NULL, exactly like SQL ASOF LEFT JOIN — a running
    // last(_rv, ignoreNulls) would instead bleed an older value forward
    // past it (the asOfTolerance mechanism, applied here too)
    p.unionByName(r)
      .withColumn("_ref", when(col("_side") === 0, struct(col("_rv").as("_v"))))
      .withColumn("_m", last(col("_ref"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("id"), col("k"), col("t"), col("_m._v").as("asof_value"))
  }

  /** As-of join with a staleness bound (pandas `merge_asof(tolerance=...)`
    * semantics): the latest at-or-before reference still matches, but the
    * match is NULLed when it is older than `toleranceMicros` — "the config
    * must be fresher than X or treat the event as unconfigured". Matching
    * first and filtering second is exactly what a SQL
    * `ASOF LEFT JOIN ... CASE WHEN p.t - r.t <= tol THEN r.v END`
    * computes, so the oracle restates it directly.
    *
    * The reference's (time, value) ride the sweep as ONE struct so the
    * staleness compare always reads the time of the SAME row that supplied
    * the value (two independent running-`last` columns would disagree when
    * a reference value is NULL). Times are caller-provided longs (epoch
    * micros) — the tolerance compare is exact integer arithmetic. Same
    * single-shuffle-per-side shape and (key, t)-unique refs contract as
    * [[asOf]]. */
  def asOfTolerance(
      probes: DataFrame,
      pKey: Column,
      pTime: Column,
      pId: Column,
      refs: DataFrame,
      rKey: Column,
      rTime: Column,
      rValue: Column,
      toleranceMicros: Long
  ): DataFrame = {
    require(toleranceMicros > 0, "toleranceMicros must be positive")
    val refStruct = refs
      .select(struct(rTime.cast("long").as("rt"), rValue.as("rv")).as("_r"))
      .schema.head.dataType
    val p = probes.select(
      pKey.as("k"), pTime.cast("long").as("t"), pId.as("id"),
      lit(null).cast(refStruct).as("_r"),
      lit(1).as("_side"))
    val r = refs.select(
      rKey.as("k"), rTime.cast("long").as("t"),
      lit(null).cast(probes.select(pId).schema.head.dataType).as("id"),
      struct(rTime.cast("long").as("rt"), rValue.as("rv")).as("_r"),
      lit(0).as("_side"))
    val w = Window
      .partitionBy("k")
      .orderBy(col("t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("id"), col("k"), col("t"),
        when(col("t") - col("_m.rt") <= toleranceMicros, col("_m.rv")).as("asof_value"))
  }
}
