package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salting for skewed aggregations (north rule: "uniqueness on
  * image_id and phash uses repartition-by-hash with salted skew handling").
  *
  * Spark's hash aggregate already does map-side partial aggregation, which
  * absorbs most key skew before the shuffle. Salting adds a second line of
  * defense for the residual case: a key so hot that even the REDUCE-side
  * per-key state (or a downstream per-key join) overwhelms one task. The
  * two-phase shape:
  *
  *   phase 1: groupBy(key, salt) — salt derived deterministically from the
  *            row identity, spreading one hot key over `salts` reducers;
  *   phase 2: groupBy(key) over the ≤`salts` partial rows per key.
  *
  * Both phases are plain hash aggregates; results are bit-identical to the
  * unsalted aggregation (property-tested).
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): derived from the row id, NOT
    * from rand() (reproducibility across retries/resumes). */
  def saltOf(rowId: Column, salts: Int): Column =
    pmod(xxhash64(rowId), lit(salts)).cast("int")

  /** Salted duplicate-group stats: per key, (count, min(rowId)) computed in
    * two phases. Equivalent to
    * `df.groupBy(key).agg(count, min(rowId))` under any skew. */
  def saltedGroupStats(
      df: DataFrame,
      keyCols: Seq[String],
      rowId: Column,
      salts: Int = 16
  ): DataFrame = {
    val phase1 = df
      .groupBy((keyCols.map(col) :+ saltOf(rowId, salts).as("_salt")): _*)
      .agg(count(lit(1)).as("_pcnt"), min(rowId).as("_pmin"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_pcnt")).as("_cnt"), min(col("_pmin")).as("_first"))
  }
}
