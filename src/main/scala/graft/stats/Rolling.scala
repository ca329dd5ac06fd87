package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key rolling (trailing-k-events) aggregates — the smoothing pass a
  * drift monitor or rate-limit audit reads: each event annotated with the
  * sum/min/max/count of the value over its key's last k events (itself
  * included). Completes the time-series quartet (as-of join, interval
  * join, sessionization, rolling stats).
  *
  * All four window aggregates share ONE (key, (t, id)) frame, so Catalyst
  * plans a single Exchange + sort and evaluates them in one Window
  * operator — never k self-joins, never a range cross-product. The (t, id)
  * tiebreaker makes frames deterministic under timestamp collisions, which
  * is what lets an ANSI `ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`
  * oracle restate the result exactly.
  *
  * Values should be integers (or integer-scaled, e.g. cents) when exact
  * cross-engine comparison matters: integer sum/min/max have no
  * accumulation-order sensitivity, unlike float sums.
  *
  * Scale shape: one shuffle; per-key state is the sort run plus a k-deep
  * ring buffer inside the window operator. Keys are numerous, so
  * partitions stay balanced — same contract as Sessionize. */
object Rolling {

  /** (k, t, id, v, roll_sum, roll_min, roll_max, roll_n) over the trailing
    * `k` events per key, (t, id)-ordered. */
  def trailingAgg(
      events: DataFrame,
      key: Column,
      time: Column,
      id: Column,
      value: Column,
      k: Int
  ): DataFrame = {
    require(k > 0, "window size k must be positive")
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("id"))
      .rowsBetween(-(k - 1), Window.currentRow)
    events
      .select(key.as("k"), time.cast("long").as("t"), id.as("id"), value.as("v"))
      .select(col("k"), col("t"), col("id"), col("v"),
        sum(col("v")).over(w).as("roll_sum"),
        min(col("v")).over(w).as("roll_min"),
        max(col("v")).over(w).as("roll_max"),
        count(lit(1)).over(w).as("roll_n"))
  }
}
