package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: per-key event streams cut into sessions
  * wherever the inter-event gap exceeds `gapMicros` (the classic 30-minute
  * web-session rule). The validation-pipeline uses: crawl-session
  * reconstruction, rate-limit audits, per-session quality cards.
  *
  * Construction is the standard two-window sweep (lag → boundary flag →
  * running sum), all inside ONE hash shuffle on the key: both windows share
  * the same (key, order) frame, so Catalyst plans a single Exchange + sort
  * and the running sum rides the sorted partition. Never a self-join.
  *
  * Ordering inside a key is (t, id) — the tiebreaker makes session
  * assignment deterministic when timestamps collide, and lets an ANSI
  * oracle restate the sweep exactly. Times are caller-provided longs
  * (epoch micros) so the gap compare is exact integer arithmetic.
  *
  * Scale shape: one shuffle; per-key state is the sort run. Keys are
  * numerous (users) so partitions stay balanced — a single global stream
  * would hot-spot and should be pre-split by a coarser key first. */
object Sessionize {

  /** (k, t, id, session) — session is the 0-based per-key session index. */
  def assign(
      events: DataFrame,
      key: Column,
      time: Column,
      id: Column,
      gapMicros: Long
  ): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("id"))
    events
      .select(key.as("k"), time.cast("long").as("t"), id.as("id"))
      .withColumn("_new",
        when(col("t") - lag(col("t"), 1).over(w) > gapMicros, 1L).otherwise(lit(0L)))
      .withColumn("session", sum(col("_new")).over(w))
      .drop("_new")
  }

  /** Per-session card: event count, start/end, duration — the rollup a
    * crawl-audit reads. One extra hash aggregate on (k, session). */
  def card(
      events: DataFrame,
      key: Column,
      time: Column,
      id: Column,
      gapMicros: Long
  ): DataFrame =
    assign(events, key, time, id, gapMicros)
      .groupBy(col("k"), col("session"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("t")).as("t_start"),
        max(col("t")).as("t_end"))
      .withColumn("duration", col("t_end") - col("t_start"))
}
