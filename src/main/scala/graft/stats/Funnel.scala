package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential funnel — per key, the earliest time of step 1, then the
  * earliest step-2 event AT OR AFTER it, then the earliest step-3 event at
  * or after that, and so on: the product-analytics "signup → click →
  * purchase, in order" question, and for a curation pipeline the
  * crawl-lifecycle audit (fetched → parsed → admitted).
  *
  * Construction is one conditional-min aggregate per step, each joined
  * back on the key: step k's frame is (key, t_k); step k+1 filters events
  * to its step name, inner-joins the step-k frame on the key, keeps
  * `t >= t_k`, and takes min(t) per key. Every aggregate and join hashes
  * on the SAME key, so the s-step funnel is s map-side-combinable
  * aggregates + (s−1) co-partitionable joins — AQE reuses the
  * partitioning; never a window over the full event stream and never a
  * cross-step cartesian. Output keeps every step-1 key (left joins), with
  * NULL times where the funnel stalled — exactly what an ANSI chain of
  * conditional-min CTEs restates.
  *
  * "At or after" (>=) makes a same-instant step pair count as ordered —
  * the standard funnel convention (a purchase logged the same microsecond
  * as the click counts); times are caller-provided longs so the compare
  * is exact. Corollary of that convention: with a REPEATED step name
  * (`steps = Seq("click", "click")`), one event satisfies both
  * occurrences (t2 = t1 = its own time) — a same-step retry funnel needs
  * per-occurrence event identity (e.g. a strict `>` chain over distinct
  * event ids), which this operator deliberately does not model. */
object Funnel {

  /** (k, t1, t2, ..., tS) — one row per key that performed step 1;
    * t_i is NULL once the funnel stalls (and stays NULL after). */
  def firstTimes(
      events: DataFrame,
      key: Column,
      time: Column,
      step: Column,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val base = events.select(key.as("k"), time.cast("long").as("t"), step.as("s"))
    val s1 = base.filter(col("s") === steps.head)
      .groupBy("k").agg(min(col("t")).as("t1"))
    steps.tail.zipWithIndex.foldLeft(s1) { case (acc, (name, i)) =>
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val next = base.filter(col("s") === name)
        .join(acc.select(col("k"), col(prev)), Seq("k"))
        .filter(col("t") >= col(prev))
        .groupBy("k").agg(min(col("t")).as(cur))
      acc.join(next.select(col("k"), col(cur)), Seq("k"), "left")
    }
  }

  /** The rollup card: how many keys reached each step. One row. */
  def card(
      events: DataFrame,
      key: Column,
      time: Column,
      step: Column,
      steps: Seq[String]
  ): DataFrame = {
    val ft = firstTimes(events, key, time, step, steps)
    ft.agg(
      count(col("t1")).as("n_step1"),
      steps.indices.tail.map(i => count(col(s"t${i + 1}")).as(s"n_step${i + 1}")): _*)
  }
}
