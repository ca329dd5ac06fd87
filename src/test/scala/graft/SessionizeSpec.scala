package graft

import org.apache.spark.sql.functions._
import graft.stats.Sessionize

/** Gap-based sessionization: boundary semantics (strictly-greater gap
  * splits, equal gap does not), per-key isolation, deterministic tie
  * ordering, single-shuffle plan. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("assign: gap > threshold splits, gap == threshold does not, keys isolated") {
    val gap = 100L
    val ev = Seq(
      // key 1: [0, 50, 150] one session (gaps 50, 100 == gap -> no split),
      // then 251 (gap 101 > gap -> new), then 260
      (1L, 0L, 10L), (1L, 50L, 11L), (1L, 150L, 12L), (1L, 251L, 13L), (1L, 260L, 14L),
      // key 2: single event
      (2L, 5000L, 20L),
      // key 3: tie timestamps — id breaks the order, same session
      (3L, 7L, 31L), (3L, 7L, 30L), (3L, 300L, 32L)
    ).toDF("k", "t", "id")
    val got = Sessionize.assign(ev.repartition(4), col("k"), col("t"), col("id"), gap)
      .select("id", "session").as[(Long, Long)].collect().toMap
    assert(got == Map(
      10L -> 0L, 11L -> 0L, 12L -> 0L, 13L -> 1L, 14L -> 1L,
      20L -> 0L,
      30L -> 0L, 31L -> 0L, 32L -> 1L))
  }

  test("card: per-session count/start/end/duration") {
    val ev = Seq(
      (1L, 0L, 1L), (1L, 50L, 2L), (1L, 500L, 3L), (1L, 510L, 4L)
    ).toDF("k", "t", "id")
    val got = Sessionize.card(ev, col("k"), col("t"), col("id"), gapMicros = 100L)
      .orderBy("session")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 2L, 0L, 50L, 50L), (1L, 1L, 2L, 500L, 510L, 10L)))
  }

  test("plan: both windows share one Exchange — a single shuffle, no self-join") {
    val ev = (0 until 2000).map(i => ((i % 7).toLong, (i * 31L) % 10000L, i.toLong))
      .toDF("k", "t", "id")
    val plan = Sessionize.assign(ev, col("k"), col("t"), col("id"), 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"sessionize must never self-join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$plan")
  }
}
