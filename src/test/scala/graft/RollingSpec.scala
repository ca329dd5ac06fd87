package graft

import org.apache.spark.sql.functions._
import graft.stats.Rolling

/** Trailing-k rolling aggregates: frame semantics (k-deep, self-inclusive,
  * shorter at the head), per-key isolation, deterministic tie order,
  * single-shuffle single-Window plan. */
class RollingSpec extends SparkSpec {
  import spark.implicits._

  test("trailingAgg: k=3 frames, head shorter, keys isolated, ties id-ordered") {
    val ev = Seq(
      (1L, 10L, 1L, 5L), (1L, 20L, 2L, 7L), (1L, 30L, 3L, 1L), (1L, 40L, 4L, 9L),
      (2L, 10L, 5L, 100L),
      // tie at t=50: id order decides which is "earlier" in the frame
      (3L, 50L, 7L, 2L), (3L, 50L, 6L, 4L), (3L, 60L, 8L, 8L)
    ).toDF("k", "t", "id", "v")
    val got = Rolling.trailingAgg(ev.repartition(4), col("k"), col("t"), col("id"), col("v"), k = 3)
      .select("id", "roll_sum", "roll_min", "roll_max", "roll_n")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 5L, 5L, 5L, 1L),
      (2L, 12L, 5L, 7L, 2L),
      (3L, 13L, 1L, 7L, 3L),
      (4L, 17L, 1L, 9L, 3L), // frame slides: 7,1,9
      (5L, 100L, 100L, 100L, 1L),
      (6L, 4L, 4L, 4L, 1L),  // id 6 sorts before id 7 at equal t
      (7L, 6L, 2L, 4L, 2L),
      (8L, 14L, 2L, 8L, 3L)))
  }

  test("plan: all four aggregates in one Window over one Exchange") {
    val ev = (0 until 3000).map(i => ((i % 11).toLong, (i * 17L) % 9000L, i.toLong, (i % 97).toLong))
      .toDF("k", "t", "id", "v")
    val plan = Rolling.trailingAgg(ev, col("k"), col("t"), col("id"), col("v"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"rolling stats must never self-join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$plan")
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows == 1, s"all aggregates must share one Window operator, got $windows:\n$plan")
  }
}
