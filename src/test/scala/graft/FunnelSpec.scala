package graft

import org.apache.spark.sql.functions._
import graft.stats.Funnel

/** Sequential funnel: in-order first-times, at-or-after (>=) inclusivity,
  * stalls stay NULL, out-of-order steps don't count, keys isolated. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  test("firstTimes: ordered matching, same-instant counts, out-of-order ignored") {
    val ev = Seq(
      // key 1: full funnel — a@10, b@10 (same instant, counts), c@30
      (1L, 10L, "a"), (1L, 10L, "b"), (1L, 30L, "c"),
      // key 2: b before a never counts; later b@50 does; no c
      (2L, 5L, "b"), (2L, 20L, "a"), (2L, 50L, "b"),
      // key 3: c first and only -> no step-1 row at all
      (3L, 7L, "c"),
      // key 4: a only
      (4L, 9L, "a"),
      // key 1 extra: an earlier c@5 (before b) must not win
      (1L, 5L, "c")
    ).toDF("k", "t", "s")
    val got = Funnel.firstTimes(ev.repartition(4), col("k"), col("t"), col("s"), steps)
      .collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
         if (r.isNullAt(2)) None else Some(r.getLong(2)),
         if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    assert(got == Map(
      1L -> ((Some(10L), Some(10L), Some(30L))),
      2L -> ((Some(20L), Some(50L), None)),
      4L -> ((Some(9L), None, None))))
  }

  test("card: reached-step counts") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "a")
    ).toDF("k", "t", "s")
    val row = Funnel.card(ev, col("k"), col("t"), col("s"), steps).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("plan: aggregates and joins only — no window over the event stream, no cartesian") {
    val ev = (0 until 3000).map(i => ((i % 50).toLong, i.toLong, Seq("a", "b", "c", "x")(i % 4)))
      .toDF("k", "t", "s")
    val plan = Funnel.firstTimes(ev, col("k"), col("t"), col("s"), steps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel joins must stay key equi-joins:\n$plan")
    assert(!plan.contains("Window"), s"funnel must not window the event stream:\n$plan")
  }
}
