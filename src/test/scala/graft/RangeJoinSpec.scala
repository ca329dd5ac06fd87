package graft

import org.apache.spark.sql.functions._
import graft.stats.RangeJoin

/** Interval (range) join: bucketized hash join + exact residual — verified
  * against the brute-force BETWEEN join, boundary-inclusive, one row per
  * containment pair (a point maps to ONE bucket, so multi-bucket intervals
  * never duplicate), never a cartesian plan. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("intervalJoin == brute-force BETWEEN join, including bucket-boundary times") {
    val w = 100L
    // points planted to hit bucket edges exactly (t % w == 0), interval
    // edges, inside, outside; keys 0..3
    val points = (0 until 400).map { i =>
      (i.toLong % 4, (i.toLong * 37) % 1000, i.toLong)
    }.toDF("k", "t", "id")
    // intervals: varied spans 0..~350 (some single-bucket, some 4-bucket,
    // some degenerate s==e, some inverted -> dropped)
    val intervals = (0 until 60).map { j =>
      val s = (j.toLong * 53) % 900
      val e = if (j % 11 == 7) s - 10 else s + (j.toLong % 8) * 50
      (j.toLong % 4, s, e, 1000L + j)
    }.toDF("k", "s", "e", "iid")

    val got = RangeJoin
      .intervalJoin(points, col("k"), col("t"), col("id"),
        intervals, col("k"), col("s"), col("e"), col("iid"), bucketWidth = w)
      .select("p_id", "i_id").as[(Long, Long)].collect().sorted.toSeq

    val want = points.as[(Long, Long, Long)].collect().flatMap { case (k, t, id) =>
      intervals.as[(Long, Long, Long, Long)].collect().collect {
        case (ik, s, e, iid) if ik == k && s <= t && t <= e => (id, iid)
      }
    }.sorted.toSeq

    assert(want.nonEmpty && want.size < 400L * 60, "fixture must be non-trivial and non-total")
    assert(got == want)
  }

  test("intervalJoin plan: hash join on (key, bucket), never a cartesian") {
    val points = (0 until 500).map(i => (i.toLong % 7, i.toLong * 13 % 5000, i.toLong))
      .toDF("k", "t", "id")
    val intervals = (0 until 50).map(j => (j.toLong % 7, j.toLong * 90, j.toLong * 90 + 300, j.toLong))
      .toDF("k", "s", "e", "iid")
    val plan = RangeJoin
      .intervalJoin(points, col("k"), col("t"), col("id"),
        intervals, col("k"), col("s"), col("e"), col("iid"), bucketWidth = 250L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join on (key, bucket):\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash-family join:\n$plan")
  }
}
