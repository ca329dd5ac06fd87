package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.stats.AsOfJoin

/** AS-OF join: inclusive at-or-before matching, left-join semantics,
  * per-key isolation, single-shuffle plan. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOf: latest at-or-before ref per key, inclusive ties, NULL before first ref") {
    val refs = Seq(
      (1L, ts(10), 100.0), (1L, ts(20), 200.0),
      (2L, ts(15), 900.0)
    ).toDF("k", "t", "v")
    val probes = Seq(
      (1L, ts(5), 50L),   // before any ref -> NULL
      (1L, ts(10), 51L),  // == ref ts -> inclusive match 100
      (1L, ts(19), 52L),  // between -> 100
      (1L, ts(25), 53L),  // after second -> 200
      (2L, ts(15), 54L),  // other key, inclusive -> 900
      (3L, ts(99), 55L)   // key with no refs -> NULL
    ).toDF("k", "t", "id")
    val got = AsOfJoin
      .asOf(probes.repartition(4), col("k"), col("t"), col("id"),
        refs.repartition(3), col("k"), col("t"), col("v"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(got == Seq(
      (50L, None), (51L, Some(100.0)), (52L, Some(100.0)),
      (53L, Some(200.0)), (54L, Some(900.0)), (55L, None)))
  }

  test("asOf: a newer NULL-valued ref WINS the match and yields NULL (no older-value bleed)") {
    // SQL ASOF LEFT JOIN matches the ROW, then reads its (null) value; a
    // running last(value, ignoreNulls) would wrongly return 100.0 here
    val refs = Seq[(Long, java.sql.Timestamp, Option[Double])](
      (1L, ts(10), Some(100.0)), (1L, ts(20), None)
    ).toDF("k", "t", "v")
    val probes = Seq((1L, ts(15), 60L), (1L, ts(25), 61L)).toDF("k", "t", "id")
    val got = AsOfJoin
      .asOf(probes.repartition(2), col("k"), col("t"), col("id"),
        refs.repartition(2), col("k"), col("t"), col("v"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(got == Seq((60L, Some(100.0)), (61L, None)))
  }

  test("asOfTolerance: stale matches NULLed, fresh kept inclusive, value-NULL refs still anchor staleness") {
    val refs = Seq(
      (1L, 10L, Some(100.0)), (1L, 20L, None), // t=20 ref has NULL value
      (2L, 15L, Some(900.0))
    ).toDF("k", "rt", "v")
    val probes = Seq(
      (1L, 5L, 50L),   // before any ref -> NULL
      (1L, 12L, 51L),  // gap 2 <= 5 -> 100
      (1L, 16L, 52L),  // gap 6 > 5 -> stale NULL
      (1L, 22L, 53L),  // latest ref is t=20 (NULL value), gap 2 -> NULL value kept as NULL
      (2L, 20L, 54L),  // gap 5 == tolerance, inclusive -> 900
      (2L, 21L, 55L)   // gap 6 -> NULL
    ).toDF("k", "t", "id")
    val got = AsOfJoin
      .asOfTolerance(probes, col("k"), col("t"), col("id"),
        refs, col("k"), col("rt"), col("v"), toleranceMicros = 5L)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(got == Seq(
      (50L, None), (51L, Some(100.0)), (52L, None),
      (53L, None), (54L, Some(900.0)), (55L, None)))
  }

  test("asOf plan: one shuffle per side feeding one window sort — no range cross-product") {
    val refs = (1 to 50).map(i => ((i % 5).toLong, ts(i.toLong), i.toDouble)).toDF("k", "t", "v")
    val probes = (1 to 200).map(i => ((i % 5).toLong, ts(i.toLong), i.toLong)).toDF("k", "t", "id")
    val df = AsOfJoin.asOf(probes, col("k"), col("t"), col("id"),
      refs, col("k"), col("t"), col("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"must never plan a range cross-product:\n$plan")
    assert("Window".r.findAllIn(plan).nonEmpty, s"expected the sweep window:\n$plan")
  }
}
