package graft

import org.apache.spark.sql.functions._
import graft.stats.Quantiles

/** Exact distributed quantile bucketing (two-phase global rank, q127). */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exactBuckets equals the brute-force global-rank bucket on any partitioning") {
    val n = 10007L
    // deterministic non-uniform values with heavy ties (53 distinct values)
    def v(i: Long): Long = i * 2654435761L % 53L
    val df = (1L to n).map(i => (i, v(i))).toDF("id", "v")
    val got = Quantiles.exactBuckets(df.repartition(13), col("v"), col("id"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val expected = (1L to n).map(i => (i, v(i))).sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, vv), r) => (id, vv, r.toLong * 10L / n) }.sortBy(_._1)
    assert(got == expected)
    // floor-division bucketing: sizes differ by at most 1 and cover 0..k-1
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0L until 10L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
  }

  test("exactBuckets: a fully-tied hot value (every doc at the same token budget) still buckets deterministically by tie id") {
    val df = (1L to 9000L).map(i => (i, 512L)).toDF("id", "v")
    val got = Quantiles.exactBuckets(df.repartition(17), col("v"), col("id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.size == 9000)
    assert(got(1L) == 0 && got(3000L) == 0)
    assert(got(3001L) == 1 && got(6000L) == 1)
    assert(got(6001L) == 2 && got(9000L) == 2)
  }
}
