package graft

import org.apache.spark.sql.functions._
import graft.stats.Outliers

/** Tukey-fence outlier card: exact equality with a brute-force reference
  * (rational-rank quartiles, cross-multiplied fences), boundary rows stay
  * inside, null strata kept / null values dropped, and the raw aggregate's
  * exchange is reused between the fence and count branches (one scan). */
class OutliersSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(String, Long)], kNum: Long, kDen: Long) =
    rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.size.toLong
      def q(a: Long, b: Long) = vs(vs.indices.find(i => b * (i + 1) >= a * n).get)
      val (q1, q3) = (q(1, 4), q(3, 4))
      val iqr = q3 - q1
      val lo = vs.count(v => v * kDen < q1 * kDen - iqr * kNum).toLong
      val hi = vs.count(v => v * kDen > q3 * kDen + iqr * kNum).toLong
      (g, n, q1, q3, lo, hi)
    }.toSet

  test("tukeyCard == brute force, fence boundaries inclusive (not outliers)") {
    // group a (15 values): q1 = rank ceil(15/4)=4 -> 3, q3 = rank 12 -> 11,
    // iqr 8, fences [-9, 23]: -50 and 100 are outliers, 23 sits EXACTLY on
    // the high fence and stays inside; group b: all-equal values -> iqr 0,
    // any deviation is an outlier; group c: ties straddling the rank cut
    val rows: Seq[(String, Long)] =
      (1L to 12L).map(v => ("a", v)) ++ Seq(("a", 100L), ("a", -50L), ("a", 23L)) ++
        Seq.fill(5)(("b", 7L)) ++ Seq(("b", 8L)) ++
        Seq(("c", 1L), ("c", 1L), ("c", 1L), ("c", 2L), ("c", 2L), ("c", 9L))
    val got = Outliers
      .tukeyCard(rows.toDF("g", "v").repartition(4), col("g"), col("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == brute(rows, 3L, 2L))
    val a = got.find(_._1 == "a").get
    assert(a._5 == 1L && a._6 == 1L, s"exactly -50 and 100 are outliers: $a")
  }

  test("custom k, null values dropped, null group is a real stratum") {
    val df = Seq[(Option[String], Option[Long])](
      (Some("g"), Some(1L)), (Some("g"), Some(2L)), (Some("g"), Some(3L)),
      (Some("g"), Some(4L)), (Some("g"), Some(50L)), (Some("g"), None),
      (None, Some(5L)), (None, Some(5L)), (None, Some(6L)), (None, Some(7L))
    ).toDF("g", "v")
    // k = 0: fences collapse to [q1, q3] — everything outside the box counts
    val got = Outliers.tukeyCard(df, col("g"), col("v"), kNum = 0L, kDen = 1L)
      .as[(Option[String], Long, Long, Long, Long, Long)].collect().toSet
    // g: n=5 (null v dropped), sorted 1,2,3,4,50: q1=2 (4r>=5 -> r=2), q3=4
    // (4r>=15 -> r=4): below 2 -> {1}, above 4 -> {50}
    assert(got.contains((Some("g"), 5L, 2L, 4L, 1L, 1L)))
    // null group: n=4, sorted 5,5,6,7: q1=5 (r=1), q3=6 (4r>=12 -> r=3):
    // nothing below 5, {7} above 6
    assert(got.contains((None, 4L, 5L, 6L, 0L, 1L)))
  }

  test("plan: the (group, value) aggregate exchange is reused — raw input scanned once") {
    val df = (0 until 1000).map(i => (s"g${i % 3}", (i % 97).toLong)).toDF("g", "v")
    val card = Outliers.tukeyCard(df, col("g"), col("v"))
    card.collect() // AQE inserts stage reuse at runtime — inspect the FINAL plan
    val plan = card.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"fence and count branches must share the groupBy(g,v) exchange:\n$plan")
  }
}
