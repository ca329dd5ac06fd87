package graft

import org.apache.spark.sql.functions._
import graft.ann.KMeans

/** Integer-arithmetic Lloyd k-means: bit-reproducible assignment vs a
  * brute-force local reference, partitioning independence, and the
  * fixed-point quantization contract. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // local reference: identical semantics (init by smallest ids, argmin with
  // smallest-index ties, truncating-div update, empty keeps centroid)
  private def reference(
      pts: Seq[(Long, Array[Long])], k: Int, iters: Int): Map[Long, (Long, Long)] = {
    var cs = pts.sortBy(_._1).take(k).map(_._2.clone)
    def near(v: Array[Long]): (Int, Long) = {
      var best = 0; var bd = Long.MaxValue
      for (c <- cs.indices) {
        var dd = 0L
        for (j <- v.indices) { val t = v(j) - cs(c)(j); dd += t * t }
        if (dd < bd) { bd = dd; best = c }
      }
      (best, bd)
    }
    for (_ <- 1 until iters) {
      val byC = pts.groupBy(p => near(p._2)._1)
      cs = cs.indices.map { c =>
        byC.get(c) match {
          case None => cs(c)
          case Some(members) =>
            val d = cs(c).length
            Array.tabulate(d)(j => members.map(_._2(j)).sum / members.size)
        }
      }
    }
    pts.map { case (id, v) => val (c, dd) = near(v); id -> (c.toLong, dd) }.toMap
  }

  test("fitAssign: matches the local Lloyd reference, ties to smallest cluster, empty keeps centroid") {
    // two tight groups + one far singleton; k=3 inits on ids 1,2,3 (all in
    // group A) so one cluster empties after the update
    val pts: Seq[(Long, Array[Long])] =
      Seq(
        1L -> Array(0L, 0L), 2L -> Array(2L, 0L), 3L -> Array(0L, 2L),
        4L -> Array(100L, 100L), 5L -> Array(102L, 100L), 6L -> Array(100L, 102L),
        7L -> Array(1000L, 1000L)
      )
    val df = pts.map { case (i, v) => (i, v.toSeq) }.toDF("id", "v").repartition(5)
    val got = KMeans.fitAssign(df, col("v"), col("id"), k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == reference(pts, 3, 3))
    // partitioning independence
    val again = KMeans.fitAssign(df.coalesce(1), col("v"), col("id"), k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == got)
    // groups separate: 4,5,6 share a cluster distinct from 1,2,3's
    assert(Set(got(4L)._1, got(5L)._1, got(6L)._1).size == 1)
    assert(got(4L)._1 != got(1L)._1)
  }

  test("fixedPoint: floor(x*scale + 0.5), negative values truncate toward -inf") {
    val df = Seq((1L, Seq(0.0015f, -0.0015f, 0.9994f, -1.0f))).toDF("id", "v")
    val got = df.select(KMeans.fixedPoint(col("v"), 1000.0))
      .head().getSeq[Long](0).toSeq
    // note round-half-UP (floor(x+0.5)), not half-away-from-zero: the float
    // -0.0015f widens to -1.5000000130..e0 * 1e-3, so -1.50000001+0.5
    // floors to -2 — the same value the SQL floor() produces
    assert(got == Seq(2L, -2L, 999L, -1000L))
  }
}
