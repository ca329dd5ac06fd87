package graft.stats

import org.apache.datasketches.kll.KllDoublesSketch

import org.apache.spark.sql.{Column, DataFrame}

import graft.exprs.SketchAgg

/** Distribution drift over mergeable KLL quantile sketches — the scale path
  * for the north_star's "KS-statistic and PSI over quantile sketches against
  * a baseline snapshot": one aggregation pass per side produces a few-KB
  * sketch; the snapshot is persisted bytes; KS/PSI are O(grid) driver math.
  */
object SketchDrift {

  /** One-pass sketch of a numeric column. */
  def sketch(df: DataFrame, c: Column, k: Int = 200): KllDoublesSketch = {
    val bytes = df.agg(SketchAgg.kll(c, k)).head().getAs[Array[Byte]](0)
    SketchAgg.deserialize(bytes)
  }

  /** Two-sample KS statistic: max |CDF_a(x) − CDF_b(x)| over a merged
    * quantile grid from both sketches. */
  def ks(a: KllDoublesSketch, b: KllDoublesSketch, gridSize: Int = 200): Double = {
    if (a.isEmpty || b.isEmpty) return if (a.isEmpty == b.isEmpty) 0.0 else 1.0
    val qs = (0 to gridSize).map(_.toDouble / gridSize)
    val grid = (qs.map(a.getQuantile(_)) ++ qs.map(b.getQuantile(_))).distinct.sorted
    grid.map(x => math.abs(a.getRank(x) - b.getRank(x))).max
  }

  /** PSI over `buckets` equal-mass buckets of the BASELINE sketch (the
    * standard construction: baseline deciles, compare current mass). */
  def psi(current: KllDoublesSketch, baseline: KllDoublesSketch, buckets: Int = 10, eps: Double = 1e-6): Double = {
    if (current.isEmpty || baseline.isEmpty) return 0.0
    val edges = (1 until buckets).map(i => baseline.getQuantile(i.toDouble / buckets))
    def masses(s: KllDoublesSketch): Seq[Double] = {
      val ranks = edges.map(s.getRank(_))
      (Seq(0.0) ++ ranks ++ Seq(1.0)).sliding(2).map { case Seq(lo, hi) => math.max(hi - lo, 0.0) }.toSeq
    }
    masses(current).zip(masses(baseline)).map { case (p0, q0) =>
      val p = math.max(p0, eps); val q = math.max(q0, eps)
      (p - q) * math.log(p / q)
    }.sum
  }

  /** End-to-end drift between two frames on one column via sketches. */
  def detect(current: DataFrame, baseline: DataFrame, c: Column, k: Int = 200): (Double, Double) = {
    val cur = sketch(current, c, k)
    val base = sketch(baseline, c, k)
    (psi(cur, base), ks(cur, base))
  }
}
