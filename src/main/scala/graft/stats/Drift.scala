package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection: PSI and KS statistic between a current
  * column distribution and a baseline snapshot, computed over equal-width
  * histograms (or quantile sketches).
  *
  * Distributed part: one histogram aggregation per side (bounded output —
  * `buckets` rows). Driver part: O(buckets) arithmetic over the collected
  * bucket counts. At 100 TB the histograms are the only thing that moves.
  */
object Drift {

  /** Population Stability Index between two bucket-count vectors.
    * PSI = Σ (p_i - q_i) * ln(p_i / q_i), with zero-count smoothing. */
  def psi(current: Seq[Long], baseline: Seq[Long], eps: Double = 1e-6): Double = {
    require(current.size == baseline.size, "bucket counts must align")
    val cTot = math.max(current.sum, 1L).toDouble
    val bTot = math.max(baseline.sum, 1L).toDouble
    current.zip(baseline).map { case (c, b) =>
      val p = math.max(c / cTot, eps)
      val q = math.max(b / bTot, eps)
      (p - q) * math.log(p / q)
    }.sum
  }

  /** Two-sample KS statistic from aligned histograms: max |CDF_p - CDF_q|. */
  def ks(current: Seq[Long], baseline: Seq[Long]): Double = {
    require(current.size == baseline.size, "bucket counts must align")
    val cTot = math.max(current.sum, 1L).toDouble
    val bTot = math.max(baseline.sum, 1L).toDouble
    var cAcc = 0.0; var bAcc = 0.0; var maxD = 0.0
    current.zip(baseline).foreach { case (c, b) =>
      cAcc += c / cTot; bAcc += b / bTot
      maxD = math.max(maxD, math.abs(cAcc - bAcc))
    }
    maxD
  }

  /** Collect an equal-width histogram as a dense bucket-count vector. */
  def histogramVector(df: DataFrame, c: Column, lo: Double, hi: Double, buckets: Int): Seq[Long] = {
    val counts = ColumnStats
      .histogram(df, c, lo, hi, buckets)
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    (0 until buckets).map(i => counts.getOrElse(i, 0L))
  }

  /** End-to-end drift between two frames on one column: (psi, ks). */
  def detect(
      current: DataFrame,
      baseline: DataFrame,
      c: Column,
      lo: Double,
      hi: Double,
      buckets: Int = 10
  ): (Double, Double) = {
    val cur = histogramVector(current, c, lo, hi, buckets)
    val base = histogramVector(baseline, c, lo, hi, buckets)
    (psi(cur, base), ks(cur, base))
  }
}
