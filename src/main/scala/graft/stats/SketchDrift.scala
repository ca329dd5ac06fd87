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

  /** Persist a per-column sketch SNAPSHOT (the north-star's "baseline
    * snapshot"): ONE aggregation pass over the frame computes every column's
    * KLL sketch; the few-KB serialized sketches land in a tiny parquet table
    * (column, sketch). Day-over-day drift then never re-reads yesterday's
    * data — it compares against the snapshot. */
  def writeSnapshot(df: DataFrame, cols: Seq[String], path: String, k: Int = 200): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val aggs = cols.map(c => SketchAgg.kll(col(c), k).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    import spark.implicits._
    cols.zipWithIndex
      .map { case (c, i) => (c, row.getAs[Array[Byte]](i)) }
      .toDF("column", "sketch")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def readSnapshot(spark: org.apache.spark.sql.SparkSession, path: String): Map[String, KllDoublesSketch] =
    spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> SketchAgg.deserialize(r.getAs[Array[Byte]](1)))
      .toMap

  /** Drift of every snapshot column against the CURRENT frame: one
    * aggregation pass over the current data (all columns at once), O(grid)
    * driver math per column. Output: (column, psi, ks). */
  def driftAgainstSnapshot(current: DataFrame, path: String, k: Int = 200): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = current.sparkSession
    val base = readSnapshot(spark, path)
    val cols = base.keys.toSeq.sorted
    val aggs = cols.map(c => SketchAgg.kll(col(c), k).as(c))
    val row = current.agg(aggs.head, aggs.tail: _*).head()
    import spark.implicits._
    cols.zipWithIndex.map { case (c, i) =>
      val cur = SketchAgg.deserialize(row.getAs[Array[Byte]](i))
      (c, psi(cur, base(c)), ks(cur, base(c)))
    }.toDF("column", "psi", "ks")
  }
}
