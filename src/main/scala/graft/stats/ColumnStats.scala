package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-column statistics in ONE wide aggregation pass (north-star operator:
  * null counts, distinct counts via HyperLogLog sketches, min/max,
  * histograms). One `agg` with every statistic for every profiled column ⇒
  * one scan, one partial-agg shuffle of a single row per partition —
  * scale-independent output size.
  */
object ColumnStats {

  final case class ColStat(
      column: String,
      count: Long,
      nullCount: Long,
      distinct: Long,
      min: Option[Double],
      max: Option[Double]
  )

  /** Long-format stats frame: one row per profiled column. `exactDistinct`
    * uses count(distinct) (for oracle comparability in tests); the scale
    * default is approx_count_distinct (HLL++, mergeable, single-pass even for
    * many columns). */
  def profile(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = false): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      val isNumeric = df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      Seq(
        count(col(c)).as(s"${c}__count"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}__distinct")
      ) ++ (if (isNumeric)
              Seq(min(col(c)).cast("double").as(s"${c}__min"), max(col(c)).cast("double").as(s"${c}__max"))
            else
              Seq(lit(null).cast("double").as(s"${c}__min"), lit(null).cast("double").as(s"${c}__max")))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // melt to long format driver-side (one row collected)
    val row = wide.collect()(0)
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      (
        c,
        row.getAs[Long](s"${c}__count"),
        row.getAs[Long](s"${c}__nulls"),
        row.getAs[Long](s"${c}__distinct"),
        Option(row.getAs[Any](s"${c}__min")).map(_.asInstanceOf[Double]),
        Option(row.getAs[Any](s"${c}__max")).map(_.asInstanceOf[Double])
      )
    }.toDF("column", "cnt", "nulls", "dcount", "vmin", "vmax")
  }

  /** Top-k heavy hitters of a (stringified) column via one mergeable
    * frequent-items sketch pass ([[graft.exprs.FreqSketchAgg]]): a single
    * scan whose shuffle payload is one few-KB sketch per partition,
    * independent of cardinality — the 100-TB shape for "what are the top
    * values of this column". Counts are EXACT while the column's distinct
    * count fits the sketch map (categorical columns), with deterministic
    * (count desc, item asc) ordering. Output: (item, cnt), k rows. */
  def heavyHitters(df: DataFrame, c: Column, k: Int, maxMapSize: Int = 1024): DataFrame = {
    val bytes = df.agg(graft.exprs.SketchAgg.freq(c, maxMapSize)).head().getAs[Array[Byte]](0)
    val sketch = graft.exprs.SketchAgg.deserializeFreq(bytes)
    val rows = sketch
      .getFrequentItems(org.apache.datasketches.frequencies.ErrorType.NO_FALSE_POSITIVES)
      .toSeq
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (item, est) => (-est, item) }
      .take(k)
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("item", "cnt")
  }

  /** Equal-width histogram over [lo, hi): bucket → count. Values outside the
    * range clamp to the edge buckets. One groupBy over a computed bucket id —
    * partial agg keeps the shuffle at `buckets` rows per partition. */
  def histogram(df: DataFrame, c: Column, lo: Double, hi: Double, buckets: Int): DataFrame = {
    val width = (hi - lo) / buckets
    val bucket = least(
      greatest(floor((c - lit(lo)) / lit(width)).cast("int"), lit(0)),
      lit(buckets - 1)
    )
    df.filter(c.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }
}
