package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) layout store for 2-D range workloads — the
  * multi-dimensional clustering trick behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`: bucketize two columns into a 2^bits × 2^bits grid,
  * interleave the cell coordinates' bits into one Morton value, and
  * PARTITION the files by it, so a rectangle probe on (x, y) touches only
  * the directories whose cells overlap the rectangle instead of scanning
  * the whole table. A single-column sort can cluster only one dimension;
  * the Morton curve keeps BOTH dimensions' locality, which is why it is
  * the standard layout for (time × user), (lat × lon), (size × score)
  * scan patterns at warehouse scale.
  *
  * Correctness is INDEPENDENT of the cell math: the probe always applies
  * the exact rectangle predicate on the raw columns as a residual filter —
  * the Morton cell set is pure pruning (a superset of the matching cells by
  * monotonicity of the bucketizer), so a plain SQL range query restates the
  * result and a mis-sized grid can only cost speed, never rows.
  *
  * Scale shape: the write is one stats aggregate (4 doubles to the driver —
  * the IVF-centroid pattern of a bounded read) plus one codegen'd
  * bitwise projection and a directory-partitioned write; the probe
  * enumerates ≤ 2^(2·bits) candidate cells DRIVER-SIDE in pure arithmetic
  * and pushes an explicit `z IN (...)` that lands in the scan's
  * PartitionFilters — the same explicit-pruning discipline as the IVF
  * store's `cluster IN (...)` probe. */
object ZOrderStore {

  /** Interleave the low `bits` bits of x (even positions) and y (odd):
    * the Morton value. Codegen'd shift/and/or chain, no UDF. */
  private[graft] def interleaveCol(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Driver-side mirror of [[interleaveCol]]. */
  private[graft] def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Grid cell of value v in [lo, hi] over `cells` buckets. The write-side
    * Column twin [[cellCol]] runs the IDENTICAL double-op sequence, so a
    * row and a probe bound always agree on the cell. */
  private[graft] def cellOf(v: Double, lo: Double, hi: Double, cells: Int): Long =
    if (hi == lo) 0L
    else math.min(cells - 1L, math.max(0L, math.floor((v - lo) / (hi - lo) * cells).toLong))

  private def cellCol(v: Column, lo: Double, hi: Double, cells: Int): Column =
    if (hi == lo) lit(0L)
    else
      least(lit(cells - 1L),
        greatest(lit(0L),
          floor((v.cast("double") - lit(lo)) / lit(hi - lo) * lit(cells.toDouble))
            .cast("long")))

  /** Write `df` partitioned by the Morton cell of (x, y). Bounds come from
    * one min/max aggregate (4 doubles to the driver) and are persisted,
    * with the column names and grid size, in a 1-row parquet sidecar at
    * `<path>/_zmeta` (underscore-prefixed → invisible to the store scan's
    * file listing, the `_SUCCESS` convention). The sidecar is written
    * LAST (the data overwrite would delete it otherwise), so
    * `<path>/_zmeta/_SUCCESS` is the store's completeness marker — cache
    * gates must key on IT, not on the data `_SUCCESS`, or a crash between
    * the two writes leaves a "complete" store every probe fails on. */
  def write(df: DataFrame, x: Column, y: Column, path: String, bitsPerDim: Int = 4): Unit = {
    require(bitsPerDim >= 1 && bitsPerDim <= 15, "1 <= bitsPerDim <= 15")
    require(!df.columns.contains("z"),
      "ZOrderStore.write: input already has a column named 'z' — the store " +
        "uses it as the Morton partition column; rename the data column first")
    val cells = 1 << bitsPerDim
    val r = df
      .agg(min(x.cast("double")), max(x.cast("double")),
        min(y.cast("double")), max(y.cast("double")))
      .head()
    require(!r.isNullAt(0),
      "ZOrderStore.write: empty input (or all-null bounds columns) — nothing to lay out")
    val (xlo, xhi, ylo, yhi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val xName = df.select(x).columns.head
    val yName = df.select(y).columns.head
    // repartition ON z before the partitioned write: without it every
    // input task writes a sliver into every cell directory (tasks × cells
    // small files — measured SLOWER to probe than a brute scan of the
    // compacted flat copy at 20M rows); with it each cell is one compact
    // file and the probe reads exactly the overlapping cells
    df.withColumn("z",
        interleaveCol(cellCol(x, xlo, xhi, cells), cellCol(y, ylo, yhi, cells), bitsPerDim))
      .repartition(col("z"))
      .write
      .mode("overwrite")
      .partitionBy("z")
      .parquet(path)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((xName, yName, xlo, xhi, ylo, yhi, bitsPerDim))
      .toDF("x_col", "y_col", "xlo", "xhi", "ylo", "yhi", "bits")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/_zmeta")
  }

  /** Rectangle probe [x1,x2] × [y1,y2] against a [[write]] store: the
    * overlapping cell ranges come from the SAME bucketizer as the write
    * (monotonic, so [cellOf(x1)..cellOf(x2)] covers every cell holding a
    * matching row), their Morton values are enumerated driver-side and
    * pushed as an explicit `z IN (...)` partition filter; the exact
    * rectangle predicate on the raw columns runs as the residual filter.
    * A rectangle disjoint from the data bounds returns an empty frame
    * without listing any data directory. */
  def rangeProbe(spark: SparkSession, path: String,
                 x1: Double, x2: Double, y1: Double, y2: Double): DataFrame = {
    val m = spark.read.parquet(s"$path/_zmeta").head()
    val (xName, yName) = (m.getString(0), m.getString(1))
    val (xlo, xhi, ylo, yhi) = (m.getDouble(2), m.getDouble(3), m.getDouble(4), m.getDouble(5))
    val bits = m.getInt(6)
    val cells = 1 << bits
    val store = spark.read.parquet(path)
    val residual = col(xName).cast("double").between(x1, x2) &&
      col(yName).cast("double").between(y1, y2)
    if (x2 < xlo || x1 > xhi || y2 < ylo || y1 > yhi) store.filter(lit(false))
    else {
      val cx = cellOf(math.max(x1, xlo), xlo, xhi, cells) to cellOf(math.min(x2, xhi), xlo, xhi, cells)
      val cy = cellOf(math.max(y1, ylo), ylo, yhi, cells) to cellOf(math.min(y2, yhi), ylo, yhi, cells)
      val zs = for { i <- cx; j <- cy } yield interleave(i, j, bits)
      store.filter(col("z").isin(zs: _*)).filter(residual)
    }
  }
}
