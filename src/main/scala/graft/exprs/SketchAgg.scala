package graft.exprs

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable quantile sketch aggregate — a custom Catalyst
  * `TypedImperativeAggregate` over Apache DataSketches KLL
  * (datasketches-java, public API), the engine's building block for
  * distribution-drift baselines (north_star: "KS-statistic and PSI over
  * quantile sketches against a baseline snapshot").
  *
  * One pass, mergeable across partitions AND across runs: the serialized
  * sketch is the baseline snapshot persisted next to the lineage table; the
  * next run's sketch merges/compares against it driver-side with
  * [[graft.stats.SketchDrift]]. Built-in `percentile_approx` would give
  * quantiles of ONE run but its intermediate cannot be stored and re-merged
  * later, which is the whole point of a drift baseline.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KllDoublesSketch]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(storageFormat))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_sketch"
}

/** Mergeable frequent-items (heavy-hitters) sketch aggregate over Apache
  * DataSketches' Misra-Gries-style ItemsSketch: the categorical counterpart
  * of [[KllSketchAgg]] for single-pass column profiling. Counts are EXACT
  * while the distinct count stays within the sketch's map (the common case
  * for categorical columns — status flags, languages, formats) and carry
  * tight error bounds beyond it; sketches merge across partitions AND runs,
  * so a persisted sketch is a baseline for categorical drift too. */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 1024, // power of 2 (datasketches requirement)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[org.apache.datasketches.frequencies.ItemsSketch[String]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  private def serde = new org.apache.datasketches.common.ArrayOfStringsSerDe()

  override def createAggregationBuffer(): org.apache.datasketches.frequencies.ItemsSketch[String] =
    new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize)

  override def update(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      input: InternalRow
  ): org.apache.datasketches.frequencies.ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      other: org.apache.datasketches.frequencies.ItemsSketch[String]
  ): org.apache.datasketches.frequencies.ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: org.apache.datasketches.frequencies.ItemsSketch[String]): Any =
    buffer.toByteArray(serde)

  override def serialize(buffer: org.apache.datasketches.frequencies.ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.frequencies.ItemsSketch[String] =
    org.apache.datasketches.frequencies.ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_sketch"
}

object SketchAgg {

  /** Aggregate a numeric column into a serialized KLL quantile sketch
    * (BinaryType). Usage: `df.agg(SketchAgg.kll(col("x")))`. */
  def kll(c: Column, k: Int = 200): Column = {
    val expr = KllSketchAgg(GraftBridge.expression(c.cast(DoubleType)), k)
    GraftBridge.column(expr.toAggregateExpression())
  }

  def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Aggregate a column (stringified) into a serialized frequent-items
    * sketch (BinaryType). */
  def freq(c: Column, maxMapSize: Int = 1024): Column = {
    val expr = FreqSketchAgg(GraftBridge.expression(c.cast(org.apache.spark.sql.types.StringType)), maxMapSize)
    GraftBridge.column(expr.toAggregateExpression())
  }

  def deserializeFreq(bytes: Array[Byte]): org.apache.datasketches.frequencies.ItemsSketch[String] =
    org.apache.datasketches.frequencies.ItemsSketch
      .getInstance(Memory.wrap(bytes), new org.apache.datasketches.common.ArrayOfStringsSerDe())
}
