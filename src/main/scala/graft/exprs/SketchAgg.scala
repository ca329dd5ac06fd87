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

object SketchAgg {

  /** Aggregate a numeric column into a serialized KLL quantile sketch
    * (BinaryType). Usage: `df.agg(SketchAgg.kll(col("x")))`. */
  def kll(c: Column, k: Int = 200): Column = {
    val expr = KllSketchAgg(GraftBridge.expression(c.cast(DoubleType)), k)
    GraftBridge.column(expr.toAggregateExpression())
  }

  def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}
