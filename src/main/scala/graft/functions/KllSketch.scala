package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable quantile state — the KLL doubles sketch as the quantile
  * member of the pre-aggregation family, mirroring Spark's own HLL
  * trio (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`):
  *
  *  - [[KllSketchAgg]]    value column → binary sketch (the `-State`)
  *  - [[KllMergeAgg]]     binary sketches → merged binary (`-Merge`)
  *  - [[KllQuantiles]]    binary sketch + rank array → quantile values
  *
  * Exact per-group percentiles (r20's `percentile`) buffer the whole
  * group and cannot pre-aggregate; a KLL sketch is fixed-size
  * (k=200 ≈ 1.7% rank error, a few KB), closed under merge, and
  * EXACT while the group is small enough that no compaction has
  * happened — the same exact-small/approximate-at-scale contract as
  * the HLL and frequent-items members. With these, an
  * IncrementalRollup-style state table answers median/p95 questions
  * without rescanning history.
  */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, row: InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch)
      : KllDoublesSketch = { buf.merge(other); buf }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(off: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KllSketchAgg =
    copy(inputAggBufferOffset = off)
  override def prettyName: String = "kll_sketch_agg"
}

/** Union of serialized KLL sketches (the `-Merge` side). */
case class KllMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, row: InternalRow)
      : KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) buf.merge(KllDoublesSketch.heapify(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch)
      : KllDoublesSketch = { buf.merge(other); buf }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(off: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KllMergeAgg =
    copy(inputAggBufferOffset = off)
  override def prettyName: String = "kll_merge_agg"
}

/** Scalar: quantile values at the given ranks from a serialized
  * sketch. INCLUSIVE search criteria — identical to SQL
  * percentile_disc semantics in the sketch's exact (uncompacted)
  * regime.
  */
case class KllQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  // an EMPTY sketch (all-null group) evaluates to null even though
  // both children are non-nullable — declare it, or codegen consumers
  // that trust child nullability skip the null check
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, ranks: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    val rs = ranks.asInstanceOf[ArrayData].toDoubleArray()
    if (sk.isEmpty) null
    else new GenericArrayData(rs.map(r =>
      sk.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "kll_quantiles"
}
