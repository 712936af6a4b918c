package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-set aggregate — the SET-OPERATIONS member of
  * the engine's sketch families (HLL = cardinality, KLL = quantiles,
  * frequent-items = heavy hitters, CMS = point counts; theta =
  * intersect/difference across groups).
  *
  * Why theta when `hll_sketch_agg` already exists: HLL supports only
  * UNION, so a pairwise overlap matrix must go through
  * inclusion–exclusion — and HLL's coupons truncate the value hash to
  * ~26 bits, so even in its "exact" coupon regime two distinct values
  * can collide and leave |A|+|B|−|A∪B| off by one (measured on the
  * t22 corpus: one colliding pair among 20 sources at ~1.3k values
  * each). Theta retains full 64-bit hashes and supports native
  * INTERSECTION: below the nominal-entries threshold no sampling
  * occurs (θ = 1), every hash is retained, and set-op estimates are
  * EXACT up to the 2⁻⁶⁴ hash-collision term — which is what lets the
  * overlap gate carry a full DuckDB oracle. Above the threshold it
  * degrades to ~1/√k relative error like any sketch. Hashing is
  * seeded murmur3 (fixed default seed), so results are deterministic
  * across runs, partitionings, and merge orders.
  *
  * The aggregation buffer is a theta Union (streaming updates +
  * partial-merge in one object); the output is the compact immutable
  * sketch's bytes — the per-group artifact an ingest pipeline
  * persists and folds new batches into map-side.
  */
case class ThetaSketchAgg(child: Expression, lgNomEntries: Int = 14,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(lgNomEntries >= 4 && lgNomEntries <= 26,
    "theta_sketch_agg: lgNomEntries must be in [4, 26]")

  // analysis-time rejection (the DotProduct/CharHist discipline): the
  // update path casts to UTF8String, so a non-string child must fail
  // resolution, not throw ClassCastException on an executor
  override def checkInputDataTypes(
      ): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"theta_sketch_agg input must be string, got ${t.catalogString}")
    }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()

  override def update(buf: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult(false, null))
    buf
  }

  override def eval(buf: Union): Any =
    buf.getResult(true, null).toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(off: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = off)
  override def prettyName: String = "theta_sketch_agg"
}

/** |A ∩ B| from two serialized theta sketches — exact below the
  * sketches' nominal-entries threshold (see [[ThetaSketchAgg]]),
  * ~1/√k relative error above it. Per-GROUP-PAIR cardinality
  * (dictionary-sized inputs), so CodegenFallback costs nothing.
  */
case class ThetaIntersectEst(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaIntersectEst.estimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectEst = copy(left = l, right = r)
}

object ThetaIntersectEst {
  /** Shared kernel for the expression and driver-side matrix builds
    * over collected sketch artifacts (the t22 shape).
    */
  def estimate(a: Array[Byte], b: Array[Byte]): Long = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(Sketches.wrapSketch(Memory.wrap(a)))
    inter.intersect(Sketches.wrapSketch(Memory.wrap(b)))
    Math.round(inter.getResult.getEstimate)
  }
}

/** Distinct-count estimate of one serialized theta sketch (exact in
  * the θ = 1 regime) — the union/rollup read side.
  */
case class ThetaEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    Math.round(Sketches.wrapSketch(
      Memory.wrap(a.asInstanceOf[Array[Byte]])).getEstimate)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
