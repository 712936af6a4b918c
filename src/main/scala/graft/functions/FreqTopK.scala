package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters aggregate — ClickHouse's `topK(k)(x)` as a custom
  * `TypedImperativeAggregate` over the Datasketches frequent-items
  * sketch (Misra-Gries family).
  *
  * Why a sketch and not `GROUP BY x ORDER BY count DESC LIMIT k`: the
  * exact form shuffles one row per DISTINCT value — at 100 TB with a
  * high-cardinality column that is itself a massive aggregation. The
  * sketch keeps a bounded map (`maxMapSize` counters, power of two)
  * per partial, partials MERGE losslessly within the documented error
  * bound (counts over-estimate by at most n/maxMapSize after
  * saturation; EXACT while no counter was evicted), and only
  * fixed-size state crosses the shuffle. One of the engine's three
  * custom UDAFs (with [[KllSketchAgg]] and [[MapCombineAgg]]) —
  * everything else rides on built-in aggregates; the buffer
  * serializes through the sketch's own compact byte array.
  *
  * Result: array of (item, est) structs, the k highest estimates,
  * ties broken by item string ascending so the cut is deterministic
  * (and oracle-comparable in the unsaturated/exact regime).
  */
case class FreqTopK(child: Expression, k: Int, maxMapSize: Int,
    itemsOnly: Boolean = false, weight: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(k > 0, "freq_topk: k must be positive")
  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "freq_topk: maxMapSize must be a power of two >= 8")

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], row: InternalRow)
      : ItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) weight match {
      case None => buf.update(v.asInstanceOf[UTF8String].toString)
      case Some(w) =>
        // CH topKWeighted: each row counts `weight` times. The sketch
        // rejects non-positive counts with an executor-killing
        // exception, so weight 0 is skipped (a zero-count observation
        // is a no-op by definition) and negative weights get a clear
        // caller-facing error instead.
        val wv = w.eval(row)
        if (wv != null) {
          val n = wv.asInstanceOf[Number].longValue()
          if (n < 0) throw new IllegalArgumentException(
            s"topKWeighted: negative weight $n (weights must be >= 0)")
          if (n > 0) buf.update(v.asInstanceOf[UTF8String].toString, n)
        }
    }
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String])
      : ItemsSketch[String] = buf.merge(other)

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = FreqTopK.topKCut(buf, k)
    val items: Array[Any] =
      if (itemsOnly) // ClickHouse topK(k)(x) shape: values only
        rows.map(r => UTF8String.fromString(r.getItem): Any)
      else rows.map(r => InternalRow(
        UTF8String.fromString(r.getItem), r.getEstimate): Any)
    new GenericArrayData(items)
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType =
    if (itemsOnly) ArrayType(StringType)
    else ArrayType(StructType(Seq(
      StructField("item", StringType), StructField("est", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child +: weight.toSeq
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head,
      weight = if (newChildren.length > 1) Some(newChildren(1)) else None)
  override def withNewMutableAggBufferOffset(off: Int): FreqTopK =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): FreqTopK =
    copy(inputAggBufferOffset = off)
  override def prettyName: String = "freq_topk"
}

object FreqTopK {
  /** The deterministic top-k cut, single-sourced for the aggregate and
    * the scalar extractor: NO_FALSE_NEGATIVES (every true heavy hitter
    * present), (estimate desc, item asc) tie-break.
    */
  private[functions] def topKCut(sk: ItemsSketch[String], k: Int)
      : Array[ItemsSketch.Row[String]] =
    sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k)
}

/** State form of [[FreqTopK]]: emit the serialized sketch instead of
  * the top-k cut — the `-State` member of the frequent-items trio
  * (with [[FreqMergeAgg]] and [[FreqTopItems]]), so streaming shards
  * and incremental rollups can carry heavy-hitter state the same way
  * they carry HLL and KLL state.
  */
case class FreqSketchAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "freq_sketch_agg: maxMapSize must be a power of two >= 8")

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)
  override def update(buf: ItemsSketch[String], row: InternalRow)
      : ItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }
  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String])
      : ItemsSketch[String] = buf.merge(other)
  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(serde)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(off: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = off)
  override def prettyName: String = "freq_sketch_agg"
}

/** Union of serialized frequent-items sketches (the `-Merge` side). */
case class FreqMergeAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "freq_merge_agg: maxMapSize must be a power of two >= 8")

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)
  override def update(buf: ItemsSketch[String], row: InternalRow)
      : ItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) buf.merge(ItemsSketch.getInstance(
      Memory.wrap(v.asInstanceOf[Array[Byte]]), serde))
    buf
  }
  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String])
      : ItemsSketch[String] = buf.merge(other)
  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(serde)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(off: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = off)
  override def prettyName: String = "freq_merge_agg"
}

/** Scalar: the deterministic top-k cut from a serialized sketch —
  * array of (item, est) structs, (estimate desc, item asc).
  */
case class FreqTopItems(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, kAny: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]), serde)
    val rows = FreqTopK.topKCut(sk, kAny.asInstanceOf[Int])
    val items: Array[Any] = rows.map(r => InternalRow(
      UTF8String.fromString(r.getItem), r.getEstimate): Any)
    new GenericArrayData(items)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "freq_top_items"
}
