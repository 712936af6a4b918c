package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's `sumMap` / `minMap` / `maxMap`: aggregate parallel
  * (keys, values) arrays across rows, combining values per key;
  * result is the tuple (sorted keys, combined values) — the CH
  * contract for per-metric Nested counters
  * (`sumMap(metrics.id, metrics.value)`).
  *
  * A `TypedImperativeAggregate` whose buffer is one hash map per
  * partial — state is bounded by the DISTINCT KEY count (metric ids:
  * small by construction), not by row count, and partials merge
  * key-wise, so only map-sized state crosses the shuffle. The
  * composable alternative (`aggregate(collect_list(map_from_arrays…),
  * map_zip_with…)`) buffers every ROW's map per group — wrong shape
  * at scale.
  *
  * Values combine as DOUBLE (the builder casts; CH widens per input
  * type — one result type keeps the surface portable). Keys sort with
  * the element type's ordering, so output is deterministic and
  * oracle-comparable.
  */
case class MapCombineAgg(keys: Expression, values: Expression, op: String,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[Any, Double]] {

  require(Seq("sum", "min", "max").contains(op), s"bad combine op: $op")

  private def keyElem: DataType =
    keys.dataType.asInstanceOf[ArrayType].elementType

  private def combine(a: Double, b: Double): Double = op match {
    case "sum" => a + b
    case "min" => math.min(a, b)
    case "max" => math.max(a, b)
  }

  override def createAggregationBuffer()
      : scala.collection.mutable.HashMap[Any, Double] =
    scala.collection.mutable.HashMap.empty

  override def update(buf: scala.collection.mutable.HashMap[Any, Double],
      row: InternalRow): scala.collection.mutable.HashMap[Any, Double] = {
    val ka = keys.eval(row).asInstanceOf[ArrayData]
    val va = values.eval(row).asInstanceOf[ArrayData]
    if (ka == null || va == null) return buf
    val et = keyElem
    val n = math.min(ka.numElements(), va.numElements())
    var i = 0
    while (i < n) {
      if (!ka.isNullAt(i) && !va.isNullAt(i)) {
        val k0 = ka.get(i, et)
        // UnsafeArrayData may reuse backing memory — keys must own
        // their bytes to survive as map keys
        val k = k0 match { case u: UTF8String => u.copy(); case x => x }
        val v = va.getDouble(i)
        buf.get(k) match {
          case Some(prev) => buf.update(k, combine(prev, v))
          case None => buf.update(k, v)
        }
      }
      i += 1
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.HashMap[Any, Double],
      other: scala.collection.mutable.HashMap[Any, Double])
      : scala.collection.mutable.HashMap[Any, Double] = {
    other.foreach { case (k, v) =>
      buf.get(k) match {
        case Some(prev) => buf.update(k, combine(prev, v))
        case None => buf.update(k, v)
      }
    }
    buf
  }

  override def eval(buf: scala.collection.mutable.HashMap[Any, Double]): Any = {
    val ord = TypeUtils.getInterpretedOrdering(keyElem)
    val sorted = buf.toArray.sortBy(_._1)(ord.asInstanceOf[Ordering[Any]])
    InternalRow(
      new GenericArrayData(sorted.map(_._1)),
      new GenericArrayData(sorted.map(e => e._2: Any)))
  }

  override def serialize(buf: scala.collection.mutable.HashMap[Any, Double])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val et = keyElem
    buf.foreach { case (k, v) =>
      et match {
        case StringType =>
          val b = k.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case LongType | TimestampType => out.writeLong(k.asInstanceOf[Long])
        case IntegerType | DateType => out.writeInt(k.asInstanceOf[Int])
        case ShortType => out.writeShort(k.asInstanceOf[Short].toInt)
        case DoubleType => out.writeDouble(k.asInstanceOf[Double])
        case other => throw new UnsupportedOperationException(
          s"${prettyName}: unsupported key type $other")
      }
      out.writeDouble(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : scala.collection.mutable.HashMap[Any, Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[Any, Double]
    val et = keyElem
    var i = 0
    while (i < n) {
      val k: Any = et match {
        case StringType =>
          val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
        case LongType | TimestampType => in.readLong()
        case IntegerType | DateType => in.readInt()
        case ShortType => in.readShort()
        case DoubleType => in.readDouble()
        case other => throw new UnsupportedOperationException(
          s"${prettyName}: unsupported key type $other")
      }
      buf.update(k, in.readDouble())
      i += 1
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("keys", ArrayType(keyElem, containsNull = false)),
    StructField("values", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(keys, values)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keys = newChildren(0), values = newChildren(1))
  override def withNewMutableAggBufferOffset(off: Int): MapCombineAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MapCombineAgg =
    copy(inputAggBufferOffset = off)
  override def prettyName: String = op + "Map"
}
