package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `n` nearest centroid ids for a vector column — the coarse-
  * quantizer assignment of every IVF-style operator (s03 probe, d09
  * SemDeDup), as ONE primitive double loop over the plan-baked
  * centroid matrix.
  *
  * Replaces the HOF spelling `array_sort(zip_with(transform(centers,
  * c -> aggregate(zip_with(c, vec, …))), seq, struct))`: that chain
  * allocates k zipped arrays plus a k-struct sort PER ROW, and the
  * scale rehearsal measured it dominating d09 outright (assignment ∝
  * N·k with a ~100× constant). Here the only per-row allocation is the
  * n-element result.
  *
  * Distance semantics are bit-identical to the HOF form and to what
  * every DuckDB oracle replays: each element cast to double, squared
  * difference accumulated left-to-right in array order, ties broken
  * toward the LOWER cluster id (strict `<` while scanning ids
  * ascending ≡ array_sort on struct(d, i) lexicographic order).
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
    n: Int) extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= centroids.length)

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val vec = new Array[Double](m)
    elemType match {
      case FloatType =>
        var i = 0; while (i < m) { vec(i) = arr.getFloat(i); i += 1 }
      case DoubleType =>
        var i = 0; while (i < m) { vec(i) = arr.getDouble(i); i += 1 }
      case IntegerType =>
        var i = 0; while (i < m) { vec(i) = arr.getInt(i); i += 1 }
      case LongType =>
        var i = 0; while (i < m) { vec(i) = arr.getLong(i); i += 1 }
      case other => throw new IllegalStateException(
        s"NearestCells over array<$other>")
    }
    // top-n by (d2, id): insertion into two tiny parallel arrays —
    // n is 1 or 2 in every caller, so this is branch-cheap
    val bestD = Array.fill(n)(Double.PositiveInfinity)
    val bestI = new Array[Int](n)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val dim = math.min(m, cent.length)
      var d2 = 0.0
      var i = 0
      while (i < dim) {
        val d = cent(i) - vec(i)
        d2 += d * d
        i += 1
      }
      // strict < : equal distances keep the earlier (lower) id
      if (d2 < bestD(n - 1)) {
        var p = n - 1
        while (p > 0 && d2 < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = d2; bestI(p) = c
      }
      c += 1
    }
    new GenericArrayData(bestI)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
