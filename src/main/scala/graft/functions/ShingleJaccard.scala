package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Exact shingle-set Jaccard similarity of two texts as a native
  * expression: lowercases each side once, collects the distinct
  * 64-bit hashes of its n-byte shingle windows, and returns
  * |A∩B| / |A∪B| — one pass per side, no shingle string arrays.
  *
  * Used by the LSH verify stage: candidates join back to the raw TEXT
  * (≤ a few hundred bytes) instead of to 100s-of-element shingle
  * arrays, so nothing array-valued shuffles and the corpus-wide
  * shingling projection disappears entirely.
  *
  * Set membership is by 64-bit window hash (XXH64): a false collision
  * needs two distinct shingles hashing equal within one document pair
  * (~10⁻¹⁵ at document scale) — negligible against the detector's own
  * approximation, and the same equivalence [[MinHashSig]] uses.
  */
case class ShingleJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  private def hashSet(s: UTF8String): java.util.HashSet[Long] = {
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length
    val out = new java.util.HashSet[Long]()
    val windows = math.max(len - n + 1, 1)
    var i = 0
    while (i < windows) {
      val wlen = math.max(math.min(n, len - i), 0)
      out.add(XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, wlen, 42L))
      i += 1
    }
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = hashSet(a.asInstanceOf[UTF8String])
    val sb = hashSet(b.asInstanceOf[UTF8String])
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object ShingleJaccard {
  def apply(a: Column, b: Column, n: Int): Column =
    ColumnBridge.column(
      ShingleJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b), n))
}
