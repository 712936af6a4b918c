package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Densified one-permutation MinHash (OPH; Li, Owen, Zhang 2012 +
  * rotation densification, Shrivastava & Li 2014) as a native
  * expression: ONE xxhash64 per shingle window — the window hash
  * itself is the sampled value, binned by `h mod nBins` — where
  * [[MinHashSig]] pays nPerms extra `hashLong` calls per window. Same
  * tight primitive loop per row, same byte-window shingle semantics.
  *
  * Densification runs in the same pass: empty bin i borrows the
  * nearest non-empty bin j to its right (circular), offset by the
  * borrow distance (out[i] = sig[j] + t), which keeps short documents
  * from sharing sentinel-valued bands — the failure mode that makes
  * raw OPH unusable below |shingles| >> nBins. Value-identical to the
  * composable HOF form
  * `densifyOph(ophSignature(shingleHashes(text, n), nBins), nBins)`
  * on ASCII text (pinned by spec).
  */
case class OphSig(child: Expression, n: Int, nBins: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].toLowerCase.getBytes
    val len = bytes.length
    val sig = Array.fill(nBins)(Long.MaxValue)
    val windows = math.max(len - n + 1, 1)
    var i = 0
    while (i < windows) {
      val wlen = math.min(n, len - i)
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i,
        math.max(wlen, 0), 42L)
      val b = java.lang.Math.floorMod(h, nBins.toLong).toInt
      if (h < sig(b)) sig(b) = h
      i += 1
    }
    val out = new Array[Long](nBins)
    var bi = 0
    while (bi < nBins) {
      if (sig(bi) != Long.MaxValue) out(bi) = sig(bi)
      else {
        var t = 1
        var filled = false
        while (t < nBins && !filled) {
          val j = (bi + t) % nBins
          if (sig(j) != Long.MaxValue) { out(bi) = sig(j) + t; filled = true }
          t += 1
        }
        if (!filled) out(bi) = Long.MaxValue
      }
      bi += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object OphSig {
  /** Column API: densified OPH signature of length nBins over n-byte
    * shingles of the lowercased text.
    */
  def apply(text: Column, n: Int, nBins: Int): Column =
    ColumnBridge.column(OphSig(ColumnBridge.expression(text), n, nBins))
}
