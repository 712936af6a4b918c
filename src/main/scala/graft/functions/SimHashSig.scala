package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text as a native expression: lowercase + trim
  * once, split into whitespace-delimited tokens over the UTF-8 bytes,
  * XXH64 per token (seed 42 — the same value Spark's `xxhash64`
  * produces for the token string), per-bit sign votes, one pass.
  *
  * Value-compatible with `TextDedup.simHash64(TextFunctions.tokens(c))`
  * (pinned by an equivalence spec): whitespace = the Java regex `\s`
  * class used by `tokens`, and a blank input yields the single empty
  * token `split` produces. Same motivation as [[MinHashSig]]: the HOF
  * pipeline allocates a hash array plus a 64-slot vote array per
  * TOKEN and interprets every lambda.
  */
case class SimHashSig(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.trim
    val bytes = s.getBytes
    val len = bytes.length
    val votes = new Array[Int](64)
    def vote(start: Int, tokLen: Int): Unit = {
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, tokLen, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    if (len == 0) vote(0, 0) // split("") yields one empty token
    else {
      var i = 0
      while (i < len) {
        if (!isWs(bytes(i))) {
          var j = i
          while (j < len && !isWs(bytes(j))) j += 1
          vote(i, j - i)
          i = j
        } else i += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashSig {
  def apply(text: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(text)))
}
