package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native string-distance expressions for the ClickHouse dialect
  * surface — the classic algorithms Spark lacks as built-ins
  * (Levenshtein IS built in; these are its siblings). All operate on
  * Unicode code points (matching CH's UTF-8-aware variants), tight
  * int-array DP loops, CodegenFallback (cold dialect functions, not
  * hot-path operators).
  */

/** Damerau–Levenshtein (restricted: adjacent transposition counts 1).
  * CH: damerauLevenshteinDistance(a, b).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString.codePoints.toArray
    val t = b.asInstanceOf[UTF8String].toString.codePoints.toArray
    val n = s.length; val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    // three rolling rows: i-2, i-1, i
    var prev2 = new Array[Int](m + 1)
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        var d = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        if (i > 1 && j > 1 && s(i - 1) == t(j - 2) && s(i - 2) == t(j - 1))
          d = math.min(d, prev2(j - 2) + 1)
        cur(j) = d
        j += 1
      }
      val tmp = prev2; prev2 = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Jaro similarity in [0, 1]. CH: jaroSimilarity(a, b); the
  * jaroWinklerSimilarity variant adds the common-prefix boost.
  */
case class JaroSimilarity(left: Expression, right: Expression,
    winkler: Boolean = false)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString.codePoints.toArray
    val t = b.asInstanceOf[UTF8String].toString.codePoints.toArray
    val n = s.length; val m = t.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of order
    var k = 0; var transpositions = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions / 2) / mm) / 3.0
    if (!winkler) jaro
    else {
      var l = 0
      while (l < math.min(4, math.min(n, m)) && s(l) == t(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Little-endian reinterpretation of a string's leading bytes as an
  * unsigned integer (CH reinterpretAsUInt32/64 family: missing bytes
  * read as zero, extra bytes ignored). Widths 1/2/4 always fit a
  * signed Long; width 8 returns the two's-complement Long, so byte
  * patterns ≥ 2^63 read NEGATIVE here where CH shows the unsigned
  * value — the bits are identical, the rendering differs (the same
  * documented divergence as the engine-wide UInt64→BIGINT mapping).
  */
case class ReinterpretAsUInt(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {
  require(width == 1 || width == 2 || width == 4 || width == 8,
    "width must be 1/2/4/8 bytes")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var v = 0L
    var i = math.min(width, bytes.length) - 1
    while (i >= 0) { v = (v << 8) | (bytes(i) & 0xffL); i -= 1 }
    v
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact `java.lang.String.hashCode` of a string — CH's javaHash
  * (which documents Java's semantics, UTF-16 chars and int
  * wraparound included). A native expression because the arithmetic
  * needs silent 32-bit overflow, which ANSI-mode SQL refuses.
  */
case class JavaHashString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.hashCode
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Bitcoin-alphabet Base58 encoding of a string's bytes.
  * CH: base58Encode.
  */
case class Base58Encode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private val alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return UTF8String.fromString("")
    var zeros = 0
    while (zeros < bytes.length && bytes(zeros) == 0) zeros += 1
    var num = new java.math.BigInteger(1, bytes)
    val sb = new StringBuilder
    val base = java.math.BigInteger.valueOf(58)
    while (num.signum() > 0) {
      val qr = num.divideAndRemainder(base)
      sb.append(alphabet.charAt(qr(1).intValue()))
      num = qr(0)
    }
    (0 until zeros).foreach(_ => sb.append('1'))
    UTF8String.fromString(sb.reverse.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
