package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The distinct 64-bit hashes of a text's n-byte shingle windows, as a
  * SORTED primitive long array — the precomputed form of
  * [[ShingleJaccard]]'s per-pair hash set.
  *
  * Why this exists: in the LSH verify stage each document participates
  * in many candidate pairs (≈117 on the bench corpus), and
  * [[ShingleJaccard]] re-lowercases, re-windows, and re-hashes both
  * texts for EVERY pair — O(pairs × len) hashing — then compares via a
  * boxing `java.util.HashSet[Long]`. Computing this array once per doc
  * (O(docs × len) hashing, one sort) and verifying pairs with
  * [[SortedLongJaccard]]'s primitive merge makes the verify stage
  * allocation-free and hash-free per pair.
  *
  * Trade-off, stated for the 100-TB path: the array is ≤ 8 bytes per
  * distinct shingle (≤ 8× the text bytes, typically ~4×), so the
  * candidate join shuffles somewhat more per doc than raw text would —
  * but the verify join only ever carries CANDIDATE docs, and the
  * per-pair CPU drops by an order of magnitude, which is what dominates
  * wall-clock once banding has pruned the pair space.
  *
  * Window/lowercase/hash semantics are IDENTICAL to [[ShingleJaccard]]
  * and [[MinHashSig]] (seed-42 XXH64 over byte windows of the
  * lowercased text; an empty text contributes the single empty-window
  * hash), so `SortedLongJaccard(ShingleHashSorted(a), ShingleHashSorted(b))`
  * is bit-equal to `ShingleJaccard(a, b)` — pinned by spec.
  */
case class ShingleHashSorted(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].toLowerCase.getBytes
    val len = bytes.length
    val windows = math.max(len - n + 1, 1)
    val arr = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      val wlen = math.max(math.min(n, len - i), 0)
      arr(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, wlen, 42L)
      i += 1
    }
    java.util.Arrays.sort(arr)
    var w = 0
    var r = 1
    while (r < windows) {
      if (arr(r) != arr(w)) { w += 1; arr(w) = arr(r) }
      r += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(arr, w + 1))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashSorted {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSorted(ColumnBridge.expression(text), n))
}

/** ORDERED per-position window hashes of the RAW text: out(i) =
  * seed-42 XXH64 of bytes [i, i+n) — one pass, no substring
  * allocation, positions preserved (element index = window start).
  * The d19 exact-substring scan's inner kernel: the expression-level
  * form (`xxhash64(text.substr(i, n))` under an index explode) pays
  * an O(i) character-position seek plus a string copy PER WINDOW —
  * O(len²) per document — where this is one linear sweep. Byte
  * windows equal character windows for ASCII text; multi-byte UTF-8
  * is byte-aligned — the same documented divergence as [[MinHashSig]]
  * (fingerprints are internal to the detector; gates compare SPANS).
  * Unlike [[ShingleHashSorted]]: raw case (not lowercased), ordered
  * (not sorted), duplicates kept, and a sub-n text yields an EMPTY
  * array (no padded window) — callers filter length ≥ n.
  */
case class WindowHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val windows = math.max(bytes.length - n + 1, 0)
    val arr = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      arr(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, n, 42L)
      i += 1
    }
    ArrayData.toArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WindowHashes {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WindowHashes(ColumnBridge.expression(text), n))
}

/** The distinct n-CHARACTER shingle STRINGS of a text, first-occurrence
  * order — the native form of `TextDedup.shingles` (array_distinct over
  * the HOF window build), for the one consumer that needs strings
  * rather than hashes: document-frequency stop-set passes, whose
  * top-K tie-break and DuckDB oracle are keyed by the shingle STRING.
  *
  * Semantics match the HOF exactly (pinned by spec): windows are
  * CHARACTER-indexed slices of the ORIGINAL text (so case mapping
  * cannot shift positions), each window lowercased afterwards via the
  * same UTF8String.toLowerCase that `lower()` applies, and a text
  * shorter than n yields its single short window. Why native: the HOF
  * chain (transform over sequence + per-window substr/lower +
  * array_distinct) costs ~1.5 µs per window in lambda interpretation
  * and allocation — 2.2 s of the 5.5 s d16 gate at sf0.1 was this one
  * map-side build.
  */
case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    val windows = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](windows * 2)
    var i = 0
    while (i < windows) {
      val w = s.substring(i, math.min(i + n, len))
      seen.add(UTF8String.fromString(w).toLowerCase)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DistinctShingles {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(DistinctShingles(ColumnBridge.expression(text), n))
}

/** Jaccard similarity |A∩B| / |A∪B| of two SORTED distinct long arrays
  * (as produced by [[ShingleHashSorted]]): one primitive merge pass,
  * no hashing, no allocation. Integer set sizes → the double division
  * is bit-exact and engine-independent, same as [[ShingleJaccard]].
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val nx = xs.numElements()
    val ny = ys.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object SortedLongJaccard {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedLongJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** The distinct 64-bit hashes of a text's whitespace-separated TOKENS
  * (lowercased), as a SORTED primitive long array — the word-set
  * analogue of [[ShingleHashSorted]], powering the d04/d06/p02/g05
  * candidate-verify family.
  *
  * Semantics: runs of ASCII whitespace separate tokens, leading and
  * trailing ASCII whitespace is stripped, and a whitespace-only text
  * yields the single empty token (hashed), matching `split`'s [""].
  * This mirrors `array_distinct(split(trim(lower(text)), "\s+"))` for
  * text whose edge whitespace is spaces (0x20) — the shipped corpus —
  * but NOT byte-for-byte for edge tabs/newlines: SQL `trim` (Spark and
  * DuckDB alike) strips only spaces, so `"\tfoo"` gains a leading
  * empty token under the SQL expression that this expression does not
  * emit. The gates' oracles share the corpus, so this is a documented
  * corpus assumption, not a gate divergence.
  * With 64-bit XXH64 a cross-token collision needs ~2³² distinct
  * tokens in ONE document to reach coin-flip odds — set sizes (and
  * hence Jaccard/overlap against the word-set oracles) are exact in
  * any real corpus.
  *
  * Why: the window-candidate detectors shuffle each doc's token set
  * ~20× and compare ~100k pairs; string arrays pay UTF8String
  * equality per element and ~10× the bytes of a packed long array.
  * One tokenize+hash pass per doc here, then [[SortedLongJaccard]] /
  * [[SortedLongIntersect]]'s primitive merges per pair.
  */
case class TokenHashSorted(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].toLowerCase.getBytes
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B
    var lo = 0
    var hi = bytes.length
    while (lo < hi && isWs(bytes(lo))) lo += 1
    while (hi > lo && isWs(bytes(hi - 1))) hi -= 1
    val hashes = scala.collection.mutable.ArrayBuilder.make[Long]
    if (lo == hi) {
      // trim left an empty string: split yields [""], one empty token
      hashes += XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, 0, 42L)
    } else {
      var i = lo
      var start = lo
      while (i <= hi) {
        if (i == hi || isWs(bytes(i))) {
          if (i > start)
            hashes += XXH64.hashUnsafeBytes(bytes,
              Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
          // skip the whitespace run
          while (i < hi && isWs(bytes(i))) i += 1
          start = i
          if (i == hi) i += 1
        } else i += 1
      }
    }
    val arr = hashes.result()
    java.util.Arrays.sort(arr)
    var w = 0
    var r = 1
    while (r < arr.length) {
      if (arr(r) != arr(w)) { w += 1; arr(w) = arr(r) }
      r += 1
    }
    ArrayData.toArrayData(
      java.util.Arrays.copyOf(arr, math.min(w + 1, arr.length)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenHashSorted {
  def apply(text: Column): Column =
    ColumnBridge.column(TokenHashSorted(ColumnBridge.expression(text)))
}

/** Intersection SIZE of two sorted distinct long arrays — the integer
  * numerator of [[SortedLongJaccard]], exposed separately so recall
  * gates can emit (inter, union) as INTEGERS: an oracle comparing
  * integer set sizes is immune to any float formatting/rounding
  * divergence between engines, while still pinning the Jaccard value
  * exactly (j = inter / (|a|+|b|-inter)).
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val nx = xs.numElements()
    val ny = ys.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object SortedLongIntersect {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedLongIntersect(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
