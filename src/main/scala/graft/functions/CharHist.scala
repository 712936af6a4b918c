package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 28-bin character histogram of a string: bins 0–25 = 'a'–'z',
  * bin 26 = space, bin 27 = everything else — one pass per row.
  *
  * This is the build side of the classic count-filter for
  * edit-distance joins: one Levenshtein edit operation changes the
  * character histogram's L1 distance by at most 2 (substitution: two
  * bins ±1; insert/delete: one bin ±1), so
  * `ArrayL1(hist_a, hist_b) > 2k` proves dist > k WITHOUT running the
  * O(k·n) banded DP. Merging many raw characters into the catch-all
  * bin only lets opposite-sign counts cancel, i.e. it can only
  * UNDER-count the true per-character L1 — the bound stays a true
  * lower bound, just looser. The iteration is per CODEPOINT (not
  * UTF-16 unit, not byte) to match `levenshtein`'s unit of edit: a
  * supplementary character counted as two histogram units would break
  * the ≤2-per-edit invariant. Case-sensitive, like `levenshtein`.
  *
  * Per-doc work, but NOT CodegenFallback: a fallback expression in
  * the doc-side projection evicts the whole fused stage — including
  * the band join and its per-candidate condition — from whole-stage
  * codegen, so the cheap histogram would tax every CANDIDATE. The
  * generated code is one static call into [[CharHist.compute]].
  */
case class CharHist(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"CharHist input must be string, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    CharHist.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharHist$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharHist {
  def apply(text: Column): Column =
    ColumnBridge.column(CharHist(ColumnBridge.expression(text)))

  /** Shared kernel for the interpreted and generated paths. */
  def compute(input: UTF8String): ArrayData = {
    val s = input.toString
    val bins = new Array[Int](28)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val bin =
        if (cp >= 'a' && cp <= 'z') cp - 'a'
        else if (cp == ' ') 26
        else 27
      bins(bin) += 1
      i += Character.charCount(cp)
    }
    ArrayData.toArrayData(bins)
  }
}

/** Σ |aᵢ−bᵢ| over two int arrays as one codegen'd primitive loop —
  * the per-candidate probe side of the [[CharHist]] count filter.
  * Same contract as [[DotProduct]]: NULL on length mismatch or null
  * element (a malformed histogram surfaces as a dropped row, never a
  * silently-wrong distance); non-`array<int>` inputs rejected at
  * analysis time. Long accumulation — 2³¹ total mass cannot overflow.
  */
case class ArrayL1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def bad(side: String, t: DataType) = TypeCheckResult.TypeCheckFailure(
      s"ArrayL1 $side input must be array<int>, got ${t.catalogString}")
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), t) => bad("right", t)
      case (t, _) => bad("left", t)
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += math.abs(a.getInt(i).toLong - b.getInt(i).toLong)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, s) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("s"))
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += Math.abs((long) $a.getInt($i) - (long) $b.getInt($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ArrayL1 = copy(left = l, right = r)
}

object ArrayL1 {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayL1(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
