package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Σ aᵢ·bᵢ over two numeric arrays as ONE primitive loop — the inner
  * kernel of every cosine in the similarity family.
  *
  * Replaces the HOF spelling `aggregate(zip_with(a, b, (x,y) => x*y),
  * 0.0, _+_)`: that chain materializes a zipped array PER PAIR before
  * folding it — in s11's block self-join that is millions of 64-slot
  * array allocations per task, and the d05 rehearsal measured the
  * allocation pressure, not the multiplies, as the cost. Here the only
  * work is the fused multiply-add loop, and `doGenCode` emits it
  * inline so the surrounding filter/projection stays inside
  * whole-stage codegen.
  *
  * Bit-identical to the HOF form by construction: the accumulation is
  * sequential left-to-right in array-index order (the same order the
  * fold visits), each element cast to double first — so every oracle
  * that replays `list_inner_product` semantics is untouched. Length
  * mismatch yields NULL — the same observable as `zip_with`'s
  * null-padding poisoning the fold — so a malformed vector surfaces
  * as a dropped row in every cosine consumer instead of silently
  * scoring a truncated prefix. A null ELEMENT also yields null.
  * Non-array or non-numeric-element inputs are rejected at analysis
  * time by [[checkInputDataTypes]], not at executor runtime.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private val okElems: Set[DataType] =
    Set(DoubleType, FloatType, IntegerType, LongType)

  override def checkInputDataTypes(): TypeCheckResult = {
    def bad(side: String, t: DataType) = TypeCheckResult.TypeCheckFailure(
      s"DotProduct $side input must be array<double|float|int|bigint>, got ${t.catalogString}")
    (left.dataType, right.dataType) match {
      case (ArrayType(le, _), ArrayType(re, _)) =>
        if (!okElems.contains(le)) bad("left", left.dataType)
        else if (!okElems.contains(re)) bad("right", right.dataType)
        else TypeCheckResult.TypeCheckSuccess
      case (ArrayType(_, _), t) => bad("right", t)
      case (t, _) => bad("left", t)
    }
  }

  @transient private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  private def read(a: ArrayData, t: DataType, i: Int): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i)
    case IntegerType => a.getInt(i)
    case LongType => a.getLong(i)
    case other => throw new IllegalStateException(s"DotProduct over $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += read(a, leftElem, i) * read(b, rightElem, i)
      i += 1
    }
    s
  }

  private def geti(t: DataType, v: String, i: String): String = t match {
    case DoubleType => s"$v.getDouble($i)"
    case FloatType => s"(double)$v.getFloat($i)"
    case IntegerType => s"(double)$v.getInt($i)"
    case LongType => s"(double)$v.getLong($i)"
    case other => throw new IllegalStateException(s"DotProduct over $other")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, s) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("s"))
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${geti(leftElem, a, i)} * ${geti(rightElem, b, i)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
}
