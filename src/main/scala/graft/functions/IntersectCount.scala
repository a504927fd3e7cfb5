package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `size(array_intersect(a, b))` without materializing the intersection
  * array: one hash-set build over `b`, one deduplicating probe pass over
  * `a`. Exact `array_intersect`-then-`size` semantics — distinct elements
  * of `a` present in `b`, a shared null element counts once — but zero
  * per-row `ArrayData` allocation, which matters when the expression IS
  * the inner loop (the triangle count runs it once per oriented edge).
  *
  * Installed by [[graft.IntersectCountRewrite]], an optimizer rule that
  * rewrites eligible `Size(ArrayIntersect(...))` trees; the rule fires
  * only for non-floating atomic element types (float/double equality has
  * NaN/-0.0 edges this fast path does not re-implement).
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"intersect_count needs two arrays of the same element type, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    IntersectCount.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType, classOf[DataType].getName)
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.IntersectCount.count($l, $r, $et)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Count of distinct elements of `a` that occur in `b`; a null element
    * present on both sides counts once (array_intersect semantics). */
  def count(a: ArrayData, b: ArrayData, elemType: DataType): Int = {
    val bn = b.numElements()
    val bSet = new java.util.HashSet[Any](math.max(8, bn * 2))
    var bHasNull = false
    var i = 0
    while (i < bn) {
      if (b.isNullAt(i)) bHasNull = true
      else bSet.add(b.get(i, elemType))
      i += 1
    }
    val an = a.numElements()
    val seen = new java.util.HashSet[Any](math.max(8, an * 2))
    var c = 0
    var aCountedNull = false
    i = 0
    while (i < an) {
      if (a.isNullAt(i)) {
        if (bHasNull && !aCountedNull) { c += 1; aCountedNull = true }
      } else {
        val v = a.get(i, elemType)
        if (bSet.contains(v) && seen.add(v)) c += 1
      }
      i += 1
    }
    c
  }
}
