package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dot product of two `ARRAY<BIGINT>` columns as a native codegen'd
  * Catalyst expression — the EXACT-integer companion of [[VecDot]] for
  * quantized-embedding kernels (`cluster_kmeans`'s Lloyd distance
  * ‖x−c‖² = x·x − 2·x·c + c·c stays a pure BIGINT identity, so the
  * assignment is hash-gated while the hot loop is a codegen'd tight
  * loop instead of the interpreted `aggregate(zip_with(...))` pipeline).
  *
  * Callers own the overflow budget: quantized dims |q| ≤ ~5·10³ over 64
  * dims keep every partial ≤ 64·(5·10³)² ≈ 1.7e9 ≪ 2⁶³ (documented at
  * each call site).
  *
  * Registered as SQL function `vec_dot_long` via [[graft.GraftExtensions]].
  */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_long requires array<bigint> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // ev.value is pre-declared with Spark's numeric default (-1), so it
      // MUST be zeroed before accumulating
      s"""
         |${ev.value} = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}
