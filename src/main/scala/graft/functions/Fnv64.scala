package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash of a string as a native Catalyst `Expression` with
  * whole-stage-codegen support — the engine's document-fingerprinting
  * primitive. A codegen'd Expression stays inside the WholeStageCodegen
  * span (no iterator-per-row UDF overhead), which is the difference between
  * a scan-speed fingerprint pass and a 5-10x slower UDF pass at 100 TB.
  *
  * Registered as SQL function `fnv64` via [[graft.GraftExtensions]].
  */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fnv64 requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "fnv64"

  override def nullSafeEval(input: Any): Any =
    Fnv64.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64.hashBytes(($c).getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {
  /** FNV-1a 64 over raw bytes (public-domain algorithm; offset basis
    * 0xcbf29ce484222325, prime 0x100000001b3). */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
