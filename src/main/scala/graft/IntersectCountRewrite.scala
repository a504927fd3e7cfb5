package graft

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.IntersectCount

/** Optimizer rule: `size(array_intersect(a, b))` →
  * [[graft.functions.IntersectCount]] — count the intersection without
  * materializing it. Strictly an execution-shape change: the native
  * expression reproduces array_intersect-then-size semantics exactly
  * (distinct-of-a probe, shared null counts once), so the rewrite is
  * always sound where it fires.
  *
  * It fires only when
  *  - `legacySizeOfNull` is off (the legacy -1-for-null contract is not
  *    re-implemented), and
  *  - the element type is a non-floating atomic type (float/double
  *    equality carries NaN/-0.0 edges the fast path does not replicate).
  *
  * Registered via `injectOptimizerRule` in [[GraftExtensions]] — the
  * pattern for semantics-preserving plan rewrites the engine wants
  * everywhere a query composes built-ins expensively (the triangle
  * count's closing test runs once per oriented edge).
  */
class IntersectCountRewrite extends Rule[LogicalPlan] {

  private def eligible(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => et match {
      case DoubleType | FloatType => false // NaN/-0.0 equality edges
      case ByteType | ShortType | IntegerType | LongType | BooleanType |
           StringType | DateType | TimestampType | TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ai: ArrayIntersect, false)
        if ai.resolved && eligible(ai.left.dataType) &&
          ai.left.dataType.asInstanceOf[ArrayType].elementType ==
            ai.right.dataType.asInstanceOf[ArrayType].elementType =>
      IntersectCount(ai.left, ai.right)
  }
}
