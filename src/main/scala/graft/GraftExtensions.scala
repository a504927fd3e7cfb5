package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

import graft.functions.{Fnv64, Shingles, VecDot}

/** Session extensions: registers the engine's native Catalyst expressions
  * as SQL functions. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // semantics-preserving plan rewrites (see each rule's scaladoc)
    ext.injectOptimizerRule(_ => new IntersectCountRewrite)
    ext.injectFunction((
      new FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
      (children: Seq[Expression]) => Fnv64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    // shingles(text, n, distinct) — n/distinct must be non-null literals
    // of the right type; anything else (a column, NULL, a LONG) is a
    // clear analysis-time error, never a raw ClassCastException/NPE.
    def analysisError(msg: String): Nothing = throw new AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg), None)
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (children: Seq[Expression]) => {
        if (children.length != 3)
          analysisError(s"shingles(text, n, distinct) takes 3 arguments, " +
            s"got ${children.length}")
        val n = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => analysisError("shingles: argument 2 (n) must be " +
            s"an INT literal, got ${other.sql}")
        }
        val distinct = children(2) match {
          case Literal(v: Boolean, BooleanType) => v
          case other => analysisError("shingles: argument 3 (distinct) " +
            s"must be a BOOLEAN literal, got ${other.sql}")
        }
        Shingles(children.head, n, distinct)
      }))
  }
}
