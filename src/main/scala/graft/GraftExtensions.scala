package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Fnv64, Shingles, VecDot}

/** Session extensions: registers the engine's native Catalyst expressions
  * as SQL functions. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
      (children: Seq[Expression]) => Fnv64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    // shingles(text, n, distinct) — n/distinct must be literals
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (children: Seq[Expression]) => Shingles(children.head,
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Boolean])))
  }
}
