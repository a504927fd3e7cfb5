package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

import graft.functions.{Fnv64, Shingles, VecDot, VecDotLong, WindowHashes}

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
    ext.injectFunction((
      new FunctionIdentifier("vec_dot_long"),
      new ExpressionInfo(classOf[VecDotLong].getName, "vec_dot_long"),
      (children: Seq[Expression]) => VecDotLong(children.head, children(1))))
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
        // accept any foldable INT/BOOLEAN expression (1+2, CAST(3 AS INT),
        // …), not just bare literals — constant folding runs AFTER
        // function resolution, so a constant expression arrives unfolded
        def constant[T](e: Expression, dt: org.apache.spark.sql.types.DataType,
            what: String): T = {
          if (!e.foldable || e.dataType != dt)
            analysisError(s"shingles: $what must be a constant " +
              s"${dt.catalogString.toUpperCase} expression, got ${e.sql}")
          // foldable does not imply evaluable HERE: CurrentDate-style
          // expressions fold only after optimizer rules run, and ANSI
          // casts/division can throw — both must surface as a clean
          // analysis error, never an internal exception
          val v =
            try e.eval()
            catch { case t: Throwable => analysisError(
              s"shingles: $what could not be evaluated at analysis time " +
                s"(${t.getClass.getSimpleName}): ${e.sql}") }
          if (v == null)
            analysisError(s"shingles: $what must not be NULL")
          v.asInstanceOf[T]
        }
        val n = constant[Int](children(1), IntegerType, "argument 2 (n)")
        val distinct =
          constant[Boolean](children(2), BooleanType, "argument 3 (distinct)")
        Shingles(children.head, n, distinct)
      }))
    // window_hashes(text, w) — all w-char sliding-window rolling hashes
    // (the O(n) substring-dedup primitive); w follows the same
    // constant-argument discipline as shingles' n
    ext.injectFunction((
      new FunctionIdentifier("window_hashes"),
      new ExpressionInfo(classOf[WindowHashes].getName, "window_hashes"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          analysisError(s"window_hashes(text, w) takes 2 arguments, " +
            s"got ${children.length}")
        val e = children(1)
        if (!e.foldable || e.dataType != IntegerType)
          analysisError("window_hashes: argument 2 (w) must be a constant " +
            s"INT expression, got ${e.sql}")
        val v =
          try e.eval()
          catch { case t: Throwable => analysisError(
            "window_hashes: argument 2 (w) could not be evaluated at " +
              s"analysis time (${t.getClass.getSimpleName}): ${e.sql}") }
        if (v == null)
          analysisError("window_hashes: argument 2 (w) must not be NULL")
        val w = v.asInstanceOf[Int]
        if (w < 1)
          analysisError(s"window_hashes: w must be >= 1, got $w")
        WindowHashes(children.head, w)
      }))
  }
}
