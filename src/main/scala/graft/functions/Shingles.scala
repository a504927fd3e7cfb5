package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of normalized text as ONE native Catalyst
  * expression — the fused equivalent of the SQL pipeline
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * element_at(split(regexp_replace(lower(trim(text)), "\s+", " "), " "),
  * ...))))` that feeds every text-dedup operator. The HOF chain runs
  * interpreted (lambda functions never enter whole-stage codegen) and
  * allocates a token array + per-shingle catalyst rows; this expression
  * is a single scan-stage call per row (same pattern as [[Fnv64]]) doing
  * one normalization pass and direct string assembly.
  *
  * Semantics replicate the SQL chain EXACTLY (gated by ShinglesSpec
  * against the SQL pipeline on the real corpus, and transitively by the
  * DuckDB oracle gate, whose SQL is unchanged):
  *  - trim: ASCII space 0x20 only (Spark `trim` semantics) — a leading
  *    tab survives trim, is collapsed to ' ' by the \s+ pass, and yields
  *    a leading EMPTY token, exactly like the regex pipeline;
  *  - whitespace class = Java regex \s = [ \t\n\x0B\f\r];
  *  - lowercase before collapse (UTF8String.toLowerCase);
  *  - fewer than n tokens → one shingle: the whole normalized text;
  *  - `distinct` keeps first-occurrence order (array_distinct semantics).
  */
case class Shingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingles requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Shingles.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** `regexp_replace(lower(trim(s)), "\s+", " ")` in one pass. */
  def normalize(s: UTF8String): String = {
    // lower first (locale-free UTF8String semantics), then space-trim,
    // then collapse \s runs — same composition as the SQL chain
    // (lower(trim(x)) == trim(lower(x)) for the 0x20-only trim)
    val str = s.toLowerCase.toString
    var from = 0
    var until = str.length
    while (from < until && str.charAt(from) == ' ') from += 1
    while (until > from && str.charAt(until - 1) == ' ') until -= 1
    val sb = new java.lang.StringBuilder(until - from)
    var i = from
    while (i < until) {
      val c = str.charAt(i)
      if (isWs(c)) {
        sb.append(' ')
        while (i < until && isWs(str.charAt(i))) i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Tokens under `split(norm, " ")` semantics: every ' ' is a cut point,
    * empty tokens preserved (normalized text has no runs, but may carry a
    * leading/trailing single space from non-0x20 whitespace). */
  private def tokenize(norm: String): Array[String] = {
    // java String.split drops trailing empties with limit 0; Spark keeps
    // them (limit -1)
    norm.split(" ", -1)
  }

  def compute(input: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val norm = normalize(input)
    val toks = tokenize(norm)
    val out: java.util.ArrayList[UTF8String] = new java.util.ArrayList[UTF8String]()
    if (toks.length < n) {
      out.add(UTF8String.fromString(norm))
    } else {
      val seen = if (distinct) new java.util.HashSet[String]() else null
      var i = 0
      val last = toks.length - n
      val sb = new java.lang.StringBuilder(64)
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val sh = sb.toString
        if (seen == null || seen.add(sh)) out.add(UTF8String.fromString(sh))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
