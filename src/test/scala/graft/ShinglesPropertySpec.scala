package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Shingles

/** Generator-driven differential test for the native shingle kernel:
  * [[Shingles.compute]] must agree with an INDEPENDENT regex-based
  * reference (java.util.regex, exactly the SQL pipeline's semantics) on
  * arbitrary strings heavy in whitespace variety, case, repetition and
  * degenerate shapes — pure JVM, no Spark session, so hundreds of cases
  * with shrinking. (ShinglesSpec covers the Spark-side SQL pipeline and
  * the real corpus; this covers the input space.)
  */
object ShinglesPropertySpec extends Properties("shingles") {

  /** Reference implementation straight from the SQL chain. */
  private def reference(text: String, n: Int, distinct: Boolean): Seq[String] = {
    val norm = text.toLowerCase
      .replaceAll("^ +", "").replaceAll(" +$", "") // trim = 0x20 only
      .replaceAll("\\s+", " ")
    val toks = norm.split(" ", -1)
    if (toks.length < n) Seq(norm)
    else {
      val grams = (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
      if (distinct) grams.distinct else grams
    }
  }

  private val wsChar = Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')
  private val wordChar = Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('A', 'Z', 'x', 'x'))
  private val piece = Gen.oneOf(
    Gen.nonEmptyListOf(wordChar).map(_.mkString),
    Gen.nonEmptyListOf(wsChar).map(_.mkString),
    Gen.oneOf("x y z", "a b c a b c", "", " "))
  private val textGen: Gen[String] =
    Gen.listOf(piece).map(_.mkString)

  property("native == regex reference on arbitrary whitespace/case text") =
    forAll(textGen, Gen.choose(1, 5), Gen.oneOf(true, false)) {
      (text, n, distinct) =>
        val native = Shingles.compute(UTF8String.fromString(text), n, distinct)
          .toArray[UTF8String](org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
        val ref = reference(text, n, distinct)
        if (native != ref)
          println(s"MISMATCH text=${text.map(c => f"\\u${c.toInt}%04x").mkString} " +
            s"n=$n d=$distinct\n native=$native\n ref=$ref")
        native == ref
    }
}
