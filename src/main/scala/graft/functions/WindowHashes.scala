package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All W-char sliding-window hashes of a string as ONE native Catalyst
  * expression — the O(n) replacement for the O(n·W) SQL pipeline
  * `transform(sequence(1, length(text) - (W-1)), i ->
  * xxhash64(substr(text, i, W)))` that fed `dedup_substring_spans`
  * (Lee et al. 2022 exact substring dedup): the HOF chain hashed W
  * characters per position AND allocated a W-char substring per
  * position, so a 1 MB document cost 40 MB of hashing plus a million
  * allocations. This expression makes one pass: a polynomial rolling
  * hash (base B, wrapping mod 2⁶⁴) slides across the text updating in
  * O(1) per position, and each window value is finished with a
  * BIJECTIVE avalanche mix (murmur3 finalizer) — bijective, so the
  * collision classes are exactly the rolling hash's, and the mix only
  * de-correlates adjacent windows for the downstream groupBy/Bloom.
  *
  * HASH-EQUALITY CONTRACT: downstream treats equal hashes as equal
  * 40-char windows (the DuckDB oracle groups the raw SUBSTRINGS, so the
  * engine-side hash function is free to change — this swap is what
  * makes that freedom pay). 64-bit polynomial equality over same-length
  * windows means a false span needs Σ(c_j−c'_j)·B^k ≡ 0 (mod 2⁶⁴) —
  * ~n²/2⁶⁵ birthday odds over a corpus's window count, the same class
  * of risk the previous xxhash64 design already accepted.
  *
  * Positions count CODE POINTS (Spark `substr`/`length` semantics, same
  * as the oracle's `substr`/`len`): the ASCII fast path rolls straight
  * over the UTF8 bytes (byte == code point — verified per string by a
  * high-bit scan fused into the fill loop); non-ASCII strings take the
  * code-point array path. Result length = numChars − W + 1 (empty when
  * shorter — callers pre-filter `length(text) >= W`). */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WindowHashes.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  /** Odd multiplier (golden-ratio constant | 1) — any odd base is a unit
    * mod 2⁶⁴, so the per-window polynomial is invertible in its leading
    * coefficient and the rolling subtraction is exact. */
  private final val B = 0x9E3779B97F4A7C15L | 1L

  /** murmur3's 64-bit finalizer — bijective avalanche. */
  private def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33; z
  }

  private val empty: ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  def compute(input: UTF8String, w: Int): ArrayData = {
    val nBytes = input.numBytes()
    // ASCII fast path: fill the code array from bytes, bailing to the
    // code-point path on the first high bit (one fused scan either way)
    var ascii = true
    val cs = new Array[Int](nBytes)
    var i = 0
    while (ascii && i < nBytes) {
      val b = input.getByte(i)
      if (b < 0) ascii = false else { cs(i) = b; i += 1 }
    }
    if (ascii) roll(cs, nBytes, w)
    else {
      val s = input.toString
      val n = s.codePointCount(0, s.length)
      val cps = new Array[Int](n)
      var ci = 0
      var k = 0
      while (k < n) {
        val cp = s.codePointAt(ci)
        cps(k) = cp
        ci += Character.charCount(cp)
        k += 1
      }
      roll(cps, n, w)
    }
  }

  private def roll(cs: Array[Int], n: Int, w: Int): ArrayData = {
    if (n < w) return empty
    val out = new Array[Long](n - w + 1)
    // B^(w-1) for the rolling subtraction
    var bw1 = 1L
    var p = 1
    while (p < w) { bw1 *= B; p += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = h * B + cs(i); i += 1 }
    out(0) = mix(h)
    var j = 1
    while (j <= n - w) {
      h = (h - cs(j - 1) * bw1) * B + cs(j + w - 1)
      out(j) = mix(h)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
