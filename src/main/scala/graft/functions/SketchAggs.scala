package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Sketch aggregators as typed `Aggregator`s (public Spark API — SURVEY.md
  * §7.3): one pass over the feature hashes per document, with map-side
  * partial aggregation and an associative/commutative merge, so the shuffle
  * carries one fixed-size sketch per document instead of the exploded
  * feature stream. That reduction is the 100 TB design point: k longs per
  * doc over the wire, never k x features rows.
  */
object SketchAggs {

  /** splitmix64 finalizer — the per-permutation mixing function of the
    * MinHash family h_i(x) = mix(x ^ seed_i). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic per-permutation seeds (fixed root seed: reproducible
    * signatures across runs and executors). */
  def seeds(k: Int): Array[Long] =
    Array.iterate(0x5851f42d4c957f2dL, k)(s => mix64(s))

  /** k-permutation MinHash signature over (docId, featureHash) rows,
    * grouped by docId. IN = the feature hash; BUF/OUT = signature. */
  final class MinHashSig(k: Int) extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    private val ss = seeds(k)
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val h = in._2
      var i = 0
      while (i < k) {
        val v = mix64(h ^ ss(i))
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** 64-bit SimHash over (docId, featureHash) rows grouped by docId:
    * per-bit +/-1 votes, bit set where the vote is positive (ties -> 0,
    * deterministic). */
  final class SimHash64 extends Aggregator[(Long, Long), Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(buf: Array[Int], in: (Long, Long)): Array[Int] = {
      val h = in._2
      var b = 0
      while (b < 64) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Int]): Long = {
      var out = 0L
      var b = 0
      while (b < 64) { if (buf(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
  }

  /** Bloom-filter bitset over pre-hashed keys. Input = (h1, h2) — the two
    * base hashes are computed as codegen'd columns BEFORE the aggregate so
    * build- and probe-side hashing share one expression; the aggregator
    * only ORs `k` double-hashed bit positions into a fixed `mBits`-bit
    * array. Merge is bitwise OR (associative/commutative), so partial
    * aggregation reduces each map task to one small bitset. At 100 TB the
    * finished bitset is broadcast (Spark's own AQE runtime bloom filter
    * caps at 8 MB for the same reason) and prunes the probe side BEFORE
    * its shuffle — a false positive costs nothing (the exact join behind
    * it removes it); a false negative is impossible. */
  final class BloomBits(mBits: Int, k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    override def zero: Array[Long] = new Array[Long](mBits / 64)
    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      // pre-reduce mod m before combining, mirroring the probe-side column
      // expression exactly (m is a power of two, so this equals
      // floorMod(h1 + i*h2, m) and can never overflow)
      val h1 = java.lang.Math.floorMod(in._1, mBits.toLong)
      val h2 = java.lang.Math.floorMod(in._2, mBits.toLong)
      var i = 0
      while (i < k) {
        val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, mBits.toLong).toInt
        buf(idx >>> 6) |= 1L << (idx & 63)
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** KMV (bottom-k minimum values) distinct-count sketch over 64-bit key
    * hashes, unsigned order. State = the k smallest DISTINCT hash values
    * seen (sorted ascending unsigned), so the shuffle carries at most k
    * longs per group whatever the stream length — the approx-distinct
    * shape at 100 TB, where exact COUNT(DISTINCT) must shuffle every key.
    * Estimate: fewer than k distinct hashes -> the exact buffer length;
    * otherwise (k-1) * 2^64 / u(kth) in exact integer arithmetic — fully
    * deterministic, so a DuckDB oracle reproduces it to the last digit. */
  final class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Long] {
    require(k > 1, s"k must be > 1, got $k")
    private def ult(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) < 0

    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      // sorted-insert if absent and within the bottom-k (O(k) per row;
      // k is small and the common case exits on the bounds check)
      if (buf.length == k && !ult(h, buf(k - 1))) return buf
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ult(buf(mid), h)) lo = mid + 1 else hi = mid
      }
      if (lo < buf.length && buf(lo) == h) return buf // already present
      val n = math.min(buf.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = h
      System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
      out
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted distinct runs, keep the smallest k
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && ult(a(i), b(j)))
        val v = if (takeA) { val x = a(i); i += 1; x } else { val x = b(j); j += 1; x }
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }
    override def finish(buf: Array[Long]): Long =
      if (buf.length < k) buf.length.toLong
      else {
        val kth = buf(k - 1)
        if (kth == 0L) (k - 1).toLong
        else java.math.BigInteger.valueOf(k - 1L).shiftLeft(64)
          .divide(new java.math.BigInteger(java.lang.Long.toUnsignedString(kth)))
          .longValueExact()
      }
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
  }

  /** Union-merge of KMV (bottom-k) sketches: input, state and output are
    * all sorted-distinct bottom-k runs (any length <= k), merged keeping
    * the k smallest distinct values — signed order (callers feed small
    * positive modular hashes). This is the HyperBall composition
    * primitive (Boldi-Vigna 2013, with HLL registers swapped for the
    * KMV statistic the DuckDB oracle can replay exactly): the k smallest
    * distinct hashes of a union are contained in the union of each
    * member's k smallest, so per-round truncation to k longs is LOSSLESS
    * for the final bottom-k — state stays k longs per node per round no
    * matter how large the neighborhood grows. */
  final class KmvUnion(k: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    require(k > 1, s"k must be > 1, got $k")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] =
      merge(buf, in)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) < b(j))
        val v = if (takeA) { val x = a(i); i += 1; x }
                else { val x = b(j); j += 1; x }
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Single-value KMV insert: [[KmvUnion]]'s Long-input twin for rounds
    * whose messages are INDIVIDUAL hashes rather than sketches (the ball-1
    * round: each neighbor contributes one modular hash). Feeding
    * KmvUnion 1-element arrays pays an array allocation + array
    * serialization per message row; this inserts the bare long into the
    * sorted-distinct bottom-k buffer (binary search + bounded arraycopy)
    * and shuffles 8 bytes per partial instead of an array cell. Result
    * is IDENTICAL to KmvUnion over singleton arrays: both keep the k
    * smallest distinct values in signed order (callers feed small
    * positive modular hashes). */
  final class KmvAddLong(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 1, s"k must be > 1, got $k")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], v: Long): Array[Long] = {
      val n = buf.length
      if (n == k && v >= buf(n - 1)) return buf // kth or beyond: absorbed
      val idx = java.util.Arrays.binarySearch(buf, v)
      if (idx >= 0) return buf // already present (sketch is a set)
      val ins = -idx - 1
      val outLen = math.min(n + 1, k)
      val out = new Array[Long](outLen)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
      out
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) < b(j))
        val v = if (takeA) { val x = a(i); i += 1; x }
                else { val x = b(j); j += 1; x }
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Count-min sketch over a gram stream: d rows x w counters (w a power
    * of two), row r's hash = FNV-1a 64 of the salted gram ('a'+r prefix)
    * — the engine's reproducible fingerprint primitive, which is what
    * lets a DuckDB oracle recompute the sketch exactly. Point estimate =
    * min over rows of the hashed counter (always >= the true count).
    * State is a fixed d*w longs regardless of stream length: THE
    * heavy-hitter shape at 100 TB, where exact n-gram counts would
    * shuffle billions of distinct grams. */
  final class CountMin(d: Int, w: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    require(w > 0 && (w & (w - 1)) == 0, s"width must be a power of two, got $w")

    def bucket(r: Int, gram: String): Int = {
      val salted = ('a' + r).toChar.toString + gram
      (Fnv64.hashBytes(salted.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        & (w - 1)).toInt
    }
    /** Point estimate from a finished sketch. */
    def estimate(sketch: Array[Long], gram: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < d) {
        val v = sketch(r * w + bucket(r, gram))
        if (v < best) best = v
        r += 1
      }
      best
    }

    override def zero: Array[Long] = new Array[Long](d * w)
    override def reduce(buf: Array[Long], gram: String): Array[Long] = {
      var r = 0
      while (r < d) { buf(r * w + bucket(r, gram)) += 1L; r += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
