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
