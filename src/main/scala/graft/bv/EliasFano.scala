package graft.bv

/** Succinct Elias–Fano encoding of a monotone non-decreasing sequence of
  * longs — the offsets-index representation the reference holds in memory
  * (EliasFanoMonotoneLongBigList, patched/HdfsBVGraph.java:378-379).
  *
  * Why it matters at scale: a web-scale BV graph has up to 2^31 nodes; a
  * plain Array[Long] offsets index costs 8 B/node (up to 16 GiB per
  * executor), while EF costs ~(2 + log2(u/n)) bits/element — typically
  * 6-10 bits/node, a 7-10x memory reduction for an index every scan task
  * needs resident.
  *
  * Layout: each value splits into l = floor(log2(u/n)) low bits (packed
  * array) and high bits (gaps unary-coded in a bit vector). `apply(i)`
  * is select(i) on the high vector + the packed low bits; select uses a
  * jump table every [[EliasFanoLongList.JUMP]] ones, then a bounded word
  * scan.
  */
final class EliasFanoLongList private (
    val length: Int,
    l: Int,
    lower: Array[Long],
    upper: Array[Long],
    jumps: Array[Long]) {

  import EliasFanoLongList.JUMP

  /** Memory footprint in bytes (diagnostics). */
  def sizeInBytes: Long = 8L * (lower.length + upper.length + jumps.length)

  private def lowBits(i: Int): Long = {
    if (l == 0) return 0L
    val bitPos = i.toLong * l
    val w = (bitPos >>> 6).toInt
    val off = (bitPos & 63).toInt
    val mask = (1L << l) - 1
    if (off + l <= 64) (lower(w) >>> off) & mask
    else ((lower(w) >>> off) | (lower(w + 1) << (64 - off))) & mask
  }

  /** Bit position of the (i+1)-th set bit in `upper`. */
  private def select(i: Int): Long = {
    var remaining = i - (i / JUMP) * JUMP
    val jump = jumps(i / JUMP)
    var w = (jump >>> 6).toInt
    var word = upper(w) & ~((1L << (jump & 63)) - 1)
    while (true) {
      val c = java.lang.Long.bitCount(word)
      if (remaining < c) {
        var x = word
        var r = remaining
        while (r > 0) { x &= x - 1; r -= 1 }
        return w.toLong * 64 + java.lang.Long.numberOfTrailingZeros(x)
      }
      remaining -= c
      w += 1
      word = upper(w)
    }
    -1L // unreachable
  }

  def apply(i: Int): Long = {
    require(i >= 0 && i < length, s"index $i out of [0,$length)")
    ((select(i) - i) << l) | lowBits(i)
  }
}

object EliasFanoLongList {
  private[bv] val JUMP = 64

  def apply(values: Array[Long]): EliasFanoLongList = {
    val n = values.length
    if (n == 0) return new EliasFanoLongList(0, 0, Array.empty, Array(0L), Array(0L))
    val u = values(n - 1) + 1
    val l = math.max(0, 63 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, u / n)))
    val lower = new Array[Long](((n.toLong * l + 63) / 64).toInt + 1)
    val upperBitsLen = (u >>> l) + n + 1
    val upper = new Array[Long](((upperBitsLen + 63) / 64).toInt + 1)
    val jumps = new Array[Long]((n + JUMP - 1) / JUMP + 1)
    var i = 0
    while (i < n) {
      val v = values(i)
      require(i == 0 || v >= values(i - 1), s"sequence must be monotone at $i")
      if (l > 0) {
        val low = v & ((1L << l) - 1)
        val bitPos = i.toLong * l
        val w = (bitPos >>> 6).toInt
        val off = (bitPos & 63).toInt
        lower(w) |= low << off
        if (off + l > 64) lower(w + 1) |= low >>> (64 - off)
      }
      val hiPos = (v >>> l) + i // unary-coded gap position
      upper((hiPos >>> 6).toInt) |= 1L << (hiPos & 63)
      if (i % JUMP == 0) jumps(i / JUMP) = hiPos
      i += 1
    }
    new EliasFanoLongList(n, l, lower, upper, jumps)
  }
}
