package graft.bv

import java.io.EOFException

/** Random-access byte source for the bit streams. Implementations must be
  * cheap to instantiate per reader (the decoder opens a fresh stream per
  * reference-chain recursion, mirroring the reference's temp-stream pool —
  * /root/reference/.../patched/HdfsBVGraph.java:45-49).
  */
trait SeekableBytes {
  def length: Long
  /** Read up to `len` bytes at absolute position `pos`; returns bytes read,
    * -1 at EOF. */
  def readAt(pos: Long, buf: Array[Byte], off: Int, len: Int): Int
  /** Release any underlying OS handle (file channel / HDFS stream).
    * Long-lived executors scanning many graphs would otherwise leak two
    * fds per evicted cache entry. */
  def close(): Unit = ()
}

final class ArrayBytes(data: Array[Byte]) extends SeekableBytes {
  def length: Long = data.length.toLong
  def readAt(pos: Long, buf: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= data.length) return -1
    val n = math.min(len.toLong, data.length - pos).toInt
    System.arraycopy(data, pos.toInt, buf, off, n)
    n
  }
}

final class FileBytes(path: java.nio.file.Path) extends SeekableBytes {
  private val ch = java.nio.channels.FileChannel.open(path,
    java.nio.file.StandardOpenOption.READ)
  def length: Long = ch.size()
  def readAt(pos: Long, buf: Array[Byte], off: Int, len: Int): Int =
    ch.read(java.nio.ByteBuffer.wrap(buf, off, len), pos)
  override def close(): Unit = ch.close()
}

/** MSB-first bit input with γ/δ/ζ_k/unary/minimal-binary decoders, matching
  * the WebGraph/dsiutils wire formats (SURVEY.md §2.2). Buffered and
  * repositionable: `position(bitPos)` is the decoder's random-access
  * primitive (offsets are bit positions —
  * /root/reference/.../patched/HdfsBVGraph.java:75).
  *
  * Hot path: a 64-bit accumulator holds up to 56 look-ahead bits so γ/ζ
  * reads are a couple of shifts in the common case.
  */
final class BitInput(bytes: SeekableBytes, bufferSize: Int = 1 << 16) {
  private val buf = new Array[Byte](bufferSize)
  private lazy val maxUnaryBits = 8L * bytes.length
  private var bufStart: Long = 0L // absolute byte pos of buf(0)
  private var bufLen: Int = 0 // valid bytes in buf
  private var ptr: Int = 0 // next byte index within buf
  private var acc: Long = 0L // low `fill` bits are unread, MSB-first
  private var fill: Int = 0

  /** Absolute bit position of the next unread bit. */
  def bitPosition: Long = (bufStart + ptr) * 8 - fill

  def position(bitPos: Long): Unit = {
    val bytePos = bitPos >>> 3
    acc = 0L
    fill = 0
    if (bytePos >= bufStart && bytePos < bufStart + bufLen) {
      ptr = (bytePos - bufStart).toInt
    } else {
      bufStart = bytePos
      bufLen = 0
      ptr = 0
    }
    val skip = (bitPos & 7L).toInt
    if (skip > 0) readLong(skip)
  }

  private def nextByte(): Int = {
    if (ptr >= bufLen) {
      bufStart += bufLen
      ptr = 0
      bufLen = math.max(bytes.readAt(bufStart, buf, 0, buf.length), 0)
      if (bufLen == 0) return -1 // EOF: caller decides (zero-pad vs throw)
    }
    val b = buf(ptr) & 0xff
    ptr += 1
    b
  }

  /** Pull bytes until ≥ n bits buffered (n ≤ 56). Zero-pads at EOF — bit
    * streams are zero-padded to a byte boundary, so a read that straddles
    * the final byte must see zeros, and a read truly past EOF is a caller
    * bug caught by the unary guard below.
    */
  private def ensure(n: Int): Unit = {
    while (fill < n) {
      val b = nextByte()
      acc = (acc << 8) | (if (b < 0) 0L else b.toLong)
      fill += 8
    }
  }

  def readLong(len: Int): Long = {
    if (len == 0) return 0L
    if (len <= 56) {
      ensure(len)
      fill -= len
      (acc >>> fill) & (if (len == 64) -1L else (1L << len) - 1)
    } else {
      val hi = readLong(len - 32)
      val lo = readLong(32)
      (hi << 32) | lo
    }
  }

  def readInt(len: Int): Int = readLong(len).toInt

  def readBit(): Int = readLong(1).toInt

  /** Unary: count of 0-bits before the next 1-bit. */
  def readUnary(): Int = {
    var count = 0
    while (true) {
      if (fill == 0) ensure(1)
      val chunk = acc & ((1L << fill) - 1)
      if (chunk == 0L) {
        count += fill
        fill = 0
        // runaway zero-run ⇒ read past logical EOF. Bounded by the stream's
        // total bit length (not a fixed constant): a legal unary value can
        // exceed any fixed guard — e.g. OFFSETS_UNARY with one node record
        // longer than the guard — but can never exceed the stream itself.
        if (count > maxUnaryBits)
          throw new EOFException(s"unary run exceeded stream length at bit $bitPosition")
      } else {
        val top = 63 - java.lang.Long.numberOfLeadingZeros(chunk)
        count += fill - 1 - top
        fill = top // consumes the zeros and the terminating 1
        return count
      }
    }
    0 // unreachable
  }

  def readGamma(): Int = {
    val msb = readUnary()
    ((1L << msb) | readLong(msb)).toInt - 1
  }

  def readLongGamma(): Long = {
    val msb = readUnary()
    ((1L << msb) | readLong(msb)) - 1
  }

  def readDelta(): Int = readLongDelta().toInt

  def readLongDelta(): Long = {
    val msb = readGamma()
    ((1L << msb) | readLong(msb)) - 1
  }

  def readZeta(k: Int): Int = readLongZeta(k).toInt

  def readLongZeta(k: Int): Long = {
    val h = readUnary()
    val left = 1L << (h * k)
    val m = readLong(h * k + k - 1)
    if (m < left) m + left - 1
    else (m << 1) + readBit() - 1
  }

  /** Minimal binary (truncated binary) code for values in [0, b):
    * the first 2^(s+1)-b values take s bits, the rest s+1 (s = ⌊log2 b⌋) —
    * the Golomb-family remainder code (dsiutils InputBitStream wire
    * format). */
  def readMinimalBinary(b: Int): Int = {
    val log2b = 31 - Integer.numberOfLeadingZeros(b)
    val m = (1 << (log2b + 1)) - b
    val x = readInt(log2b)
    if (x < m) x else (x << 1) + readBit() - m
  }

  /** Long-bound minimal binary: skewed-Golomb windows are 2^i · b and
    * routinely exceed 2^31 on big-graph offset gaps, so the bound must be
    * a Long (b < 2^62). */
  def readLongMinimalBinary(b: Long): Long = {
    val log2b = 63 - java.lang.Long.numberOfLeadingZeros(b)
    val m = (1L << (log2b + 1)) - b
    val x = readLong(log2b)
    if (x < m) x else (x << 1) + readBit() - m
  }

  /** Golomb code with modulus b: quotient unary, remainder minimal
    * binary. */
  def readGolomb(b: Int): Int = {
    if (b == 0) return 0
    readUnary() * b + readMinimalBinary(b)
  }

  def readLongGolomb(b: Int): Long = {
    if (b == 0) return 0L
    readUnary().toLong * b + readMinimalBinary(b)
  }

  /** Skewed Golomb: doubling windows [ (2^i - 1)b, (2^(i+1) - 1)b ) —
    * window index unary, position-in-window minimal binary. */
  def readSkewedGolomb(b: Int): Int = readLongSkewedGolomb(b).toInt

  def readLongSkewedGolomb(b: Int): Long = {
    // window i starts at (2^i - 1)·b and is 2^i·b wide; both can exceed
    // 2^31 (offset gaps on a big graph), hence the Long minimal binary
    val i = readUnary()
    val m = ((1L << i) - 1L) * b
    m + readLongMinimalBinary((1L << i) * b)
  }

  /** Variable-length nibble code: groups of 1 stop bit (1 = last) + 3 data
    * bits, most-significant group first. */
  def readNibble(): Int = readLongNibble().toInt

  def readLongNibble(): Long = {
    var x = 0L
    var stop = 0
    do {
      x <<= 3
      stop = readBit()
      x |= readLong(3)
    } while (stop == 0)
    x
  }
}

/** MSB-first bit output, symmetric to [[BitInput]]. Bit-at-a-time byte
  * accumulator — the encoder is the fixture/ingest path, not the scan hot
  * path. `writtenBits` feeds the offsets stream.
  */
final class BitOutput(out: java.io.OutputStream) {
  private var cur: Int = 0
  private var nbits: Int = 0
  private var written: Long = 0L

  def writtenBits: Long = written

  def writeBit(b: Int): Unit = {
    cur = (cur << 1) | (b & 1)
    nbits += 1
    written += 1
    if (nbits == 8) {
      out.write(cur)
      cur = 0
      nbits = 0
    }
  }

  /** Write the low `len` bits of x, MSB first. */
  def writeLong(x: Long, len: Int): Unit = {
    var i = len - 1
    while (i >= 0) {
      writeBit(((x >>> i) & 1L).toInt)
      i -= 1
    }
  }

  def writeUnary(n: Int): Unit = {
    var i = n
    while (i > 0) { writeBit(0); i -= 1 }
    writeBit(1)
  }

  def writeGamma(n: Long): Unit = {
    require(n >= 0, s"gamma needs n >= 0, got $n")
    val v = n + 1
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(v)
    writeUnary(msb)
    writeLong(v, msb) // v without its MSB, in msb bits (writeLong masks)
  }

  def writeDelta(n: Long): Unit = {
    require(n >= 0)
    val v = n + 1
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(v)
    writeGamma(msb)
    writeLong(v, msb)
  }

  def writeZeta(n: Long, k: Int): Unit = {
    require(n >= 0)
    val v = n + 1
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val h = msb / k
    writeUnary(h)
    val left = 1L << (h * k)
    if (v - left < left) writeLong(v - left, h * k + k - 1)
    else writeLong(v, h * k + k)
  }

  /** Minimal binary for x in [0, b) — see [[BitInput.readMinimalBinary]]. */
  def writeMinimalBinary(x: Int, b: Int): Unit =
    writeLongMinimalBinary(x.toLong, b.toLong)

  /** Long-bound variant (b < 2^62) — see
    * [[BitInput.readLongMinimalBinary]]. */
  def writeLongMinimalBinary(x: Long, b: Long): Unit = {
    require(b > 0 && x >= 0 && x < b, s"minimal binary needs 0 <= $x < $b")
    val log2b = 63 - java.lang.Long.numberOfLeadingZeros(b)
    val m = (1L << (log2b + 1)) - b
    if (x < m) writeLong(x, log2b)
    else {
      val y = x + m
      writeLong(y >> 1, log2b)
      writeBit((y & 1L).toInt)
    }
  }

  def writeGolomb(x: Int, b: Int): Unit = writeGolomb(x.toLong, b)

  def writeGolomb(x: Long, b: Int): Unit = {
    require(b > 0 && x >= 0)
    val q = x / b
    require(q <= Int.MaxValue, s"golomb quotient $q overflows the unary run")
    writeUnary(q.toInt)
    writeMinimalBinary((x % b).toInt, b)
  }

  def writeSkewedGolomb(x: Int, b: Int): Unit = writeSkewedGolomb(x.toLong, b)

  def writeSkewedGolomb(x: Long, b: Int): Unit = {
    require(b > 0 && x >= 0)
    val i = 63 - java.lang.Long.numberOfLeadingZeros(x / b + 1)
    writeUnary(i)
    // window i = [ (2^i - 1)·b, (2^(i+1) - 1)·b ), width 2^i·b — Long-wide
    val m = ((1L << i) - 1L) * b
    writeLongMinimalBinary(x - m, (1L << i) * b)
  }

  def writeNibble(n: Long): Unit = {
    require(n >= 0)
    val msb = if (n == 0) 0 else 63 - java.lang.Long.numberOfLeadingZeros(n)
    var h = msb / 3
    while (h >= 0) {
      writeBit(if (h == 0) 1 else 0)
      writeLong(n >>> (h * 3), 3)
      h -= 1
    }
  }

  /** Emit `n` '1' bits — the bulk path for runs of γ(0) records
    * (degree-0 nodes): once byte-aligned, whole 0xFF bytes go straight to
    * the underlying stream instead of 8 per-bit pushes each. A 2^31-node
    * gap shard encodes in one pass of ~256 MB byte writes rather than
    * ~2^31 `writeBit` calls stalling the driver at commit time. */
  def writeOnes(n: Long): Unit = {
    var left = n
    while (left > 0 && nbits != 0) { writeBit(1); left -= 1 }
    if (left >= 8) {
      val chunk = new Array[Byte](math.min(left / 8, 1L << 16).toInt)
      java.util.Arrays.fill(chunk, 0xFF.toByte)
      while (left >= 8) {
        val bytes = math.min(left / 8, chunk.length.toLong).toInt
        out.write(chunk, 0, bytes)
        written += 8L * bytes
        left -= 8L * bytes
      }
    }
    while (left > 0) { writeBit(1); left -= 1 }
  }

  /** Pad the final partial byte with zeros and flush. */
  def flush(): Unit = {
    while (nbits != 0) writeBit(0)
    out.flush()
  }
}

object BitOutput {
  /** Bit sink for cost estimation (the encoder dry-runs candidate
    * reference encodings to pick the cheapest). */
  object NullStream extends java.io.OutputStream {
    override def write(b: Int): Unit = ()
    override def write(b: Array[Byte], off: Int, len: Int): Unit = ()
  }
}

object ZigZag {
  /** dsiutils Fast.int2nat: signed -> natural (zigzag). */
  def int2nat(x: Long): Long = (x << 1) ^ (x >> 63)
  /** dsiutils Fast.nat2int: natural -> signed. */
  def nat2int(v: Long): Long = (v >>> 1) ^ -(v & 1)
}
