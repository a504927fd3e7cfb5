package graft.bv

import ZigZag.nat2int

/** Decoder for BVGraph-compressed graphs — a clean-room Scala
  * implementation of the decode walk specified by
  * /root/reference/.../patched/HdfsBVGraph.java:99-201 (itself upstream
  * it.unimi.dsi.webgraph.BVGraph). Eager per-node decode: adjacency lists
  * average a handful of ints, so the reference's lazy 3-way iterator
  * machinery buys nothing under Spark's row-at-a-time pull.
  *
  * Random access (offsets + reference-chain recursion) powers mid-split
  * window warm-up, which is what makes the format splittable for parallel
  * scan (SURVEY.md §2.1 D1/D4).
  */
final class BvGraph(
    val props: BvProperties,
    graph: SeekableBytes,
    offsetsSrc: SeekableBytes,
    efOffsets: Option[Boolean] = None) {

  val n: Int = props.nodes
  val m: Long = props.arcs
  private val windowSize = props.windowSize
  private val minIntervalLength = props.minIntervalLength
  private val zetaK = props.zetaK
  private val codings = props.codings
  private val cyclicBufferSize = windowSize + 1

  /** Bit offsets of each node's record, plus the end-of-stream sentinel
    * (n+1 entries). Decoded once per `BvGraph` instance — executors share
    * one instance per (basename, task) via [[BvGraph.load]]'s caller.
    * Representation follows the reference (patched/HdfsBVGraph.java:378):
    * small graphs keep a plain Array[Long] (8 B/node, zero decode cost);
    * past [[BvGraph.EF_THRESHOLD]] nodes the index switches to the
    * succinct Elias–Fano form (~2+log2(bits/node) bits per node — a
    * 7-10x executor-memory reduction on web-scale graphs).
    */
  val offsets: BvGraph.Offsets = {
    if (offsetsSrc eq BvGraph.NoOffsets) null // sequential-only mode
    else {
      val raw = BvGraph.decodeOffsets(offsetsSrc, props)
      val useEf = efOffsets.getOrElse(raw.length > BvGraph.EF_THRESHOLD)
      if (useEf) new BvGraph.EfOffsets(EliasFanoLongList(raw))
      else new BvGraph.PlainOffsets(raw)
    }
  }
  // the offsets stream is fully decoded above — release its handle now
  // (close() is idempotent on both FileChannel and FSDataInputStream)
  offsetsSrc.close()

  private def requireIndex(): Unit =
    require(offsets != null,
      "graph opened without an offsets index (sequential-only mode — " +
        "regenerate the index with BvOffsets.regenerate)")

  private val golombB = props.golombModulus
  // shard base (sidecar `firstnode`, 0 for unsharded): value-coded deltas
  // are anchored at the GLOBAL id firstNode + x — see BvEncoder.encodeNode
  private val firstNode = props.firstNode

  private def readCoded(in: BitInput, coding: Int): Int = coding match {
    case Coding.GAMMA => in.readGamma()
    case Coding.DELTA => in.readDelta()
    case Coding.ZETA => in.readZeta(zetaK)
    case Coding.UNARY => in.readUnary()
    case Coding.NIBBLE => in.readNibble()
    case Coding.GOLOMB => in.readGolomb(golombB)
    case Coding.SKEWED_GOLOMB => in.readSkewedGolomb(golombB)
    case c => throw new IllegalStateException(s"coding $c unsupported")
  }

  private def readCodedLong(in: BitInput, coding: Int): Long = coding match {
    case Coding.GAMMA => in.readLongGamma()
    case Coding.DELTA => in.readLongDelta()
    case Coding.ZETA => in.readLongZeta(zetaK)
    case Coding.UNARY => in.readUnary().toLong
    case Coding.NIBBLE => in.readLongNibble()
    case Coding.GOLOMB => in.readLongGolomb(golombB)
    case Coding.SKEWED_GOLOMB => in.readLongSkewedGolomb(golombB)
    case c => throw new IllegalStateException(s"coding $c unsupported")
  }

  def newBitInput(bufferSize: Int = 1 << 16): BitInput =
    new BitInput(graph, bufferSize)

  /** Reference count pinning the shared byte sources. The owning cache
    * holds one reference from construction; each active partition reader
    * acquires one more and releases it in its `close()`. The underlying
    * OS handles close only when the count reaches zero — so LRU eviction
    * (or mtime replacement) can never close a graph out from under an
    * in-flight read on another task thread. */
  private val refs = new java.util.concurrent.atomic.AtomicInteger(1)

  /** Pin this graph for an active reader. Must be balanced by [[release]]. */
  def acquire(): BvGraph = { refs.incrementAndGet(); this }

  /** Drop one reference; closes the underlying byte sources (two OS
    * handles) when the last holder lets go. Called by
    * [[graft.sources.BvGraphCache]] on LRU eviction / mtime replacement
    * and by partition readers on close, so executors scanning many graphs
    * don't accumulate fds — without fail-stopping concurrent readers. */
  def release(): Unit =
    if (refs.decrementAndGet() == 0) {
      graph.close()
      offsetsSrc.close()
    }

  /** Test/utility hook: current pin count. */
  private[graft] def refCount: Int = refs.get()

  /** Random-access outdegree: position at offsets(x), read one value
    * (mirrors D3, /root/reference/.../patched/HdfsBVGraph.java:69-91).
    * Enables degree-only scans that never touch successor data.
    */
  def outdegree(x: Int, in: BitInput): Int = {
    require(x >= 0 && x < n, s"Node index out of range: $x")
    requireIndex()
    in.position(offsets(x))
    readCoded(in, codings.outdegree)
  }

  /** Random-access successor decode; reference chains resolved recursively
    * with fresh bit streams (depth bounded by maxrefcount at encode time —
    * mirrors /root/reference/.../patched/HdfsBVGraph.java:238-243).
    */
  def successorArray(x: Int): Array[Int] = {
    requireIndex()
    val in = newBitInput(4096)
    in.position(offsets(x))
    decodeNode(x, in, y => successorArray(y))
  }

  /** The BV decode kernel: outdegree → reference copy-blocks → intervals →
    * residuals → 3-way merge. `resolveRef` supplies the referenced node's
    * full successor list (window lookup when scanning sequentially,
    * recursion for random access).
    */
  def decodeNode(x: Int, in: BitInput, resolveRef: Int => Array[Int]): Array[Int] = {
    val d = readCoded(in, codings.outdegree)
    if (d == 0) return BvGraph.EMPTY

    val ref = if (windowSize > 0) readCoded(in, codings.reference) else 0

    // 1. masked copy from the referenced list
    var copied: Array[Int] = BvGraph.EMPTY
    if (ref > 0) {
      val refList = resolveRef(x - ref)
      val blockCount = readCoded(in, codings.blockCount)
      val out = new Array[Int](d)
      var nCopied = 0
      var pos = 0
      var total = 0
      var i = 0
      while (i < blockCount) {
        val b = readCoded(in, codings.block) + (if (i == 0) 0 else 1)
        total += b
        if ((i & 1) == 0) { // copy block
          var j = 0
          while (j < b) { out(nCopied) = refList(pos + j); nCopied += 1; j += 1 }
        }
        pos += b
        i += 1
      }
      if ((blockCount & 1) == 0) { // implicit trailing copy block
        var j = pos
        while (j < refList.length) { out(nCopied) = refList(j); nCopied += 1; j += 1 }
      }
      copied = java.util.Arrays.copyOf(out, nCopied)
    }

    var extraCount = d - copied.length

    // 2. intervals (γ throughout, first left extreme zigzagged against x)
    var intervals: Array[Int] = BvGraph.EMPTY
    if (extraCount > 0 && minIntervalLength != 0) {
      val intervalCount = in.readGamma()
      if (intervalCount != 0) {
        val vals = new Array[Int](extraCount)
        var nv = 0
        var prev = 0
        var i = 0
        while (i < intervalCount) {
          val left =
            if (i == 0) (nat2int(in.readLongGamma()) + firstNode + x).toInt
            else in.readGamma() + prev + 1
          val len = in.readGamma() + minIntervalLength
          var v = left
          while (v < left + len) { vals(nv) = v; nv += 1; v += 1 }
          prev = left + len
          extraCount -= len
          i += 1
        }
        intervals = java.util.Arrays.copyOf(vals, nv)
      }
    }

    // 3. residuals (first zigzagged against x, then +1-gap coded)
    var residuals: Array[Int] = BvGraph.EMPTY
    if (extraCount > 0) {
      residuals = new Array[Int](extraCount)
      var prev = (firstNode + x + nat2int(readCodedLong(in, codings.residual))).toInt
      residuals(0) = prev
      var i = 1
      while (i < extraCount) {
        prev += readCoded(in, codings.residual) + 1
        residuals(i) = prev
        i += 1
      }
    }

    // 4. merge three ascending, disjoint sequences
    BvGraph.merge3(copied, intervals, residuals, d)
  }

  /** Long-valued random-access successors — the >2³¹ global-id ("big")
    * decode path. Bit-compatible with [[successorArray]]: universal codes
    * are width-agnostic, so the SAME stream decodes through either kernel
    * as long as values fit the narrower type; this one never narrows. */
  def successorArrayLong(x: Int): Array[Long] = {
    requireIndex()
    val in = newBitInput(4096)
    in.position(offsets(x))
    decodeNodeLong(x, in, y => successorArrayLong(y))
  }

  /** The decode kernel with Long successor VALUES (local node indexes stay
    * Int — a shard holds <2³¹ nodes; its global ids don't). Mirrors
    * [[decodeNode]] exactly, but every value-sized read (interval-left
    * gaps, residual gaps) uses the Long reader: on a >2³¹-id graph a gap
    * can exceed Int.MaxValue and the Int kernel would silently wrap. */
  def decodeNodeLong(x: Int, in: BitInput, resolveRef: Int => Array[Long]): Array[Long] = {
    val d = readCoded(in, codings.outdegree)
    if (d == 0) return BvGraph.EMPTY_L

    val ref = if (windowSize > 0) readCoded(in, codings.reference) else 0

    // 1. masked copy from the referenced list
    var copied: Array[Long] = BvGraph.EMPTY_L
    if (ref > 0) {
      val refList = resolveRef(x - ref)
      val blockCount = readCoded(in, codings.blockCount)
      val out = new Array[Long](d)
      var nCopied = 0
      var pos = 0
      var i = 0
      while (i < blockCount) {
        val b = readCoded(in, codings.block) + (if (i == 0) 0 else 1)
        if ((i & 1) == 0) { // copy block
          var j = 0
          while (j < b) { out(nCopied) = refList(pos + j); nCopied += 1; j += 1 }
        }
        pos += b
        i += 1
      }
      if ((blockCount & 1) == 0) { // implicit trailing copy block
        var j = pos
        while (j < refList.length) { out(nCopied) = refList(j); nCopied += 1; j += 1 }
      }
      copied = java.util.Arrays.copyOf(out, nCopied)
    }

    var extraCount = d - copied.length

    // 2. intervals (γ throughout, first left extreme zigzagged against x)
    var intervals: Array[Long] = BvGraph.EMPTY_L
    if (extraCount > 0 && minIntervalLength != 0) {
      val intervalCount = in.readGamma()
      if (intervalCount != 0) {
        val vals = new Array[Long](extraCount)
        var nv = 0
        var prev = 0L
        var i = 0
        while (i < intervalCount) {
          val left =
            if (i == 0) nat2int(in.readLongGamma()) + firstNode + x
            else in.readLongGamma() + prev + 1
          val len = in.readGamma() + minIntervalLength
          var v = left
          while (v < left + len) { vals(nv) = v; nv += 1; v += 1 }
          prev = left + len
          extraCount -= len
          i += 1
        }
        intervals = java.util.Arrays.copyOf(vals, nv)
      }
    }

    // 3. residuals (first zigzagged against x, then +1-gap coded)
    var residuals: Array[Long] = BvGraph.EMPTY_L
    if (extraCount > 0) {
      residuals = new Array[Long](extraCount)
      var prev = firstNode + x + nat2int(readCodedLong(in, codings.residual))
      residuals(0) = prev
      var i = 1
      while (i < extraCount) {
        prev += readCodedLong(in, codings.residual) + 1
        residuals(i) = prev
        i += 1
      }
    }

    // 4. merge three ascending, disjoint sequences
    BvGraph.merge3Long(copied, intervals, residuals, d)
  }

  /** Sequential scan over nodes [from, until): the splittable-read
    * primitive. Mid-stream starts warm the decode window by random access
    * for the `windowSize` predecessors, exactly as the reference's
    * node-iterator constructor does
    * (/root/reference/.../patched/HdfsBVGraph.java:221-229).
    */
  def nodeIterator(from: Int, until: Int,
      bufferSize: Int = 1 << 20): Iterator[(Int, Array[Int])] = {
    require(from >= 0 && from <= n, s"Node index out of range: $from")
    if (from > 0) requireIndex() // mid-split warm-up needs random access
    val hi = math.min(until, n)
    if (from >= hi) return Iterator.empty
    val in = newBitInput(bufferSize)
    val window = new Array[Array[Int]](cyclicBufferSize)
    if (from > 0 && windowSize > 0) {
      var i = 1
      while (i < math.min(from + 1, cyclicBufferSize)) {
        window((from - i) % cyclicBufferSize) = successorArray(from - i)
        i += 1
      }
    }
    in.position(if (from == 0) 0L else offsets(from))
    new Iterator[(Int, Array[Int])] {
      private var curr = from
      def hasNext: Boolean = curr < hi
      def next(): (Int, Array[Int]) = {
        val succ = decodeNode(curr, in, y => window(y % cyclicBufferSize))
        // Integrity: node x's record must end exactly where offsets says
        // node x+1 begins. A truncated/corrupt stream zero-pads, and zeros
        // decode as plausible empty nodes — without this check a damaged
        // split would SILENTLY feed wrong adjacency downstream. (Skipped
        // in sequential-only mode — there is no index to check against.)
        if (offsets != null && in.bitPosition != offsets(curr + 1))
          throw new java.io.EOFException(
            s"decode desync at node $curr: ended at bit ${in.bitPosition}, " +
              s"offsets say ${offsets(curr + 1)} (truncated or corrupt .graph?)")
        if (windowSize > 0) window(curr % cyclicBufferSize) = succ
        val r = (curr, succ)
        curr += 1
        r
      }
    }
  }

  /** [[nodeIterator]]'s Long-valued twin for >2³¹-global-id shards: same
    * splittable sequential scan (mid-split window warm-up by random
    * access), successor values decoded wide. Kept as a separate kernel so
    * the classic path pays zero widening cost — Int adjacency is the hot
    * path for every <2³¹ graph.
    */
  def nodeIteratorLong(from: Int, until: Int,
      bufferSize: Int = 1 << 20): Iterator[(Int, Array[Long])] = {
    require(from >= 0 && from <= n, s"Node index out of range: $from")
    if (from > 0) requireIndex() // mid-split warm-up needs random access
    val hi = math.min(until, n)
    if (from >= hi) return Iterator.empty
    val in = newBitInput(bufferSize)
    val window = new Array[Array[Long]](cyclicBufferSize)
    if (from > 0 && windowSize > 0) {
      var i = 1
      while (i < math.min(from + 1, cyclicBufferSize)) {
        window((from - i) % cyclicBufferSize) = successorArrayLong(from - i)
        i += 1
      }
    }
    in.position(if (from == 0) 0L else offsets(from))
    new Iterator[(Int, Array[Long])] {
      private var curr = from
      def hasNext: Boolean = curr < hi
      def next(): (Int, Array[Long]) = {
        val succ = decodeNodeLong(curr, in, y => window(y % cyclicBufferSize))
        if (offsets != null && in.bitPosition != offsets(curr + 1))
          throw new java.io.EOFException(
            s"decode desync at node $curr: ended at bit ${in.bitPosition}, " +
              s"offsets say ${offsets(curr + 1)} (truncated or corrupt .graph?)")
        if (windowSize > 0) window(curr % cyclicBufferSize) = succ
        val r = (curr, succ)
        curr += 1
        r
      }
    }
  }

  /** Re-derive the n+1 record bit-offsets by one sequential decode pass —
    * the engine's version of the reference's ONLY sink, the offsets
    * regeneration job (writeOffsets,
    * /root/reference/.../patched/HdfsBVGraph.java:393-407). Works in
    * sequential-only mode (no .offsets file needed). */
  def rebuildOffsets(bufferSize: Int = 1 << 20): Array[Long] = {
    // Long kernel: regeneration must be value-safe on >2³¹-id shards too,
    // and this is a cold path (one pass per lost index) — widening is free.
    val in = newBitInput(bufferSize)
    in.position(0L)
    val window = new Array[Array[Long]](cyclicBufferSize)
    val out = new Array[Long](n + 1)
    var x = 0
    while (x < n) {
      out(x) = in.bitPosition
      val succ = decodeNodeLong(x, in, y => window(y % cyclicBufferSize))
      if (windowSize > 0) window(x % cyclicBufferSize) = succ
      x += 1
    }
    out(n) = in.bitPosition
    out
  }

  /** Whole-graph scan. */
  def iterator: Iterator[(Int, Array[Int])] = nodeIterator(0, n)
}

object BvGraph {
  private val EMPTY = new Array[Int](0)
  private val EMPTY_L = new Array[Long](0)

  /** Sentinel offsets source: opens the graph in sequential-only mode (no
    * index decoded; random access and mid-split starts throw). Used by
    * [[BvOffsets.regenerate]] to rebuild a lost/corrupt `.offsets`. */
  val NoOffsets: SeekableBytes = new ArrayBytes(Array.empty)

  /** Node count past which the offsets index switches to Elias–Fano. */
  val EF_THRESHOLD: Int = 1 << 22

  sealed trait Offsets {
    def apply(i: Int): Long
    def length: Int
  }
  final class PlainOffsets(a: Array[Long]) extends Offsets {
    def apply(i: Int): Long = a(i)
    def length: Int = a.length
  }
  final class EfOffsets(ef: EliasFanoLongList) extends Offsets {
    def apply(i: Int): Long = ef(i)
    def length: Int = ef.length
  }

  /** Load from a local directory basename (test/fixture path; the Spark
    * source supplies Hadoop-backed SeekableBytes instead).
    */
  def load(basename: String): BvGraph = {
    val propsText = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(basename + ".properties")),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val props = BvProperties.parse(propsText)
    new BvGraph(props,
      new FileBytes(java.nio.file.Paths.get(basename + ".graph")),
      new FileBytes(java.nio.file.Paths.get(basename + ".offsets")))
  }

  /** D5: offsets file = (coding-dependent, γ default) delta-coded gaps;
    * prefix-sum to n+1 absolute bit offsets
    * (/root/reference/.../patched/HdfsBVGraph.java:410-436).
    */
  private def decodeOffsets(src: SeekableBytes, props: BvProperties): Array[Long] = {
    val in = new BitInput(src)
    val n = props.nodes
    val out = new Array[Long](n + 1)
    var off = 0L
    var i = 0
    while (i <= n) {
      val gap = props.codings.offset match {
        case Coding.GAMMA => in.readLongGamma()
        case Coding.DELTA => in.readLongDelta()
        case Coding.ZETA => in.readLongZeta(props.zetaK)
        case Coding.UNARY => in.readUnary().toLong
        case Coding.NIBBLE => in.readLongNibble()
        case Coding.GOLOMB => in.readLongGolomb(props.golombModulus)
        case Coding.SKEWED_GOLOMB => in.readLongSkewedGolomb(props.golombModulus)
        case c => throw new IllegalStateException(s"offset coding $c unsupported")
      }
      off += gap
      out(i) = off
      i += 1
    }
    out
  }

  /** 3-way merge of ascending disjoint arrays into one ascending array of
    * exactly `d` elements.
    */
  private[bv] def merge3(a: Array[Int], b: Array[Int], c: Array[Int],
      d: Int): Array[Int] = {
    if (b.isEmpty && c.isEmpty) return a
    if (a.isEmpty && c.isEmpty) return b
    if (a.isEmpty && b.isEmpty) return c
    val out = new Array[Int](d)
    var (i, j, k, o) = (0, 0, 0, 0)
    while (o < d) {
      val va = if (i < a.length) a(i) else Int.MaxValue
      val vb = if (j < b.length) b(j) else Int.MaxValue
      val vc = if (k < c.length) c(k) else Int.MaxValue
      if (va <= vb && va <= vc) { out(o) = va; i += 1 }
      else if (vb <= vc) { out(o) = vb; j += 1 }
      else { out(o) = vc; k += 1 }
      o += 1
    }
    out
  }

  /** [[merge3]] for Long-valued lists (the big decode path). */
  private[bv] def merge3Long(a: Array[Long], b: Array[Long], c: Array[Long],
      d: Int): Array[Long] = {
    if (b.isEmpty && c.isEmpty) return a
    if (a.isEmpty && c.isEmpty) return b
    if (a.isEmpty && b.isEmpty) return c
    val out = new Array[Long](d)
    var (i, j, k, o) = (0, 0, 0, 0)
    while (o < d) {
      val va = if (i < a.length) a(i) else Long.MaxValue
      val vb = if (j < b.length) b(j) else Long.MaxValue
      val vc = if (k < c.length) c(k) else Long.MaxValue
      if (va <= vb && va <= vc) { out(o) = va; i += 1 }
      else if (vb <= vc) { out(o) = vb; j += 1 }
      else { out(o) = vc; k += 1 }
      o += 1
    }
    out
  }
}
