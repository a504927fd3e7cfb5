package graft.bv

import ZigZag.int2nat

/** BVGraph encoder — produces `.graph`/`.offsets`/`.properties` triples that
  * [[BvGraph]] (and upstream WebGraph) can decode. The reference repo never
  * writes graphs (its only sink is offsets regeneration,
  * /root/reference/.../patched/HdfsBVGraph.java:394-408); we need an encoder
  * to (a) create test fixtures — `/root/testdata` has no `.graph` files —
  * and (b) act as the engine's BV *sink* so graphs can be round-tripped.
  *
  * Successor values are `Long` end-to-end: the universal codes (γ/δ/ζ/…)
  * are width-agnostic — γ(5) is the same bits whether the 5 came from an
  * Int or a Long — so ONE encoder serves both the classic (<2³¹ ids) and
  * the sharded long-id (>2³¹ global ids, SCALE.md "big" mode) write paths,
  * and graphs written either way are bit-identical for in-range values.
  * Node indexes `x` stay Int: a single shard's LOCAL node count is capped
  * at 2³¹ (the offsets index is one array), which is exactly the upstream
  * BVGraph/big-BVGraph split (it.unimi.dsi.big.webgraph widens values,
  * not per-segment counts).
  *
  * Encoding per node (mirror image of [[BvGraph.decodeNode]]):
  * outdegree → reference + copy-blocks → intervals → residuals. Reference
  * selection is cost-based: each candidate in the window is dry-encoded
  * through a counting [[BitOutput]] and the cheapest wins, subject to the
  * `maxRefCount` chain-length cap.
  */
final class BvEncoder(props: BvProperties) {
  private val windowSize = props.windowSize
  private val maxRefCount = props.maxRefCount
  private val minIntervalLength = props.minIntervalLength
  private val zetaK = props.zetaK
  private val codings = props.codings

  private val golombB = props.golombModulus
  // shard base: value-coded deltas anchor at the GLOBAL id (firstNode + x),
  // matching [[BvGraph.decodeNode]]; 0 for unsharded graphs
  private val firstNode = props.firstNode

  private def writeCoded(out: BitOutput, coding: Int, v: Long): Unit = coding match {
    case Coding.GAMMA => out.writeGamma(v)
    case Coding.DELTA => out.writeDelta(v)
    case Coding.ZETA => out.writeZeta(v, zetaK)
    case Coding.UNARY => out.writeUnary(v.toInt)
    case Coding.NIBBLE => out.writeNibble(v)
    case Coding.GOLOMB => out.writeGolomb(v, golombB)
    case Coding.SKEWED_GOLOMB => out.writeSkewedGolomb(v, golombB)
    case c => throw new IllegalStateException(s"coding $c unsupported")
  }

  /** Copy-block decomposition of `succ` against `refList`: alternating
    * copy/skip run lengths over refList, starting with a copy run, with a
    * trailing copy run left implicit (decoder's even-blockCount rule,
    * /root/reference/.../patched/HdfsBVGraph.java:135). Returns (blocks,
    * leftover successors not covered by the copy).
    */
  private[bv] def copyBlocks(succ: Array[Long], refList: Array[Long]): (Array[Int], Array[Long]) = {
    val blocks = new scala.collection.mutable.ArrayBuffer[Int]
    val extras = new scala.collection.mutable.ArrayBuffer[Long]
    var i = 0 // index into succ
    var j = 0 // index into refList
    var curr = 0 // current run length
    var copying = true // runs alternate, first is a copy run
    while (j < refList.length) {
      // two-pointer walk: refList(j) either appears in succ (copy) or not
      while (i < succ.length && succ(i) < refList(j)) { extras += succ(i); i += 1 }
      val inSucc = i < succ.length && succ(i) == refList(j)
      if (inSucc == copying) curr += 1
      else { blocks += curr; copying = !copying; curr = 1 }
      if (inSucc) i += 1
      j += 1
    }
    // The final run is always left implicit: with an even emitted block
    // count the decoder copies the refList tail, with an odd one it skips
    // it — and dropping the last run lands on the right parity either way
    // (copy runs sit at even indices, skip runs at odd).
    while (i < succ.length) { extras += succ(i); i += 1 }
    (blocks.toArray, extras.toArray)
  }

  /** Split `extras` into maximal runs of consecutive ids of length ≥
    * minIntervalLength (the intervals) and the rest (residuals).
    */
  private[bv] def intervalize(extras: Array[Long]): (Array[(Long, Int)], Array[Long]) = {
    if (minIntervalLength == 0 || extras.isEmpty)
      return (Array.empty, extras)
    val intervals = new scala.collection.mutable.ArrayBuffer[(Long, Int)]
    val residuals = new scala.collection.mutable.ArrayBuffer[Long]
    var runStart = 0
    var i = 1
    def closeRun(endExcl: Int): Unit = {
      val len = endExcl - runStart
      if (len >= minIntervalLength) intervals += ((extras(runStart), len))
      else { var k = runStart; while (k < endExcl) { residuals += extras(k); k += 1 } }
    }
    while (i < extras.length) {
      if (extras(i) != extras(i - 1) + 1) { closeRun(i); runStart = i }
      i += 1
    }
    closeRun(extras.length)
    (intervals.toArray, residuals.toArray)
  }

  /** Encode one node's list given a chosen reference (0 = none) and the
    * referenced list. Works against any BitOutput, including a counting one
    * for cost estimation.
    */
  private def encodeNode(out: BitOutput, x: Int, succ: Array[Long],
      ref: Int, refList: Array[Long]): Unit = {
    writeCoded(out, codings.outdegree, succ.length.toLong)
    if (succ.isEmpty) return
    if (windowSize > 0) writeCoded(out, codings.reference, ref.toLong)

    var extras = succ
    if (ref > 0) {
      val (blocks, ex) = copyBlocks(succ, refList)
      extras = ex
      writeCoded(out, codings.blockCount, blocks.length.toLong)
      var i = 0
      while (i < blocks.length) {
        writeCoded(out, codings.block, (blocks(i) - (if (i == 0) 0 else 1)).toLong)
        i += 1
      }
    }

    if (extras.nonEmpty && minIntervalLength != 0) {
      val (intervals, residuals) = intervalize(extras)
      out.writeGamma(intervals.length.toLong)
      var prev = 0L
      var i = 0
      while (i < intervals.length) {
        val (left, len) = intervals(i)
        if (i == 0) out.writeGamma(int2nat(left - (firstNode + x)))
        else out.writeGamma(left - prev - 1)
        out.writeGamma((len - minIntervalLength).toLong)
        prev = left + len
        i += 1
      }
      extras = residuals
    }

    if (extras.nonEmpty) {
      writeCoded(out, codings.residual,
        int2nat(extras(0) - (firstNode + x)))
      var i = 1
      while (i < extras.length) {
        writeCoded(out, codings.residual, extras(i) - extras(i - 1) - 1)
        i += 1
      }
    }
  }

  private def costOf(x: Int, succ: Array[Long], ref: Int, refList: Array[Long]): Long = {
    val counter = new BitOutput(BitOutput.NullStream)
    encodeNode(counter, x, succ, ref, refList)
    counter.writtenBits
  }

  /** Stateful one-node-at-a-time encoder: nodes are appended in ascending
    * id order and the bit stream grows incrementally — this is what lets a
    * Spark `DataWriter` encode its partition's node range without
    * buffering the whole adjacency (the distributed BV sink,
    * graft.sources write path). */
  final class Stream(graphOut: java.io.OutputStream) {
    private val out = new BitOutput(graphOut)
    private val cyclic = math.max(windowSize + 1, 1)
    private val window = new Array[Array[Long]](cyclic)
    private val refCounts = new Array[Int](cyclic)
    private val offsetsBuf = new scala.collection.mutable.ArrayBuffer[Long]
    private var x = 0
    private var arcs = 0L

    def nodeCount: Int = x
    def arcCount: Long = arcs

    /** Append node `x` (implicit: call order defines ids 0,1,2,…). */
    def append(succ: Array[Long]): Unit = {
      offsetsBuf += out.writtenBits
      arcs += succ.length
      var bestRef = 0
      var bestCost = Long.MaxValue
      if (succ.nonEmpty && windowSize > 0) {
        bestCost = costOf(x, succ, 0, null)
        var r = 1
        while (r <= math.min(windowSize, x)) {
          val cand = window((x - r) % cyclic)
          if (cand != null && cand.nonEmpty && refCounts((x - r) % cyclic) < maxRefCount) {
            val c = costOf(x, succ, r, cand)
            if (c < bestCost) { bestCost = c; bestRef = r }
          }
          r += 1
        }
      }
      encodeNode(out, x, succ,
        bestRef, if (bestRef > 0) window((x - bestRef) % cyclic) else null)
      if (windowSize > 0) {
        window(x % cyclic) = succ
        refCounts(x % cyclic) =
          if (bestRef > 0) refCounts((x - bestRef) % cyclic) + 1 else 0
      }
      x += 1
    }

    /** Int-adjacency convenience (the classic <2³¹ write path). */
    def append(succ: Array[Int]): Unit = append(BvEncoder.widenInts(succ))

    /** Flush the graph stream; returns (offsetsBytes, propertiesText). */
    def finish(): (Array[Byte], String) = {
      offsetsBuf += out.writtenBits
      out.flush()
      (BvOffsets.encode(offsetsBuf.toSeq, props),
        props.copy(nodes = x, arcs = arcs).render)
    }
  }

  /** Encode the whole graph. `adjacency(x)` must be strictly ascending,
    * duplicate-free, values in [0, n). Returns (graphBytes, offsetsBytes,
    * propertiesText) with `arcs` filled in.
    */
  def encode(adjacency: Array[Array[Int]]): (Array[Byte], Array[Byte], String) = {
    val graphBos = new java.io.ByteArrayOutputStream()
    val st = new Stream(graphBos)
    adjacency.foreach(st.append)
    val (offsets, propsText) = st.finish()
    (graphBos.toByteArray, offsets, propsText)
  }

  /** Long-adjacency encode (values may exceed 2³¹ — shard-global ids). */
  def encodeLong(adjacency: Array[Array[Long]]): (Array[Byte], Array[Byte], String) = {
    val graphBos = new java.io.ByteArrayOutputStream()
    val st = new Stream(graphBos)
    adjacency.foreach(st.append)
    val (offsets, propsText) = st.finish()
    (graphBos.toByteArray, offsets, propsText)
  }

  /** Encode and write the `.graph`/`.offsets`/`.properties` triple. */
  def write(basename: String, adjacency: Array[Array[Int]]): Unit = {
    val (g, o, p) = encode(adjacency)
    import java.nio.file.{Files, Paths}
    Files.write(Paths.get(basename + ".graph"), g)
    Files.write(Paths.get(basename + ".offsets"), o)
    Files.write(Paths.get(basename + ".properties"),
      p.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
  }
}

object BvEncoder {
  private[graft] def widenInts(a: Array[Int]): Array[Long] = {
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i).toLong; i += 1 }
    out
  }

  def apply(
      windowSize: Int = 7,
      maxRefCount: Int = 3,
      minIntervalLength: Int = 4,
      zetaK: Int = 3,
      codings: StreamCodings = StreamCodings()): BvEncoder =
    new BvEncoder(BvProperties(nodes = 0, arcs = 0L, windowSize = windowSize,
      maxRefCount = maxRefCount, minIntervalLength = minIntervalLength,
      zetaK = zetaK, codings = codings))
}
