package graft.bv

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BvShards

/** Gates for the round-3 ADVICE fixes: refcounted graph pinning, coding
  * flag suffix parsing, bulk empty-shard encoding, and atomic offsets
  * regeneration. */
class Round3FixSpec extends AnyFunSuite {

  /** SeekableBytes that records whether close() ran. */
  private class TrackingBytes(data: Array[Byte]) extends SeekableBytes {
    var closed = false
    private val inner = new ArrayBytes(data)
    def length: Long = inner.length
    def readAt(pos: Long, buf: Array[Byte], off: Int, n: Int): Int =
      inner.readAt(pos, buf, off, n)
    override def close(): Unit = closed = true
  }

  private def tinyGraph(): (BvProperties, Array[Byte], Array[Byte]) = {
    val enc = BvEncoder()
    val adj = Array(Array(1, 2), Array(2), Array.empty[Int])
    val (g, o, p) = enc.encode(adj)
    (BvProperties.parse(p), g, o)
  }

  test("refcount: eviction release does not close under an active reader") {
    val (props, g, o) = tinyGraph()
    val gb = new TrackingBytes(g)
    val graph = new BvGraph(props, gb, new ArrayBytes(o))
    assert(graph.refCount == 1) // the cache's own reference
    graph.acquire() // reader pins
    assert(graph.refCount == 2)
    graph.release() // cache evicts — handles must stay open
    assert(!gb.closed)
    // the pinned reader still decodes bits after "eviction"
    val in = graph.newBitInput()
    assert(graph.outdegree(0, in) == 2)
    graph.release() // reader closes
    assert(gb.closed)
  }

  test("refcount: last release closes exactly once, order-independent") {
    val (props, g, o) = tinyGraph()
    val gb = new TrackingBytes(g)
    val graph = new BvGraph(props, gb, new ArrayBytes(o))
    graph.acquire(); graph.acquire()
    graph.release(); assert(!gb.closed)
    graph.release(); assert(!gb.closed)
    graph.release(); assert(gb.closed)
  }

  test("SKEWED_GOLOMB flag parses as a coding suffix, not a bogus stream") {
    // round 4 made the Golomb family first-class: the flag parses (the
    // round-3 rejection is gone), and the modulus contract moved to the
    // sidecar — a Golomb-flagged .properties WITHOUT golombmodulus fails
    // fast instead of silently decoding garbage with a default
    val c = StreamCodings.fromFlagString("RESIDUALS_SKEWED_GOLOMB")
    assert(c.residual == Coding.SKEWED_GOLOMB)
    val sidecar = BvProperties(10, 20, codings = c, golombModulus = 13).render
    val noModulus = sidecar.linesIterator
      .filterNot(_.startsWith("golombmodulus")).mkString("\n")
    val e = intercept[IllegalArgumentException](BvProperties.parse(noModulus))
    assert(e.getMessage.contains("golombmodulus"), e.getMessage)
    // with the key present, the modulus round-trips
    assert(BvProperties.parse(sidecar).golombModulus == 13)
  }

  test("flag with no coding suffix still errors as unknown") {
    val e = intercept[IllegalArgumentException] {
      StreamCodings.fromFlagString("GAMMA") // no stream prefix at all
    }
    assert(e.getMessage.contains("unknown"), e.getMessage)
  }

  test("writeOnes emits byte-identical bits to per-bit writes") {
    for (prefix <- 0 to 9; n <- Seq(0L, 1L, 5L, 7L, 8L, 9L, 63L, 64L, 65L, 1000L)) {
      def run(f: BitOutput => Unit): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val out = new BitOutput(bos)
        (0 until prefix).foreach(i => out.writeBit(i & 1)) // misalign
        f(out)
        out.writeGamma(5) // something after, to catch bit-position drift
        out.flush()
        bos.toByteArray
      }
      val fast = run(_.writeOnes(n))
      val slow = run(o => (0L until n).foreach(_ => o.writeBit(1)))
      assert(fast.sameElements(slow), s"prefix=$prefix n=$n")
    }
  }

  test("bulk empty-shard streams are byte-identical to the naive encoder") {
    for (count <- Seq(0, 1, 2, 3, 7, 8, 9, 21, 22, 23, 24, 64, 1000)) {
      // the naive path this replaced: per-node append through a Stream
      val (g, o, p) =
        new BvEncoder(BvProperties(0, 0)).encode(
          Array.fill(count)(Array.empty[Int]))
      val fastOff = new java.io.ByteArrayOutputStream()
      BvShards.writeEmptyOffsets(fastOff, count.toLong)
      assert(fastOff.toByteArray.sameElements(o), s"offsets count=$count")
      val fastGraph = new java.io.ByteArrayOutputStream()
      val bits = new BitOutput(fastGraph)
      bits.writeOnes(count.toLong)
      bits.flush()
      assert(fastGraph.toByteArray.sameElements(g), s"graph count=$count")
      assert(BvProperties.parse(p).nodes == count)
    }
  }

  test("partition readers report decode metrics (nodes + arcs)") {
    import graft.sources.{BvGraphPartitionReader, BvInputPartition, BvOutdegreeReader}
    val dir = java.nio.file.Files.createTempDirectory("bv-metrics")
    val base = dir.resolve("g").toString
    val adj = Array(Array(1, 2), Array(2), Array.empty[Int], Array(0, 1, 3))
    BvEncoder().write(base, adj)
    val p = BvInputPartition(base, 0, adj.length, 0, Array.empty)
    val full = new BvGraphPartitionReader(p, Array("id", "successors"))
    try {
      while (full.next()) full.get()
      val m = full.currentMetricsValues().map(t => t.name() -> t.value()).toMap
      assert(m("bvNodesDecoded") == adj.length.toLong)
      assert(m("bvArcsDecoded") == adj.map(_.length).sum.toLong)
    } finally full.close()
    val deg = new BvOutdegreeReader(p, Array("id", "outdegree"))
    try {
      while (deg.next()) deg.get()
      val m = deg.currentMetricsValues().map(t => t.name() -> t.value()).toMap
      assert(m("bvNodesDecoded") == adj.length.toLong)
      assert(m("bvArcsDecoded") == 0L) // degree-only scan never decodes arcs
    } finally deg.close()
  }

  test("regenerate writes the offsets atomically (no bare partial file)") {
    val dir = java.nio.file.Files.createTempDirectory("bv-atomic")
    val base = dir.resolve("g").toString
    val enc = BvEncoder()
    enc.write(base, Array(Array(1, 2), Array(0), Array.empty[Int]))
    val original = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base + ".offsets"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(base + ".offsets"))
    BvOffsets.regenerate(base)
    val rebuilt = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base + ".offsets"))
    assert(rebuilt.sameElements(original))
    // the temp staging file must not linger
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(base + ".offsets.tmp")))
  }
}
