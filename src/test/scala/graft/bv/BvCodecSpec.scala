package graft.bv

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the BV codec (SURVEY.md §5.1): encoder→decoder
  * round-trips across shaped generators that force each coding path —
  * interval-heavy consecutive runs, reference-heavy near-duplicate rows,
  * empty outdegrees, residual-only — crossed with the format parameters
  * (window size, min interval length, ζ_k, per-stream codings).
  */
class BvCodecSpec extends AnyFunSuite {

  // ---- bit-level round-trips --------------------------------------------

  private def withBits[A](write: BitOutput => Unit)(read: BitInput => A): A = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new BitOutput(bos)
    write(out)
    out.flush()
    read(new BitInput(new ArrayBytes(bos.toByteArray)))
  }

  test("gamma/delta/unary/zeta round-trip") {
    for (seed <- 1 to 8; k <- 1 to 6) {
        val rnd = new scala.util.Random(seed)
        val xs = List.fill(200)(rnd.nextLong(1L << 40))
        val got = withBits { out =>
          xs.foreach { x =>
            out.writeGamma(x); out.writeDelta(x); out.writeZeta(x, k)
            out.writeUnary((x & 63L).toInt)
          }
        } { in =>
          xs.map { _ =>
            (in.readLongGamma(), in.readLongDelta(), in.readLongZeta(k),
              in.readUnary().toLong)
          }
        }
        assert(got == xs.map(x => (x, x, x, x & 63L)))
    }
  }

  test("zeta matches slow independent implementation") {
    // Independent slow ζ_k decoder straight from the Boldi–Vigna definition:
    // h in unary; then a minimal-ish binary value of h*k+k-1 bits, extended
    // by one bit when ≥ 2^(h*k).
    def slowReadZeta(in: BitInput, k: Int): Long = {
      val h = in.readUnary()
      val left = 1L << (h * k)
      val m = in.readLong(h * k + k - 1)
      if (m < left) m + left - 1 else (m << 1 | in.readBit()) - 1
    }
    for (seed <- 1 to 6; k <- 1 to 5) {
        val rnd = new scala.util.Random(seed)
        val xs = List.fill(100)(rnd.nextLong(1L << 30))
        val got = withBits { out => xs.foreach(out.writeZeta(_, k)) } { in =>
          xs.map(_ => slowReadZeta(in, k))
        }
        assert(got == xs)
    }
  }

  test("minimal-binary/golomb/skewed-golomb/nibble round-trip") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val bs = List.fill(100)(1 + rnd.nextInt(1000))
      val xs = bs.map(b => rnd.nextInt(b))        // minimal binary needs x < b
      val ys = List.fill(100)(rnd.nextInt(100000)) // unbounded values
      val ns = List.fill(100)(rnd.nextLong(1L << 40) & Long.MaxValue)
      val got = withBits { out =>
        xs.zip(bs).foreach { case (x, b) => out.writeMinimalBinary(x, b) }
        ys.zip(bs).foreach { case (y, b) =>
          out.writeGolomb(y, b); out.writeSkewedGolomb(y, b)
        }
        ns.foreach(out.writeNibble)
      } { in =>
        val mb = bs.map(in.readMinimalBinary)
        val g = bs.map(b => (in.readGolomb(b), in.readSkewedGolomb(b)))
        val nb = ns.map(_ => in.readLongNibble())
        (mb, g, nb)
      }
      assert(got._1 == xs)
      assert(got._2 == ys.zip(ys).map(identity))
      assert(got._3 == ns)
    }
  }

  test("golden bit patterns: golomb/skewed-golomb/nibble/minimal-binary") {
    def bytesOf(write: BitOutput => Unit): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new BitOutput(bos)
      write(out); out.flush(); bos.toByteArray
    }
    // nibble(0) = stop-bit 1 + 000 -> 1000____
    assert(bytesOf(_.writeNibble(0L)).sameElements(Array(0x80.toByte)))
    // nibble(9 = 0b1001): groups 001,001 -> 0001 1001
    assert(bytesOf(_.writeNibble(9L)).sameElements(Array(0x19.toByte)))
    // golomb(4, b=3): q=1 unary '01'; r=1 minimal binary over 3 = '10'
    assert(bytesOf(_.writeGolomb(4, 3)).sameElements(Array(0x60.toByte)))
    // skewed golomb(5, b=2): window i=1 -> '01'; offset 3 over bound 4 = '11'
    assert(bytesOf(_.writeSkewedGolomb(5, 2)).sameElements(Array(0x70.toByte)))
    // minimal binary over b=5 (s=2, m=3): 3 -> '110'
    assert(bytesOf(_.writeMinimalBinary(3, 5)).sameElements(Array(0xC0.toByte)))
    // first 2^(s+1)-b values take s bits: 0 over b=5 -> '00'
    assert(bytesOf(_.writeMinimalBinary(0, 5)).sameElements(Array(0x00.toByte)))
  }

  test("golomb-family stream flags parse and the modulus round-trips the sidecar") {
    val c = StreamCodings.fromFlagString("RESIDUALS_GOLOMB|BLOCKS_SKEWED_GOLOMB")
    assert(c.residual == Coding.GOLOMB && c.block == Coding.SKEWED_GOLOMB)
    val p = BvProperties(10, 20, codings = c, golombModulus = 13)
    val parsed = BvProperties.parse(p.render)
    assert(parsed.golombModulus == 13)
    assert(parsed.codings == c)
    // default-coded graphs render without the key (byte-compatible with
    // upstream sidecars) and parse back to the documented default
    val plain = BvProperties.parse(BvProperties(10, 20).render)
    assert(!BvProperties(10, 20).render.contains("golombmodulus"))
    assert(plain.golombModulus == BvProperties.DEFAULT_GOLOMB_MODULUS)
  }

  test("long golomb / skewed-golomb round-trip across moduli") {
    val allVals = Seq(0L, 1L, 2L, 7L, 63L, 64L, 1000L, 123456789L,
      Int.MaxValue.toLong, Int.MaxValue + 1L, (1L << 33) + 5, (1L << 40) + 17,
      (1L << 50) + 123456789L)
    Seq(1, 2, 3, 8, 1024).foreach { b =>
      // plain Golomb's quotient is unary — keep v/b testable (the skewed
      // variant's windows double, so it takes every value)
      val vals = allVals.filter(_ / b <= 200000L)
      val bos = new java.io.ByteArrayOutputStream()
      val out = new BitOutput(bos)
      vals.foreach(v => out.writeGolomb(v, b))
      allVals.foreach(v => out.writeSkewedGolomb(v, b))
      out.flush()
      val in = new BitInput(new ArrayBytes(bos.toByteArray))
      vals.foreach(v => assert(in.readLongGolomb(b) == v, s"golomb b=$b v=$v"))
      allVals.foreach(v =>
        assert(in.readLongSkewedGolomb(b) == v, s"skewed b=$b v=$v"))
    }
  }

  test("zigzag round-trip") {
    val rnd = new scala.util.Random(3)
    (List.fill(1000)(rnd.nextLong()) ++ List(0L, 1L, -1L, Long.MaxValue >> 1, Long.MinValue >> 1))
      .foreach { x => assert(ZigZag.nat2int(ZigZag.int2nat(x)) == x) }
  }

  test("position() mid-stream repositioning") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new BitOutput(bos)
    val xs = (0 until 500).map(i => (i * 2654435761L) % 1000)
    val positions = xs.map { x => val p = out.writtenBits; out.writeGamma(x); p }
    out.flush()
    val in = new BitInput(new ArrayBytes(bos.toByteArray), bufferSize = 16)
    // read at random positions, including backwards seeks
    val order = scala.util.Random.shuffle(xs.indices.toList)
    order.foreach { i =>
      in.position(positions(i))
      assert(in.readLongGamma() == xs(i), s"at index $i")
    }
  }

  // ---- graph generators --------------------------------------------------

  /** Strictly ascending duplicate-free successor list over [0, n). */
  private def adjacency(n: Int, gen: (Int, scala.util.Random) => Array[Int],
      seed: Long): Array[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n)(x => gen(x, rnd))
  }

  private def randomList(n: Int, maxDeg: Int)(x: Int, rnd: scala.util.Random): Array[Int] = {
    val d = rnd.nextInt(maxDeg + 1)
    val set = scala.collection.mutable.SortedSet.empty[Int]
    while (set.size < math.min(d, n)) set += rnd.nextInt(n)
    set.toArray
  }

  /** Long consecutive runs — forces the interval coder. */
  private def intervalHeavy(n: Int)(x: Int, rnd: scala.util.Random): Array[Int] = {
    val runs = rnd.nextInt(3)
    val set = scala.collection.mutable.SortedSet.empty[Int]
    (0 until runs).foreach { _ =>
      val start = rnd.nextInt(n)
      val len = 2 + rnd.nextInt(12)
      (start until math.min(start + len, n)).foreach(set += _)
    }
    set.toArray
  }

  /** Near-duplicate consecutive rows — forces reference compression. */
  private def referenceHeavy(n: Int): Array[Array[Int]] = {
    val rnd = new scala.util.Random(7L)
    val out = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      if (i == 0 || rnd.nextDouble() < 0.3 || out(i - 1).isEmpty) {
        out(i) = randomList(n, 12)(i, rnd)
      } else {
        // mutate the predecessor slightly: drop some, add some
        val set = scala.collection.mutable.SortedSet.empty[Int] ++ out(i - 1)
        if (set.nonEmpty && rnd.nextBoolean()) set -= set.toVector(rnd.nextInt(set.size))
        if (rnd.nextBoolean()) set += rnd.nextInt(n)
        out(i) = set.toArray
      }
      i += 1
    }
    out
  }

  private val paramGrid = Seq(
    BvProperties(0, 0),                                         // upstream defaults
    BvProperties(0, 0, windowSize = 0),                         // no references
    BvProperties(0, 0, minIntervalLength = 0),                  // no intervals
    BvProperties(0, 0, windowSize = 1, maxRefCount = 1),
    BvProperties(0, 0, windowSize = 4, maxRefCount = 2, minIntervalLength = 2, zetaK = 1),
    BvProperties(0, 0, zetaK = 5),
    BvProperties(0, 0, codings = StreamCodings(
      outdegree = Coding.DELTA, residual = Coding.GAMMA, offset = Coding.DELTA)),
    BvProperties(0, 0, codings = StreamCodings(
      block = Coding.DELTA, blockCount = Coding.DELTA, reference = Coding.GAMMA)),
    BvProperties(0, 0, codings = StreamCodings( // every stream nibble-coded
      outdegree = Coding.NIBBLE, block = Coding.NIBBLE,
      residual = Coding.NIBBLE, reference = Coding.NIBBLE,
      blockCount = Coding.NIBBLE, offset = Coding.NIBBLE)),
    BvProperties(0, 0, codings = StreamCodings( // the reference's GOLOMB path
      residual = Coding.GOLOMB, offset = Coding.GOLOMB), golombModulus = 5),
    BvProperties(0, 0, codings = StreamCodings( // every stream golomb-family
      outdegree = Coding.GOLOMB, block = Coding.SKEWED_GOLOMB,
      residual = Coding.SKEWED_GOLOMB, reference = Coding.GOLOMB,
      blockCount = Coding.GOLOMB, offset = Coding.SKEWED_GOLOMB),
      golombModulus = 3))

  private def roundTrip(adj: Array[Array[Int]], p: BvProperties): Unit = {
    val enc = new BvEncoder(p)
    val (g, o, propsText) = enc.encode(adj)
    val props = BvProperties.parse(propsText)
    assert(props.nodes == adj.length)
    assert(props.arcs == adj.map(_.length.toLong).sum)
    val graph = new BvGraph(props, new ArrayBytes(g), new ArrayBytes(o))

    // full sequential scan
    val seq = graph.iterator.toArray
    assert(seq.length == adj.length)
    seq.foreach { case (x, succ) =>
      assert(succ.sameElements(adj(x)), s"node $x (params $p): " +
        s"got ${succ.mkString(",")} want ${adj(x).mkString(",")}")
    }

    if (adj.length > 0) {
      // random access from a cold stream
      val probe = scala.util.Random.shuffle(adj.indices.toList).take(20)
      probe.foreach { x =>
        assert(graph.successorArray(x).sameElements(adj(x)), s"random access node $x")
      }
      // random-access outdegree
      val din = graph.newBitInput(512)
      probe.foreach { x => assert(graph.outdegree(x, din) == adj(x).length) }
      // mid-split starts: window warm-up must reproduce the sequential scan
      val starts = Seq(1, adj.length / 3, adj.length / 2, adj.length - 1)
        .filter(s => s > 0 && s < adj.length)
      starts.foreach { from =>
        val part = graph.nodeIterator(from, adj.length).toArray
        assert(part.length == adj.length - from)
        part.foreach { case (x, succ) =>
          assert(succ.sameElements(adj(x)), s"mid-split from=$from node $x")
        }
      }
    }
  }

  test("round-trip: random graphs across the parameter grid") {
    for (p <- paramGrid; seed <- 1L to 3L) {
      roundTrip(adjacency(60, randomList(60, 10), seed), p)
    }
  }

  test("round-trip: shard-base anchored graphs (firstnode) across the parameter grid") {
    // the sharded sink's exact shape: shard-LOCAL node indices with GLOBAL
    // successor values near firstNode + x. Every coding in the grid must
    // round-trip with the anchor, and the sidecar must carry it.
    val base = 5000000
    for (p <- paramGrid; seed <- 1L to 2L) {
      val shifted = adjacency(60, randomList(60, 10), seed)
        .map(_.map(_ + base))
      roundTrip(shifted, p.copy(firstNode = base.toLong))
    }
    val rendered = BvProperties(0, 0, firstNode = base.toLong).render
    assert(rendered.contains(s"firstnode=$base"))
    assert(BvProperties.parse(rendered.replace("nodes=0", "nodes=1")
      .replace("arcs=0", "arcs=0")).firstNode == base.toLong)
  }

  test("round-trip: interval-heavy graphs") {
    for (p <- paramGrid; seed <- 1L to 2L) {
      roundTrip(adjacency(50, intervalHeavy(50), seed), p)
    }
  }

  test("round-trip: reference-heavy graphs") {
    for (p <- paramGrid) roundTrip(referenceHeavy(80), p)
  }

  test("round-trip: empty graph, empty lists, singleton") {
    for (p <- paramGrid) {
      roundTrip(Array.empty[Array[Int]], p)
      roundTrip(Array.fill(10)(Array.empty[Int]), p)
      roundTrip(Array(Array(0)), p)
      // self-loops + full row
      roundTrip(Array.tabulate(8)(x => Array.range(0, 8)), p)
    }
  }

  test("round-trip: seeded random graphs, default params") {
    val rnd = new scala.util.Random(11)
    (1 to 40).foreach { _ =>
      val n = rnd.nextInt(81)
      roundTrip(adjacency(n, randomList(n, 8), rnd.nextLong()), BvProperties(0, 0))
    }
  }

  test("offsets regeneration reproduces the encoder's offsets byte-for-byte") {
    // the reference's only sink (writeOffsets, HdfsBVGraph.java:393-407):
    // given just .graph + .properties, one sequential decode pass must
    // rebuild .offsets identical to what the encoder emitted — across
    // offset codings (γ/δ/nibble) and format parameters
    for (p <- paramGrid; seed <- 1L to 2L) {
      val adj = adjacency(70, randomList(70, 9), seed)
      val (g, o, propsText) = new BvEncoder(p).encode(adj)
      val props = BvProperties.parse(propsText)
      val rebuilt = BvOffsets.regenerate(props, new ArrayBytes(g))
      assert(rebuilt.sameElements(o),
        s"offsets mismatch for params $p: ${rebuilt.length} vs ${o.length} bytes")
      // the regenerated index drives a fully-functional random-access graph
      val g2 = new BvGraph(props, new ArrayBytes(g), new ArrayBytes(rebuilt))
      assert(g2.successorArray(35).sameElements(adj(35)))
    }
  }

  test("sequential-only mode: full scan works, random access throws") {
    val adj = adjacency(40, randomList(40, 6), 5L)
    val (g, _, propsText) = new BvEncoder(BvProperties(0, 0)).encode(adj)
    val props = BvProperties.parse(propsText)
    val seq = new BvGraph(props, new ArrayBytes(g), BvGraph.NoOffsets)
    val got = seq.iterator.toArray
    assert(got.length == 40)
    got.foreach { case (x, succ) => assert(succ.sameElements(adj(x))) }
    intercept[IllegalArgumentException](seq.successorArray(3))
    intercept[IllegalArgumentException](seq.nodeIterator(5, 10))
  }

  test("properties render/parse round-trip incl. flag strings") {
    for (p <- paramGrid) {
      val r = BvProperties.parse(p.copy(nodes = 42, arcs = 99L).render)
      assert(r.windowSize == p.windowSize && r.minIntervalLength == p.minIntervalLength
        && r.zetaK == p.zetaK && r.codings == p.codings)
    }
  }

  test("big.webgraph class rewrite accepted; bad class/version rejected") {
    val ok = "graphclass=it.unimi.dsi.big.webgraph.BVGraph\nversion=0\nnodes=1\narcs=0\n" +
      "windowsize=7\nmaxrefcount=3\nminintervallength=4\n"
    assert(BvProperties.parse(ok).graphClass.endsWith("BVGraph"))
    intercept[IllegalArgumentException] {
      BvProperties.parse(ok.replace("BVGraph", "ASCIIGraph"))
    }
    intercept[IllegalArgumentException] {
      BvProperties.parse(ok.replace("version=0", "version=99"))
    }
  }
}
