package graft.bv

import org.scalatest.funsuite.AnyFunSuite

/** Golden fixtures (FIXTURES.md §2): the named fixture shapes, plus
  * HAND-DERIVED bit-exact encodings. The round-trip property tests prove
  * encoder and decoder agree with each other; the byte goldens below
  * prove they agree with the *published wire format* (γ/ζ_k definitions
  * and the record layout of BVGraph) — a self-consistent-but-wrong codec
  * fails here.
  */
class GoldenFixturesSpec extends AnyFunSuite {

  private def decodeAll(g: Array[Byte], o: Array[Byte], propsText: String) = {
    val graph = new BvGraph(BvProperties.parse(propsText),
      new ArrayBytes(g), new ArrayBytes(o))
    graph.iterator.map(_._2).toArray
  }

  // ---- bit-exact goldens --------------------------------------------------

  test("golden bytes: residual-only graph (windowsize=0, intervals off)") {
    // nodes: 0->[1], 1->[], 2->[0,2]; outdegrees gamma, residuals zeta_3.
    //   node0: g(1)=010, z3(int2nat(1))=z3(2)=1011            -> 0101011
    //   node1: g(0)=1                                          -> 1
    //   node2: g(2)=011, z3(int2nat(-2))=z3(3)=1100, z3(1)=1010-> 01111001010
    // stream: 0101011 1 011 1100 1010 + pad = 0x57 0x79 0x40
    val adj = Array(Array(1), Array[Int](), Array(0, 2))
    val p = BvProperties(0, 0, windowSize = 0, minIntervalLength = 0)
    val (g, o, propsText) = new BvEncoder(p).encode(adj)
    assert(g.toSeq == Seq(0x57, 0x79, 0x40).map(_.toByte),
      s"graph bytes: ${g.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    // offsets: gamma gaps of [0,7,8,19]: g(0)=1 g(7)=0001000 g(1)=010
    // g(11)=0001100 -> 0x88 0x43 0x00
    assert(o.toSeq == Seq(0x88, 0x43, 0x00).map(_.toByte),
      s"offsets bytes: ${o.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    assert(decodeAll(g, o, propsText).zip(adj).forall(t => t._1.sameElements(t._2)))
  }

  test("golden bytes: interval coding") {
    // node 0 -> [2,3,4,5], windowsize=0, minintervallength=4:
    //   g(4)=00101, intervalCount g(1)=010,
    //   left extreme g(int2nat(2))=g(4)=00101, len g(4-4)=g(0)=1
    // stream: 00101 010 00101 1 + pad = 0x2A 0x2C
    val adj = Array(Array(2, 3, 4, 5))
    val p = BvProperties(0, 0, windowSize = 0, minIntervalLength = 4)
    val (g, o, propsText) = new BvEncoder(p).encode(adj)
    assert(g.toSeq == Seq(0x2A, 0x2C).map(_.toByte),
      s"graph bytes: ${g.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    assert(decodeAll(g, o, propsText).head.sameElements(adj.head))
  }

  test("golden bytes: reference compression with implicit trailing copy block") {
    // 0->[1,3], 1->[1,3]; windowsize=1, maxref=1, intervals off.
    //   node0: g(2)=011, ref unary(0)=1, z3(2)=1011, z3(1)=1010
    //   node1: g(2)=011, ref unary(1)=01, blockCount g(0)=1
    //          (even count => decoder copies the entire referenced list)
    // stream: 011 1 1011 1010 011 01 1 + pad = 0x7B 0xA6 0xC0
    val adj = Array(Array(1, 3), Array(1, 3))
    val p = BvProperties(0, 0, windowSize = 1, maxRefCount = 1, minIntervalLength = 0)
    val (g, o, propsText) = new BvEncoder(p).encode(adj)
    assert(g.toSeq == Seq(0x7B, 0xA6, 0xC0).map(_.toByte),
      s"graph bytes: ${g.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    assert(decodeAll(g, o, propsText).zip(adj).forall(t => t._1.sameElements(t._2)))
  }

  // ---- named fixture shapes (FIXTURES.md §2) ------------------------------

  /** tiny7: empty outdegree + consecutive run + near-identical rows. */
  private val tiny7: Array[Array[Int]] = Array(
    Array(1, 2, 3, 4, 5), // interval path
    Array[Int](),         // empty outdegree
    Array(0, 3, 6),
    Array(0, 3, 6),       // identical -> reference/copy-block path
    Array(0, 2, 3, 6),    // near-identical -> blocks + residual
    Array(4),
    Array(0, 1, 2, 3, 4, 5, 6))

  private def roundTrip(adj: Array[Array[Int]], p: BvProperties): Unit = {
    val (g, o, propsText) = new BvEncoder(p).encode(adj)
    val got = decodeAll(g, o, propsText)
    assert(got.length == adj.length)
    got.zip(adj).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.sameElements(b), s"node $i")
    }
  }

  test("tiny7 decodes node-by-node under default / nowin / noint params") {
    roundTrip(tiny7, BvProperties(0, 0))                          // defaults
    roundTrip(tiny7, BvProperties(0, 0, windowSize = 0))          // nowin
    roundTrip(tiny7, BvProperties(0, 0, minIntervalLength = 0))   // noint
  }

  test("line1k: split boundaries and window warm-up on a path graph") {
    val adj = Array.tabulate(1000)(i => if (i < 999) Array(i + 1) else Array[Int]())
    val (g, o, propsText) = new BvEncoder(BvProperties(0, 0)).encode(adj)
    val graph = new BvGraph(BvProperties.parse(propsText),
      new ArrayBytes(g), new ArrayBytes(o))
    // n >> splits and n < splits split semantics, every boundary exact
    for (splitCount <- Seq(3, 13, 1000, 2048)) {
      val splitSize = math.max(1, math.ceil(1000.0 / splitCount).toInt)
      var from = 0
      while (from < 1000) {
        val until = math.min(from + splitSize, 1000)
        graph.nodeIterator(from, until).foreach { case (x, succ) =>
          assert(succ.sameElements(adj(x)), s"split [$from,$until) node $x")
        }
        from = until
      }
    }
  }

  test("clique32+isolates: interval-heavy rows mixed with empty outdegrees") {
    val adj = Array.tabulate(64) { i =>
      if (i < 32) (0 until 32).filter(_ != i).toArray else Array[Int]()
    }
    roundTrip(adj, BvProperties(0, 0))
    // degree-only access path equals full decode
    val (g, o, propsText) = new BvEncoder(BvProperties(0, 0)).encode(adj)
    val graph = new BvGraph(BvProperties.parse(propsText),
      new ArrayBytes(g), new ArrayBytes(o))
    val in = graph.newBitInput(512)
    adj.indices.foreach(x => assert(graph.outdegree(x, in) == adj(x).length))
  }

  test("empty graph: zero-node semantics") {
    roundTrip(Array.empty[Array[Int]], BvProperties(0, 0))
    val (g, o, propsText) = new BvEncoder(BvProperties(0, 0))
      .encode(Array.empty[Array[Int]])
    val graph = new BvGraph(BvProperties.parse(propsText),
      new ArrayBytes(g), new ArrayBytes(o))
    assert(graph.nodeIterator(0, 0).isEmpty && graph.n == 0)
  }
}
