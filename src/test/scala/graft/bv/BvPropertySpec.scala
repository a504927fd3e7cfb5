package graft.bv

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties (SURVEY.md §5.1): generator-driven round-trips
  * for the universal codes, the Elias-Fano list, and whole-graph
  * encode/decode with shrinking on failure. */
object BvPropertySpec extends Properties("bv") {

  // ---- universal codes ----------------------------------------------------

  private def codeRoundTrip(xs: List[Long], k: Int): Boolean = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new BitOutput(bos)
    xs.foreach { x => out.writeGamma(x); out.writeDelta(x); out.writeZeta(x, k) }
    out.flush()
    val in = new BitInput(new ArrayBytes(bos.toByteArray))
    xs.forall { x =>
      in.readLongGamma() == x && in.readLongDelta() == x && in.readLongZeta(k) == x
    }
  }

  property("gamma/delta/zeta round-trip") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 1L << 50)), Gen.choose(1, 7)) {
      (xs, k) => codeRoundTrip(xs, k)
    }

  property("zigzag is a bijection on longs") =
    forAll { (x: Long) => ZigZag.nat2int(ZigZag.int2nat(x)) == x }

  // ---- Elias-Fano ---------------------------------------------------------

  private val monotoneGen: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 100000L)).map(_.scanLeft(0L)(_ + _).toArray)

  property("elias-fano equals the source sequence") = forAll(monotoneGen) { vs =>
    val ef = EliasFanoLongList(vs)
    ef.length == vs.length && vs.indices.forall(i => ef(i) == vs(i))
  }

  // ---- whole-graph round-trip --------------------------------------------

  private def adjacencyGen(maxN: Int): Gen[Array[Array[Int]]] =
    Gen.choose(0, maxN).flatMap { n =>
      Gen.sequence[Array[Array[Int]], Array[Int]](
        Seq.fill(n)(Gen.someOf(0 until n).map(_.toArray.sorted)))
    }

  private val paramsGen: Gen[BvProperties] = for {
    w <- Gen.oneOf(0, 1, 3, 7)
    mil <- Gen.oneOf(0, 2, 4)
    zk <- Gen.choose(1, 5)
  } yield BvProperties(0, 0, windowSize = w, maxRefCount = 3,
    minIntervalLength = mil, zetaK = zk)

  property("graph encode/decode round-trip across parameters") =
    forAll(adjacencyGen(40), paramsGen) { (adj, p) =>
      val (g, o, propsText) = new BvEncoder(p).encode(adj)
      val graph = new BvGraph(BvProperties.parse(propsText),
        new ArrayBytes(g), new ArrayBytes(o))
      graph.iterator.toArray.zip(adj).forall {
        case ((x, got), want) => got.sameElements(want)
      } && graph.n == adj.length
    }

  property("mid-split start equals sequential scan suffix") =
    forAll(adjacencyGen(40), Gen.choose(0, 39)) { (adj, fromRaw) =>
      adj.isEmpty || {
        val from = fromRaw % adj.length
        val (g, o, propsText) = new BvEncoder(BvProperties(0, 0)).encode(adj)
        val graph = new BvGraph(BvProperties.parse(propsText),
          new ArrayBytes(g), new ArrayBytes(o))
        graph.nodeIterator(from, adj.length).forall {
          case (x, got) => got.sameElements(adj(x))
        }
      }
    }
}
