package graft.bv

import org.scalatest.funsuite.AnyFunSuite

/** Corrupted/truncated inputs must fail loudly (EOF/IllegalArgument), not
  * return silently wrong adjacency — a scan task that decodes garbage
  * would poison every downstream aggregate. */
class CorruptionSpec extends AnyFunSuite {

  private def fixture(): (Array[Byte], Array[Byte], BvProperties, Array[Array[Int]]) = {
    val rnd = new scala.util.Random(5L)
    val adj = Array.tabulate(200) { _ =>
      val d = rnd.nextInt(8)
      val s = scala.collection.mutable.SortedSet.empty[Int]
      while (s.size < d) s += rnd.nextInt(200)
      s.toArray
    }
    val (g, o, p) = new BvEncoder(BvProperties(0, 0)).encode(adj)
    (g, o, BvProperties.parse(p), adj)
  }

  test("truncated graph stream throws instead of fabricating successors") {
    val (g, o, props, _) = fixture()
    val cut = java.util.Arrays.copyOf(g, g.length / 3)
    val graph = new BvGraph(props, new ArrayBytes(cut), new ArrayBytes(o))
    intercept[Exception] {
      graph.iterator.foreach { case (_, succ) => succ.length }
    }
  }

  test("truncation at a node boundary cannot yield silent empty nodes") {
    // adversarial case: cut the graph exactly at a node's byte-aligned
    // start — the zero padding would decode as outdegree-0 nodes forever;
    // the per-node offsets desync check must catch it
    val (g, o, props, adj) = fixture()
    val graph0 = new BvGraph(props, new ArrayBytes(g), new ArrayBytes(o))
    val cutBit = graph0.offsets(props.nodes / 2)
    val cut = java.util.Arrays.copyOf(g, ((cutBit + 7) / 8).toInt)
    val graph = new BvGraph(props, new ArrayBytes(cut), new ArrayBytes(o))
    val e = intercept[Exception] {
      val it = graph.iterator
      while (it.hasNext) it.next()
    }
    assert(e.getMessage != null)
  }

  test("truncated offsets stream fails at load") {
    val (g, o, props, _) = fixture()
    val cut = java.util.Arrays.copyOf(o, math.max(1, o.length / 4))
    intercept[Exception] {
      new BvGraph(props, new ArrayBytes(g), new ArrayBytes(cut)).offsets(props.nodes)
    }
  }

  test("node count mismatch in properties is detected") {
    val (g, o, props, _) = fixture()
    // claim more nodes than the offsets stream encodes
    val lying = props.copy(nodes = props.nodes * 2)
    intercept[Exception] {
      new BvGraph(lying, new ArrayBytes(g), new ArrayBytes(o)).offsets(lying.nodes)
    }
  }

  test("malformed properties are rejected with clear errors") {
    intercept[IllegalArgumentException](BvProperties.parse("graphclass=Foo\n"))
    intercept[IllegalArgumentException](BvProperties.parse(
      "graphclass=it.unimi.dsi.webgraph.BVGraph\nversion=0\n")) // missing nodes
    intercept[IllegalArgumentException](BvProperties.parse(
      "graphclass=it.unimi.dsi.webgraph.BVGraph\nversion=0\nnodes=1\narcs=0\n" +
        "windowsize=7\nmaxrefcount=3\nminintervallength=4\n" +
        "compressionflags=RESIDUALS_BANANA"))
  }
}
