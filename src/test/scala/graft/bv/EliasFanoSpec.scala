package graft.bv

import org.scalatest.funsuite.AnyFunSuite

class EliasFanoSpec extends AnyFunSuite {

  private def check(values: Array[Long]): Unit = {
    val ef = EliasFanoLongList(values)
    assert(ef.length == values.length)
    values.indices.foreach { i =>
      assert(ef(i) == values(i), s"at $i: got ${ef(i)} want ${values(i)}")
    }
  }

  test("random monotone sequences round-trip across densities") {
    for (seed <- 1 to 10; gapScale <- Seq(1, 7, 100, 5000)) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(3000)
      val values = new Array[Long](n)
      var acc = rnd.nextInt(gapScale).toLong
      for (i <- 0 until n) {
        values(i) = acc
        acc += rnd.nextInt(gapScale)
      }
      check(values)
    }
  }

  test("edge cases: empty, single, all-equal, zeros, huge gaps") {
    check(Array.empty[Long])
    check(Array(0L))
    check(Array(123456789L))
    check(Array.fill(500)(42L))
    check(Array.fill(100)(0L))
    check(Array(0L, 1L << 40, (1L << 40) + 1, 1L << 41))
    check((0L until 10000L).toArray)
  }

  test("jump-table boundaries (indices around multiples of JUMP)") {
    val values = Array.tabulate(1000)(i => i.toLong * 37)
    val ef = EliasFanoLongList(values)
    for (k <- Seq(0, 63, 64, 65, 127, 128, 129, 511, 512, 513, 999)) {
      assert(ef(k) == values(k))
    }
  }

  test("succinctness: dense sequences use far fewer bytes than Array[Long]") {
    val values = Array.tabulate(100000)(i => i.toLong * 11) // ~offsets-like
    val ef = EliasFanoLongList(values)
    assert(ef.sizeInBytes < 8L * values.length / 4,
      s"${ef.sizeInBytes} bytes vs plain ${8L * values.length}")
  }

  test("BvGraph decodes identically with the EF offsets index forced") {
    val rnd = new scala.util.Random(9L)
    val adj = Array.tabulate(300) { _ =>
      val d = rnd.nextInt(10)
      val s = scala.collection.mutable.SortedSet.empty[Int]
      while (s.size < d) s += rnd.nextInt(300)
      s.toArray
    }
    val (g, o, propsText) = new BvEncoder(BvProperties(0, 0)).encode(adj)
    val props = BvProperties.parse(propsText)
    val ef = new BvGraph(props, new ArrayBytes(g), new ArrayBytes(o),
      efOffsets = Some(true))
    assert(ef.offsets.isInstanceOf[BvGraph.EfOffsets])
    // sequential, mid-split, and random access all go through the EF index
    ef.iterator.foreach { case (x, succ) => assert(succ.sameElements(adj(x))) }
    ef.nodeIterator(137, 300).foreach { case (x, succ) =>
      assert(succ.sameElements(adj(x)))
    }
    (0 until 300 by 17).foreach { x =>
      assert(ef.successorArray(x).sameElements(adj(x)))
    }
  }
}
