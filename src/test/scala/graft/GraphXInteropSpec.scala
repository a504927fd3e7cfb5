package graft

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.bv.BvEncoder

/** GraphX handoff — the reference's documented analytics path
  * (/root/reference/README.md:37-48): adjacency rows -> edge tuples ->
  * Graph.fromEdgeTuples -> numVertices/numEdges, plus a PageRank step to
  * prove the handoff yields a fully functional GraphX graph. */
class GraphXInteropSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private lazy val fixture: (String, Array[Array[Int]]) = {
    val rnd = new scala.util.Random(123L)
    val n = 400
    val adj = Array.tabulate(n) { _ =>
      val d = rnd.nextInt(8)
      val s = scala.collection.mutable.SortedSet.empty[Int]
      while (s.size < d) s += rnd.nextInt(n)
      s.toArray
    }
    val dir = java.nio.file.Files.createTempDirectory("gx").toString
    BvEncoder().write(s"$dir/g", adj)
    (s"$dir/g", adj)
  }

  test("bvgraph scan -> Graph.fromEdgeTuples -> vertex/edge counts (README path)") {
    val (base, adj) = fixture
    val df = spark.read.format("bvgraph").option("basename", base)
      .option("splits", 6).load()
    // README.md:39-40 of the reference, DataFrame-first:
    val edges = df.select(col("id"), explode(col("successors")).as("dst"))
      .rdd.map(r => (r.getInt(0).toLong, r.getInt(1).toLong))
    val graph = Graph.fromEdgeTuples(edges, defaultValue = 1)
    assert(graph.numEdges == adj.map(_.length.toLong).sum)
    // fromEdgeTuples synthesizes vertices that appear in at least one edge
    val touched = (adj.indices.filter(adj(_).nonEmpty) ++ adj.toSeq.flatten).distinct
    assert(graph.numVertices == touched.size)
  }

  test("handoff graph runs PageRank") {
    val (base, _) = fixture
    val df = spark.read.format("bvgraph").option("basename", base).load()
    val edges = df.select(col("id"), explode(col("successors")).as("dst"))
      .rdd.map(r => Edge(r.getInt(0).toLong, r.getInt(1).toLong, 1))
    val g = Graph.fromEdges(edges, defaultValue = 1.0)
    val pr = g.staticPageRank(3).vertices.collect()
    assert(pr.nonEmpty && pr.forall(_._2 > 0))
  }

  test("connectedComponents matches union-find on chains, cycles and isolated stars") {
    // arbitrary topology (not the star shape graph_cc's oracle relies
    // on): two chains bridged into one component, a cycle, a self-loop,
    // and an isolated pair — cross-checked against a scala union-find
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),       // chain
      (10L, 11L), (11L, 12L), (4L, 10L),  // second chain, bridged to first
      (20L, 21L), (21L, 22L), (22L, 20L), // cycle
      (30L, 30L),                          // self-loop
      (40L, 41L))                          // isolated pair
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
    val rdd = spark.sparkContext.parallelize(edges.map { case (a, b) => Edge(a, b, ()) })
    val got = Graph.fromEdges(rdd, ()).connectedComponents()
      .vertices.collect().toMap
    assert(got == expected, s"got $got want $expected")
  }
}
