package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture
import graft.bv.BvEncoder

/** DSv2 end-to-end (SURVEY.md §5.4): encoder-written fixture graphs read
  * back through `spark.read.format("bvgraph")`, across split counts and
  * pruned schemas — one real query through source → Catalyst → Tungsten.
  */
class BvSourceSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def fixture(n: Int, seed: Long): (String, Array[Array[Int]]) = {
    val rnd = new scala.util.Random(seed)
    val adj = Array.tabulate(n) { _ =>
      val d = rnd.nextInt(12)
      val s = scala.collection.mutable.SortedSet.empty[Int]
      while (s.size < math.min(d, n)) s += rnd.nextInt(n)
      s.toArray
    }
    val dir = java.nio.file.Files.createTempDirectory("bvsrc").toString
    val base = s"$dir/g"
    BvEncoder().write(base, adj)
    (base, adj)
  }

  test("full scan matches encoder input across split counts") {
    val (base, adj) = fixture(500, 42L)
    for (splits <- Seq(1, 3, 7, 32, 600)) {
      val got = spark.read.format("bvgraph")
        .option("basename", base).option("splits", splits).load()
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Int](1).toArray)
        .toMap
      assert(got.size == adj.length, s"splits=$splits")
      adj.indices.foreach { x =>
        assert(got(x).sameElements(adj(x)), s"splits=$splits node $x")
      }
    }
  }

  test("aggregates: edge count via sum(size(successors))") {
    val (base, adj) = fixture(300, 7L)
    val m = spark.read.format("bvgraph")
      .option("basename", base).option("splits", 5).load()
      .agg(sum(size(col("successors")))).head().getLong(0)
    assert(m == adj.map(_.length.toLong).sum)
  }

  test("column pruning: id-only scan synthesizes ids without decode") {
    val (base, adj) = fixture(200, 9L)
    val df = spark.read.format("bvgraph")
      .option("basename", base).option("splits", 4).load()
      .select("id")
    // plan-level: the scan's read schema must have dropped successors
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.head.scan.readSchema().fieldNames.sameElements(Array("id")))
    val ids = df.collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == adj.indices.toSeq)
    // count(*) prunes everything
    val n = spark.read.format("bvgraph").option("basename", base).load().count()
    assert(n == adj.length)
  }

  test("explode to edge list round-trips (the reference's flatMap pattern)") {
    val (base, adj) = fixture(150, 3L)
    val edges = spark.read.format("bvgraph")
      .option("basename", base).option("splits", 3).load()
      .select(col("id").as("src"), explode(col("successors")).as("dst"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    val want = adj.indices.flatMap(x => adj(x).map(d => (x, d))).sorted
    assert(edges.sameElements(want))
  }

  test("stats are reported from .properties") {
    val (base, adj) = fixture(100, 5L)
    val scan = new BvGraphScan(base, None, BvGraphTable.SCHEMA)
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == adj.length)
    assert(st.sizeInBytes().getAsLong == 4L * adj.length + 4L * adj.map(_.length.toLong).sum)
  }
}
