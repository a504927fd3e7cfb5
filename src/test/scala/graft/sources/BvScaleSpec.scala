package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/** Scale smoke for the BV pipeline: a 2M-node / ~8M-edge graph generated
  * distributively, compressed through the sharded sink, and read back —
  * no driver materialization anywhere. Validates shard tiling, decode
  * correctness by formula spot-checks, and the degree fast path at a
  * size where per-task state actually matters. */
class BvScaleSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private val N = 2000000L

  // successors of x: {x+1, (x*2654435761) mod N, (x*40503) mod N} sorted
  // distinct, minus x itself — deterministic and recomputable per node
  private def succOf(x: Long): Seq[Int] = {
    val n = N
    Seq((x + 1) % n, (x * 2654435761L) % n, (x * 40503L) % n)
      .filter(_ != x).distinct.sorted.map(_.toInt)
  }

  test("2M-node graph: distributed generate -> sharded encode -> scan") {
    val base = java.nio.file.Files.createTempDirectory("bvscale").toString + "/g"
    val df = spark.range(N).select(
      col("id").cast("int").as("id"),
      array_sort(array_distinct(filter(array(
        (col("id") + 1) % N,
        (col("id") * 2654435761L) % N,
        (col("id") * 40503L) % N), x => x =!= col("id")))).cast("array<int>")
        .as("successors"))
      .withColumn("outdegree", size(col("successors")))
    df.write.format("bvgraph").option("basename", base).option("shards", 16)
      .mode("overwrite").save()

    val mf = BvShards.readManifest(base)
    assert(mf.isDefined && mf.get.shards.length == 16 && mf.get.nodes == N)

    val back = spark.read.format("bvgraph").option("basename", base).load()
    // full decode: node count and total edges match the generator
    val expectedEdges = mf.get.arcs
    assert(back.count() == N)
    assert(back.agg(sum(size(col("successors")))).head().getLong(0) == expectedEdges)
    // degree fast path agrees with the full decode
    assert(back.select(col("outdegree"))
      .agg(sum(col("outdegree"))).head().getLong(0) == expectedEdges)
    // formula spot-checks across shard boundaries and interiors
    val probes = Seq(0L, 1L, 124999L, 125000L, 999999L, 1999998L, 1999999L)
    val got = back.filter(col("id").isin(probes.map(_.toInt): _*))
      .collect().map(r => r.getInt(0).toLong -> r.getSeq[Int](1)).toMap
    probes.foreach { x =>
      assert(got(x) == succOf(x), s"node $x: got ${got(x)} want ${succOf(x)}")
    }
    // compression: well under the 96 bits/node of the raw arrays
    val graphBytes = mf.get.shards.map { sh =>
      new java.io.File(sh.base + ".graph").length
    }.sum
    info(f"${mf.get.arcs} edges, ${graphBytes * 8.0 / mf.get.arcs}%.2f bits/link across 16 shards")
    assert(graphBytes * 8.0 / mf.get.arcs < 40.0)
  }
}
