package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The coding advisor's claim is that its bit formulas ARE the encoder's
  * cost function — so gate them against the real thing: re-encode the
  * fixture graph residual-only (windowsize=0, minintervallength=0, one
  * shard) under each residual coding and require the `.graph` file to be
  * exactly the model's bit total rounded up to whole bytes. A drift of
  * even one bit in either the model or the encoder fails here.
  *
  * Also regression-gates [[graft.queries.GraphQueries.degreeOrderPerm]]:
  * the two-phase rank must be a true permutation that sorts by
  * (outdegree DESC, id).
  */
class BvAdvisorSpec extends AnyFunSuite {
  import graft.SparkSessionFixture._

  test("advisor bit model == encoder output, per residual coding") {
    graft.Caches.sweep(spark)
    val adv = graft.SparkEntry.queries("bv_coding_advisor")(spark, sf0001).collect()
    assert(adv.nonEmpty)
    val totals = Map(
      "gamma" -> adv.map(_.getAs[Long]("bits_gamma")).sum,
      "delta" -> adv.map(_.getAs[Long]("bits_delta")).sum,
      "zeta3" -> adv.map(_.getAs[Long]("bits_zeta3")).sum)
    val base = graft.queries.GraphQueries.bvFixture(spark, sf0001)
    val g = spark.read.format("bvgraph").option("basename", base).load()
    val n = g.agg(max(col("id"))).head().getInt(0) + 1
    val arcs = g.agg(sum(col("outdegree"))).head().getLong(0)
    for ((name, flag) <- Seq("gamma" -> "RESIDUALS_GAMMA",
        "delta" -> "RESIDUALS_DELTA", "zeta3" -> "RESIDUALS_ZETA")) {
      val b = java.nio.file.Files.createTempDirectory("graft_adv").toString + "/g"
      g.filter(col("outdegree") > 0)
        .select(col("id"), col("successors"), col("outdegree"))
        .write.format("bvgraph").option("basename", b)
        .option("shards", 1).option("nodes", n)
        .option("windowsize", 0).option("minintervallength", 0)
        .option("compressionflags", flag).option("zetak", 3)
        .mode("overwrite").save()
      // one DATA shard, plus driver-encoded empty-pad shards for the
      // degree-0 boundary gaps (the `nodes` densify) — the model covers
      // all of them, so sum every .graph file; each is byte-padded.
      val dir = java.nio.file.Paths.get(s"$b.d")
      val graphFiles = java.nio.file.Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".graph")).toSeq
      val bits = graphFiles.map(java.nio.file.Files.size(_) * 8).sum
      val model = totals(name)
      assert(bits >= model && bits <= model + 7L * graphFiles.size,
        s"$name: model says $model bits, encoder wrote $bits over ${graphFiles.size} shards")
      // and the coding actually decodes: full round-trip arc count
      val back = spark.read.format("bvgraph").option("basename", b).load()
        .select(explode(col("successors"))).count()
      assert(back == arcs, s"$name round-trip lost arcs: $back != $arcs")
    }
  }

  test("degreeOrderPerm is a (outdeg DESC, id) permutation, built without a global node window") {
    val g = spark.read.format("bvgraph")
      .option("basename", graft.queries.GraphQueries.bvFixture(spark, sf0001)).load()
    val n = g.count()
    val perm = graft.queries.GraphQueries.degreeOrderPerm(g)
    perm.collect() // drive AQE to the final plan
    val p = perm.queryExecution.executedPlan.toString
    // the node-sized rank window must be bucket-partitioned; only the
    // metadata-sized bucket-count cumsum may run single-partition
    assert(p.contains("row_number()") && p.contains("windowspecdefinition(okey"),
      s"rank window lost its bucket partitioning:\n$p")
    val rows = perm.collect()
    assert(rows.length == n)
    assert(rows.map(_.getAs[Long]("new_id")).sorted.toSeq == (0L until n).toSeq,
      "new_id is not a dense permutation")
    // order check: new_id ascending implies (outdeg desc, id asc)
    val deg = g.select(col("id"), col("outdegree")).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val byNew = rows.sortBy(_.getAs[Long]("new_id"))
      .map(r => r.getAs[Int]("old_id"))
    byNew.sliding(2).foreach { case Array(a, b) =>
      assert(deg(a) > deg(b) || (deg(a) == deg(b) && a < b),
        s"order violated between old ids $a and $b")
    case _ => ()
    }
  }
}
