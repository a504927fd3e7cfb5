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

  test("outdegree column: values correct via both the fast path and full decode") {
    val (base, adj) = fixture(250, 33L)
    val df = spark.read.format("bvgraph")
      .option("basename", base).option("splits", 5).load()
    // degree-only projection -> BvOutdegreeReader (no successor decode)
    val fast = df.select("id", "outdegree")
    val scans = fast.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("id", "outdegree"))
    val got = fast.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    adj.indices.foreach(x => assert(got(x) == adj(x).length, s"node $x"))
    // full projection: outdegree consistent with size(successors)
    val mism = df.filter(col("outdegree") =!= size(col("successors"))).count()
    assert(mism == 0)
  }

  test("id-range predicate pushdown prunes node ranges at planning time") {
    val (base, adj) = fixture(400, 21L)
    val df = spark.read.format("bvgraph")
      .option("basename", base).option("splits", 8).load()
      .filter(col("id") >= 100 && col("id") < 150)
    // values: only the requested range, correct successors
    val got = df.collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toArray).toMap
    assert(got.keySet == (100 until 150).toSet)
    (100 until 150).foreach(x => assert(got(x).sameElements(adj(x))))
    // planning: the scan's partitions cover only the pushed range
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val parts = scans.head.partitions.flatten.collect { case p: BvInputPartition => p }
    assert(parts.nonEmpty)
    assert(parts.map(p => p.until - p.from).sum == 50,
      s"partitions not pruned: ${parts.mkString(",")}")
    assert(scans.head.scan.description().contains("id in [100,150)"))
  }

  test("id pushdown on a sharded graph drops whole shards") {
    import spark.implicits._
    val adj = Array.tabulate(300)(x => Array((x + 1) % 300))
    val base = java.nio.file.Files.createTempDirectory("bvpd").toString + "/g"
    adj.zipWithIndex.map { case (s, i) => (i, s) }.toSeq.toDF("id", "successors")
      .select(col("id").cast("int"), col("successors").cast("array<int>"))
      .withColumn("outdegree", size(col("successors")))
      .write.format("bvgraph").option("basename", base).option("shards", 6)
      .mode("overwrite").save()
    val df = spark.read.format("bvgraph").option("basename", base).load()
      .filter(col("id") === 250)
    val got = df.collect()
    assert(got.length == 1 && got.head.getInt(0) == 250
      && got.head.getSeq[Int](1) == Seq(251))
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val parts = scans.head.partitions.flatten.collect { case p: BvInputPartition => p }
    assert(parts.length == 1 && parts.head.until - parts.head.from == 1)
  }

  test("aggregate pushdown: count/sum(outdegree)/min/max answered from metadata") {
    val (base, adj) = fixture(300, 44L)
    val df = spark.read.format("bvgraph").option("basename", base).load()
    // count(*) — no scan at all: the plan's scan must carry the pushed agg
    val cnt = df.groupBy().count()
    val scans = cnt.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.head.scan.description().contains("PushedAggregates: COUNT(*)"),
      s"agg not pushed:\n${scans.head.scan.description()}")
    assert(cnt.head().getLong(0) == 300)
    // sum(outdegree) == arcs from properties
    assert(df.agg(sum(col("outdegree"))).head().getLong(0)
      == adj.map(_.length.toLong).sum)
    // min/max id from the range
    val mm = df.agg(min(col("id")), max(col("id"))).head()
    assert(mm.getInt(0) == 0 && mm.getInt(1) == 299)
    // count with pushed id bounds = clamped range size, still metadata-only
    val bounded = df.filter(col("id") >= 50 && col("id") < 120).groupBy().count()
    assert(bounded.head().getLong(0) == 70)
    // SUM(outdegree) must NOT push under an id filter (arcs is global)
    val filteredSum = df.filter(col("id") < 100).agg(sum(col("outdegree")))
    assert(filteredSum.head().getLong(0) == adj.take(100).map(_.length.toLong).sum)
    // grouped aggregation is not pushed and stays correct
    val grouped = df.groupBy((col("id") % 2).as("p")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(grouped(0) == 150 && grouped(1) == 150)
  }

  test("aggregate pushdown works on sharded graphs from the manifest") {
    import spark.implicits._
    val adj = Array.tabulate(400)(x => Array((x + 7) % 400))
    val base = java.nio.file.Files.createTempDirectory("bvagg").toString + "/g"
    adj.zipWithIndex.map { case (s, i) => (i, s) }.toSeq.toDF("id", "successors")
      .select(col("id").cast("int"), col("successors").cast("array<int>"))
      .withColumn("outdegree", size(col("successors")))
      .write.format("bvgraph").option("basename", base).option("shards", 4)
      .mode("overwrite").save()
    val df = spark.read.format("bvgraph").option("basename", base).load()
    assert(df.groupBy().count().head().getLong(0) == 400)
    assert(df.agg(sum(col("outdegree"))).head().getLong(0) == 400)
  }

  test("stats are reported from .properties") {
    val (base, adj) = fixture(100, 5L)
    val scan = new BvGraphScan(base, None, BvGraphTable.SCHEMA)
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == adj.length)
    assert(st.sizeInBytes().getAsLong == 4L * adj.length + 4L * adj.map(_.length.toLong).sum)
  }

  test("runtime filtering (DSv2 DPP analogue) prunes partitions via filter()") {
    import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, In, LessThan}
    val (base, _) = fixture(400, 22L)
    val scan = new BvGraphScan(base, Some(8), BvGraphTable.SCHEMA)
    val before = scan.planInputPartitions().collect { case p: BvInputPartition => p }
    assert(before.map(p => p.until - p.from).sum == 400)
    // a join's build-side id set arrives at runtime; the IN collapses to
    // its [min, max] envelope — partial pruning is sound, the join
    // re-evaluates its condition
    scan.filter(Array[Filter](In("id", Array(120, 160, 199))))
    val after = scan.planInputPartitions().collect { case p: BvInputPartition => p }
    assert(after.map(p => p.until - p.from).sum == 80,
      s"runtime IN-filter did not prune: ${after.mkString(",")}")
    assert(after.forall(p => p.from >= 120 && p.until <= 200))
    // range filters compose with the earlier bounds
    scan.filter(Array[Filter](GreaterThanOrEqual("id", 150), LessThan("id", 180)))
    val tighter = scan.planInputPartitions().collect { case p: BvInputPartition => p }
    assert(tighter.map(p => p.until - p.from).sum == 30)
    // the unfiltered scan is untouched (fresh scan plans the full graph)
    val fresh = new BvGraphScan(base, Some(8), BvGraphTable.SCHEMA)
    assert(fresh.planInputPartitions().collect { case p: BvInputPartition => p }
      .map(p => p.until - p.from).sum == 400)
  }

  test("pushed + runtime id bounds cover exactly the clamped range (randomized)") {
    import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThan}
    val n = 500
    val (base, _) = fixture(n, 41L)
    val rnd = new scala.util.Random(7)
    (1 to 30).foreach { trial =>
      val a = rnd.nextInt(n + 100) - 50 // deliberately includes out-of-range
      val b = rnd.nextInt(n + 100) - 50
      val (lo, hi) = (math.min(a, b).toLong, math.max(a, b).toLong)
      val scan = new BvGraphScan(base, Some(7), BvGraphTable.SCHEMA, lo, hi)
      val rl = lo + rnd.nextInt(20)
      val rh = hi - rnd.nextInt(20)
      scan.filter(Array[Filter](
        GreaterThanOrEqual("id", rl), LessThan("id", rh)))
      val eLo = math.max(0L, math.max(lo, rl))
      val eHi = math.min(n.toLong, math.min(hi, rh))
      val parts = scan.planInputPartitions()
        .collect { case p: BvInputPartition => p }.sortBy(_.from)
      val expected = math.max(0L, eHi - eLo)
      assert(parts.map(p => (p.until - p.from).toLong).sum == expected,
        s"trial $trial: bounds [$lo,$hi) rt [$rl,$rh)")
      if (expected > 0) {
        assert(parts.head.from == eLo && parts.last.until == eHi)
        parts.sliding(2).foreach {
          case Array(x, y) => assert(x.until == y.from, s"gap in trial $trial")
          case _ =>
        }
      }
    }
  }

  test("BvCatalog: graphs are SQL tables addressed by basename, no registration") {
    val (base, adj) = fixture(150, 31L)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.BvCatalog")
    try {
      val m = spark.sql(s"SELECT sum(outdegree) AS m FROM graft.`$base`")
        .head().getLong(0)
      assert(m == adj.map(_.length.toLong).sum)
      // full scan features work from SQL: pruned degree-only read above,
      // adjacency explode here
      val edges = spark.sql(
        s"SELECT id, explode(successors) AS dst FROM graft.`$base`").count()
      assert(edges == m)
      // a basename with no graph files is a missing table, not a crash
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT * FROM graft.`/nonexistent/graph`").collect()
      }
      assert(e.getMessage.toLowerCase.contains("table"))
    } finally spark.conf.unset("spark.sql.catalog.graft")
  }

  test("BvCatalog allowlist fences paths: inside resolves, outside never probes") {
    val (base, adj) = fixture(120, 37L)
    val parent = new java.io.File(base).getParent
    // a second real graph OUTSIDE the allowlist — proves the fence is the
    // allowlist, not file existence
    val (outsideBase, _) = fixture(80, 41L)
    val outsideParent = new java.io.File(outsideBase).getParent
    assert(parent != outsideParent, "fixtures must land in distinct dirs")
    spark.conf.set("spark.sql.catalog.graftfenced", "graft.sources.BvCatalog")
    spark.conf.set("spark.sql.catalog.graftfenced.allowlist",
      s"$parent,/some/other/prefix")
    try {
      val m = spark.sql(s"SELECT sum(outdegree) AS m FROM graftfenced.`$base`")
        .head().getLong(0)
      assert(m == adj.map(_.length.toLong).sum)
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM graftfenced.`$outsideBase`").collect()
      }
      assert(e.getMessage.contains("allowlist"),
        s"expected an allowlist rejection, got: ${e.getMessage}")
      // segment-safe prefixes: a sibling dir sharing the prefix STRING is
      // still fenced ("/a/b" must not admit "/a/bevil/...")
      val cat = new BvCatalog
      cat.initialize("t", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("allowlist", "/data/graphs")))
      assert(!cat.tableExists(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty[String], "/data/graphs-private/g")))
      assert(!cat.tableExists(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty[String], "/data/graphsx")))
    } finally {
      spark.conf.unset("spark.sql.catalog.graftfenced.allowlist")
      spark.conf.unset("spark.sql.catalog.graftfenced")
    }
  }

  test("optimizer injects a runtime filter into the bv scan under a selective join") {
    val (base, adj) = fixture(400, 23L)
    // independent selective dim: a tiny id table with a pushable filter
    import spark.implicits._
    val dimPath = java.nio.file.Files.createTempDirectory("bvdim").toString
    (0 until 400).map(i => (i, i % 7)).toDF("jid", "tag")
      .write.mode("overwrite").parquet(dimPath)
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    try {
      val g = spark.read.format("bvgraph")
        .option("basename", base).option("splits", 8).load()
      val dim = spark.read.parquet(dimPath).filter(col("tag") === 3)
      val j = g.join(dim, g("id") === dim("jid"))
        .agg(sum(size(col("successors"))).as("arcs"))
      val expected = adj.zipWithIndex
        .collect { case (s, i) if i % 7 == 3 => s.length.toLong }.sum
      assert(j.head().getLong(0) == expected)
      val p = j.queryExecution.executedPlan.toString
      // the plan carries the dynamic pruning expression on our v2 scan —
      // filter() then receives the dim's ids at runtime
      assert(p.contains("dynamicpruning") || p.contains("RuntimeFilters"),
        s"no runtime filter reached the bv scan:\n$p")
    } finally {
      spark.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }

  test("limit pushdown plans a single-prefix scan") {
    val (base, adj) = fixture(400, 11L)
    val df = spark.read.format("bvgraph")
      .option("basename", base).option("splits", 6).load()
      .limit(25)
    // the first 25 node rows in id order — deterministic because the
    // pushed limit truncates planning to the [0, 25) prefix
    val got = df.collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toArray).toMap
    assert(got.keySet == (0 until 25).toSet)
    (0 until 25).foreach(x => assert(got(x).sameElements(adj(x)), s"node $x"))
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.description().contains("PushedLimit: 25"),
      scans.head.scan.description())
    // the 6-way split request collapses: 25 nodes plan as one partition
    assert(scans.head.inputRDD.getNumPartitions == 1)
  }
}
