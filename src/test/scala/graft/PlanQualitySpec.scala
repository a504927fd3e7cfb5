package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates (the 100 TB checklist from the builder
  * brief): filters and projections must reach the parquet scan, small
  * dimensions must broadcast, aggregates must partial-aggregate before the
  * shuffle, global top-k must compile to TakeOrderedAndProject (not a
  * global sort), and the hot path must stay inside WholeStageCodegen.
  * Plan regressions — e.g. a filter that stops pushing down — fail here
  * long before they would show up as a benchmark regression.
  */
class PlanQualitySpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkSessionFixture._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.executedPlan.toString
  }

  private def executed(df: DataFrame): String = {
    df.collect() // drives THIS df's AdaptiveSparkPlanExec to its final plan
    df.queryExecution.executedPlan.toString
  }

  test("proj_filter: predicate and projection pushed into the parquet scan") {
    val p = planOf("proj_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter not pushed:\n$p")
    // column pruning: the scan reads only the 4 needed of 16 lineitem cols
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:bigint," +
      "l_quantity:double,l_extendedprice:double,l_discount:double>")
      || p.contains("l_extendedprice") && !p.contains("l_comment"),
      s"columns not pruned:\n$p")
  }

  test("join_bhj: dimension side broadcasts (no shuffle of the fact table for the join)") {
    val p = planOf("join_bhj")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("join_smj: fact-fact join shuffles on the key (sort-merge or shuffled-hash)") {
    // at sf0.001 AQE correctly demotes this to broadcast; disable the
    // thresholds to observe the shape this plan takes at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val p = executed(SparkEntry.queries("join_smj")(spark, sf0001))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected shuffle join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q1_agg: partial aggregation runs before the exchange, inside codegen") {
    val df = SparkEntry.queries("q1_agg")(spark, sf0001)
    val p = executed(df) // AQE final plan exposes codegen spans
    assert(p.contains("partial_sum"), s"no map-side partial aggregation:\n$p")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx > 0, "no hash exchange found")
    assert(p.indexOf("partial_sum", exchangeIdx) > 0,
      s"partial agg did not run before the shuffle:\n$p")
    val spans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"agg fell out of codegen:\n$p")
  }

  test("top_revenue: global top-k is TakeOrderedAndProject, never a global sort") {
    val p = planOf("top_revenue")
    assert(p.contains("TakeOrderedAndProject"), s"top-k compiled to a sort:\n$p")
  }

  test("sim_topk: probe side is broadcast; corpus is scanned once") {
    val p = planOf("sim_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"probe vectors not broadcast:\n$p")
  }

  test("dedup_exact groups on the fixed-width digest, not the raw text") {
    val p = planOf("dedup_exact")
    assert(p.contains("md5"), s"expected md5 digest grouping:\n$p")
    val ex = p.linesIterator.find(_.contains("Exchange hashpartitioning"))
    // the digest is aliased to _groupingexpression before the exchange;
    // the raw text column must not be a shuffle key
    assert(ex.isDefined && !ex.get.contains("text#"),
      s"raw text crossed the shuffle as a key:\n$p")
  }

  test("bucketed tables join with zero shuffle (the co-location strategy at scale)") {
    import org.apache.spark.sql.functions.col
    // bucket both fact tables on the join key — at 100 TB this is done once
    // at ingest and every subsequent key-join skips its exchange entirely
    Tables.orders(spark, sf0001).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    Tables.lineitem(spark, sf0001).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_bkt")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").count()
      val p = executed(j)
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(p.contains("Bucketed: true"), s"scans not bucketed:\n$p")
      // the only exchange allowed is the groupBy's (on o_orderpriority);
      // the join keys must never be shuffled — that is what bucketing buys
      assert(!p.contains("Exchange hashpartitioning(o_orderkey")
        && !p.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffled its inputs:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("dedup_embed: block-partitioned equi-join — no nested-loop/cartesian all-pairs") {
    // the exact pair query is inherently Θ(n²) compute at its low
    // threshold, but the PLAN must distribute it: hash equi-joins on
    // block-pair keys (bounded task memory), never a BroadcastNestedLoop
    // join that ships the whole table to every executor
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val p = executed(SparkEntry.queries("dedup_embed")(spark, sf0001))
      assert(!p.contains("CartesianProduct"), s"cartesian all-pairs:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ all-pairs:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("dedup_embed_lsh: banded candidate join, no all-pairs operator") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val p = executed(SparkEntry.queries("dedup_embed_lsh")(spark, sf0001))
      assert(!p.contains("CartesianProduct"), s"cartesian all-pairs:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ all-pairs:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("join_skew_salted: the shuffle keys include the salt (hot key spreads over reducers)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val p = executed(SparkEntry.queries("join_skew_salted")(spark, sf0001))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected shuffle join:\n$p")
      val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
        .mkString("\n")
      assert(ex.contains("salt"), s"salt not a shuffle key:\n$ex")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("contamination: probe shingle set broadcasts; corpus shingles never shuffle for the join") {
    val p = planOf("contamination")
    assert(p.contains("BroadcastHashJoin"), s"probe set not broadcast:\n$p")
  }

  test("join_range_bucketed: pure range join runs as a bucket equi-join, never a BNLJ") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val p = executed(SparkEntry.queries("join_range_bucketed")(spark, sf0001))
      assert(!p.contains("CartesianProduct"), s"cartesian range join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ range join:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected bucket equi-join:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("graph_triangles: edge-iterator plan — no wedge-explosion join output") {
    val p = executed(SparkEntry.queries("graph_triangles")(spark, sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs shape in triangle count:\n$p")
    // the closing test is an array intersection INSIDE the row (the
    // optimizer rewrites it to the native intersect_count), not a join
    // against a wedge relation
    assert(p.contains("intersect_count") || p.contains("array_intersect"),
      s"expected in-row intersect closing:\n$p")
  }

  test("graph_squares: wedge counts partial-aggregate before the exchange, no all-pairs shape") {
    val p = executed(SparkEntry.queries("graph_squares")(spark, sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs shape in square count:\n$p")
    // the (v, w) wedge-pair counts must collapse map-side before they
    // cross the wire — without partial_count the exchange carries one row
    // per 2-path instead of one per distinct endpoint pair
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
  }

  test("dedup_passages: chunks shuffle as 64-bit hashes, never raw text") {
    val p = executed(SparkEntry.queries("dedup_passages")(spark, sf0001))
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .mkString("\n")
    assert(ex.nonEmpty, s"no exchange found:\n$p")
    assert(!ex.contains("text#") && !ex.contains("chunk_str"),
      s"raw text crossed an exchange:\n$ex")
  }

  test("graph_kcore: iterative peel keeps the logical plan FLAT (no exponential growth)") {
    // The round-3/4 trap: persist()+count() per peel round cuts execution
    // lineage but the LOGICAL plan still embeds the previous round twice
    // (two join arms), doubling per round — exponential Catalyst analysis
    // that no correctness test sees (it only detonates at bench/driver SF:
    // 121 s median at sf0.1, >1000 s in round 3). The fixed shape
    // (localCheckpoint per round) truncates each round to a LogicalRDD
    // leaf, so the FINAL query's plan is a handful of nodes regardless of
    // round count. Guard both the node count and the wall-clock to
    // optimize — either explodes under the old shape (measured: >3000
    // nodes, ~60 s single-threaded planning at 6 rounds).
    val df = SparkEntry.queries("graph_kcore")(spark, sf0001)
    val analyzedNodes = df.queryExecution.analyzed.collect { case p => p }.size
    assert(analyzedNodes < 150,
      s"kcore logical plan has $analyzedNodes nodes — iterative lineage is " +
        "leaking into the final plan (checkpoint each round, don't persist)")
    val t0 = System.nanoTime()
    df.queryExecution.optimizedPlan // force analysis + optimization
    val planSec = (System.nanoTime() - t0) / 1e9
    assert(planSec < 5.0,
      f"kcore planning took $planSec%.1f s at sf0.001 — exponential plan " +
        "growth is back")
  }

  test("graph_pagerank: per-iteration checkpoints keep the plan flat at high N") {
    // kcore's hygiene applied to the pagerank loop shape: the shipped query
    // runs 3 iterations (safe either way), but the PATTERN must survive a
    // convergence-style iteration count. At N=10 the uncheckpointed loop
    // re-embeds the pinned e/nodes/outdeg trees every iteration — plan
    // growth the analyzer re-canonicalizes on every round — while the
    // checkpointed loop truncates each iteration to a LogicalRDD leaf, so
    // the final plan is the same handful of nodes at ANY N.
    Caches.hardSweep(spark)
    val checked = graft.queries.GraphAlgos
      .pageRank(spark, sf0001, iters = 10, checkpointEachIter = true)
    val checkedNodes = checked.queryExecution.analyzed.collect { case p => p }.size
    val checkedRows = checked.collect()
    Caches.hardSweep(spark)
    val unchecked = graft.queries.GraphAlgos
      .pageRank(spark, sf0001, iters = 10, checkpointEachIter = false)
    val uncheckedNodes = unchecked.queryExecution.analyzed.collect { case p => p }.size
    assert(checkedNodes < 80,
      s"checkpointed pagerank plan has $checkedNodes nodes at N=10 — " +
        "iteration lineage is leaking into the final plan")
    assert(uncheckedNodes > 2 * checkedNodes,
      s"uncheckpointed plan ($uncheckedNodes nodes) no longer dwarfs the " +
        s"checkpointed one ($checkedNodes) — this gate's premise changed; re-audit")
    // the checkpoint is a pure lineage cut: results must be bit-identical
    assert(java.util.Arrays.equals(
      checkedRows.map(_.toString).asInstanceOf[Array[AnyRef]],
      unchecked.collect().map(_.toString).asInstanceOf[Array[AnyRef]]),
      "checkpointed and uncheckpointed pagerank disagree at N=10")
    Caches.hardSweep(spark)
  }

  test("graph_ppr: per-iteration checkpoints keep the plan flat; integer sums partial-aggregate") {
    val df = SparkEntry.queries("graph_ppr")(spark, sf0001)
    val analyzedNodes = df.queryExecution.analyzed.collect { case p => p }.size
    assert(analyzedNodes < 80,
      s"graph_ppr plan has $analyzedNodes nodes — iteration lineage is leaking")
    val p = executed(df)
    // like bv_pagerank: after the iterations the rank frame must be a
    // checkpointed leaf — the integer-sum aggregates live in the per-round
    // checkpoint jobs, not in this final sort+project
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      s"the iterated rank frame must be a checkpointed leaf:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the final projection must not reshuffle the checkpointed ranks:\n$p")
    Caches.hardSweep(spark)
  }

  test("iterative loops: every declared graph query plans in bounded time") {
    // cheap canary for the whole iterative family: building the query and
    // reaching the optimized plan must be seconds, not minutes, at the
    // smallest SF. (Execution cost is Bench's job; PLANNING cost is this
    // test's.)
    Seq("graph_pagerank", "graph_bfs", "graph_cc", "graph_scc",
        "graph_msf", "graph_ppr", "graph_topo_layers").foreach { name =>
      Caches.hardSweep(spark)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.queryExecution.optimizedPlan
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec < 30.0, f"$name took $sec%.1f s to build+plan at sf0.001")
    }
  }

  test("dynamic partition pruning fires on a star-schema partitioned join") {
    import org.apache.spark.sql.functions._
    // the 100 TB layout: the fact table lives partitioned on the join key;
    // a selective dim filter must prune fact PARTITIONS at runtime (DPP),
    // not scan them all. Gate the plan feature, not just the result. The
    // dim must be an independent selective relation — DPP's benefit
    // estimator rejects a "dim" carved out of the fact's own full scan.
    Tables.customer(spark, sf0001)
      .write.partitionBy("c_nationkey").mode("overwrite")
      .saveAsTable("cust_part")
    try {
      val dim = Tables.nation(spark, sf0001)
        .filter(col("n_regionkey") === 1).select("n_nationkey", "n_name")
      val j = spark.table("cust_part")
        .join(dim, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"),
          sum(floor(col("c_acctbal") * 100)).as("bal_c"))
      val p = executed(j)
      assert(p.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS cust_part")
  }

  test("bv_id_slice: the id-range filter reaches the bvgraph scan") {
    val p = planOf("bv_id_slice")
    assert(p.contains("id in [100,600)"), s"id range not pushed:\n$p")
  }

  test("bv_limit: LIMIT k reaches the bvgraph scan as a prefix plan") {
    val p = planOf("bv_limit")
    assert(p.contains("PushedLimit: 500"), s"limit not pushed:\n$p")
  }

  test("bv_big: long-id scan surfaces BIGINT ids straight from the source") {
    val df = SparkEntry.queries("bv_big")(spark, sf0001)
    assert(df.schema("src").dataType ==
      org.apache.spark.sql.types.LongType)
    val p = executed(df)
    // no widening casts: the source emits LONG natively (a CAST above the
    // scan would mean the schema lied and every row pays a conversion)
    assert(!p.toLowerCase.contains("cast(id"), s"unexpected id cast:\n$p")
  }

  test("bv scan reports stats so Catalyst can plan broadcasts against it") {
    val base = graft.queries.GraphQueries.bvFixture(spark, sf0001)
    val df = spark.read.format("bvgraph").option("basename", base).load()
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.isDefined && stats.rowCount.get.toLong > 0)
  }

  test("text_collocations: global top-k compiles to TakeOrderedAndProject") {
    val df = SparkEntry.queries("text_collocations")(spark, sf0001)
    val p = executed(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be per-partition heaps + driver merge, not a sort:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"vocabulary joins must broadcast, not shuffle the bigram side:\n$p")
  }

  test("quality_novelty: bigram exchanges carry hashed longs, not strings") {
    val df = SparkEntry.queries("quality_novelty")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("xxhash64"),
      s"bigram keys must be 64-bit hashes before any exchange:\n$p")
    // the bigram STRING must never be a shuffle key: every
    // hashpartitioning over the bigram side uses the hashed column
    assert(!"hashpartitioning\\([^)]*concat\\(".r.findFirstIn(p).isDefined,
      s"raw bigram strings used as a shuffle key:\n$p")
  }

  test("mix_rebalance: per-source rates broadcast back onto the scan") {
    val df = SparkEntry.queries("mix_rebalance")(spark, sf0001)
    val p = executed(df)
    assert(p.contains("BroadcastHashJoin"),
      s"rate relation must broadcast onto the corpus pass:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the rate join:\n$p")
  }

  test("mix_temperature: exact isqrt thresholds broadcast; corpus scanned once") {
    val df = SparkEntry.queries("mix_temperature")(spark, sf0001)
    val p = executed(df)
    assert(p.contains("BroadcastHashJoin"),
      s"rate relation must broadcast onto the corpus pass:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the rate join:\n$p")
    // the isqrt correction must stay a scalar expression chain — no UDF
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"isqrt must be built-in expressions, not a UDF:\n$p")
  }

  test("graph_hyperball: checkpointed rounds keep the plan flat; sketch merge partial-aggregates") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("graph_hyperball")(spark, sf0001)
    val analyzedNodes = df.queryExecution.analyzed.collect { case p => p }.size
    assert(analyzedNodes < 80,
      s"hyperball plan has $analyzedNodes nodes — round lineage is leaking")
    // the final query's plan is (by design) just the checkpoint leaf; the
    // scale property lives in the ROUND plan, so gate that directly: the
    // KmvUnion udaf must merge map-side (bounded k-long state per node
    // BEFORE the exchange) — that partial merge is the whole scale point
    val kmv = udaf(new graft.functions.SketchAggs.KmvUnion(16))
    val e = graft.queries.GraphAlgos.coPurchaseEdges(spark, sf0001)
    val sym = e.select(col("u").as("x"), col("v").as("y"))
      .unionByName(e.select(col("v").as("x"), col("u").as("y")))
    val st = sym.select(col("x")).distinct()
      .select(col("x"), array((col("x") * lit(2654435761L)) % lit(1000000007L) + lit(1L)).as("sk"))
    val round = sym.join(st.withColumnRenamed("x", "y"), "y")
      .select(col("x"), col("sk"))
      .unionByName(st)
      .groupBy(col("x")).agg(kmv(col("sk")).as("sk"))
    val p = executed(round)
    val partialLine = p.linesIterator.find(l =>
      l.contains("Aggregate") && l.contains("partial_"))
    assert(partialLine.isDefined,
      s"sketch merge is not partial-aggregated before the exchange:\n$p")
  }

  test("graph_harmonic / graph_nf: sketch generations stay checkpoint leaves; nf reduces map-side") {
    // both reuse graph_hyperball's KMV round (partial-merge gated above);
    // what's new to gate: the two-generation join must sit on checkpoint
    // leaves (no re-derivation of round 1 inside round 2's lineage), and
    // graph_nf's global sums must combine map-side so only 1-row partials
    // reach the single-partition exchange
    val h = SparkEntry.queries("graph_harmonic")(spark, sf0001)
    val hNodes = h.queryExecution.analyzed.collect { case p => p }.size
    assert(hNodes < 80,
      s"graph_harmonic plan has $hNodes nodes — sketch lineage is leaking")
    val nf = SparkEntry.queries("graph_nf")(spark, sf0001)
    val p = executed(nf)
    assert(p.linesIterator.exists(l =>
        l.contains("Aggregate") && l.contains("partial_")),
      s"graph_nf's global sums are not partial-aggregated:\n$p")
    assert(p.contains("SinglePartition"),
      s"graph_nf must reduce to one metadata-sized row:\n$p")
    Caches.hardSweep(spark)
  }

  test("quality_surprisal: unigram join broadcasts; raw text never crosses an exchange") {
    val df = SparkEntry.queries("quality_surprisal")(spark, sf0001)
    val p = executed(df)
    assert(p.contains("BroadcastHashJoin"),
      s"the Zipf-small unigram table should broadcast under AQE:\n$p")
    val ex = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!ex.exists(_.contains("text#")),
      s"raw text crossed an exchange:\n${ex.mkString("\n")}")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
    Caches.hardSweep(spark)
  }

  test("multimodal_dedup: payloads never shuffle; candidates come from an equi-join") {
    val df = SparkEntry.queries("multimodal_dedup")(spark, sf0001)
    val p = executed(df)
    val ex = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!ex.exists(l => l.contains("payload#") || l.contains("text#")),
      s"media bytes crossed an exchange:\n${ex.mkString("\n")}")
    assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
      s"banded candidate join degenerated to an all-pairs product:\n$p")
    Caches.hardSweep(spark)
  }

  test("search_two_stage: shortlist is TakeOrdered and broadcasts into the rerank; vectors never shuffle") {
    val df = SparkEntry.queries("search_two_stage")(spark, sf0001)
    val p = executed(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"the bm25 shortlist must be TakeOrderedAndProject, not a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 20-row shortlist must broadcast into the embeddings scan:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"neither corpus may shuffle — only 1-row stats and the 20-row shortlist move:\n$p")
    Caches.hardSweep(spark)
  }

  test("profile_drift: histogram counts combine map-side; only sketch-sized keys shuffle") {
    val df = SparkEntry.queries("profile_drift")(spark, sf0001)
    val p = executed(df)
    assert(p.contains("partial_count"),
      s"the (source, bucket) histogram must partial-aggregate:\n$p")
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!ex.exists(l => l.contains("text#") || l.contains("doc_id#")),
      s"document-sized data crossed an exchange — drift must reduce to the sketch first:\n${ex.mkString("\n")}")
    Caches.hardSweep(spark)
  }

  test("events_outliers_mad: rank windows are bucket-partitioned, never one task per type") {
    val df = SparkEntry.queries("events_outliers_mad")(spark, sf0001)
    val p = executed(df)
    assert("""event_type#\d+, bkt#\d+L?\]""".r.findFirstIn(p).isDefined,
      s"the order-statistics window lost its (type, bucket) partitioning:\n$p")
    assert(p.contains("partial_count"),
      s"bucket counts must combine map-side:\n$p")
    Caches.hardSweep(spark)
  }

  test("dedup_cdc: text never shuffles — only chunk keys cross the exchanges") {
    val df = SparkEntry.queries("dedup_cdc")(spark, sf0001)
    val p = executed(df)
    val ex = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!ex.exists(l => l.contains("text#") || l.contains("nt#")),
      s"document text crossed an exchange — chunking must stay in the scan stage:\n${ex.mkString("\n")}")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    Caches.hardSweep(spark)
  }

  test("distinct_kmv_pairs: sketches reduce map-side; the pair algebra runs on 64-long state") {
    val df = SparkEntry.queries("distinct_kmv_pairs")(spark, sf0001)
    val p = executed(df)
    assert(p.contains("partial_"),
      s"the per-type KMV union must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the sketch pair join:\n$p")
    // the raw (user, day) keys may cross ONLY for the exact calibration
    // baseline — the estimates themselves must come from the sketch rows
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the array-state sketch aggregate:\n$p")
    Caches.hardSweep(spark)
  }

  test("host_graph: contraction happens before the one host-pair exchange") {
    val df = SparkEntry.queries("host_graph")(spark, sf0001)
    val p = executed(df)
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.exists(_.contains("src_host")),
      s"expected the aggregate exchange on the contracted host keys:\n$p")
    // page-level ids must never be a shuffle key — the contraction must
    // fold into the scan stage so the exchange carries host pairs only
    assert(!ex.exists(l => l.contains("id#") || l.contains("dd#")),
      s"page-level ids crossed an exchange:\n${ex.mkString("\n")}")
    assert(p.contains("partial_count"), s"no map-side weight combine:\n$p")
  }

  test("funnel_steps: conditional mins partial-aggregate; no self-joins") {
    val df = SparkEntry.queries("funnel_steps")(spark, sf0001)
    val p = executed(df)
    assert(!p.contains("Join"),
      s"funnel must be one conditional-min pass, not per-stage joins:\n$p")
    assert(p.contains("partial_min"), s"stage mins not partial-aggregated:\n$p")
  }

  test("q21: EXISTS/NOT-EXISTS compile to semi/anti joins with a top-k, never row explosion") {
    val p = executed(SparkEntry.queries("q21_blame_supplier")(spark, sf0001))
    assert(p.contains("LeftSemi"), s"EXISTS did not compile to a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not compile to an anti join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 compiled to a sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in q21:\n$p")
  }

  test("q22: the recency filter reaches the orders scan; only the 1-row threshold broadcasts") {
    val p = executed(SparkEntry.queries("q22_idle_customers")(spark, sf0001))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"date filter not pushed into the orders scan:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not compile to an anti join:\n$p")
  }

  test("layout_partitioned_prune: only the 3 matching partitions are ever opened") {
    val df = SparkEntry.queries("layout_partitioned_prune")(spark, sf0001)
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in the plan")
    // 150 (event_type, day) partitions exist; the predicate selects exactly
    // purchase x {10,11,12 Jan} — directory-listing pruning, no file I/O
    // for the other 147
    val parts = scans.map(_.selectedPartitions.partitionCount).sum
    assert(parts == 3, s"expected 3 pruned partitions, scanned $parts")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), s"no partition filters in scan:\n$p")
  }

  test("pipeline_publish: the published shard prunes to ONE lang partition, one file") {
    val df = SparkEntry.queries("pipeline_publish")(spark, sf0001)
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in the plan")
    // 5 langs published; the lang='en' read-back must open exactly one
    // partition directory, and the pre-repartition(col("lang")) write
    // must have compacted it to a single parquet file
    val sel = scans.map(_.selectedPartitions).head
    assert(scans.map(_.selectedPartitions.partitionCount).sum == 1,
      s"expected 1 pruned partition")
    assert(sel.totalNumberOfFiles == 1,
      s"expected 1 compacted file, got ${sel.totalNumberOfFiles}")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), s"no partition filters in scan:\n$p")
  }

  test("join_dpp: the fact scan carries a dynamic pruning subquery and opens 90/150 partitions") {
    val df = SparkEntry.queries("join_dpp")(spark, sf0001)
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("graft_part_")) => f
    }
    assert(scans.nonEmpty, "no partitioned fact scan in the plan")
    assert(scans.exists(_.partitionFilters.exists(
      _.toString.contains("dynamicpruning"))),
      s"no dynamic pruning subquery on the fact scan:\n" +
        scans.map(_.partitionFilters.mkString(", ")).mkString("\n"))
    // 3 of 5 event types survive the dim filter x 30 days = 90 of the 150
    // directories; the other 60 are never listed into the scan
    val parts = scans.map(_.selectedPartitions.partitionCount).sum
    assert(parts == 90, s"expected 90 dynamically pruned partitions, scanned $parts")
  }

  test("bv_enrich_join: degree-only BV scan (successors never decoded) + broadcast dim") {
    val df = SparkEntry.queries("bv_enrich_join")(spark, sf0001)
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "no DSv2 scan in the plan")
    assert(scans.exists(_.scan.readSchema().fieldNames.toSeq == Seq("id", "outdegree")),
      s"scan must prune to the outdegree fast path: " +
        scans.map(_.scan.readSchema().fieldNames.mkString(",")).mkString(" | "))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"customer dim must broadcast:\n$p")
  }

  test("resample_ohlc: one partial-aggregated pass, no window exchange per row") {
    val p = executed(SparkEntry.queries("resample_ohlc")(spark, sf0001))
    assert(p.contains("partial_min_by") || p.contains("min_by"),
      s"no map-side min_by partials:\n$p")
    assert(!p.contains("Window"), s"OHLC must not be a window query:\n$p")
  }

  test("join_interval_overlap: bucketized equi-join, never a theta cross product") {
    val p = executed(SparkEntry.queries("join_interval_overlap")(spark, sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a cross product:\n$p")
    // the overlap predicate must ride an equi-join on (user_id, bkt)
    assert(p.contains("bkt"), s"no bucket key in the join:\n$p")
  }

  test("cdc_upsert: map-side max_by partials, one full-outer merge, no explosion join") {
    val p = executed(SparkEntry.queries("cdc_upsert")(spark, sf0001))
    assert(p.contains("partial_max_by") || p.contains("partial_maxby") ||
      p.contains("max_by"), s"no partial-aggregated latest-per-key:\n$p")
    assert(p.contains("FullOuter"), s"merge must be a full-outer join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"explosion join in the upsert:\n$p")
  }

  test("cdc_merge_delete: tombstone merge keeps cdc_upsert's shape — partials, one full-outer, post-merge delete filter") {
    val p = executed(SparkEntry.queries("cdc_merge_delete")(spark, sf0001))
    assert(p.contains("partial_max_by") || p.contains("partial_maxby") ||
      p.contains("max_by"), s"no partial-aggregated latest-per-key:\n$p")
    assert(p.contains("FullOuter"), s"merge must be a full-outer join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"explosion join in the merge:\n$p")
    // the tombstone drop is a filter on the merge's winner struct — it
    // must NOT become a second join or aggregate pass
    assert("HashAggregate".r.findAllIn(p).size <= 4,
      s"tombstone handling added an extra aggregate pass:\n$p")
  }

  test("graph_diameter_sweep: both sweeps end checkpointed; planning stays bounded") {
    Caches.hardSweep(spark)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries("graph_diameter_sweep")(spark, sf0001)
    df.queryExecution.optimizedPlan
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, f"graph_diameter_sweep took $sec%.1f s to build+plan at sf0.001")
    val analyzedNodes = df.queryExecution.analyzed.collect { case p => p }.size
    assert(analyzedNodes < 80,
      s"graph_diameter_sweep plan has $analyzedNodes nodes — sweep lineage is leaking")
    val p = executed(df)
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      s"the second sweep must aggregate a checkpointed leaf:\n$p")
    Caches.hardSweep(spark)
  }

  test("orc_roundtrip: the predicate is pushed into the ORC scan") {
    val df = SparkEntry.queries("orc_roundtrip")(spark, sf0001)
    val pushed = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("EqualTo(event_type,purchase)") &&
      pushed.contains("GreaterThan(value,50.0)"),
      s"predicate not pushed into the ORC scan: $pushed")
  }

  test("graph_reciprocity: semi-join probe, no cartesian, one tagged-union aggregate") {
    val p = executed(SparkEntry.queries("graph_reciprocity")(spark, sf0001))
    assert(p.contains("LeftSemi"), s"reciprocal test must be a semi join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"row-explosion join in reciprocity:\n$p")
  }

  test("graph_clustering_coeff: edge-iterator intersection, never a wedge join") {
    val p = executed(SparkEntry.queries("graph_clustering_coeff")(spark, sf0001))
    assert(p.contains("intersect_count") || p.contains("array_intersect"),
      s"triangle closure must be an in-row intersection:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedge-join explosion in clustering coeff:\n$p")
  }

  test("join_bucketed_colocated: bucketed scans join with no key exchange") {
    val df = SparkEntry.queries("join_bucketed_colocated")(spark, sf0001)
    val p = executed(df)
    assert(p.contains("SortMergeJoin"),
      s"bucketed join must stay a sort-merge join:\n$p")
    assert(!p.contains("hashpartitioning(o_orderkey") &&
      !p.contains("hashpartitioning(l_orderkey"),
      s"join key was reshuffled despite bucketing:\n$p")
  }

  test("q6: scan-dominant agg — date and quantity predicates reach the parquet scan") {
    val df = SparkEntry.queries("q6_forecast_revenue")(spark, sf0001)
    val p = executed(df)
    // plan toString truncates long PushedFilters lists — read the scan
    // node's untruncated metadata instead
    val pushed = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThan(l_shipdate"),
      s"shipdate range not pushed into the scan: $pushed")
    assert(pushed.contains("LessThan(l_quantity,24.0)"),
      s"quantity filter not pushed: $pushed")
    assert(!p.contains("Exchange hashpartitioning"),
      s"a 1-row global agg needs no hash exchange:\n$p")
  }

  test("q4: EXISTS compiles to a left-semi join; the quarter filter reaches the orders scan") {
    val p = executed(SparkEntry.queries("q4_order_priority")(spark, sf0001))
    assert(p.contains("LeftSemi"), s"EXISTS did not compile to a semi join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"quarter filter not pushed into the orders scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in q4:\n$p")
  }

  test("q15/q17: scalar-max and per-group thresholds come back as broadcasts, not driver collects") {
    val p15 = executed(SparkEntry.queries("q15_top_supplier")(spark, sf0001))
    assert(p15.contains("BroadcastHashJoin"),
      s"the 1-row max must broadcast back onto the revenue table:\n$p15")
    assert(!p15.contains("CartesianProduct") &&
      !p15.contains("BroadcastNestedLoopJoin"), s"non-equi fallback in q15:\n$p15")
    val p17 = executed(SparkEntry.queries("q17_small_quantity")(spark, sf0001))
    assert(p17.contains("BroadcastHashJoin"),
      s"the per-part aggregate must broadcast onto the fact scan:\n$p17")
    assert(p17.contains("partial_sum"), s"no map-side partial agg in q17:\n$p17")
  }

  test("q18: the HAVING aggregate partial-aggregates and the top-100 is TakeOrderedAndProject") {
    val p = executed(SparkEntry.queries("q18_large_orders")(spark, sf0001))
    assert(p.contains("partial_sum"), s"no map-side partial agg in q18:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 compiled to a sort:\n$p")
  }

  test("quantile_hist: bounds broadcast; histogram partial-aggregates map-side") {
    val p = executed(SparkEntry.queries("quantile_hist")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row bounds must broadcast, never collect:\n$p")
    assert(p.contains("partial_count"),
      s"bin counts must partial-aggregate before the shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in quantile_hist:\n$p")
  }

  test("resample_gapfill: the day grid is generated, not joined from the corpus") {
    val p = executed(SparkEntry.queries("resample_gapfill")(spark, sf0001))
    assert(p.contains("Generate explode"),
      s"the grid must come from sequence+explode over the span relation:\n$p")
    assert(p.contains("partial_count"),
      s"daily counts must partial-aggregate map-side:\n$p")
  }

  test("pipeline_curate_pack: dedup shuffles on the digest; packing windows partition by bucket") {
    val p = executed(SparkEntry.queries("pipeline_curate_pack")(spark, sf0001))
    assert(p.contains("hashpartitioning(text_md5"),
      s"dedup stage must shuffle on the 32 B md5, not raw text:\n$p")
    // the per-doc prefix window must be bucket-partitioned — a global
    // Window.orderBy would drag the whole corpus into one task; the only
    // single-partition window allowed is over the metadata-sized bucket
    // totals. WindowExec prints "..., [partitionSpec], [orderSpec]".
    assert("""\], \[bkt#\d+L\], \[doc_id#""".r.findFirstIn(p).isDefined,
      s"the within-bucket window lost its partitioning:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the pipeline:\n$p")
  }

  test("vocab_encode: top-K vocab is TakeOrdered and broadcasts into the encode join") {
    val p = executed(SparkEntry.queries("vocab_encode")(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"),
      s"the vocabulary top-K must be TakeOrderedAndProject, not a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the K-row vocab must broadcast into the encode join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in vocab_encode:\n$p")
  }

  test("bm25_search: no token explode, 1-row stats broadcast, top-20 is TakeOrdered") {
    val p = executed(SparkEntry.queries("bm25_search")(spark, sf0001))
    // tf comes from per-row array filters — the token stream must never
    // explode into rows (that is the whole point of the shape)
    assert(!p.contains("Generate explode"),
      s"bm25 must not explode the token stream:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 must be TakeOrderedAndProject:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the corpus must not shuffle — only the 1-row stats move:\n$p")
  }

  test("sample_negatives: bucket-partitioned index windows; equi-join draw resolution") {
    val p = executed(SparkEntry.queries("sample_negatives")(spark, sf0001))
    assert("""\], \[bkt#\d+L\], \[doc_id#""".r.findFirstIn(p).isDefined,
      s"the dense-index window lost its bucket partitioning:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in sample_negatives (the 1-row n frame must broadcast):\n$p")
  }

  test("bv_pagerank: the final plan is a checkpointed leaf — the BV graph is never rescanned") {
    val df = SparkEntry.queries("bv_pagerank")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // checkpoint hygiene: after 3 iterations the rank frame must be a
    // LogicalRDD leaf (sort + project over it), with every BV decode
    // confined to the pinned/checkpointed upstream jobs — a BatchScan or
    // a hash exchange here would mean the loop re-derives the compressed
    // graph each iteration
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      s"the iterated rank frame must be a checkpointed leaf:\n$p")
    assert(!p.contains("BatchScan"),
      s"final iteration must not rescan the BV source:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"no join/agg exchange may survive past the checkpoint:\n$p")
  }

  test("events_outliers: 1-row-per-type stats broadcast; moments partial-aggregate") {
    val p = executed(SparkEntry.queries("events_outliers")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      s"the per-type stats must broadcast back onto the corpus pass:\n$p")
    assert(p.contains("partial_sum"),
      s"the moments must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in events_outliers:\n$p")
  }

  test("layout_compaction: manifest agg partial-aggregates; windows partition by type") {
    val p = executed(SparkEntry.queries("layout_compaction")(spark, sf0001))
    assert(p.contains("partial_count"),
      s"the manifest row counts must partial-aggregate map-side:\n$p")
    assert("""\], \[event_type#\d+\], \[day#""".r.findFirstIn(p).isDefined,
      s"the within-type window lost its partitioning:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in layout_compaction:\n$p")
  }

  test("retention_cohorts: per-user min partial-aggregates; cohort join never explodes") {
    val p = executed(SparkEntry.queries("retention_cohorts")(spark, sf0001))
    assert(p.contains("partial_min"),
      s"the per-user first-day pass must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cohort join degenerated:\n$p")
  }

  test("scd2_intervals: every window stays user-partitioned — no global sort of the stream") {
    val p = executed(SparkEntry.queries("scd2_intervals")(spark, sf0001))
    assert(p.contains("windowspecdefinition(user_id"),
      s"windows lost the user partitioning:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"a global single-partition exchange crept into the SCD-2 build:\n$p")
  }

  test("knn_graph: the self-join is cell-keyed (hash or broadcast), never a cross product") {
    val p = executed(SparkEntry.queries("knn_graph")(spark, sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"knn self-join degenerated to all-pairs:\n$p")
    assert(p.contains("windowspecdefinition(vec_id"),
      s"top-k window lost its per-vector partitioning:\n$p")
  }

  test("dedup_containment: posting self-join shuffles on the 8 B shingle hash") {
    val p = executed(SparkEntry.queries("dedup_containment")(spark, sf0001))
    assert("""hashpartitioning\(sng#\d+L""".r.findFirstIn(p).isDefined,
      s"posting join must key on the xxhash64 shingle id:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in dedup_containment:\n$p")
  }

  test("bv_check: one narrow decode pass, bucket-keyed partial agg, no joins") {
    val p = executed(SparkEntry.queries("bv_check")(spark, sf0001))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"invariant counts must partial-aggregate map-side:\n$p")
    assert(!p.contains("Join"), s"the fsck pass must not join anything:\n$p")
  }

  test("bv_coding_advisor: gap transform is narrow; costs partial-aggregate on the bucket key") {
    val p = executed(SparkEntry.queries("bv_coding_advisor")(spark, sf0001))
    assert(p.contains("partial_sum"),
      s"bit costs must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"advisor join degenerated:\n$p")
  }

  test("bv_union: the merge dedups on (src,dst) map-side before one hash exchange") {
    // gate the WRITE pipeline's merge frame (the query's read-back side is
    // just a BV scan once the fixture exists)
    val p = executed(graft.queries.GraphQueries.unionEdges(spark, sf0001))
    // the distinct over base ∪ delta must partial-aggregate before its
    // exchange (map-side dedup — at 100 TB the duplicate mass between a
    // snapshot and its delta batch never crosses the wire twice)
    assert("""hashpartitioning\(src#\d+, dst#\d+""".r.findFirstIn(p).isDefined,
      s"union dedup must shuffle on the edge key:\n$p")
    assert(p.contains("HashAggregate"),
      s"dedup must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"bv_union merge must be union+distinct, no join:\n$p")
  }

  test("anon_kanonymity: both class-size tables broadcast back; corpus scanned once") {
    val p = executed(SparkEntry.queries("anon_kanonymity")(spark, sf0001))
    // two QID-cardinality-sized aggregates join back as broadcasts — the
    // document table itself must never be exchanged for the join
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"class-size joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"k-anonymity corpus join degenerated to a shuffle:\n$p")
  }

  test("anon_ldiversity: class tables (with distinct-lang counts) broadcast back; corpus scanned once") {
    val p = executed(SparkEntry.queries("anon_ldiversity")(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"class joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"l-diversity corpus join degenerated to a shuffle:\n$p")
  }

  test("events_transitions: the lead() window stays user-partitioned; transition counts partial-aggregate") {
    val p = executed(SparkEntry.queries("events_transitions")(spark, sf0001))
    assert("""hashpartitioning\(user_id#\d+""".r.findFirstIn(p).isDefined,
      s"the sequence window lost its user partitioning:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    // the only SinglePartition exchange allowed is for the final
    // types×types share window + ordering — never the corpus
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs shape:\n$p")
  }

  test("forecast_naive_seasonal: one count pass to the day grain; windows on the days relation") {
    val p = executed(SparkEntry.queries("forecast_naive_seasonal")(spark, sf0001))
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
    assert("""hashpartitioning\(dow#\d+""".r.findFirstIn(p).isDefined,
      s"seasonal window lost its weekday partitioning:\n$p")
  }

  test("events_cusum: closed-form prefix windows, type-partitioned, one corpus pass") {
    val p = executed(SparkEntry.queries("events_cusum")(spark, sf0001))
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert("""hashpartitioning\(event_type#\d+""".r.findFirstIn(p).isDefined,
      s"cusum windows lost type partitioning:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs shape:\n$p")
  }

  test("graph_modularity: three partial-aggregated corpus passes; the combine is metadata-sized") {
    val p = executed(SparkEntry.queries("graph_modularity")(spark, sf0001))
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs shape:\n$p")
    // the only BNLJ allowed is the 1-row edge-count broadcast (count in
    // the FINAL plan only — AQE repeats nodes in its Initial Plan text)
    val bnlj = "BroadcastNestedLoopJoin".r
      .findAllIn(p.split("== Initial Plan ==")(0)).size
    assert(bnlj <= 1, s"unexpected nested-loop joins ($bnlj):\n$p")
  }

  test("embed_outliers_centroid: label-sum table broadcasts back; top-20 is TakeOrdered") {
    val p = executed(SparkEntry.queries("embed_outliers_centroid")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"centroid join must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus exchanged for the centroid join:\n$p")
  }

  test("basket_rules: item counts broadcast onto supported pairs; top-20 is TakeOrdered") {
    val p = executed(SparkEntry.queries("basket_rules")(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p.split("== Initial Plan ==")(0)).size >= 2,
      s"item-count joins must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs shape:\n$p")
  }

  test("graph_knn_degree: partial-aggregated class sums; output is degree-classes-sized") {
    val p = executed(SparkEntry.queries("graph_knn_degree")(spark, sf0001))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs shape:\n$p")
  }

  test("graph_4cliques: in-row triple intersection, never a wedge join") {
    val p = executed(SparkEntry.queries("graph_4cliques")(spark, sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs shape in K4 count:\n$p")
    assert(p.contains("intersect_count") || p.contains("array_intersect"),
      s"expected in-row intersections:\n$p")
  }

  test("join_asof_nearest: zero-join window composition, user-partitioned") {
    val p = executed(SparkEntry.queries("join_asof_nearest")(spark, sf0001))
    assert(!p.contains("Join"), s"nearest as-of must be join-free:\n$p")
    assert("""hashpartitioning\(user_id#\d+""".r.findFirstIn(p).isDefined,
      s"window lost user partitioning:\n$p")
  }

  test("time_travel_diff: both snapshots from ONE scan + ONE aggregate, no join") {
    val p = executed(SparkEntry.queries("time_travel_diff")(spark, sf0001))
    assert(!p.contains("Join"), s"two-cut diff must not self-join:\n$p")
    // count scans in the FINAL plan only — the AQE string repeats nodes
    // in its "Initial Plan" section
    val fin = p.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(fin).size == 1,
      s"events scanned more than once:\n$p")
  }

  test("events_rate_spikes: one partial-aggregated count pass; lag window on the type-hour relation") {
    val p = executed(SparkEntry.queries("events_rate_spikes")(spark, sf0001))
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert("""hashpartitioning\(event_type#\d+""".r.findFirstIn(p).isDefined,
      s"lag window lost type partitioning:\n$p")
  }

  test("dedup_semantic: pairs come from the banded key join, never an all-pairs product") {
    val p = executed(SparkEntry.queries("dedup_semantic")(spark, sf0001))
    assert(!p.contains("CartesianProduct"),
      s"semantic dedup must never form the all-pairs product:\n$p")
  }

  test("graph_sssp: relaxation rounds end in a checkpointed leaf; planning stays bounded") {
    Caches.hardSweep(spark)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries("graph_sssp")(spark, sf0001)
    df.queryExecution.optimizedPlan
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, f"graph_sssp took $sec%.1f s to build+plan at sf0.001")
    val analyzedNodes = df.queryExecution.analyzed.collect { case p => p }.size
    assert(analyzedNodes < 80,
      s"graph_sssp plan has $analyzedNodes nodes — iteration lineage is leaking")
    val p = executed(df)
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      s"the relaxed distance frame must be a checkpointed leaf:\n$p")
    Caches.hardSweep(spark)
  }

  test("sample_reservoir: the corpus window stays (source, bucket)-partitioned and the candidate set is pruned to the top-k prefix") {
    val df = SparkEntry.queries("sample_reservoir")(spark, sf0001)
    val p = executed(df)
    assert("""hashpartitioning\(grp#\d+, bkt#\d+""".r.findFirstIn(p).isDefined,
      s"the rank window lost its (group, bucket) partitioning:\n$p")
    assert(p.contains("partial_count"),
      s"bucket counts must combine map-side:\n$p")
    // the off < k prune is what keeps the within-bucket window candidate
    // set ~k-sized — without it every document enters the final window
    assert(p.contains("(off") && p.contains("< 64"),
      s"the top-k bucket prune is missing — every doc would enter the rank window:\n$p")
    Caches.hardSweep(spark)
  }

  test("parquet_schema_merge: the merged read sees both vintages with evolved nullability") {
    val df = SparkEntry.queries("parquet_schema_merge")(spark, sf0001)
    // schema evolution proof: the merged scan carries the v2-only column
    assert(df.schema.fieldNames.contains("sum_priced_cents"))
    val p = executed(df)
    assert(p.contains("partial_count"),
      s"the aggregate over the merged scan must map-side combine:\n$p")
    assert(!p.contains("Join"),
      s"the two vintages must merge in one scan, not a join:\n$p")
    Caches.hardSweep(spark)
  }

  test("sim_pq_topk: join-free ADC scan over the native pq_encode projection") {
    val p = executed(SparkEntry.queries("sim_pq_topk")(spark, sf0001))
    assert(p.contains("pq_encode"), s"native PQ encoder missing from the plan:\n$p")
    assert(!p.contains("Join"),
      s"the ADC scan must be a pure projection + window, no join:\n$p")
  }

  test("graph_truss: per-round support is an in-row intersection, never a wedge join") {
    val p = executed(SparkEntry.queries("graph_truss")(spark, sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs shape in the truss peel:\n$p")
    assert(p.contains("array_intersect"),
      s"expected the sorted-array triangle intersection:\n$p")
  }

  test("graph_jaccard_neighbors: numerator is the partial-aggregated triangle support, not arrays shipped per edge") {
    val p = executed(SparkEntry.queries("graph_jaccard_neighbors")(spark, sf0001))
    // the compact-forward support pass partial-aggregates a COUNT on the
    // canonical edge key — the naive formulation (full neighbor arrays
    // joined onto every edge, intersected in-row) had no (u,v)-keyed
    // aggregate at all and shipped sum(deg^2) array cells instead
    assert("""HashAggregate\(keys=\[u#\d+L?(, |, knownfloatingpointnormalized.*)?v#\d+L?\], functions=\[partial_count""".r
      .findFirstIn(p).isDefined ||
      """HashAggregate\(keys=\[u#\d+L?, v#\d+L?\]""".r.findFirstIn(p).isDefined,
      s"(u,v)-keyed support aggregate missing:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must be TakeOrderedAndProject:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs shape in the jaccard plan:\n$p")
  }

  test("graph_betweenness2: sigma comes from one pair-key window, not a join-back") {
    val p = executed(SparkEntry.queries("graph_betweenness2")(spark, sf0001))
    assert("(?s)Window".r.findAllIn(p.split("== Initial Plan ==")(0)).size >= 1,
      s"pair-count window missing:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"wedge relation should not re-shuffle into a sigma join:\n$p")
  }

  test("interval_coalesce: one hash shuffle on user_id, single-sweep islands (no interval-x-interval join)") {
    val p = executed(SparkEntry.queries("interval_coalesce")(spark, sf0001))
    assert(!p.contains("Join"),
      s"the cumulative-max sweep must not join intervals against intervals:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(
      p.split("== Initial Plan ==")(0)).size
    assert(hashExchanges == 1,
      s"expected exactly one user_id hash exchange, got $hashExchanges:\n$p")
  }

  test("graph_louvain: edge-sized equi-joins only; argmax partial-aggregates on the node key") {
    val p = executed(SparkEntry.queries("graph_louvain")(spark, sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs shape in the louvain sweep:\n$p")
    // the argmax partial-agg sits behind the moved-labels localCheckpoint
    // (invisible in the final plan string); gate the visible summary:
    // community sizes must map-side combine before their exchange
    assert(p.contains("partial_count"),
      s"community sizes must map-side combine:\n$p")
    Caches.hardSweep(spark)
  }

  test("multimodal_audio: payloads stay in the scan stage (no hash exchange anywhere)") {
    val p = executed(SparkEntry.queries("multimodal_audio")(spark, sf0001))
    assert(!p.contains("Exchange hashpartitioning"),
      s"audio features must extract before any shuffle:\n$p")
    assert(!p.contains("Join"), s"no join belongs in the feature pass:\n$p")
  }

  test("anon_dp_geometric: one partial-aggregated count; the noise is a post-agg projection") {
    val p = executed(SparkEntry.queries("anon_dp_geometric")(spark, sf0001))
    assert(p.contains("partial_count"),
      s"the protected count must map-side combine:\n$p")
    assert(!p.contains("Join"),
      s"the DP release is a projection over the count, never a join:\n$p")
  }
}
