package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal: drive the BV sink + source well past the bench SF on
  * a synthetic web-ish graph, and print measured throughput as one JSON
  * line. Not part of the driver contract — an auditable, reproducible
  * backing for SCALE.md's claims.
  *
  * Usage: ScaleRehearsal [nodes] [avgDeg] [shards]   (defaults 2M, 5, 32)
  *
  * The graph is deterministic (splitmix-style per-node PRNG), successors
  * clustered near the source id (exercises interval + reference coding
  * like a real web graph) — generated DISTRIBUTED (no driver
  * materialization), written through the sharded DSv2 sink, then scanned
  * back through every read path: full decode, degree-only, id-slice,
  * metadata aggregates.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val avgDeg = args.lift(1).map(_.toInt).getOrElse(5)
    val shards = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // more shuffle partitions than cores at big n: 50M-node frames at 32
    // partitions put ~1.5M sketch/edge rows in ONE task's hash tables —
    // the per-task footprint, not the total, is what OOMs. 4x cores keeps
    // tasks bounded while staying far from small-file/scheduling overhead
    // (this is exactly the shuffle.partitions sizing lever the brief
    // names for the 100 TB tier).
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      (cpus.toInt * 4).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // distributed deterministic generation: one task per id range
    val base = java.nio.file.Files.createTempDirectory("graft_scale").toString + "/g"
    val adj = spark.range(0, n).mapPartitions { it =>
      it.map { x =>
        var h = x * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
        def next(): Long = { h ^= h >>> 27; h *= 0x94D049BB133111EBL; h ^= h >>> 31; h }
        val d = 1 + (math.abs(next()) % (2L * avgDeg - 1)).toInt // mean ≈ avgDeg
        val s = scala.collection.mutable.SortedSet.empty[Int]
        while (s.size < d) {
          val delta = (next() % 20000L).toInt // locality window ±20k
          val v = math.max(0L, math.min(n - 1L, x + delta)).toInt
          s += v
        }
        (x.toInt, s.toArray)
      }
    }.toDF("id", "successors")
      .withColumn("outdegree", size(col("successors")))

    val (_, tWrite) = timed {
      adj.write.format("bvgraph").option("basename", base)
        .option("shards", shards).option("nodes", n).mode("overwrite").save()
    }
    val g = spark.read.format("bvgraph").option("basename", base).load()

    // COLD pruned range scan, run FIRST (the JVM's BvGraphCache has never
    // seen this basename): the pushed id band must open ONLY the covering
    // shards — planning prunes from the manifest without touching shard
    // files, so the coldOpens delta IS the opened-shard count (the same
    // gate BvShardOpenSpec pins at 8 shards, asserted here at `shards`
    // shards / n nodes; at a 10k-shard crawl snapshot, opening all shards
    // for a 2-shard slice is 10k wasted opens+offsets decodes per
    // executor). Collected via explode, never an agg — metadata
    // aggregates answer from the manifest without opening anything.
    val cLo = n / 2L; val cHi = cLo + n / 100L
    val coveringShards = sources.BvShards.readManifest(base).get
      .shards.count(sh => sh.from < cHi && sh.until > cLo)
    val opensBefore = sources.BvGraphCache.coldOpens.get()
    val (coldSliceEdges, tColdSlice) = timed(
      g.filter(col("id") >= cLo && col("id") < cHi)
        .select(explode(col("successors"))).count())
    val coldOpened = sources.BvGraphCache.coldOpens.get() - opensBefore

    // metadata aggregate: must be O(1), no decode
    val ((nn, mm), tMeta) = timed {
      val r = g.agg(count(lit(1)), sum(col("outdegree"))).head()
      (r.getLong(0), r.getLong(1))
    }
    // full sequential decode: edge count via successors
    val (m2, tFull) = timed(
      g.select(explode(col("successors"))).count())
    // degree-only: random-access outdegree path, zero successor decode
    val (_, tDeg) = timed(
      g.select(col("id"), col("outdegree"))
        .groupBy(col("outdegree")).count().count())
    // id-slice: pushed range, ~1% of the graph
    val lo = n / 2; val hi = n / 2 + n / 100
    val (sliceEdges, tSlice) = timed(
      g.filter(col("id") >= lo && col("id") < hi)
        .select(explode(col("successors"))).count())

    // iterative peel (the round-5 kcore shape): eager localCheckpoint per
    // round keeps the logical plan flat, so driver-side planning stays
    // O(1) per round at ANY data size — this is the measured evidence
    // that the fix scales, not just that it passed at sf0.1
    val sc = spark.sparkContext
    // the shared clamped checkpoint (GraphAlgos.checkpointWithIds):
    // inherited stats are capped so iterative loops can't compound them
    // into driver-melting BigInt products (see Checkpoints.clampStats)
    def checkpoint(df: org.apache.spark.sql.DataFrame) =
      queries.GraphAlgos.checkpointWithIds(df)
    def free(ids: Set[Int]): Unit = ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

    val (kcoreRounds, tKcore) = timed {
      val e = g.select(col("id").as("u"), explode(col("successors")).as("v"))
      val eP = e.persist()
      val (deg, degIds) = checkpoint(
        eP.select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy(col("x")).agg(count(lit(1)).as("deg")))
      val k = 2L * avgDeg // peel threshold above the mean: rounds do work
      var alive = deg.filter(col("deg") >= k).select(col("x").as("id"))
      var aliveIds = degIds
      var nAlive = alive.count()
      var rounds = 0
      var converged = false
      for (_ <- 1 to 6 if !converged) {
        val (next, nextIds) = checkpoint(eP
          .join(alive.select(col("id").as("u")), "u")
          .join(alive.select(col("id").as("v")), "v")
          .select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy(col("x")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("x").as("id")))
        val nNext = next.count()
        rounds += 1
        if (nNext == nAlive) { converged = true; free(nextIds) }
        else { free(aliveIds); alive = next; aliveIds = nextIds; nAlive = nNext }
      }
      free(aliveIds)
      eP.unpersist(blocking = false)
      rounds
    }

    // h-index coreness rehearsal, PRODUCTION MODE (r9 — closing the r8
    // verdict's items 4+5; graph_coreness itself stays the 2-round
    // oracle-expressible form): (a) ONE round computed in BOTH physical
    // forms — the per-node ordered-rank sort and the bounded ≤√(2m)
    // HISTOGRAM (the crawl-hub plan hIndexRound auto-selects past
    // maxDeg > 2·√(2m)) — compared NODE FOR NODE (coreness_hist_diff
    // must be 0: the forms are result-identical by the capping argument
    // in GraphAlgos.hIndexRoundHist's scaladoc, and this is the at-scale
    // equality gate for it); (b) the full TO-FIXPOINT iteration via
    // GraphAlgos.corenessFixpoint with kcore's early-exit pattern and
    // per-round monotonicity ASSERTED (h^{i+1} ≤ h^i for every node — a
    // violation aborts the run), landing on the exact core number of
    // every node (gated against a driver-side peel at sf0.001 in
    // CorenessLouvainSpec; here the invariants + convergence are the
    // checkable facts).
    val ((corenessNodes, corenessViol, corenessHistDiff, corenessFxRounds,
        corenessConverged, maxCore), tCoreness) = timed {
      val e = g.select(col("id").cast("long").as("u"),
        explode(col("successors")).as("v0"))
        .select(col("u"), col("v0").cast("long").as("v"))
      val symP = e.select(col("u").as("x"), col("v").as("y"))
        .unionByName(e.select(col("v").as("x"), col("u").as("y")))
        .persist()
      val dst = symP.groupBy(col("x")).agg(count(lit(1)).as("deg"))
        .agg(count(lit(1)), sum(col("deg")), max(col("deg"))).head()
      val nNodes = dst.getLong(0)
      val hmax = math.sqrt(dst.getLong(1).toDouble).toLong
      val maxDeg = dst.getLong(2)
      val (h0, h0Ids) = checkpoint(
        symP.groupBy(col("x")).agg(count(lit(1)).as("h")))
      val hs = queries.GraphAlgos.hIndexRoundSort(symP, h0)
      val hh = queries.GraphAlgos.hIndexRoundHist(symP, h0, hmax)
      val histDiff = hs.withColumnRenamed("h", "a")
        .join(hh.withColumnRenamed("h", "b"), Seq("x"), "full")
        .filter(col("a").isNull || col("b").isNull || col("a") =!= col("b"))
        .count()
      val viol = hs.withColumnRenamed("h", "h1").join(h0, "x")
        .agg(sum(when(col("h1") > col("h"), 1L).otherwise(0L)))
        .head().getLong(0)
      free(h0Ids)
      val (hf, hfIds, fxRounds, fxConverged) =
        queries.GraphAlgos.corenessFixpoint(spark, symP, hmax, maxDeg,
          maxRounds = 100, checkMonotone = true)
      val mc = hf.agg(max(col("h"))).head().getLong(0)
      free(hfIds)
      symP.unpersist(blocking = false)
      (nNodes, viol, histDiff, fxRounds, fxConverged, mc)
    }

    // LOUVAIN production ladder (r9 — the graph_louvain scaladoc's
    // "each later sweep has the same plan over a strictly smaller graph",
    // proved at full scale): GUARDED sweep from singletons over the
    // undirected w=1 graph (louvainSweepMonotone — the raw synchronous
    // sweep's Q(sweep) ≥ Q(singletons) is NOT a theorem, simultaneous
    // moves can regress on adversarial ties; the guard keeps the moved
    // labels only when their exact-integer Q is at least the singletons',
    // making monotonicity hold by construction), COARSEN communities to
    // super-nodes (internal weight becomes self-loops), guarded sweep
    // AGAIN over the strictly smaller graph. Checks are exact-integer
    // equalities on the scaled modularity Q·(2m)²
    // (GraphAlgos.modularityScaled): Q(sweep1) ≥ Q(singletons) (by
    // construction — asserted anyway as a wiring check); coarsening
    // leaves Q INVARIANT (singleton labels on the coarse graph ==
    // sweep-1 labels on the original — same integer); and
    // Q(sweep2) ≥ Q(sweep1). Float never enters any comparison.
    val ((louvainOk, coarseEdges, q0s, q1s, q2s), tLouvain) = timed {
      val e = g.select(col("id").cast("long").as("u"),
        explode(col("successors")).as("v0"))
        .select(col("u"), col("v0").cast("long").as("v"))
      val we = e.filter(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .distinct().select(col("u"), col("v"), lit(1L).as("w"))
        .localCheckpoint(true)
      val (lbl1, ids1, q0, q1, m2a, _) =
        queries.GraphAlgos.louvainSweepMonotone(spark, we)
      val coarse = queries.GraphAlgos.coarsen(we, lbl1).localCheckpoint(true)
      val cSingles = coarse.select(col("u").as("x"))
        .unionByName(coarse.select(col("v").as("x"))).distinct()
        .select(col("x"), col("x").as("comm"))
      val (qc, m2c) = queries.GraphAlgos.modularityScaled(coarse, cSingles)
      val cEdges = coarse.count()
      val (lbl2, ids2, qc2, q2, _, _) =
        queries.GraphAlgos.louvainSweepMonotone(spark, coarse)
      free(ids1); free(ids2)
      val ok = m2a == m2c && q1 >= q0 && qc == q1 && qc2 == qc && q2 >= q1
      (ok, cEdges, q0, q1, q2)
    }

    // runtime filtering (SupportsRuntimeFiltering): a selective join whose
    // dim values land in a narrow id band must tighten the scan's id
    // bounds BEFORE task launch — the 100 TB "join a graph against a small
    // id set" shape. Evidence of pruning = this join's cost tracks the
    // 0.5% band, not the full decode. Cross-checked against the pushed
    // static-range scan of the same band.
    val dimPath = java.nio.file.Files.createTempDirectory("graft_scale_dim").toString
    val dLo = n / 3L; val dHi = dLo + n / 200L
    spark.range(dLo, dHi).toDF("jid").write.mode("overwrite").parquet(dimPath)
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    val (rtEdges, tRt) = timed {
      g.join(spark.read.parquet(dimPath), col("id") === col("jid"))
        .select(explode(col("successors"))).count()
    }
    val (expRt, _) = timed(
      g.filter(col("id") >= dLo && col("id") < dHi)
        .select(explode(col("successors"))).count())

    // Golomb-coded shard set: the same graph written with RESIDUALS_GOLOMB
    // (explicit modulus — the sidecar contract) and decoded end-to-end, so
    // SCALE.md can state measured links/s per coding, not just "it parses".
    // The modulus must track the residual-gap distribution (Golomb's unary
    // quotient is gap/m bits): mean gap ≈ 2·localityWindow/avgDeg; rounded
    // down to a power of two for the Rice fast path. A mismatched modulus
    // is catastrophic, not suboptimal — m=256 on this data measured
    // ~1500 bits/link and 5x the write time.
    val golombM = Integer.highestOneBit(math.max(1, 40000 / avgDeg))
    val baseGol = base + "_golomb"
    val (_, tWriteGol) = timed {
      adj.write.format("bvgraph").option("basename", baseGol)
        .option("shards", shards).option("nodes", n)
        .option("compressionflags", "RESIDUALS_GOLOMB")
        .option("golombmodulus", golombM.toString)
        .mode("overwrite").save()
    }
    val gGol = spark.read.format("bvgraph").option("basename", baseGol).load()
    val (mGol, tFullGol) = timed(
      gGol.select(explode(col("successors"))).count())

    // pointer-doubling rehearsal (graph_scc's primitive): ceil(log2 n)
    // rounds over an n-row state frame on the arithmetic functional graph
    // f(i) = (i²+1) mod n — each round one self-join + eager
    // localCheckpoint, previous generation freed as the next lands, and
    // the adaptive image-restricted broadcast kicks in once the pointer
    // image collapses toward the cycle set (see GraphAlgos.pointerDoubling
    // — un-restricted, the tail rounds hash-exchange the whole state onto
    // cycle-sized key space). Node count capped at 2M here: the loop's
    // round count is the log-n story (21 rounds at 2M, ~40 at a
    // trillion) and its per-round cost is state-constant, but past ~2M
    // in ONE JVM the measurement drowns in driver-shared GC — profiled
    // at 10M: flat plan, constant storage, single live generation, yet
    // GC/cleaner pauses dominate late rounds. On a cluster the state is
    // per-executor-small and the constant applies per round.
    val sccN = math.min(n, 2000000).toLong
    val ((sccRounds, sccOnCycle), tScc) = timed {
      import graft.queries.GraphAlgos
      val st0 = spark.range(0, sccN).toDF("i")
        .select(col("i"),
          ((col("i") * col("i") + 1L) % lit(sccN)).as("p"),
          col("i").as("m"))
      val (st, ids) = GraphAlgos.pointerDoubling(spark, st0, sccN)
      val onCycle = st.select(col("p")).distinct().count()
      GraphAlgos.freeRdds(spark, ids)
      val k = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, sccN - 1L))
      (k, onCycle)
    }

    // HyperBall rehearsal (graph_hyperball's loop at full node coverage):
    // radius-2 directed-ball size sketches for EVERY node via bottom-k
    // (k=16) KMV merges — per round one edge-partitioned join + one
    // bounded-state partial aggregate, state exactly k longs per node.
    // This is the operation exact ball counting cannot survive (Σdeg²);
    // the rehearsal measures the sketch loop's real cost at M arcs so
    // SCALE.md can state it, and cross-checks the average estimate
    // against the ball's trivial lower bound (outdeg + 1).
    val ((hbAvgX100, hbMin), tHb) = timed {
      val kmv = udaf(new graft.functions.SketchAggs.KmvUnion(16))
      val eDir = g.select(col("id").cast("long").as("x"),
        explode(col("successors")).as("yy"))
        .select(col("x"), col("yy").cast("long").as("y"))
      var st = spark.range(0, n).toDF("x")
        .select(col("x"),
          array((col("x") * lit(2654435761L)) % lit(1000000007L) + lit(1L))
            .as("sk"))
      var stIds = Set.empty[Int]
      for (_ <- 1 to 2) {
        val msgs = eDir.join(st.withColumnRenamed("x", "y"), "y")
          .select(col("x"), col("sk"))
        val (ck, ids) = checkpoint(
          msgs.unionByName(st).groupBy(col("x")).agg(kmv(col("sk")).as("sk")))
        free(stIds)
        st = ck
        stIds = ids
      }
      val est = st.select(
        when(size(col("sk")) < 16, size(col("sk")).cast("long"))
          .otherwise(expr(s"${15L * 1000000007L} DIV element_at(sk, 16)"))
          .as("est"))
      val r = est.agg(
        floor(avg(col("est")) * 100).cast("long"), min(col("est"))).head()
      free(stIds)
      (r.getLong(0), r.getLong(1))
    }

    // PageRank over the compressed graph (bv_pagerank's loop at M arcs):
    // 3 eagerly-checkpointed iterations of GraphAlgos.pageRankLoop fed
    // straight from the BV scan — edges decoded ONCE into a pinned frame,
    // the node set and out-degrees off the degree-only γ fast path. Each
    // iteration is one edge-partitioned join + partial/final agg + a
    // node-sized refresh join; the checkpoint keeps the logical plan a
    // LogicalRDD leaf so driver planning stays O(1) per iteration at any
    // scale. Checks: every node surfaces, and rank ≥ 0.15 (the damping
    // floor) everywhere — a dropped node or a lost contribution breaks
    // one of the two.
    val ((prCount, prMin), tPr) = timed {
      import graft.queries.GraphAlgos
      val e = g.select(col("id").cast("long").as("src"),
        explode(col("successors")).as("dq"))
        .select(col("src"), col("dq").cast("long").as("dst")).persist()
      val nodes = g.select(col("id").cast("long").as("id")).persist()
      val outdeg = g.filter(col("outdegree") > 0)
        .select(col("id").cast("long").as("src"),
          col("outdegree").cast("long").as("odeg")).persist()
      val pr = GraphAlgos.pageRankLoop(spark, e, nodes, outdeg, iters = 3,
        checkpointEachIter = true)
      val r = pr.agg(count(lit(1)), min(col("pr_e9"))).head()
      e.unpersist(blocking = false); nodes.unpersist(blocking = false)
      outdeg.unpersist(blocking = false)
      Caches.sweep(spark) // run the loop's deferred final-generation free
      (r.getLong(0), r.getLong(1))
    }

    def graphBytesOf(b: String): Long = {
      val dir = new java.io.File(b + ".d")
      if (dir.isDirectory)
        dir.listFiles.filter(_.getName.endsWith(".graph")).map(_.length).sum
      else new java.io.File(b + ".graph").length
    }
    val bitsPerLink = graphBytesOf(base) * 8.0 / mm
    val bitsPerLinkGol = graphBytesOf(baseGol) * 8.0 / mm

    // Coding advisor at scale: price γ/δ/ζ₃ for every shard-sized id
    // bucket with the exact bit model (the SAME codingCostFrame behind
    // bv_coding_advisor), then hold the model to account — write the
    // graph residual-only under uniform γ and uniform ζ₃ and require the
    // summed model to equal the .graph bytes to within per-shard byte
    // padding. The per-bucket argmin total is what a per-shard-coding
    // deployment would pay; its delta vs the best uniform coding is the
    // advisor's projected gain, measured not guessed.
    val advBucket = math.max(1L, n.toLong / shards)
    val (advRows, tAdv) = timed {
      graft.queries.GraphQueries.codingCostFrame(
        g.select(col("id").cast("long").as("id"),
          col("outdegree").cast("long").as("odeg"),
          col("successors").as("succ")), advBucket).collect()
    }
    val advG = advRows.map(_.getAs[Long]("bits_gamma")).sum
    val advD = advRows.map(_.getAs[Long]("bits_delta")).sum
    val advZ = advRows.map(_.getAs[Long]("bits_zeta3")).sum
    val advMixed = advRows.map(r => math.min(r.getAs[Long]("bits_gamma"),
      math.min(r.getAs[Long]("bits_delta"), r.getAs[Long]("bits_zeta3")))).sum
    val advUniformBest = math.min(advG, math.min(advD, advZ))
    def writeResidual(b: String, flag: String): Unit =
      adj.write.format("bvgraph").option("basename", b)
        .option("shards", shards).option("nodes", n)
        .option("windowsize", 0).option("minintervallength", 0)
        .option("compressionflags", flag).mode("overwrite").save()
    writeResidual(base + "_rg", "RESIDUALS_GAMMA")
    writeResidual(base + "_rz", "RESIDUALS_ZETA")
    val actualRg = graphBytesOf(base + "_rg") * 8L
    val actualRz = graphBytesOf(base + "_rz") * 8L
    val modelOk = actualRg >= advG && actualRg <= advG + 8L * shards &&
      actualRz >= advZ && actualRz <= advZ + 8L * shards
    val advGainPct = 100.0 * (advUniformBest - advMixed) / advUniformBest

    // Degree-ordered renumbering at scale (bv_permute's build): the
    // two-phase bucketed rank over all n nodes, both endpoint-mapping
    // joins, re-compression through the sink, and a full decode of the
    // permuted graph. The generator plants locality around the NATURAL
    // order (successors within ±20k of the source), so degree ordering
    // destroys it — the measured bits/link delta quantifies what node
    // ordering is worth on a BV graph, which is exactly why the
    // production path is a locality-preserving ordering (LLP/BFS) and
    // the permutation machinery here is the tool that applies it.
    val ((permArcs, permBpl), tPerm) = timed {
      val perm = graft.queries.GraphQueries.degreeOrderPerm(g)
      val pbase = base + "_perm"
      g.select(col("id").as("src"), explode(col("successors")).as("dst"))
        .join(perm.select(col("old_id").as("src"), col("new_id").as("nsrc")), "src")
        .join(perm.select(col("old_id").as("dst"), col("new_id").as("ndst")), "dst")
        .groupBy(col("nsrc"))
        .agg(sort_array(collect_list(col("ndst").cast("int"))).as("successors"))
        .select(col("nsrc").cast("int").as("id"), col("successors"))
        .withColumn("outdegree", size(col("successors")))
        .write.format("bvgraph").option("basename", pbase)
        .option("shards", shards).option("nodes", n).mode("overwrite").save()
      val arcs = spark.read.format("bvgraph").option("basename", pbase).load()
        .select(explode(col("successors"))).count()
      (arcs, graphBytesOf(pbase) * 8.0 / arcs)
    }
    // Borůvka MSF at scale (graph_msf's shared loop): undirected edges
    // u < v with deterministic hash weights, pk shifts WIDENED
    // AUTOMATICALLY from the rehearsal id space (idBits = bits of n−1,
    // w < 2^10 ⇒ needs 2·idBits + 10 ≤ 63 — holds to n = 2^26.5 ≈ 95M;
    // past that drop to a two-column argmin). The check is the FOREST
    // INVARIANT — every chosen edge reduces the component count
    // by exactly one, so incident-node count − chosen = final components
    // — which holds only if selection, mutual-pair breaking and the
    // doubling relabel are all exactly right; no reference answer needed.
    val idBits = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, n - 1L))
    require(2 * idBits + 10 <= 63,
      s"msf pk packing cannot hold $idBits-bit ids — use a struct argmin")
    val ((msfNodes, msfChosen, msfComps), tMsf) = timed {
      val und = g.select(col("id").cast("long").as("a"),
          explode(col("successors")).as("b0"))
        .select(col("a"), col("b0").cast("long").as("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val (we, weIds) = checkpoint(und.select(col("u"), col("v"),
        (((col("u") * 2654435761L + col("v")) % 997 + 1)
          * (1L << (2 * idBits))
          + col("u") * (1L << idBits) + col("v")).as("pk")))
      val doublings = math.max(1,
        64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1L)))
      val (chosen, comps, loopIds) = graft.queries.GraphAlgos
        .boruvkaForest(spark, we, rounds = 3, doublings = doublings)
      val nNodes = we.select(explode(array(col("u"), col("v"))).as("id"))
        .distinct().count()
      val nChosen = chosen.count()
      val nComps = comps.select(col("comp")).distinct().count()
      free(weIds); free(loopIds)
      (nNodes, nChosen, nComps)
    }

    // Relaxation kernel at scale (graph_sssp / graph_diameter_sweep's
    // shared loop, unit weights): 4 checkpointed min-plus rounds from
    // node 0 must agree ROW FOR ROW with an INDEPENDENT implementation of
    // the same recurrence — GraphX Pregel capped at the same 4 supersteps.
    // A DataFrame join+agg loop and a Pregel message engine share no code
    // path; exact agreement on 10M nodes is a reference-free correctness
    // gate for both.
    val ((ssspReached, ssspMismatch), tSssp) = timed {
      import org.apache.spark.graphx._
      val ud = g.select(col("id").cast("long").as("a"),
          explode(col("successors")).as("b0"))
        .select(col("a"), col("b0").cast("long").as("b"))
      val und = ud.unionByName(ud.select(col("b").as("a"), col("a").as("b")))
        .withColumn("w", lit(1L))
      val dist = graft.queries.GraphAlgos.relaxRounds(spark, und, 0L, 4)
      // symmetric closure on the Pregel side too — the kernel relaxed
      // over und, and a directed-only twin mismatches on every node first
      // reached through a reverse arc
      val edgeRdd = ud.rdd.flatMap(r => Iterator(
        Edge(r.getLong(0), r.getLong(1), ()),
        Edge(r.getLong(1), r.getLong(0), ())))
      val g0 = Graph.fromEdges(edgeRdd, ())
      val bfs = g0.mapVertices((id, _) => if (id == 0L) 0L else Long.MaxValue)
        .pregel(Long.MaxValue, maxIterations = 4)(
          (_, d0, msg) => math.min(d0, msg),
          t => if (t.srcAttr != Long.MaxValue && t.srcAttr + 1L < t.dstAttr)
            Iterator((t.dstId, t.srcAttr + 1L)) else Iterator.empty,
          (x, y) => math.min(x, y))
      import spark.implicits._
      val bfsDf = bfs.vertices.filter(_._2 != Long.MaxValue)
        .map { case (id, dd) => (id, dd) }.toDF("x", "bdist")
      val joined = dist.join(bfsDf, Seq("x"), "full_outer")
      val mism = joined.filter(col("dist").isNull || col("bdist").isNull ||
        col("dist") =!= col("bdist")).count()
      val reached = dist.count()
      g0.unpersistVertices(blocking = false)
      g0.edges.unpersist(blocking = false)
      bfs.unpersistVertices(blocking = false)
      bfs.edges.unpersist(blocking = false)
      (reached, mism)
    }

    // LONG-ID (>2^33) ANALYTICS rehearsal — bv_big proves sink→source
    // round-trips above 2^33; this closes the loop to the ALGORITHM
    // layer: the same adjacency shifted past 2^33 (every id overflows
    // Int), written idwidth=long, scanned through the Long decode
    // kernel, and pushed through (a) the 3-iteration pageRankLoop and
    // (b) the 2-round min-label propagation (graph_lpa's kernel — the
    // component-labeling primitive). Checks are SHIFT INVARIANCE: arcs
    // and node counts match the narrow graph, the rank floor holds for
    // every node, and — the exact gate — every LPA label satisfies
    // lbl_big(x + 2^33.x) == lbl_narrow(x) + shift ROW FOR ROW (min
    // labels are all-integer, so invariance is exact, not approximate).
    // A silent 32-bit truncation anywhere in the scan, join keys, agg
    // keys, or checkpoint encoders breaks one of these loudly.
    val BIG = 12_000_000_000L // > 2^33: catches truncation AND sign wraps
    val bigBase = base + "_big"
    val ((bigArcs, bigPrOk, lpaMismatch), tBig) = timed {
      adj.select((col("id").cast("long") + BIG).as("id"),
          transform(col("successors"), x => x.cast("long") + BIG)
            .as("successors"),
          col("outdegree"))
        .write.format("bvgraph").option("basename", bigBase)
        .option("idwidth", "long").option("shards", shards)
        .mode("overwrite").save()
      val gb = spark.read.format("bvgraph").option("basename", bigBase).load()
      val eb = gb.select(col("id").as("src"),
        explode(col("successors")).as("dst")).persist()
      val arcs = eb.count()
      // pagerank over the >2^33 id space: every node surfaces, damping
      // floor everywhere (float sums are order-dependent on in-degree>1
      // graphs, so the exact-equality burden rides on LPA below)
      val nodesB = gb.select(col("id").cast("long").as("id")).persist()
      val outdegB = gb.filter(col("outdegree") > 0)
        .select(col("id").cast("long").as("src"),
          col("outdegree").cast("long").as("odeg")).persist()
      val prB = graft.queries.GraphAlgos.pageRankLoop(spark, eb
          .select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst")),
        nodesB, outdegB, iters = 3, checkpointEachIter = true)
      val prR = prB.agg(count(lit(1)), min(col("pr_e9"))).head()
      val prOk = prR.getLong(0) == n.toLong && prR.getLong(1) >= 150000000L
      // 2-round min-LPA on both graphs; exact shift invariance
      def lpa2(edges: org.apache.spark.sql.DataFrame) = {
        val sym = edges.select(col("src").as("x"), col("dst").as("y"))
          .unionByName(edges.select(col("dst").as("x"), col("src").as("y")))
        val l1 = sym.groupBy(col("x"))
          .agg(least(col("x"), min(col("y"))).as("lbl"))
        sym.join(l1.withColumnRenamed("x", "y"), "y")
          .groupBy(col("x")).agg(min(col("lbl")).as("nmin"))
          .join(l1, "x")
          .select(col("x"), least(col("lbl"), col("nmin")).as("lbl"))
      }
      val narrowE = g.select(col("id").cast("long").as("src"),
        explode(col("successors")).as("d0"))
        .select(col("src"), col("d0").cast("long").as("dst"))
      val mism = lpa2(eb.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst")))
        .select((col("x") - BIG).as("x"), (col("lbl") - BIG).as("bl"))
        .join(lpa2(narrowE), Seq("x"), "full_outer")
        .filter(col("bl").isNull || col("lbl").isNull ||
          col("bl") =!= col("lbl"))
        .count()
      eb.unpersist(blocking = false); nodesB.unpersist(blocking = false)
      outdegB.unpersist(blocking = false)
      Caches.sweep(spark)
      (arcs, prOk, mism)
    }

    def f(v: Double): String = f"$v%.2f"
    println(s"""{"nodes":$n,"arcs":$mm,"shards":$shards,""" +
      s""""bits_per_link":${f(bitsPerLink)},"write_sec":${f(tWrite)},""" +
      s""""meta_agg_sec":${f(tMeta)},"full_decode_sec":${f(tFull)},""" +
      s""""decode_mlinks_per_sec":${f(m2 / tFull / 1e6)},""" +
      s""""degree_scan_sec":${f(tDeg)},"id_slice_sec":${f(tSlice)},""" +
      s""""cold_slice_sec":${f(tColdSlice)},""" +
      s""""cold_slice_shards_opened":$coldOpened,""" +
      s""""cold_slice_shards_covering":$coveringShards,""" +
      s""""kcore_rounds":$kcoreRounds,"kcore_sec":${f(tKcore)},""" +
      s""""coreness_sec":${f(tCoreness)},"coreness_nodes":$corenessNodes,""" +
      s""""coreness_monotone_violations":$corenessViol,""" +
      s""""coreness_hist_diff":$corenessHistDiff,""" +
      s""""coreness_fixpoint_rounds":$corenessFxRounds,""" +
      s""""coreness_converged":$corenessConverged,"max_core":$maxCore,""" +
      s""""louvain_sec":${f(tLouvain)},"louvain_coarse_edges":$coarseEdges,""" +
      s""""louvain_q_scaled":[$q0s,$q1s,$q2s],"louvain_ok":$louvainOk,""" +
      s""""runtime_join_sec":${f(tRt)},"runtime_join_edges":$rtEdges,""" +
      s""""golomb_write_sec":${f(tWriteGol)},""" +
      s""""golomb_full_decode_sec":${f(tFullGol)},""" +
      s""""golomb_decode_mlinks_per_sec":${f(mGol / tFullGol / 1e6)},""" +
      s""""golomb_bits_per_link":${f(bitsPerLinkGol)},""" +
      s""""slice_edges":$sliceEdges,""" +
      s""""scc_nodes":$sccN,"scc_rounds":$sccRounds,"scc_sec":${f(tScc)},""" +
      s""""scc_on_cycle":$sccOnCycle,""" +
      s""""hyperball_sec":${f(tHb)},"hyperball_avg_ball2":${f(hbAvgX100 / 100.0)},""" +
      s""""pagerank_sec":${f(tPr)},""" +
      s""""advisor_sec":${f(tAdv)},"advisor_buckets":${advRows.length},""" +
      s""""advisor_uniform_best_bits":$advUniformBest,""" +
      s""""advisor_mixed_bits":$advMixed,""" +
      s""""advisor_gain_pct":${f(advGainPct)},""" +
      s""""advisor_model_matches_encoder":$modelOk,""" +
      s""""perm_sec":${f(tPerm)},"perm_bits_per_link":${f(permBpl)},""" +
      s""""msf_sec":${f(tMsf)},"msf_nodes":$msfNodes,""" +
      s""""msf_chosen":$msfChosen,"msf_components":$msfComps,""" +
      s""""sssp_sec":${f(tSssp)},"sssp_reached":$ssspReached,""" +
      s""""sssp_pregel_mismatches":$ssspMismatch,""" +
      s""""longid_sec":${f(tBig)},"longid_arcs":$bigArcs,""" +
      s""""longid_lpa_mismatches":$lpaMismatch,""" +
      s""""checks":${corenessNodes == n.toLong && corenessViol == 0L &&
        corenessHistDiff == 0L && corenessConverged && maxCore >= 1L &&
        louvainOk && coarseEdges > 0L &&
        coldOpened == coveringShards.toLong && coldSliceEdges > 0L &&
        nn == n && m2 == mm && mGol == mm && rtEdges == expRt &&
        sccOnCycle >= 1 && sccOnCycle <= sccN && hbMin >= 1 &&
        hbAvgX100 >= 100L * (1 + avgDeg) &&
        prCount == n && prMin >= 150000000L &&
        modelOk && permArcs == mm &&
        msfNodes - msfChosen == msfComps && msfChosen > 0 &&
        ssspMismatch == 0L && ssspReached > 1L &&
        bigArcs == mm && bigPrOk && lpaMismatch == 0L}}""")
    spark.stop()
  }
}
