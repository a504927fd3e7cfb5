package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.GraphAlgos

/** Production-mode iteration for the round-8 graph decompositions
  * (r8 verdict items 4+5), gated at sf0.001 — the same checks the scale
  * rehearsal runs at 50M:
  *  - hIndexRoundHist (hub-safe bounded histogram) is result-identical
  *    to hIndexRoundSort, per node, per round;
  *  - corenessFixpoint converges with a monotone h-sequence and lands on
  *    the EXACT core numbers (checked against a driver-side peel — sound
  *    at this SF, the graph is a few thousand nodes);
  *  - the Louvain ladder louvainSweep → coarsen → louvainSweep keeps
  *    exact-integer modularity non-decreasing, and coarsening leaves
  *    modularity INVARIANT (Q of the coarse graph under the second
  *    sweep's labels == Q of the original graph under composed labels).
  */
class CorenessLouvainSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private lazy val sym = {
    val e = GraphAlgos.coPurchaseEdges(spark, sf0001).cache()
    e.select(col("u").as("x"), col("v").as("y"))
      .unionByName(e.select(col("v").as("x"), col("u").as("y")))
      .cache()
  }
  private lazy val (hmax, maxDeg) = {
    val deg = sym.groupBy("x").agg(count(lit(1)).as("deg"))
    val r = deg.agg(sum(col("deg")), max(col("deg"))).head()
    (math.sqrt(r.getLong(0).toDouble).toLong, r.getLong(1))
  }

  test("histogram h-index round == sort h-index round, node for node") {
    var h = sym.groupBy(col("x")).agg(count(lit(1)).as("h"))
    for (round <- 1 to 3) {
      val hs = GraphAlgos.hIndexRoundSort(sym, h)
      val hh = GraphAlgos.hIndexRoundHist(sym, h, hmax)
      val diff = hs.withColumnRenamed("h", "a")
        .join(hh.withColumnRenamed("h", "b"), Seq("x"), "full")
        .filter(col("a").isNull || col("b").isNull || col("a") =!= col("b"))
        .count()
      assert(diff == 0, s"round $round: $diff nodes differ between forms")
      h = hs.localCheckpoint(true)
    }
  }

  test("histogram round's plan: partial-agg histogram feeds the window, no degree-sized sort input") {
    val h0 = sym.groupBy(col("x")).agg(count(lit(1)).as("h"))
    val plan = GraphAlgos.hIndexRoundHist(sym, h0, hmax)
      .queryExecution.executedPlan.toString
    // the (x, hvc) count must partial-aggregate BEFORE the window's sort:
    // two HashAggregates for the histogram + the window on top of them
    assert(plan.contains("Window"), plan.take(500))
    val winIdx = plan.indexOf("Window")
    val below = plan.substring(winIdx)
    assert(below.contains("HashAggregate") || below.contains("SortAggregate"),
      "the window must consume the aggregated histogram, not raw neighbor rows")
    assert("partial_count|partial_sum".r.findFirstIn(plan).isDefined,
      "histogram count must have a map-side partial phase (hub fan-in collapse)")
  }

  test("corenessFixpoint converges monotonically to the exact core numbers") {
    val (h, hIds, rounds, converged) = GraphAlgos.corenessFixpoint(
      spark, sym, hmax, maxDeg, maxRounds = 100, checkMonotone = true)
    assert(converged, s"no fixpoint after $rounds rounds")
    assert(rounds >= 1)
    // driver-side exact peel (Matula–Beck): repeatedly remove the
    // minimum-degree node; its degree at removal is its core number
    val adjPairs = sym.select("x", "y").collect()
      .map(r => (r.getAs[Number]("x").longValue, r.getAs[Number]("y").longValue))
    val adj = adjPairs.groupBy(_._1).map { case (k, vs) =>
      (k, scala.collection.mutable.Set(vs.map(_._2): _*)) }
    val deg = scala.collection.mutable.Map(adj.map { case (k, v) => (k, v.size) }.toSeq: _*)
    val core = scala.collection.mutable.Map.empty[Long, Int]
    val remaining = scala.collection.mutable.Set(deg.keys.toSeq: _*)
    var k = 0
    while (remaining.nonEmpty) {
      val u = remaining.minBy(deg)
      k = math.max(k, deg(u))
      core(u) = k
      remaining -= u
      adj(u).foreach { v =>
        if (remaining.contains(v)) { deg(v) -= 1; adj(v) -= u }
      }
    }
    val got = h.collect().map(r =>
      (r.getAs[Number]("x").longValue, r.getAs[Long]("h"))).toMap
    GraphAlgos.freeRdds(spark, hIds)
    assert(got.keySet == core.keySet)
    val bad = got.filter { case (n, hv) => hv != core(n).toLong }
    assert(bad.isEmpty,
      s"${bad.size} nodes disagree with the exact peel, e.g. ${bad.take(3)}")
  }

  test("checkpoint stats stay clamped across many self-joining rounds (driver-melt regression)") {
    // localCheckpoint inherits the child plan's estimated sizeInBytes;
    // a loop that joins its own previous generation MULTIPLIES the
    // estimate per round — digits double until the driver wedges in
    // BigInteger math inside stats estimation (hit live at 50M, round
    // ~20+). The clamp in checkpointWithIds bounds every generation.
    import spark.implicits._
    val cap = BigInt(10).pow(18)
    var (df, ids0) = GraphAlgos.checkpointWithIds(
      Seq(1L, 2L, 3L).toDF("x"))
    // generations are freed at the END here: this test's subject is the
    // STATS clamp (the per-round-free discipline over real data is what
    // the fixpoint test above exercises), and 60 trivial generations are
    // a few KB of blocks
    val all = scala.collection.mutable.Set.empty[Int] ++= ids0
    val t0 = System.nanoTime()
    for (_ <- 1 to 60) {
      val (nd, nids) = GraphAlgos.checkpointWithIds(
        df.join(df.withColumnRenamed("x", "y"), expr("x = y"))
          .join(df.withColumnRenamed("x", "z"), expr("x = z"))
          .select(col("x")))
      df = nd; all ++= nids
      assert(df.queryExecution.analyzed.stats.sizeInBytes <= cap,
        "checkpointed stats exceed the clamp")
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(df.count() == 3)
    GraphAlgos.freeRdds(spark, all.toSet)
    // unclamped, round ~25+ alone takes minutes of driver-side BigInt
    // math; the whole loop must stay planning-cheap (generous bound for
    // a loaded CI box)
    assert(sec < 120, f"60 self-joining rounds took $sec%.0f s — stats blowup?")
  }

  test("louvain ladder: modularity non-decreasing and coarsening-invariant (exact integers)") {
    val we = GraphAlgos.weightedCoPurchase(spark, sf0001)
      .localCheckpoint(true)
    val singletons = we.select(col("u").as("x")).unionByName(
      we.select(col("v").as("x"))).distinct().select(col("x"), col("x").as("comm"))
    val (qSingle, m2a) = GraphAlgos.modularityScaled(we, singletons)
    val (lbl1, ids1) = GraphAlgos.louvainSweep(spark, we)
    val (qSweep1, m2b) = GraphAlgos.modularityScaled(we, lbl1)
    assert(m2a == m2b, "total strength must be label-independent")
    assert(qSweep1 >= qSingle,
      s"sweep 1 decreased modularity: $qSweep1 < $qSingle")
    val coarse = GraphAlgos.coarsen(we, lbl1).localCheckpoint(true)
    // coarsening preserves total strength exactly
    val (qCoarseSingle, m2c) = GraphAlgos.modularityScaled(coarse,
      coarse.select(col("u").as("x")).unionByName(coarse.select(col("v").as("x")))
        .distinct().select(col("x"), col("x").as("comm")))
    assert(m2c == m2a, s"coarsening changed total strength: $m2c != $m2a")
    // singleton labels on the coarse graph == sweep-1 labels on the
    // original (each super-node IS a community): Q must carry over exactly
    assert(qCoarseSingle == qSweep1,
      s"coarsening is not modularity-invariant: $qCoarseSingle != $qSweep1")
    val (lbl2, ids2) = GraphAlgos.louvainSweep(spark, coarse)
    val (qSweep2, _) = GraphAlgos.modularityScaled(coarse, lbl2)
    assert(qSweep2 >= qSweep1,
      s"sweep 2 decreased modularity: $qSweep2 < $qSweep1")
    // composed labels on the ORIGINAL graph reproduce the coarse Q exactly
    val composed = lbl1.select(col("x"), col("comm").as("c1"))
      .join(lbl2.select(col("x").as("c1"), col("comm")), "c1")
      .select(col("x"), col("comm"))
    val (qComposed, _) = GraphAlgos.modularityScaled(we, composed)
    assert(qComposed == qSweep2,
      s"composed labels lose modularity invariance: $qComposed != $qSweep2")
    GraphAlgos.freeRdds(spark, ids1 ++ ids2)
  }
}
