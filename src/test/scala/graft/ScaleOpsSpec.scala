package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchAggs

/** Invariant gates for the 100 TB-shape operators (graft.queries.ScaleOps).
  * Value-level parity is the DuckDB oracle's job; these assert what the
  * oracle can't: Bloom no-false-negatives + real pruning, KMV estimator
  * math and merge-order independence, and the Z-order layout's pruning
  * advantage over a single-key sort.
  */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkSessionFixture._

  // ---- Bloom --------------------------------------------------------------

  test("BloomBits: inserted keys always test positive; merge == reduce-all") {
    val agg = new SketchAggs.BloomBits(1 << 10, 3)
    val m = 1 << 10
    def contains(bits: Array[Long], h1: Long, h2: Long): Boolean = {
      val r1 = java.lang.Math.floorMod(h1, m.toLong)
      val r2 = java.lang.Math.floorMod(h2, m.toLong)
      (0 until 3).forall { i =>
        val idx = java.lang.Math.floorMod(r1 + i.toLong * r2, m.toLong).toInt
        (bits(idx >>> 6) & (1L << (idx & 63))) != 0
      }
    }
    val keys = (1 to 500).map(i => (SketchAggs.mix64(i.toLong), SketchAggs.mix64(-i.toLong)))
    val all = keys.foldLeft(agg.zero)(agg.reduce)
    keys.foreach { case (h1, h2) => assert(contains(all, h1, h2), s"false negative ($h1,$h2)") }
    val (l, r) = keys.splitAt(250)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.sameElements(all))
  }

  test("join_bloom_prefilter prunes the probe side before the exact join") {
    import graft.Tables._
    val d = sf001
    val total = lineitem(spark, d).count()
    val trueMatches = lineitem(spark, d)
      .join(supplier(spark, d).filter(col("s_nationkey") < 5)
        .select(col("s_suppkey").cast("long").as("sk")),
        col("l_suppkey").cast("long") === col("sk"), "left_semi").count()
    // re-run the query's own output: sum(n_items) must equal the exact
    // semi-join row count (no false negatives lost, all FPs removed)
    val out = SparkEntry.queries("join_bloom_prefilter")(spark, d)
    val kept = out.agg(sum("n_items")).head().getLong(0)
    assert(kept == trueMatches, s"bloom+exact kept $kept, exact semi join has $trueMatches")
    assert(trueMatches < total, "fixture degenerate: filter selects everything")
    // the plan keeps the bitset filter below the join (scan-stage pruning)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("xxhash64"), s"no bloom membership filter in plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  // ---- KMV ----------------------------------------------------------------

  test("KmvDistinct: exact below k, bounded error above, merge-order independent") {
    val k = 64
    val agg = new SketchAggs.KmvDistinct(k)
    def hashes(n: Int, seed: Long): Seq[Long] =
      (1 to n).map(i => SketchAggs.mix64(seed + i))
    // below k: estimate is exactly the distinct count (duplicates collapse)
    val small = hashes(40, 7L)
    val smallBuf = (small ++ small).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(smallBuf) == 40L)
    // above k: relative error within 5 standard errors (se = 1/sqrt(k-1))
    val n = 20000
    val big = hashes(n, 42L)
    val est = agg.finish(big.foldLeft(agg.zero)(agg.reduce)).toDouble
    val se = 1.0 / math.sqrt(k - 1.0)
    assert(math.abs(est - n) / n < 5 * se, s"estimate $est for true $n")
    // merge == reduce-all regardless of split point and order
    val full = big.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(1, 999, 10000, 19999)) {
      val (l, r) = big.splitAt(cut)
      val lb = l.foldLeft(agg.zero)(agg.reduce)
      val rb = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(lb.clone(), rb.clone()).sameElements(full), s"cut=$cut")
      assert(agg.merge(rb.clone(), lb.clone()).sameElements(full), s"cut=$cut swapped")
    }
    // buffer never exceeds k entries
    assert(full.length == k)
  }

  test("KmvAddLong == KmvUnion over singleton arrays (the ball-1 rewrite)") {
    // the long-input insert path must produce bit-identical sketches to
    // the array-union path it replaced in kmvBallSketches round 1 —
    // same k smallest DISTINCT values, any feed order, any merge split
    val k = 16
    val add = new SketchAggs.KmvAddLong(k)
    val un = new SketchAggs.KmvUnion(k)
    val rnd = new scala.util.Random(1234L)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(60)
      // small positive modular-hash regime incl. heavy duplicates
      val vs = Seq.fill(n)(1L + rnd.nextInt(40).toLong)
      val viaAdd = vs.foldLeft(add.zero)(add.reduce)
      val viaUnion = vs.foldLeft(un.zero)((b, v) => un.reduce(b, Array(v)))
      assert(viaAdd.sameElements(viaUnion),
        s"trial $trial: ${viaAdd.toSeq} vs ${viaUnion.toSeq} for $vs")
      // merge of split halves == reduce-all (the partial-agg contract)
      val (l, r) = vs.splitAt(n / 2)
      val lb = l.foldLeft(add.zero)(add.reduce)
      val rb = r.foldLeft(add.zero)(add.reduce)
      assert(add.merge(lb, rb).sameElements(viaAdd), s"trial $trial merge")
      // sorted distinct, never longer than k
      assert(viaAdd.length <= k)
      assert(viaAdd.toSeq == viaAdd.toSeq.distinct.sorted)
    }
  }

  test("distinct_kmv estimates within the theoretical bound on real data") {
    val rows = SparkEntry.queries("distinct_kmv")(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      assert(math.abs(est - exact).toDouble / exact < 5.0 / math.sqrt(63.0),
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  // ---- Z-order ------------------------------------------------------------

  test("Morton interleave round-trips (spread16 is a bijection on 16 bits)") {
    def spread(x0: Long): Long = {
      var x = x0
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      x = (x | (x << 1)) & 0x55555555L
      x
    }
    def unspread(z0: Long): Long = {
      var z = z0 & 0x55555555L
      z = (z | (z >> 1)) & 0x33333333L
      z = (z | (z >> 2)) & 0x0F0F0F0FL
      z = (z | (z >> 4)) & 0x00FF00FFL
      z = (z | (z >> 8)) & 0x0000FFFFL
      z
    }
    for (v <- Seq(0L, 1L, 99L, 1999L, 0xFFFFL))
      assert(unspread(spread(v)) == v)
    // interleave of (p, s) keeps both recoverable
    val z = spread(1234L) | (spread(77L) << 1)
    assert(unspread(z) == 1234L && unspread(z >> 1) == 77L)
  }

  test("z-order layout prunes more files on a 2-D box than a 1-D sort") {
    import org.apache.spark.sql.expressions.Window
    val rows = SparkEntry.queries("layout_zorder")(spark, sf001).collect()
    val zOverlap = rows.count(_.getInt(6) == 1)
    val nFiles = rows.length
    // same file stats under an orderkey-sorted (z-oblivious) layout
    val base = Tables.lineitem(spark, sf001).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_partkey").cast("long").as("p"), col("l_suppkey").cast("long").as("sk"))
    val rn = row_number().over(Window.orderBy(col("l_orderkey"), col("l_linenumber")))
    val oneD = base.withColumn("file_id", floor((rn - 1) / lit(1000)).cast("long"))
      .groupBy("file_id")
      .agg(min("p").as("min_p"), max("p").as("max_p"),
        min("sk").as("min_s"), max("sk").as("max_s"))
      .withColumn("overlaps",
        (col("min_p") <= 511 && col("max_p") >= 256 &&
          col("min_s") <= 47 && col("max_s") >= 32).cast("int"))
      .collect()
    val oneDOverlap = oneD.count(_.getAs[Int]("overlaps") == 1)
    assert(oneD.length == nFiles)
    // the 2-D box covers (256/2000) x (16/100) ~ 2% of the key space: a
    // z-clustered layout must touch far fewer files than a layout sorted
    // by an unrelated key (which typically cannot prune at all)
    assert(zOverlap < oneDOverlap,
      s"z-order touched $zOverlap/$nFiles files, 1-D sort $oneDOverlap/$nFiles")
    assert(zOverlap.toDouble / nFiles < 0.5,
      s"z-order pruning too weak: $zOverlap/$nFiles files overlap")
  }
}
