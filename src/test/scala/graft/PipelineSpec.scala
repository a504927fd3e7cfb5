package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fnv64, SketchAggs}
import graft.multimodal.Multimodal

/** Tests for the training-data-pipeline operators (dedup, similarity,
  * text analysis, multimodal plumbing). Value-level parity with DuckDB is
  * the driver's gate; here we assert the algorithmic invariants that the
  * oracle can't express (hash-dependent sketches, recall, batch shapes).
  */
class PipelineSpec extends AnyFunSuite {
  import SparkSessionFixture._

  // ---- MinHash / LSH ------------------------------------------------------

  test("dedup_minhash recovers the exact-jaccard pair set at sf0.001") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = SparkEntry.queries("dedup_minhash")(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verified candidates can only be a subset of the exact pair set
    assert(mh.subsetOf(exact), s"minhash produced non-pairs: ${mh -- exact}")
    // b=32,r=4 at jaccard>=0.8 -> candidate probability ~1; demand full recall here
    assert(mh == exact, s"missed pairs: ${exact -- mh}")
  }

  test("minhash signature estimates jaccard") {
    val agg = new SketchAggs.MinHashSig(256)
    def sig(xs: Seq[Long]): Array[Long] =
      xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, (0L, x)))
    val a = (1L to 100L).toSeq
    val b = (21L to 120L).toSeq // true jaccard = 80/120 = 0.667
    val est = sig(a).zip(sig(b)).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 0.667) < 0.1, s"estimate $est")
    // merge == reduce-all (partial aggregation correctness)
    val (l, r) = a.splitAt(50)
    assert(agg.merge(sig(l), sig(r)).sameElements(sig(a)))
  }

  // ---- Embedding dedup ----------------------------------------------------

  test("dedup_embed block join reproduces the brute-force all-pairs result") {
    import SimilarityTestHelper._
    val blocked = SparkEntry.queries("dedup_embed")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = bruteForcePairs(spark, sf0001, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(blocked.sameElements(brute),
      s"block join diverged: ${blocked.length} vs ${brute.length} pairs")
  }

  test("block-pair decomposition covers every unordered pair exactly once, for any block count") {
    // the pairing argument (off-diagonal pairs via one (p,q) key, diagonal
    // dedup on id order) must hold for ANY blocks value — including the
    // degenerate single block and more blocks than rows
    import spark.implicits._
    val n = 60
    val emb = (0 until n).map(i =>
      (i.toLong, Array.tabulate(4)(j => (1.0f + i + j)))).toDF("vec_id", "embedding")
    val expected = n.toLong * (n - 1) / 2
    for (blocks <- Seq(1, 2, 7, 64, 97)) {
      val pairs = graft.queries.DedupQueries.blockPairSim(spark, emb, blocks)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.length == expected,
        s"blocks=$blocks: ${pairs.length} pairs, want $expected (dups or misses)")
      assert(pairs.distinct.length == pairs.length, s"blocks=$blocks: duplicate pairs")
      assert(pairs.forall { case (a, b) => a < b }, s"blocks=$blocks: unordered output")
    }
  }

  test("dedup_embed_lsh finds every planted near-dup twin (full recall)") {
    val ids = Tables.embeddings(spark, sf0001).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val pairs = SparkEntry.queries("dedup_embed_lsh")(spark, sf0001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = ids.map(i => (i, i + 100000L))
    // every planted twin pair must survive the banded-SRP prefilter —
    // this is the recall gate on the LSH candidate generation (the
    // DuckDB oracle additionally proves it value-exactly at sf0.01)
    assert(planted.subsetOf(pairs),
      s"LSH missed planted twins: ${(planted -- pairs).take(5)}")
  }

  // ---- SimHash ------------------------------------------------------------

  test("simhash: near-dup docs land within hamming<=7 and share a band") {
    val agg = new SketchAggs.SimHash64()
    def simhash(tokens: Seq[String]): Long =
      agg.finish(tokens.foldLeft(agg.zero)((b, t) =>
        agg.reduce(b, (0L, Fnv64.hashBytes(t.getBytes("UTF-8"))))))
    val base = (1 to 60).map(i => s"token$i")
    val nearDup = base.drop(1) :+ "tokenNEW"
    val (h1, h2) = (simhash(base), simhash(nearDup))
    val dist = java.lang.Long.bitCount(h1 ^ h2)
    assert(dist <= 7, s"hamming $dist")
    val bandsEqual = (0 until 8).count(b => ((h1 >>> (b * 8)) & 0xff) == ((h2 >>> (b * 8)) & 0xff))
    assert(bandsEqual >= 1) // pigeonhole: <=7 differing bits over 8 bands
    // unrelated docs are far apart
    val h3 = simhash((1 to 60).map(i => s"other$i"))
    assert(java.lang.Long.bitCount(h1 ^ h3) > 15)
  }

  test("dedup_simhash emits 8 band buckets per doc, consistent with the hex sketch") {
    val rows = SparkEntry.queries("dedup_simhash")(spark, sf0001)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty && rows.forall(_._2.length == 8))
    rows.head._2.foreach { r =>
      val sketch = java.lang.Long.parseUnsignedLong(r.getString(1), 16)
      val (band, bucket) = (r.getInt(2), r.getLong(3))
      assert(((sketch >>> (band * 8)) & 0xff) == bucket)
    }
  }

  // ---- count-min sketch ---------------------------------------------------

  test("count-min: estimate >= exact always; collisions only inflate") {
    // tiny width forces collisions so the overestimate path is exercised
    val cms = new SketchAggs.CountMin(4, 16)
    val rnd = new scala.util.Random(7)
    val stream = Seq.fill(2000)(s"g${rnd.nextInt(50)}")
    val sketch = stream.foldLeft(cms.zero)(cms.reduce)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (g, n) =>
      val est = cms.estimate(sketch, g)
      assert(est >= n, s"$g: est $est < exact $n")
    }
    // with 50 keys over 16 buckets, at least one estimate must collide
    assert(exact.exists { case (g, n) => cms.estimate(sketch, g) > n })
    // merge associativity: split-stream merge equals single-stream sketch
    val (s1, s2) = stream.splitAt(700)
    val merged = cms.merge(s1.foldLeft(cms.zero)(cms.reduce),
      s2.foldLeft(cms.zero)(cms.reduce))
    assert(merged.sameElements(sketch))
  }

  test("freq_ngrams_cms: top grams carry non-negative overestimates") {
    val rows = SparkEntry.queries("freq_ngrams_cms")(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"cms < exact in $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }

  // ---- grouped top-k ------------------------------------------------------

  test("TopKPairs == sort-take model; merge is associative + commutative") {
    val k = 3
    val agg = new graft.functions.TopK.TopKPairs(k)
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 100) {
      val xs = Seq.fill(rnd.nextInt(30))((rnd.nextInt(8).toLong, rnd.nextInt(100).toLong))
      val reduced = xs.foldLeft(agg.zero)(agg.reduce)
      val pairs = reduced.grouped(2).map(a => (a(0), a(1))).toSeq
      // duplicate (c, id) inputs both enter the buffer (no dedup), so the
      // model is the duplicate-preserving stable sort-take
      val full = xs.sortBy { case (c, id) => (-c, id) }.take(k)
      assert(pairs == full, s"xs=$xs")
      // split-merge equals single-stream
      val (l, r) = xs.splitAt(xs.length / 2)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(merged.toSeq == reduced.toSeq, s"merge mismatch xs=$xs")
      val mergedRev = agg.merge(r.foldLeft(agg.zero)(agg.reduce),
        l.foldLeft(agg.zero)(agg.reduce))
      assert(mergedRev.toSeq == reduced.toSeq)
    }
  }

  test("topk_per_group: partial aggregation runs before the exchange") {
    val df = SparkEntry.queries("topk_per_group")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx > 0 && p.indexOf("partial_topkpairs", exchangeIdx) > 0
      || p.indexOf("partial_", exchangeIdx) > 0,
      s"no map-side partial top-k before the shuffle:\n$p")
  }

  // ---- similarity ---------------------------------------------------------

  test("sim_ann_lsh results are contained in the exact ranking's candidate pool") {
    val exact = SparkEntry.queries("sim_topk")(spark, sf0001)
      .select("qid", "vec_id", "sim_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, sf0001).collect()
    assert(ann.nonEmpty)
    // any ANN hit that IS in the exact top-10 must carry the same quantized sim
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exact.get(key).foreach(s => assert(s == r.getLong(4), s"sim mismatch at $key"))
    }
    // determinism: two runs produce identical buckets and rankings
    val again = SparkEntry.queries("sim_ann_lsh")(spark, sf0001).collect()
    assert(ann.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("sim_ann_ivf: full-probe IVF equals exact brute-force top-k") {
    val exact = SparkEntry.queries("sim_topk")(spark, sf0001)
      .filter(col("rnk") <= 5)
      .select("qid", "rnk", "vec_id", "sim_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val ivfFull = graft.queries.SimilarityQueries.ivf(spark, sf0001, nprobe = 10)
      .select("qid", "rnk", "vec_id", "sim_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(ivfFull == exact, "IVF with nprobe=nlist must be exact search")
    // nprobe=2 results are a subset of the corpus with correct sim values
    val exactSims = SparkEntry.queries("sim_topk")(spark, sf0001)
      .select("qid", "vec_id", "sim_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = SparkEntry.queries("sim_ann_ivf")(spark, sf0001).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      exactSims.get((r.getLong(0), r.getLong(2)))
        .foreach(s => assert(s == r.getLong(4)))
    }
  }

  test("vec_dot: codegen result matches interpreted eval and known values") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    // codegen'd projection path
    assert(df.select(graft.queries.SimilarityQueries.dot(col("a"), col("b")))
      .head().getDouble(0) == 32.0)
    // SQL-registered path (exercises the same expression via the extension)
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0) == 11.0)
    // interpreted eval directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val lit = (xs: Seq[Double]) => Literal.create(xs,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    assert(graft.functions.VecDot(lit(Seq(1.0, 2.0)), lit(Seq(3.0, 4.0)))
      .eval(null) == 11.0)
  }

  // ---- fingerprints -------------------------------------------------------

  test("fnv64 expression matches scalar implementation and is codegen-stable") {
    import spark.implicits._
    val df = Seq("", "a", "hello world", "the quick brown fox").toDF("s")
    val viaExpr = df.select(
      org.apache.spark.sql.graftbridge.Exprs.toColumn(
        Fnv64(org.apache.spark.sql.graftbridge.Exprs.toExpr(col("s")))))
      .collect().map(_.getLong(0))
    val direct = Seq("", "a", "hello world", "the quick brown fox")
      .map(s => Fnv64.hashBytes(s.getBytes("UTF-8")))
    assert(viaExpr.toSeq == direct)
    // golden pin: FNV-1a 64 of empty string is the offset basis
    assert(Fnv64.hashBytes(Array.empty) == 0xcbf29ce484222325L)
  }

  test("fnv64 registers as a SQL function via GraftExtensions") {
    // the fixture session was built with the extension installed
    import spark.implicits._
    val got = spark.sql("SELECT fnv64('abc')").head().getLong(0)
    assert(got == Fnv64.hashBytes("abc".getBytes("UTF-8")))
  }

  test("text_fingerprint is deterministic and collision-free on distinct docs") {
    val fps = SparkEntry.queries("text_fingerprint")(spark, sf0001).collect()
    assert(fps.length == Tables.documents(spark, sf0001).count())
    // sf0.001 has no duplicate texts -> whole-doc fingerprints are unique
    assert(fps.map(_.getString(1)).distinct.length == fps.length)
  }

  // ---- multimodal ---------------------------------------------------------

  test("multimodal batch plumbing: batch sizes, stub shapes, feature values") {
    val batches = scala.collection.mutable.ArrayBuffer[Int]()
    val recs = (0 until 150).map(i =>
      Multimodal.MmRecord(i.toLong, "image", s"payload$i".getBytes, 8, 4))
    recs.grouped(Multimodal.DECODE_BATCH).foreach { b =>
      batches += b.length
      val feats = Multimodal.extractBatch(b).toSeq
      assert(feats.length == b.length)
      feats.zip(b).foreach { case (f, r) =>
        assert(f.payload_len == r.payload.length)
        assert(f.byte_sum == r.payload.map(_ & 0xff).sum)
      }
    }
    assert(batches.toSeq == Seq(64, 64, 22))
    // stub decode expands to width*height deterministically
    val px = Multimodal.decodeImageStub("ab".getBytes, 3, 2)
    assert(px.toSeq == Seq('a', 'b', 'a', 'b', 'a', 'b').map(_.toByte))
  }

  test("multimodal resize + frame-sample stubs: real math on fake media") {
    // resize: identity, downscale, upscale
    val px = Array.tabulate(12)(_.toByte) // 4x3
    assert(Multimodal.resizeStub(px, 4, 3, 4, 3).sameElements(px))
    val down = Multimodal.resizeStub(px, 4, 3, 2, 1)
    assert(down.length == 2 && down.sameElements(Array[Byte](0, 2)))
    val up = Multimodal.resizeStub(px, 4, 3, 8, 6)
    assert(up.length == 48 && up(0) == 0 && up(47) == px(11))
    // frame sampling: every 2nd 4-byte frame of a 20-byte "video"
    val video = Array.tabulate(20)(_.toByte)
    val frames = Multimodal.frameSampleStub(video, frameSize = 4, stride = 2)
    assert(frames.length == 3)
    assert(frames(0).sameElements(Array[Byte](0, 1, 2, 3)))
    assert(frames(1).sameElements(Array[Byte](8, 9, 10, 11)))
    assert(frames(2).sameElements(Array[Byte](16, 17, 18, 19)))
    // trailing partial frame is dropped
    assert(Multimodal.frameSampleStub(video, 6, 1).length == 3)
  }

  test("multimodal features never shuffle the payload (narrow plan)") {
    val df = Multimodal.features(spark, Tables.documents(spark, sf0001))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"payload crossed a shuffle:\n$plan")
  }

  test("cdc kernel: boundaries are content-defined — chunks after the first boundary survive a prefix insertion") {
    val rnd = new scala.util.Random(42)
    val s1 = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val h1 = graft.queries.DedupQueries.cdcChunkHashes(s1)
    assert(h1.length >= 10, s"expected many chunks, got ${h1.length}")
    // the CDC property: a prefix edit can only reshape chunks up to the
    // first boundary past the seam — everything after re-aligns exactly
    val h2 = graft.queries.DedupQueries.cdcChunkHashes("INSERTED-PREFIX-" + s1)
    assert(h2.endsWith(h1.drop(1)),
      "chunks after the first boundary must survive a prefix insertion")
    // fixed-size chunking fails this by construction — the contrast is
    // the whole reason CDC exists
    val f1 = s1.grouped(64).toSeq
    val f2 = ("INSERTED-PREFIX-" + s1).grouped(64).toSeq
    assert(!f2.endsWith(f1.drop(1)),
      "fixed-size chunking should not realign after an insertion")
    // boundary density 1/64 → expected chunk ~64 chars (loose band)
    val avg = s1.length.toDouble / h1.length
    assert(avg > 16 && avg < 256, s"avg chunk $avg chars, design point 64")
  }
}

/** Test-only brute-force cosine all-pairs (the naive nested-loop shape the
  * production block join must reproduce value-for-value). */
object SimilarityTestHelper {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import graft.queries.SimilarityQueries

  def bruteForcePairs(s: SparkSession, d: String, t: Double): DataFrame = {
    val e = SimilarityQueries.withNorm(Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v")))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim",
        SimilarityQueries.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") > t)
      .select(col("vec_a"), col("vec_b"),
        floor(col("sim") * 1000000).cast("long").as("sim_e6"))
      .orderBy("vec_a", "vec_b")
  }
}
