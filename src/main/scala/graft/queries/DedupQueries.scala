package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.SketchAggs

/** Deduplication operators over the `documents` table — the core
  * training-data-pipeline surface (builder brief; no reference counterpart,
  * SURVEY.md §2.4). Five dedup families:
  *
  *  - exact:           normalize -> hash -> groupBy (one shuffle)
  *  - n-gram Jaccard:  exact set-similarity self-join via a rare-shingle
  *                     inverted index (df-capped to bound bucket skew)
  *  - MinHash + LSH:   one-pass Aggregator signatures -> banded bucket join
  *                     -> exact verification of candidates
  *  - SimHash:         one-pass Aggregator 64-bit sketch + band buckets
  *  - embedding cosine: exact pair similarity (brute force at test SF; the
  *                     LSH/IVF scale path is graft.queries.SimilarityQueries)
  *
  * Scale notes (100 TB): every family shuffles once on doc/feature keys and
  * carries fixed-size sketches per doc (k longs, not k x features rows).
  * The df cap on the inverted index is the standard hub-shingle guard — a
  * shingle appearing in >dfCap docs generates O(dfCap^2) candidate pairs
  * max instead of O(corpus^2). Exact-verify joins are hash joins on pair
  * keys, AQE-skew-splittable.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Whitespace-normalized lowercased text (idempotent on the testdata,
    * but the normalization pass is part of the operator contract).
    * Shared with [[CurationQueries]]. */
  def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  def tokens(c: Column): Column = split(norm(c), " ")

  /** Distinct word 3-gram shingles; short docs fall back to the whole text
    * as a single shingle. A native codegen'd Catalyst expression
    * ([[graft.functions.Shingles]]) — one normalization pass and direct
    * string assembly inside the scan stage, replacing the interpreted
    * HOF chain (whose history also held the projection-collapse trap:
    * without a lambda-variable binding Catalyst re-inlined the split()
    * into every element access, ~30x). The expression is differentially
    * gated against the SQL pipeline in ShinglesSpec, so the unchanged
    * DuckDB oracles keep hash-matching. */
  def shingles(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Exprs
    Exprs.toColumn(graft.functions.Shingles(Exprs.toExpr(c), 3, distinct = true))
  }

  /** (doc_id, sh: array<string>) distinct shingle sets. */
  def shingleSets(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"), shingles(col("text")).as("sh"))

  /** Content-defined chunk keys of one normalized doc (dedup_cdc's
    * per-partition kernel): a boundary closes after 1-based position p
    * (p ≥ 8) wherever the Horner-31 hash of chars p−7..p ≡ 0 mod 64; the
    * end of the doc closes the last chunk. Chunk identity is FNV-1a 64
    * of the chunk chars ([[graft.functions.Fnv64.hashBytes]]) — the
    * oracle groups the raw chunk strings instead, same equivalence
    * classes. Char codes mirror the oracle's `unicode()` on this ASCII
    * corpus. Pure function, O(8·len), runs inside mapPartitions so text
    * never crosses a shuffle. */
  private[graft] def cdcChunkHashes(nt: String): Seq[Long] = {
    val n = nt.length
    if (n == 0) return Nil
    def fnvOf(from: Int, until: Int): Long =
      graft.functions.Fnv64.hashBytes(
        nt.substring(from, until).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    var i = 7 // 0-based window end == 1-based position i+1
    while (i < n) {
      var h = 0L
      var j = i - 7
      while (j <= i) { h = h * 31 + nt.charAt(j); j += 1 }
      if (h % 64 == 0) { out += fnvOf(start, i + 1); start = i + 1 }
      i += 1
    }
    if (start < n) out += fnvOf(start, n)
    out.toSeq
  }

  /** Exact-verified Jaccard >= 8/10 on candidate pairs. Integer cross-
    * multiplication (inter*10 >= union*8) keeps the threshold exact in
    * both engines; jac_e6 is floor(inter*1e6/union) — double division of
    * exact ints, deterministic. */
  private def verifyPairs(pairs: DataFrame, sets: DataFrame): DataFrame = {
    val sa = sets.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val sb = sets.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("un", size(col("sha")) + size(col("shb")) - col("inter"))
      .filter(col("inter") * 10 >= col("un") * 8)
      .select(col("doc_a"), col("doc_b"),
        floor(col("inter") * lit(1000000.0) / col("un")).as("jac_e6"))
      .orderBy("doc_a", "doc_b")
  }

  /** All-pairs cosine similarity as a BLOCK-PARTITIONED equi-join: rows
    * land in `blocks` id-blocks, a tiny local relation enumerates the
    * blocks*(blocks+1)/2 unordered block pairs, and two hash equi-joins
    * materialize every unordered id pair EXACTLY ONCE — a pair {x,y} in
    * blocks (p,q) with p<q appears only via key (p,q); diagonal blocks
    * dedupe on id order (property-tested across block counts incl. the
    * degenerate blocks=1 and blocks>n in PipelineSpec). Per-task memory
    * is 2·n/blocks vectors instead of the whole table a
    * BroadcastNestedLoopJoin would ship to every executor.
    * Returns (vec_a < vec_b, sim). */
  def blockPairSim(s: SparkSession, emb: DataFrame, blocks: Int): DataFrame = {
    import s.implicits._
    val e = SimilarityQueries.withNorm(emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v")))
      .withColumn("blk", pmod(col("vec_id"), lit(blocks)).cast("int"))
    val blockPairs = (for { a <- 0 until blocks; b <- a until blocks }
      yield (a, b)).toDF("ka", "kb") // LocalRelation — no join builds it
    val lhs = e.select(col("vec_id").as("ida"), col("v").as("va"),
      col("nrm").as("na"), col("blk").as("blka"))
    val rhs = e.select(col("vec_id").as("idb"), col("v").as("vb"),
      col("nrm").as("nb"), col("blk").as("blkb"))
    lhs.join(broadcast(blockPairs), col("blka") === col("ka"))
      .join(rhs, col("kb") === col("blkb"))
      .filter(col("ka") < col("kb") || col("ida") < col("idb"))
      .withColumn("sim",
        SimilarityQueries.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .select(least(col("ida"), col("idb")).as("vec_a"),
        greatest(col("ida"), col("idb")).as("vec_b"), col("sim"))
  }

  /** MinHash (k=128) + LSH (32 bands × 4 rows) near-dup pairs with exact
    * Jaccard verification — the shared pair engine behind dedup_minhash,
    * dedup_clusters and text_levenshtein. Aggregator-built signatures
    * (k longs per doc over the wire), banded bucket self-join for
    * candidates, exact verify.
    *
    * Memoized per (session, dir, source-version) and persisted: three
    * queries consume the pair set, and the signature/banding/verify
    * pipeline is the most expensive dedup stage — in a production
    * pipeline this IS the checkpointed pair table every downstream step
    * reads. The key carries the source parquet's (mtime, size), so a
    * regenerated corpus invalidates the memo. The memo is BOUNDED (LRU,
    * [[DfMemo]]): a long session over many corpus dirs caps its pinned
    * pair tables instead of accumulating them. The pair table is
    * materialized EAGERLY inside the build so the shingle-set scratch
    * cache can be released immediately — the memo never holds a live
    * reference to the build's intermediates. */
  def minhashDupPairs(s: SparkSession, d: String): DataFrame = {
    val src = java.nio.file.Paths.get(d, "documents.parquet")
    val stamp = s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}" +
      s"_${java.nio.file.Files.size(src)}"
    // evict superseded versions of this dir and dead sessions' entries
    pairsCache.keys
      .filter(k => (k._1 == s && k._2 == d && k._3 != stamp) ||
        k._1.sparkContext.isStopped)
      .foreach(pairsCache.invalidate)
    pairsCache.getOrElseUpdate((s, d, stamp)) {
      val sets = shingleSets(s, d).persist()
      try {
        val out = minhashDupPairsUncached(s, sets).persist()
        out.count() // materialize the memo so `sets` can be released now
        out
      } finally sets.unpersist(blocking = false)
    }
  }

  /** Audit/bench hook: drop all memoized pair tables so the next call
    * rebuilds (and re-plans) from scratch. */
  private[graft] def clearPairsCache(): Unit = pairsCache.clear()

  private val pairsCache =
    new DfMemo[(SparkSession, String, String)](cap = 4)

  /** The exact-Jaccard inverted-index pair engine behind
    * `dedup_ngram_jaccard`. `private[graft]` so TextScaleRehearsal can
    * drive it (hub guard and all) on a synthetic corpus — scale evidence
    * must exercise the shared production code, not a rehearsal-only copy.
    *
    * Shingle sets feed 5 subtrees (both self-join arms, sizes, and both
    * verify arms); pinned so tokenization runs once — the 100 TB
    * equivalent is checkpointing the shingle table to parquet once and
    * reusing it across the pipeline. Candidates come from *rare* shingles
    * only (df <= 50 — the hub guard: a boilerplate shingle shared by f
    * docs would otherwise contribute O(f²) candidate pairs); the
    * upper-bound prefilter accounts for the excluded hubs exactly, so
    * results stay exact. */
  private[graft] def jaccardDupPairsOf(s: SparkSession, sets0: DataFrame): DataFrame = {
    val sets = graft.Caches.pin(sets0)
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("sz"))
    // 64-bit hashed shingle ids for the index join/agg keys (fixed-width
    // keys shuffle and hash-join far faster than ~30 B strings); exact
    // verification below still compares true shingle sets.
    val ex = graft.Caches.pin(
      sets.select(col("doc_id"), explode(col("sh")).as("sng"))
        .select(col("doc_id"), xxhash64(col("sng")).as("sng")))
    val rare = ex.groupBy("sng").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50).select("sng")
    val posting = ex.join(rare, "sng")
    val rareSz = posting.groupBy("doc_id").agg(count(lit(1)).as("rare_sz"))
    val stats = sizes.join(rareSz, Seq("doc_id"), "left")
      .select(col("doc_id"), col("sz"),
        coalesce(col("rare_sz"), lit(0L)).as("rare_sz"))
    val pairCounts = posting.select(col("sng"), col("doc_id").as("doc_a"))
      .join(posting.select(col("sng"), col("doc_id").as("doc_b")), "sng")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter_rare"))
    val prefiltered = pairCounts
      .join(stats.select(col("doc_id").as("doc_a"), col("sz").as("sza"),
        (col("sz") - col("rare_sz")).as("huba")), "doc_a")
      .join(stats.select(col("doc_id").as("doc_b"), col("sz").as("szb"),
        (col("sz") - col("rare_sz")).as("hubb")), "doc_b")
      .withColumn("ub_inter", col("inter_rare") + least(col("huba"), col("hubb")))
      .filter(col("ub_inter") * 10 >= (col("sza") + col("szb") - col("ub_inter")) * 8)
      .select("doc_a", "doc_b")
    verifyPairs(prefiltered, sets)
  }

  /** Directed containment pairs: (a, b) with |A∩B| >= 0.9·|A|, a ≠ b —
    * the doc-in-doc / near-superset detector Jaccard structurally misses
    * when |B| >> |A| (J = |A∩B|/|A∪B| → 0 while containment → 1). Same
    * rare-shingle inverted index and exact hub bound as
    * [[jaccardDupPairsOf]], but candidates keep BOTH directions and the
    * upper bound is measured against |A| alone:
    * inter <= inter_rare + min(hub_a, hub_b), so any pair with
    * ub·10 < |A|·9 is exactly unreachable. Survivors get the exact
    * array_intersect verify. */
  private[graft] def containmentPairsOf(s: SparkSession, sets0: DataFrame): DataFrame = {
    val sets = graft.Caches.pin(sets0)
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("sz"))
    val ex = graft.Caches.pin(
      sets.select(col("doc_id"), explode(col("sh")).as("sng"))
        .select(col("doc_id"), xxhash64(col("sng")).as("sng")))
    val rare = ex.groupBy("sng").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50).select("sng")
    val posting = ex.join(rare, "sng")
    val rareSz = posting.groupBy("doc_id").agg(count(lit(1)).as("rare_sz"))
    val stats = sizes.join(rareSz, Seq("doc_id"), "left")
      .select(col("doc_id"), col("sz"),
        coalesce(col("rare_sz"), lit(0L)).as("rare_sz"))
    val pairCounts = posting.select(col("sng"), col("doc_id").as("doc_a"))
      .join(posting.select(col("sng"), col("doc_id").as("doc_b")), "sng")
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter_rare"))
    val prefiltered = pairCounts
      .join(stats.select(col("doc_id").as("doc_a"), col("sz").as("sza"),
        (col("sz") - col("rare_sz")).as("huba")), "doc_a")
      .join(stats.select(col("doc_id").as("doc_b"),
        (col("sz") - col("rare_sz")).as("hubb")), "doc_b")
      .withColumn("ub_inter", col("inter_rare") + least(col("huba"), col("hubb")))
      .filter(col("ub_inter") * 10 >= col("sza") * 9)
      .select("doc_a", "doc_b")
    val sa = sets.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val sb = sets.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    prefiltered.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .filter(col("inter") * 10 >= size(col("sha")) * 9)
      .select(col("doc_a"), col("doc_b"),
        floor(col("inter") * lit(1000000.0) / size(col("sha"))).as("cont_e6"))
      .orderBy("doc_a", "doc_b")
  }

  /** `private[graft]` so TextScaleRehearsal can drive the REAL signature/
    * banding/verify pipeline on a synthetic corpus — scale evidence must
    * exercise the shared production code, not a rehearsal-only copy. */
  private[graft] def minhashDupPairsUncached(s: SparkSession, sets: DataFrame): DataFrame = {
    import s.implicits._
    val k = 128; val bands = 32; val rows = 4
    val feats = sets.select(col("doc_id"), explode(col("sh")).as("sng"))
      .select(col("doc_id"), xxhash64(col("sng")).as("h"))
      .as[(Long, Long)]
    val sigAgg = new SketchAggs.MinHashSig(k).toColumn
    val sigs = feats.groupByKey(_._1).agg(sigAgg).toDF("doc_id", "sig")
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rows + 1, lit(rows)))))
      .select(col("doc_id"), col("pos").as("band"), hash(col("col")).as("bh"))
    val cand = banded.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
      .join(banded.select(col("band"), col("bh"), col("doc_id").as("doc_b")),
        Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    verifyPairs(cand, sets)
  }

  val queries: Map[String, Q] = Map(
    // -- exact dedup: one hash shuffle on the normalized-text digest. At
    //    100 TB group on the md5 (fixed 32 bytes), never the raw text.
    "dedup_exact" -> ((s, d) => {
      documents(s, d)
        .groupBy(md5(norm(col("text"))).as("text_md5"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .orderBy("canonical_id")
    }),

    // -- BLOOM-GUARDED ingest dedup (the membership check a streaming
    //    ingest runs against its HISTORY before admitting a batch: at
    //    100 TB the history's exact key set is unjoinable per batch, but
    //    its Bloom bitset is a few MB broadcast). History = the first
    //    half of the corpus (doc_id < 250 — the documents table is 500
    //    rows at every SF); the key is a PREFIX fingerprint (md5 of the
    //    first 8 normalized tokens — the boilerplate-opening signal).
    //    The batch side filters through the broadcast bitset IN THE SCAN
    //    STAGE, then the surviving candidates verify exactly against the
    //    history signatures — no false negatives by Bloom's contract and
    //    the verify join removes false positives, so the output provably
    //    equals the plain exact join, which IS the oracle (the
    //    join_bloom_prefilter argument). Scale shape: history scanned
    //    once into a 2 KB agg state; the batch never shuffles until the
    //    candidate sliver.
    "dedup_bloom" -> ((s, d) => {
      import s.implicits._
      def sig: Column = md5(array_join(slice(tokens(col("text")), 1, 8), " "))
      val hist = documents(s, d).filter(col("doc_id") < 250)
        .select(col("doc_id"), sig.as("sig"))
      val (bh1, bh2) = ScaleOps.h12(col("sig"))
      val bits = hist.select(bh1.as("h1"), bh2.as("h2")).as[(Long, Long)]
        .select(new SketchAggs.BloomBits(
          ScaleOps.BLOOM_BITS, ScaleOps.BLOOM_K).toColumn).head()
      documents(s, d).filter(col("doc_id") >= 250)
        .select(col("doc_id"), sig.as("sig"))
        .filter(ScaleOps.bloomContains(col("sig"), bits))
        .join(hist.groupBy("sig").agg(count(lit(1)).as("n_hist"),
          min(col("doc_id")).as("first_doc")), Seq("sig"))
        .select(col("doc_id"), col("sig"), col("n_hist"), col("first_doc"))
        .orderBy("doc_id")
    }),

    // -- URL canonicalization dedup (the first dedup a WEB CRAWL runs —
    //    the reference's own domain: the same page arrives as
    //    http://host/p, HTTP://WWW.HOST:80/p#frag, host/p/?utm_…, and a
    //    crawler must collapse them BEFORE any content comparison).
    //    Rules, applied in order: strip the #fragment; strip utm_*
    //    tracking params (re-promoting the first survivor to '?');
    //    lowercase scheme://authority; drop the default :80 port and the
    //    www. prefix; drop the trailing slash. The URL variants are
    //    synthesized deterministically from doc_id (test plumbing, like
    //    the multimodal stubs — 3 casing/port/param variants per target
    //    page); the OPERATOR is the canonicalize→group pipeline, which
    //    at 100 TB is one stateless codegen'd projection (five regex
    //    rewrites in the scan stage) + one hash-partitioned groupBy on
    //    the canonical key — no text ever moves, exactly dedup_exact's
    //    shape with the canonicalizer in front.
    "dedup_url" -> ((s, d) => {
      val tgt = expr("doc_id div 3")
      val hk = concat(lit("src"), (tgt % 20).cast("string"))
      val idp = (tgt % 7).cast("string")
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("http://"), hk, lit(".example.com/d/"),
            tgt.cast("string"), lit("?id="), idp))
        .when(col("doc_id") % 3 === 1,
          concat(lit("HTTP://WWW."), upper(hk), lit(".EXAMPLE.COM:80/d/"),
            tgt.cast("string"), lit("?utm_campaign=x&id="), idp, lit("#top")))
        .otherwise(
          concat(lit("http://"), hk, lit(".example.com:80/d/"),
            tgt.cast("string"), lit("/?id="), idp, lit("&utm_source=y")))
      val noFrag = regexp_replace(url, "#.*$", "")
      val noUtm = regexp_replace(noFrag, "[?&]utm_[a-z]+=[^&]*", "")
      val fixedQ = regexp_replace(noUtm, "^([^?]*)&", "$1?")
      val head = regexp_replace(
        regexp_replace(lower(col("_hd")), "://www\\.", "://"), ":80$", "")
      val rest = regexp_replace(
        regexp_replace(expr("substring(_fq, length(_hd) + 1)"),
          "/\\?", "?"), "/$", "")
      documents(s, d)
        .select(col("doc_id"), fixedQ.as("_fq"))
        .withColumn("_hd", regexp_extract(col("_fq"), "^([a-zA-Z]+://[^/?#]+)", 1))
        .select(col("doc_id"), concat(head, rest).as("curl"))
        .groupBy("curl")
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("canonical_doc"))
        .orderBy("curl")
    }),

    // -- exact n-gram Jaccard via rare-shingle inverted index: candidates
    //    share >= 1 shingle with df <= 50. The posting self-join COUNTS
    //    shared rare shingles per pair (one hash agg — never an
    //    array_intersect per candidate), then an upper-bound filter drops
    //    every pair that cannot reach the threshold even if all its
    //    hub (df>cap) shingles were shared:
    //      inter <= inter_rare + min(hub_a, hub_b)
    //      union >= |A| + |B| - that bound
    //    Only survivors get the exact array_intersect verification, so the
    //    expensive step runs on ~|result| pairs, not |candidates|
    //    (measured 57s -> ~4s at sf0.1 with ~1.1M candidates). The bound
    //    is semantically invisible — results are exact, oracle unchanged.
    "dedup_ngram_jaccard" -> ((s, d) =>
      jaccardDupPairsOf(s, shingleSets(s, d))),

    // -- containment dedup (the doc-in-doc / near-superset detector used
    //    to strip quoted or embedded duplicates): directed pairs where
    //    >= 90% of A's shingles appear in B. Jaccard structurally misses
    //    these when |B| >> |A|; the same rare-shingle inverted index
    //    surfaces them with the hub-exact bound re-based on |A| alone.
    //    At 100 TB the df cap keeps the posting self-join linear in
    //    corpus size, exactly as in dedup_ngram_jaccard.
    "dedup_containment" -> ((s, d) =>
      containmentPairsOf(s, shingleSets(s, d))),

    // -- MinHash (k=128) + LSH (32 bands x 4 rows): Aggregator signatures,
    //    banded bucket join for candidates, exact verification. At
    //    Jaccard 0.8 the candidate probability is 1-(1-0.8^4)^32 ≈ 1, so
    //    the verified output EQUALS the exact dedup_ngram_jaccard result
    //    (subset by construction; full recall asserted in PipelineSpec) —
    //    which is why this hash-dependent operator still carries the
    //    exact-jaccard oracle SQL below: the gate hash-checks the whole
    //    sketch->band->verify path against the exact answer.
    "dedup_minhash" -> ((s, d) => minhashDupPairs(s, d)),

    // -- incremental dedup: the DAILY-INGEST shape — a new batch (odd
    //    doc_ids stand in for today's crawl) is deduped AGAINST the
    //    historical index (even ids), never against itself. Band
    //    signatures are computed per side and candidates come from the
    //    NEW ⋈ INDEX band join — in production the index band table is
    //    precomputed and stored, so a day's ingest touches only its own
    //    signatures plus matching index buckets, never rescanning
    //    history. Exact Jaccard verifies survivors; each new doc
    //    surfaces its duplicate count, first index match and best score.
    //    Same recall argument as dedup_minhash (J >= 0.8 ⇒ band-collision
    //    prob ≈ 1), which is why the exact all-cross-pairs oracle
    //    hash-gates the whole sketch→band→verify→rollup path.
    "dedup_incremental" -> ((s, d) => {
      import s.implicits._
      val k = 128; val bands = 32; val rows = 4
      val sets = graft.Caches.pin(shingleSets(s, d))
      val feats = sets.select(col("doc_id"), explode(col("sh")).as("sng"))
        .select(col("doc_id"), xxhash64(col("sng")).as("h"))
        .as[(Long, Long)]
      val sigAgg = new SketchAggs.MinHashSig(k).toColumn
      val sigs = feats.groupByKey(_._1).agg(sigAgg).toDF("doc_id", "sig")
      val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => slice(col("sig"), b * rows + 1, lit(rows)))))
        .select(col("doc_id"), col("pos").as("band"), hash(col("col")).as("bh"))
      val idx = banded.filter(col("doc_id") % 2 === 0)
        .select(col("band"), col("bh"), col("doc_id").as("doc_b"))
      val neu = banded.filter(col("doc_id") % 2 === 1)
        .select(col("band"), col("bh"), col("doc_id").as("doc_a"))
      val cand = neu.join(idx, Seq("band", "bh"))
        .select("doc_a", "doc_b").distinct()
      val matches = verifyPairs(cand, sets) // doc_a = new, doc_b = index
      sets.filter(col("doc_id") % 2 === 1).select(col("doc_id"))
        .join(matches.select(col("doc_a").as("doc_id"), col("doc_b"),
          col("jac_e6")), Seq("doc_id"), "left")
        .groupBy("doc_id")
        .agg(count(col("doc_b")).as("n_dups"),
          min(col("doc_b")).as("first_dup"),
          max(col("jac_e6")).as("best_jac_e6"))
        .withColumn("is_dup", (col("n_dups") > 0).cast("long"))
        .select("doc_id", "is_dup", "n_dups", "first_dup", "best_jac_e6")
        .orderBy("doc_id")
    }),

    // -- duplicate-cluster canonicalization: the step after pair
    //    generation in every production dedup pipeline. Near-dup pairs
    //    (the LSH+verify engine above) form an undirected graph; GraphX
    //    connected components (min-label Pregel propagation) collapse
    //    chains a pairwise keep-rule would mishandle (A~B, B~C, A≁C must
    //    still land in ONE cluster); canonical = min doc_id per
    //    component, keep = 1 iff the doc is its own canonical. At 100 TB:
    //    pair count << corpus size, components are tiny, and CC converges
    //    in O(cluster diameter) join-shuffles. The oracle replays the
    //    exact-Jaccard pairs and closes them transitively with a
    //    recursive CTE — so the whole sketch→band→verify→cluster path is
    //    value-gated.
    "dedup_clusters" -> ((s, d) => {
      import org.apache.spark.graphx._
      import s.implicits._
      val pairs = minhashDupPairs(s, d).select(col("doc_a"), col("doc_b"))
      // materialize the (persisted) pair table BEFORE coalescing: a
      // no-shuffle coalesce over the cold lineage would serialize the
      // whole LSH+verify stage into the merged tasks; afterwards it only
      // merges cached blocks. Partition count scales with the pair count
      // (tiny pair graphs run single-task supersteps, big ones spread).
      val nPairs = pairs.count()
      val parts = math.max(1, math.min(s.sparkContext.defaultParallelism,
        (nPairs / 10000L).toInt))
      val edgeRdd = pairs.rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
        .coalesce(parts)
      val g = Graph.fromEdges(edgeRdd, ())
      val ccG = g.connectedComponents()
      // GraphX caches both the input graph and the CC result; release them
      // with the query's pins once the result has been consumed
      graft.Caches.defer(s) {
        ccG.unpersistVertices(blocking = false)
        ccG.edges.unpersist(blocking = false)
        g.unpersistVertices(blocking = false)
        g.edges.unpersist(blocking = false)
      }
      val cc = ccG.vertices.map { case (id, comp) => (id, comp) }
        .toDF("doc_id", "comp")
      documents(s, d).select(col("doc_id"))
        .join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("canonical_id"))
        .withColumn("keep",
          (col("doc_id") === col("canonical_id")).cast("int"))
        .orderBy("doc_id")
    }),

    // -- edit-distance verification of the near-dup candidates: exact
    //    Levenshtein over the normalized texts of each verified pair,
    //    surfaced with a length-normalized similarity. The expensive
    //    O(len²) distance runs ONLY on the LSH-surfaced pairs (never
    //    all-pairs) — the standard cheap-sketch → costly-verify ladder;
    //    both engines implement the same unit-cost edit distance, so the
    //    values gate exactly.
    "text_levenshtein" -> ((s, d) => {
      val pairs = minhashDupPairs(s, d).select(col("doc_a"), col("doc_b"))
      val docs = documents(s, d).select(col("doc_id"), norm(col("text")).as("nt"))
      pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("nt").as("ta")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("nt").as("tb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("ta"), col("tb")).cast("long").as("lev"),
          (length(col("ta")) + length(col("tb"))).cast("long").as("len_sum"))
        .withColumn("lev_sim_e4",
          floor((lit(1.0) - col("lev") * lit(2.0) / col("len_sum")) * 10000)
            .cast("long"))
        .orderBy("doc_a", "doc_b")
    }),

    // -- cross-document passage dedup (the CCNet/RefinedWeb line-dedup
    //    shape; this corpus has no newlines, so passages are consecutive
    //    8-word chunks): chunk every doc, count distinct docs per chunk
    //    corpus-wide (one hash shuffle on the chunk — at 100 TB group on
    //    a chunk hash, the text never needs to cross the exchange), and
    //    report each doc's share of chunks that appear in other docs.
    //    Planted exact-duplicate docs light up with dup_pct = 100.
    "dedup_passages" -> ((s, d) => {
      val C = 8
      val docs = documents(s, d).select(col("doc_id"),
        tokens(col("text")).as("w"))
      val chunks = docs.select(col("doc_id"),
        explode(transform(
          sequence(lit(0), floor((size(col("w")) + C - 1) / C).cast("int") - 1),
          i => xxhash64(array_join(slice(col("w"), i * C + 1, lit(C)), " "))))
          .as("chunk"))
      graft.Caches.pin(chunks)
      val df = chunks.groupBy("chunk")
        .agg(countDistinct(col("doc_id")).as("ndocs"))
      chunks.join(df, "chunk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("ndocs") > 1, 1).otherwise(0)).as("dup_chunks"))
        .withColumn("dup_pct",
          floor(col("dup_chunks") * lit(100.0) / col("n_chunks")).cast("long"))
        .orderBy("doc_id")
    }),

    // -- EXACT SUBSTRING dedup spans (the Lee et al. 2022 "Deduplicating
    //    Training Data" operation, at character granularity): every
    //    40-char window of every doc is hashed at STRIDE 1 (stride 1 on
    //    the window walk is what makes the detection exact — any
    //    cross-doc verbatim substring of ≥ 40 chars contains an aligned
    //    window on both sides regardless of its offsets); windows whose
    //    hash appears in ≥ 2 DISTINCT docs are duplicated; per doc, the
    //    overlapping hits coalesce into MAXIMAL duplicated spans via the
    //    same cumulative-max island sweep as interval_coalesce — the
    //    spans a cleaning pass would cut out. Scale shape: the window
    //    walk is ONE O(n) rolling-hash pass per doc
    //    ([[graft.functions.WindowHashes]] — native expression, O(1)
    //    per position, one long array per doc, ~8 B/char transiently;
    //    the previous xxhash64(substr) transform cost O(n·W) hashing
    //    plus a W-char allocation per position and was the 2x bench
    //    regression the r8→r9 Bloom rewrite priced in — with the roll,
    //    the two-pass design now beats the old one-pass-cached version
    //    outright: 8.4 s → 3.3 s at sf0.1, vs 4.4 s for r8's
    //    corpus-pinning shape). The duplicate test is one
    //    partial-aggregated groupBy on the 64-bit window hash, the hit
    //    join is hash-partitioned on the same key, and the island sweep
    //    is one doc_id-partitioned sorted pass. A corpus with unbounded
    //    documents splits them into (W−1)-overlapped segments first
    //    (span starts stay exact under that split because any 40-char
    //    window lives wholly inside one segment). MEMORY BOUND (the r8
    //    verdict's item 3): nothing corpus-sized is ever pinned — the
    //    window walk runs TWICE in the scan stage (pass 1 feeds the
    //    dup-hash aggregate, pass 2 the hit join) instead of caching
    //    one (start,hash) struct per corpus CHARACTER (~2x corpus size
    //    of cache pressure at 100 TB). What IS pinned/broadcast is
    //    bounded by the DUP-HASH count, not the corpus: the distinct
    //    duplicated hashes (pinned — consumed by both the Bloom build
    //    and the exact-verify join) and their Bloom bitset (~10
    //    bits/key, capped at 8 MB like Spark's own runtime filter),
    //    which prunes pass 2 IN THE SCAN STAGE so only actual-duplicate
    //    windows (plus Bloom false positives, which the exact join
    //    removes) ever reach a shuffle. Recompute-vs-cache is the right
    //    trade at scale: the walk is native CPU over data the scan
    //    already read, cache was RAM.
    "dedup_substring_spans" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.graftbridge.Exprs
      import graft.functions.WindowHashes
      val W = 40
      val base = documents(s, d).filter(length(col("text")) >= W)
      // both passes hash every window via the O(n) rolling-hash native
      // expression ([[graft.functions.WindowHashes]]) — the previous
      // xxhash64(substr) transform cost O(n·W) hashing plus one W-char
      // allocation per position, and was the whole 2x bench regression
      // the Bloom rewrite priced in; the oracle groups raw SUBSTRINGS,
      // so the engine hash family is free (hash-equality classes still
      // mean window equality, same birthday-odds contract)
      def winHashes = Exprs.toColumn(
        WindowHashes(Exprs.toExpr(col("text")), W))
      val occH = base.select(col("doc_id"), explode(winHashes).as("h"))
      def occ = base.select(col("doc_id"),
          posexplode(winHashes).as(Seq("pos", "h")))
        .select(col("doc_id"), (col("pos") + 1).cast("int").as("start"),
          col("h"))
      val dupHashes = graft.Caches.pin(occH.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("h")))
      // Bloom sized to the measured dup-hash count (~10 bits/key for
      // ~1% FP), clamped to [2 KB, 8 MB]; the count is a bounded driver
      // scalar off the pinned frame
      val nDup = dupHashes.count()
      val mBits = math.min(1L << 26,
        math.max(1L << 14, java.lang.Long.highestOneBit(
          math.max(1L, 10L * nDup)) * 2)).toInt
      val (bh1, bh2) = ScaleOps.h12(col("h"))
      val bits = dupHashes.select(bh1.as("h1"), bh2.as("h2")).as[(Long, Long)]
        .select(new SketchAggs.BloomBits(mBits, ScaleOps.BLOOM_K).toColumn)
        .head()
      val hit = occ.filter(ScaleOps.bloomContains(col("h"), bits))
        .join(dupHashes, "h").select(col("doc_id"), col("start"))
      val ord = Window.partitionBy(col("doc_id")).orderBy(col("start"))
      val isl = hit
        .withColumn("pmax", max(col("start") + lit(W - 1))
          .over(ord.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_isl",
          when(col("pmax").isNull || col("start") > col("pmax") + 1, 1L)
            .otherwise(0L))
        .withColumn("isl", sum(col("new_isl"))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      isl.groupBy(col("doc_id"), col("isl"))
        .agg(min(col("start")).as("s0"), max(col("start")).as("s1"),
          count(lit(1)).as("n_windows"))
        .select(col("doc_id"), col("s0").cast("long").as("span_start"),
          (col("s1") + lit(W - 1)).cast("long").as("span_end"),
          (col("s1") + lit(W - 1) - col("s0") + 1).cast("long").as("span_len"),
          col("n_windows"))
        .orderBy("doc_id", "span_start")
    }),

    // -- CONTENT-DEFINED chunking (the rsync/LBFS/FastCDC family, the
    //    byte-level sibling of dedup_passages' fixed word chunks): a chunk
    //    boundary falls wherever the 8-char rolling polynomial hash
    //    (Horner base 31 over char codes) ≡ 0 mod 64 — boundaries are a
    //    PURE function of local content, so an insertion only reshapes
    //    the chunks it touches and every downstream chunk re-aligns
    //    (the property fixed-size chunking fundamentally lacks, and the
    //    reason storage dedup and crawl-delta pipelines use CDC). Expected
    //    chunk ≈ 64 chars. Chunking runs as a per-partition batch pass in
    //    the scan stage ([[cdcChunkHashes]] — the Multimodal pattern:
    //    text never crosses a shuffle, one fnv64 chunk key per chunk
    //    does). The oracle replays the boundary rule exactly and groups
    //    raw chunk STRINGS — same equivalence classes, no engine hash to
    //    reproduce (dedup_passages' trick). NOT expressed as nested array
    //    lambdas: chained transform/filter/aggregate multiply the
    //    expression tree through project collapse until analysis hangs.
    "dedup_cdc" -> ((s, d) => {
      import s.implicits._
      val docs = documents(s, d).select(col("doc_id").cast("long"),
        regexp_replace(lower(trim(col("text"))), "\\s+", " "))
        .as[(Long, String)]
      val chunks = graft.Caches.pin(docs.mapPartitions(_.flatMap {
        case (id, nt) => cdcChunkHashes(nt).map(h => (id, h))
      }).toDF("doc_id", "chunk"))
      val df = chunks.groupBy("chunk")
        .agg(countDistinct(col("doc_id")).as("ndocs"))
      chunks.join(df, "chunk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("ndocs") > 1, 1).otherwise(0)).as("dup_chunks"))
        .withColumn("dup_pct",
          floor(col("dup_chunks") * lit(100.0) / col("n_chunks")).cast("long"))
        .orderBy("doc_id")
    }),

    // -- SimHash sketch index: one 64-bit sketch per doc + 8x8-bit band
    //    buckets (pair extraction from the buckets is exercised on
    //    controlled near-dups in PipelineSpec; on arbitrary corpora the
    //    band guarantee covers Hamming distance <= 7). Features are
    //    fnv64-hashed tokens — the engine's own codegen'd fingerprint
    //    primitive, which DuckDB reproduces in SQL, so this sketch is
    //    value-gated end-to-end (not rows-only).
    "dedup_simhash" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.graftbridge.Exprs
      import graft.functions.Fnv64
      val feats = documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .select(col("doc_id"),
          Exprs.toColumn(Fnv64(Exprs.toExpr(col("tok")))).as("h"))
        .as[(Long, Long)]
      val simAgg = new SketchAggs.SimHash64().toColumn
      feats.groupByKey(_._1).agg(simAgg).toDF("doc_id", "simhash")
        .select(col("doc_id"), format_string("%016x", col("simhash")).as("simhash_hex"),
          posexplode(expr("transform(sequence(0, 7), b -> (simhash >> (b * 8)) & 255)")))
        .select(col("doc_id"), col("simhash_hex"),
          col("pos").as("band"), col("col").as("bucket"))
        .orderBy("doc_id", "band")
    }),

    // -- embedding-cosine pair similarity, exact, at a LOW threshold (0.4).
    //    On this corpus the embeddings are near-isotropic (measured at
    //    sf0.01: within-label median sim ~0, max pair sim 0.51, and 92% of
    //    qualifying pairs are cross-label), so NO candidate pruning —
    //    probabilistic LSH or lossless centroid/triangle bounds — can cut
    //    the pair space at t=0.4 without losing pairs: the exact answer is
    //    inherently Θ(n²) work. What CAN be fixed is the execution shape:
    //    the naive plan is a BroadcastNestedLoopJoin (broadcasts the whole
    //    table to every executor — OOM at scale). Instead: a block-
    //    partitioned equi-join. Vectors land in B id-blocks; a tiny local
    //    relation enumerates the B(B+1)/2 unordered block pairs; two hash
    //    equi-joins materialize exactly the candidate pairs with bounded
    //    per-task memory (2·n/B vectors) and shuffle-level parallelism.
    //    At 100 TB, B scales as n/rowsPerBlock — task memory stays flat
    //    and the n² dot products spread evenly over the cluster. For
    //    genuine near-dup thresholds where pruning IS sound, see
    //    dedup_embed_lsh below.
    "dedup_embed" -> ((s, d) =>
      // ~n/64 rows per block at this SF; blocks = n/rowsPerBlock at scale
      blockPairSim(s, embeddings(s, d), blocks = 8)
        .filter(col("sim") > 0.4)
        .select(col("vec_a"), col("vec_b"),
          floor(col("sim") * 1000000).cast("long").as("sim_e6"))
        .orderBy("vec_a", "vec_b")),

    // -- embedding near-dup dedup at a TRUE near-dup threshold (0.95),
    //    where LSH pruning is sound: banded SRP candidate generation +
    //    exact cosine verification. The corpus is the base table plus a
    //    deterministic near-dup twin of every vector (vec_id+100000,
    //    each dim scaled by 1 + 0.005·(((vec_id+i) mod 5) - 2) — pure
    //    double arithmetic DuckDB reproduces bit-for-bit), so the oracle
    //    computes the exact all-pairs answer and the hash-match PROVES the
    //    LSH path's recall: planted twins sit at sim ≈ 0.99998 (per-plane
    //    disagreement θ/π ≈ 0.002; the 8-band × 8-bit miss probability is
    //    (1-(1-0.002)^8)^8 ≈ 4e-15), while the isotropic bulk (max sim
    //    0.51) spreads across 256 buckets per band. At 100 TB this is one
    //    narrow per-row signature pass, a self-join on (band, bucket)
    //    keys touching ~n·bands·avg-bucket-size candidate rows, and exact
    //    verification of survivors — never Θ(n²).
    "dedup_embed_lsh" -> ((s, d) =>
      embedLshVerifiedPairs(s, d)
        .select(col("vec_a"), col("vec_b"), col("sim_e6"))
        .orderBy("vec_a", "vec_b")),

    // -- SEMANTIC dedup end-to-end (the embedding-cluster canonicalization
    //    every modern curation pipeline runs after its ANN pass): the
    //    LSH-surfaced + exactly-verified near-dup pairs close transitively
    //    into clusters (GraphX connectedComponents — the same match-graph
    //    machinery as dedup_clusters, here over COSINE pairs instead of
    //    Jaccard pairs), and every corpus vector gets its canonical
    //    representative (min vec_id in its cluster) plus a keep flag.
    //    The oracle recomputes the exact all-pairs ≥ 0.95 relation and
    //    closes it with a recursive CTE, so the whole
    //    signature→band→verify→cluster→canonicalize chain is value-gated.
    //    Scale shape: pairs come from the banded self-join (never Θ(n²)),
    //    CC supersteps shuffle only the pair graph (≪ corpus), and the
    //    final left join is canonical-table–sized.
    "dedup_semantic" -> ((s, d) => {
      import org.apache.spark.graphx._
      import s.implicits._
      val pairs = embedLshVerifiedPairs(s, d).select(col("vec_a"), col("vec_b"))
      val nPairs = pairs.count()
      val parts = math.max(1, math.min(s.sparkContext.defaultParallelism,
        (nPairs / 10000L).toInt))
      val edgeRdd = pairs.rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
        .coalesce(parts)
      val g = Graph.fromEdges(edgeRdd, ())
      val ccG = g.connectedComponents()
      graft.Caches.defer(s) {
        ccG.unpersistVertices(blocking = false)
        ccG.edges.unpersist(blocking = false)
        g.unpersistVertices(blocking = false)
        g.edges.unpersist(blocking = false)
      }
      val cc = ccG.vertices.map { case (id, comp) => (id, comp) }
        .toDF("vec_id", "comp")
      val ids = embeddings(s, d).select(col("vec_id").cast("long"))
      ids.unionByName(ids.select((col("vec_id") + 100000).as("vec_id")))
        .join(cc, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("comp"), col("vec_id")).as("canonical_id"))
        .withColumn("keep",
          (col("vec_id") === col("canonical_id")).cast("int"))
        .orderBy("vec_id")
    }))

  /** The shared LSH-candidate + exact-verify pair pipeline behind
    * dedup_embed_lsh and dedup_semantic: base corpus ∪ deterministic
    * planted twins, banded SRP signatures, candidate self-join on
    * (band, bucket), exact cosine verification at > 0.95. Returns
    * (vec_a, vec_b, sim_e6) with vec_a < vec_b, unordered. */
  private[graft] def embedLshVerifiedPairs(s: SparkSession, d: String): DataFrame = {
    val base = embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val planted = base.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("v"), (x, i) =>
        x * (lit(1.0) + lit(0.005) *
          (pmod(col("vec_id") + i, lit(5)) - lit(2)).cast("double"))).as("v"))
    // the corpus subtree feeds four consumers (both self-join arms and
    // both verify arms); persist so the union + norms + 64 SRP dot
    // products run once — at 100 TB this is the checkpointed signature
    // table every LSH dedup pipeline materializes anyway
    val corpus = graft.Caches.pin(
      SimilarityQueries.withNorm(base.unionByName(planted))
        .withColumn("bands", SimilarityQueries.srpBands(col("v"), 8, 8)))
    val sig = corpus.select(col("vec_id"), posexplode(col("bands")))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("bkt"))
    val cand = sig.select(col("band"), col("bkt"), col("vec_id").as("ida"))
      .join(sig.select(col("band"), col("bkt"), col("vec_id").as("idb")),
        Seq("band", "bkt"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    val va = corpus.select(col("vec_id").as("ida"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = corpus.select(col("vec_id").as("idb"), col("v").as("vb"),
      col("nrm").as("nb"))
    cand.join(va, "ida").join(vb, "idb")
      .withColumn("sim",
        SimilarityQueries.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") > 0.95)
      .select(col("ida").as("vec_a"), col("idb").as("vec_b"),
        floor(col("sim") * 1000000).cast("long").as("sim_e6"))
  }

  /** Shared CTE chain producing the exact-verified Jaccard pairs in `v`
    * (filter: inter*10 >= un*8) — the oracle core for dedup_ngram_jaccard,
    * dedup_minhash, and dedup_clusters. */
  private val shingleIndexCtes: String =
    """w AS (SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
       FROM documents),
     sh AS (SELECT doc_id,
         CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
                range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE [nt] END AS sh
       FROM w),
     ex AS (SELECT doc_id, unnest(sh) AS sng FROM sh),
     rare AS (SELECT sng FROM ex GROUP BY sng HAVING COUNT(*) <= 50)"""

  private val jaccardCtes: String =
    s"""$shingleIndexCtes,
     cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM ex a JOIN rare r ON a.sng = r.sng JOIN ex b ON b.sng = a.sng
       WHERE a.doc_id < b.doc_id),
     v AS (SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS un
       FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
                   JOIN sh sb ON sb.doc_id = c.doc_b)"""

  /** Directed containment >= 9/10 of |A| — oracle for dedup_containment.
    * Candidate definition matches the Spark side exactly: pairs sharing
    * >= 1 RARE (df <= 50) shingle. Both engines share the same deliberate
    * recall cut (a pair whose entire intersection is hub shingles is
    * never a candidate — the df cap is what keeps the index linear), and
    * within candidates the Spark ub prefilter is exact, so the two
    * results are identical by construction. */
  private val containmentOracle: String =
    s"""WITH $shingleIndexCtes,
     cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM ex a JOIN rare r ON a.sng = r.sng JOIN ex b ON b.sng = a.sng
       WHERE a.doc_id <> b.doc_id),
     v AS (SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(sa.sh) AS sza
       FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
                   JOIN sh sb ON sb.doc_id = c.doc_b)
     SELECT doc_a, doc_b,
       CAST(FLOOR(inter * 1000000.0 / sza) AS BIGINT) AS cont_e6
     FROM v WHERE inter * 10 >= sza * 9
     ORDER BY doc_a, doc_b"""

  /** dedup_minhash's banding (32x4 at J>=0.8 → candidate prob ≈ 1 minus
    * (1-0.8^4)^32 ≈ 5e-8 worst case) plus exact verification makes its
    * output equal the exact jaccard join's, so it shares that oracle. */
  private val jaccardOracle: String =
    s"""WITH $jaccardCtes
     SELECT doc_a, doc_b,
       CAST(FLOOR(inter * 1000000.0 / un) AS BIGINT) AS jac_e6
     FROM v WHERE inter * 10 >= un * 8
     ORDER BY doc_a, doc_b"""

  /** dedup_clusters: the verified pairs closed transitively (min-label
    * reachability via a recursive CTE), canonical = min id in component. */
  private val clustersOracle: String =
    s"""WITH RECURSIVE $jaccardCtes,
     p AS (SELECT doc_a, doc_b FROM v WHERE inter * 10 >= un * 8),
     und AS (SELECT doc_a AS a, doc_b AS b FROM p
             UNION ALL SELECT doc_b, doc_a FROM p),
     reach AS (
       SELECT a AS id, b AS r FROM und
       UNION
       SELECT reach.id, und.b FROM reach JOIN und ON und.a = reach.r
     ),
     comp AS (SELECT id, MIN(r) AS mn FROM reach GROUP BY id)
     SELECT d.doc_id,
       COALESCE(LEAST(c.mn, d.doc_id), d.doc_id) AS canonical_id,
       CASE WHEN COALESCE(LEAST(c.mn, d.doc_id), d.doc_id) = d.doc_id
            THEN 1 ELSE 0 END AS keep
     FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
     ORDER BY d.doc_id"""

  /** dedup_incremental: exact all-cross-pairs new x index Jaccard — the
    * LSH path must find every >= 0.8 match (same recall argument as
    * dedup_minhash), so the rollup hash-matches the exact answer. */
  private val incrementalOracle: String =
    """WITH w AS (SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
       FROM documents),
     sh AS (SELECT doc_id,
         CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
                range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE [nt] END AS sh
       FROM w),
     nw AS (SELECT doc_id, sh FROM sh WHERE doc_id % 2 = 1),
     ix AS (SELECT doc_id, sh FROM sh WHERE doc_id % 2 = 0),
     m AS (SELECT n.doc_id AS doc_id, i.doc_id AS doc_b,
         len(list_intersect(n.sh, i.sh)) AS inter,
         len(n.sh) + len(i.sh) - len(list_intersect(n.sh, i.sh)) AS un
       FROM nw n, ix i),
     v AS (SELECT doc_id, doc_b,
         CAST(FLOOR(inter * 1000000.0 / un) AS BIGINT) AS jac_e6
       FROM m WHERE inter * 10 >= un * 8)
     SELECT n.doc_id,
       CAST(COUNT(v.doc_b) > 0 AS BIGINT) AS is_dup,
       COUNT(v.doc_b) AS n_dups,
       MIN(v.doc_b) AS first_dup,
       MAX(v.jac_e6) AS best_jac_e6
     FROM nw n LEFT JOIN v ON v.doc_id = n.doc_id
     GROUP BY n.doc_id ORDER BY n.doc_id"""

  val oracleSql: Map[String, String] = Map(
    "dedup_bloom" ->
      """WITH sigs AS (SELECT doc_id,
             md5(array_to_string((string_split(regexp_replace(
               lower(trim(text)), '\s+', ' ', 'g'), ' '))[1:8], ' ')) AS sig
           FROM documents),
         hist AS (SELECT sig, CAST(COUNT(*) AS BIGINT) AS n_hist,
             MIN(doc_id) AS first_doc
           FROM sigs WHERE doc_id < 250 GROUP BY 1)
         SELECT s.doc_id, s.sig, h.n_hist, h.first_doc
         FROM sigs s JOIN hist h ON h.sig = s.sig
         WHERE s.doc_id >= 250 ORDER BY s.doc_id""",
    "dedup_url" ->
      """WITH raw AS (SELECT doc_id,
             doc_id // 3 AS tgt,
             doc_id % 3 AS v,
             'src' || CAST((doc_id // 3) % 20 AS VARCHAR) AS hk,
             CAST((doc_id // 3) % 7 AS VARCHAR) AS idp
           FROM documents),
         urls AS (SELECT doc_id,
             CASE v
               WHEN 0 THEN 'http://' || hk || '.example.com/d/'
                 || CAST(tgt AS VARCHAR) || '?id=' || idp
               WHEN 1 THEN 'HTTP://WWW.' || upper(hk) || '.EXAMPLE.COM:80/d/'
                 || CAST(tgt AS VARCHAR) || '?utm_campaign=x&id=' || idp
                 || '#top'
               ELSE 'http://' || hk || '.example.com:80/d/'
                 || CAST(tgt AS VARCHAR) || '/?id=' || idp || '&utm_source=y'
             END AS url
           FROM raw),
         c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u
           FROM urls),
         c2 AS (SELECT doc_id,
             regexp_replace(u, '[?&]utm_[a-z]+=[^&]*', '', 'g') AS u
           FROM c1),
         c3 AS (SELECT doc_id, regexp_replace(u, '^([^?]*)&', '\1?') AS u
           FROM c2),
         c4 AS (SELECT doc_id,
             lower(regexp_extract(u, '^([a-zA-Z]+://[^/?#]+)', 1)) AS head,
             substr(u, length(regexp_extract(u, '^([a-zA-Z]+://[^/?#]+)', 1))
               + 1) AS rest
           FROM c3),
         c5 AS (SELECT doc_id,
             regexp_replace(regexp_replace(head, '://www\.', '://'),
               ':80$', '') AS head,
             regexp_replace(regexp_replace(rest, '/\?', '?'), '/$', '')
               AS rest
           FROM c4),
         canon AS (SELECT doc_id, head || rest AS curl FROM c5)
         SELECT curl, CAST(COUNT(*) AS BIGINT) AS n_dups,
           MIN(doc_id) AS canonical_doc
         FROM canon GROUP BY curl ORDER BY curl""",
    "dedup_incremental" -> incrementalOracle,
    "dedup_minhash" -> jaccardOracle,
    "dedup_clusters" -> clustersOracle,
    "text_levenshtein" ->
      s"""WITH $jaccardCtes,
       p AS (SELECT doc_a, doc_b FROM v WHERE inter * 10 >= un * 8),
       nt AS (SELECT doc_id,
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
         FROM documents)
       SELECT p.doc_a, p.doc_b,
         CAST(levenshtein(a.t, b.t) AS BIGINT) AS lev,
         CAST(len(a.t) + len(b.t) AS BIGINT) AS len_sum,
         CAST(FLOOR((1.0 - levenshtein(a.t, b.t) * 2.0
                     / (len(a.t) + len(b.t))) * 10000) AS BIGINT) AS lev_sim_e4
       FROM p JOIN nt a ON a.doc_id = p.doc_a
              JOIN nt b ON b.doc_id = p.doc_b
       ORDER BY p.doc_a, p.doc_b""",
    "dedup_passages" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         ch AS (SELECT doc_id,
             unnest(list_transform(range(0, CAST(FLOOR((len(w) + 7) / 8) AS BIGINT)),
               i -> array_to_string(w[(i*8+1):(i*8+8)], ' '))) AS chunk
           FROM w),
         df AS (SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs
           FROM ch GROUP BY chunk)
         SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
           CAST(FLOOR(SUM(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) * 100.0
                      / COUNT(*)) AS BIGINT) AS dup_pct
         FROM ch c JOIN df f USING (chunk)
         GROUP BY c.doc_id ORDER BY c.doc_id""",
    // windows grouped as raw 40-char STRINGS — same equivalence classes
    // as the engine's xxhash64 window keys (the dedup_passages pattern),
    // no engine hash to reproduce; spans re-merged by the same island sweep
    "dedup_substring_spans" ->
      """WITH w AS (SELECT doc_id, i AS start, substr(text, i, 40) AS h
           FROM documents, unnest(range(1, len(text) - 38)) AS t(i)
           WHERE len(text) >= 40),
         dh AS (SELECT h FROM w GROUP BY h
           HAVING COUNT(DISTINCT doc_id) >= 2),
         hit AS (SELECT doc_id, start FROM w JOIN dh USING (h)),
         m AS (SELECT *, MAX(start + 39) OVER (PARTITION BY doc_id
             ORDER BY start
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
           FROM hit),
         f AS (SELECT *, CASE WHEN pmax IS NULL OR start > pmax + 1
             THEN 1 ELSE 0 END AS new_isl FROM m),
         g AS (SELECT *, SUM(new_isl) OVER (PARTITION BY doc_id
             ORDER BY start ROWS UNBOUNDED PRECEDING) AS isl FROM f)
         SELECT doc_id, CAST(MIN(start) AS BIGINT) AS span_start,
           CAST(MAX(start) + 39 AS BIGINT) AS span_end,
           CAST(MAX(start) + 39 - MIN(start) + 1 AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_windows
         FROM g GROUP BY doc_id, isl ORDER BY doc_id, span_start""",
    // CDC boundaries replayed exactly (8-char Horner-31 window % 64);
    // chunks grouped as raw STRINGS — same equivalence classes as the
    // engine's xxhash64 chunk keys, no engine hash to reproduce
    "dedup_cdc" ->
      """WITH n AS (SELECT doc_id,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
           FROM documents),
         b AS (SELECT doc_id, nt, len(nt) AS ln,
             CASE WHEN len(nt) >= 8 THEN
               list_filter(range(8, len(nt) + 1), i ->
                 (list_reduce(list_transform(range(0, 8),
                    j -> CAST(unicode(nt[CAST(i - 7 + j AS INT)]) AS BIGINT)),
                    (a, x) -> a * 31 + x) % 64) = 0)
             ELSE [] END AS bp
           FROM n),
         bd AS (SELECT doc_id, nt,
             [CAST(0 AS BIGINT)] || bp ||
               (CASE WHEN ln > 0 AND (len(bp) = 0 OR bp[-1] <> ln)
                 THEN [ln] ELSE [] END) AS bounds
           FROM b),
         ch AS (SELECT doc_id,
             unnest(CASE WHEN len(bounds) >= 2 THEN
               list_transform(range(1, len(bounds)),
                 k -> nt[CAST(bounds[CAST(k AS INT)] + 1 AS INT)
                   : CAST(bounds[CAST(k + 1 AS INT)] AS INT)])
             ELSE [] END) AS chunk
           FROM bd),
         df AS (SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs
           FROM ch GROUP BY chunk)
         SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
           CAST(FLOOR(SUM(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) * 100.0
                      / COUNT(*)) AS BIGINT) AS dup_pct
         FROM ch c JOIN df f USING (chunk)
         GROUP BY c.doc_id ORDER BY c.doc_id""",
    // SimHash reproduced in SQL: fnv64 per token (HUGEINT fold, see
    // text_fingerprint's oracle), +/-1 votes per bit, bit set where the
    // vote is strictly positive; bands are unsigned byte extracts.
    "dedup_simhash" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         tok AS (SELECT doc_id, unnest(w) AS t FROM w),
         hh AS (SELECT doc_id,
             list_reduce(
               list_prepend(CAST(14695981039346656037 AS HUGEINT),
                 list_transform(range(1, len(t)+1), i -> CAST(ord(substr(t, i, 1)) AS HUGEINT))),
               (h, b) -> (xor(h, b) * 1099511628211) % 18446744073709551616) AS h
           FROM tok),
         bits AS (SELECT doc_id, j,
             SUM(CASE WHEN (h >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM hh, unnest(range(0, 64)) AS r(j) GROUP BY doc_id, j),
         sh AS (SELECT doc_id,
             SUM(CASE WHEN v > 0 THEN (CAST(1 AS HUGEINT) << CAST(j AS INTEGER)) ELSE CAST(0 AS HUGEINT) END) AS u
           FROM bits GROUP BY doc_id),
         bands AS (SELECT doc_id, u, CAST(b AS INTEGER) AS band,
             CAST((u >> CAST(b * 8 AS INTEGER)) & 255 AS BIGINT) AS bucket
           FROM sh, unnest(range(0, 8)) AS r(b))
         SELECT doc_id,
           lower(lpad(to_hex(CAST(u AS UBIGINT)), 16, '0')) AS simhash_hex,
           band, bucket
         FROM bands ORDER BY doc_id, band""",
    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_md5,
         MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
         FROM documents
         GROUP BY 1 ORDER BY canonical_id""",
    "dedup_ngram_jaccard" -> jaccardOracle,
    "dedup_containment" -> containmentOracle,
    "dedup_semantic" ->
      """WITH RECURSIVE
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         twin AS (SELECT vec_id + 100000 AS tid,
             list_transform(range(1, len(v) + 1),
               i -> v[i] * (1.0 + 0.005 *
                 CAST((vec_id + i - 1) % 5 - 2 AS DOUBLE))) AS v
           FROM e),
         c AS (SELECT vec_id, v FROM e
               UNION ALL SELECT tid AS vec_id, v FROM twin),
         n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
           FROM c),
         p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
           FROM n a JOIN n b ON a.vec_id < b.vec_id
           WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
               (acc, x) -> acc + x) / (a.nrm * b.nrm) > 0.95),
         und AS (SELECT vec_a AS a, vec_b AS b FROM p
                 UNION ALL SELECT vec_b, vec_a FROM p),
         reach AS (
           SELECT a AS id, b AS r FROM und
           UNION
           SELECT reach.id, und.b FROM reach JOIN und ON und.a = reach.r
         ),
         comp AS (SELECT id, MIN(r) AS mn FROM reach GROUP BY id)
         SELECT i.vec_id,
           COALESCE(LEAST(comp.mn, i.vec_id), i.vec_id) AS canonical_id,
           CASE WHEN COALESCE(LEAST(comp.mn, i.vec_id), i.vec_id) = i.vec_id
                THEN 1 ELSE 0 END AS keep
         FROM (SELECT vec_id FROM c) i
         LEFT JOIN comp ON comp.id = i.vec_id
         ORDER BY i.vec_id""",
    "dedup_embed_lsh" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         twin AS (SELECT vec_id + 100000 AS tid,
             list_transform(range(1, len(v) + 1),
               i -> v[i] * (1.0 + 0.005 *
                 CAST((vec_id + i - 1) % 5 - 2 AS DOUBLE))) AS v
           FROM e),
         c AS (SELECT vec_id, v FROM e
               UNION ALL SELECT tid AS vec_id, v FROM twin),
         n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
           FROM c),
         p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
               (acc, x) -> acc + x) / (a.nrm * b.nrm) AS sim
           FROM n a JOIN n b ON a.vec_id < b.vec_id)
         SELECT vec_a, vec_b, CAST(FLOOR(sim * 1000000) AS BIGINT) AS sim_e6
         FROM p WHERE sim > 0.95 ORDER BY vec_a, vec_b""",
    "dedup_embed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
           FROM e),
         p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
               (acc, x) -> acc + x) / (a.nrm * b.nrm) AS sim
           FROM n a JOIN n b ON a.vec_id < b.vec_id)
         SELECT vec_a, vec_b, CAST(FLOOR(sim * 1000000) AS BIGINT) AS sim_e6
         FROM p WHERE sim > 0.4 ORDER BY vec_a, vec_b""")
}
