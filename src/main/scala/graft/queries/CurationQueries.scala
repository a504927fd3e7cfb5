package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus-curation operators over the `documents` table — the
  * decontamination / filtering / sampling side of a training-data
  * pipeline (builder brief; no reference counterpart, complements
  * [[DedupQueries]]):
  *
  *  - benchmark decontamination: flag corpus docs sharing n-gram shingles
  *    with a held-out probe set (the standard train/eval overlap check)
  *  - intra-document repetition: duplicate n-gram fraction per doc (the
  *    Gopher-style repetition quality signal)
  *  - deterministic content-addressed sampling: md5-prefix sampling with
  *    per-stratum accounting — stable under re-partitioning, re-ingest
  *    and cluster size, unlike rand()-based sampling
  *
  * Scale notes (100 TB): repetition and sampling are single narrow
  * per-doc passes (no shuffle before the final stratum agg); the
  * contamination check broadcasts the probe shingle set (a benchmark
  * suite is MBs) so the corpus is scanned once with a broadcast hash
  * join — no shuffle of corpus shingles.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact top-k rows per group under (h ASC, id ASC) — the reservoir-
    * sampling kernel behind `sample_reservoir`, shared with the 1M-doc
    * scale rehearsal. Input `(grp, id, h)` with `h` a hex-string sort key
    * (md5 in production); output `(grp, rk, id)`, rk in [1, k].
    *
    * NOT a per-group global window (one group = one task at corpus
    * scale): bucket by the first 2 hash hex digits, cumsum the 256
    * per-group bucket counts on the metadata-sized offset relation, drop
    * every bucket whose offset is already ≥ k (it cannot intersect the
    * top-k prefix — so only ~k candidate rows per group enter the final
    * window), then row_number WITHIN each (grp, bucket). */
  private[graft] def reservoirTopK(df: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val in = df.toDF("grp", "id", "h")
      .withColumn("bkt", substring(col("h"), 1, 2))
    val counts = in.groupBy(col("grp"), col("bkt"))
      .agg(count(lit(1)).as("c"))
    val wOff = Window.partitionBy(col("grp")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .filter(col("off") < k)
    val wIn = Window.partitionBy(col("grp"), col("bkt"))
      .orderBy(col("h"), col("id"))
    in.join(offs.select(col("grp"), col("bkt"), col("off")),
        Seq("grp", "bkt"))
      .withColumn("rk", col("off") + row_number().over(wIn))
      .filter(col("rk") <= k)
      .select(col("grp"), col("rk"), col("id"))
  }

  /** Word 3-grams WITHOUT dedup (repetition needs multiplicity); short
    * docs fall back to the whole text, mirroring [[DedupQueries.shingles]]
    * — same native expression, distinct off. */
  private def grams(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Exprs
    Exprs.toColumn(graft.functions.Shingles(Exprs.toExpr(c), 3, distinct = false))
  }

  /** Per-document C4 quality signals + rule booleans + keep verdict +
    * the normalized-text md5 (so a downstream dedup stage needs no second
    * pass over the text). One narrow projection, no shuffle — shared by
    * `quality_c4_rules`, `pipeline_curate_pack` and (via [[c4RulesOf]])
    * the text scale rehearsal. */
  private def c4RulesFrame(s: SparkSession, d: String): DataFrame =
    c4RulesOf(documents(s, d))

  /** Same, over any (doc_id, text) frame — `private[graft]` so
    * TextScaleRehearsal measures the production signal pass, not a copy. */
  private[graft] def c4RulesOf(docs: DataFrame): DataFrame = {
    val w = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    docs
      .select(col("doc_id"), col("text"), grams(col("text")).as("g"),
        w.as("w"),
        length(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
          .cast("long").as("nc"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        // mean token length x1e4 (exact int arithmetic, same recipe as
        // text_quality): (chars - separators) / tokens
        floor((col("nc") - (size(col("w")) - 1)) * 10000 / size(col("w")))
          .as("mean_len_e4"),
        size(array_intersect(col("w"),
          array(Seq("the", "and", "of", "to", "in", "is", "it", "for",
            "on", "with").map(lit): _*))).cast("long").as("n_stop_types"),
        floor((size(col("g")) - size(array_distinct(col("g"))))
          * lit(1000000.0) / size(col("g"))).cast("long").as("dup_e6"),
        md5(graft.queries.DedupQueries.norm(col("text"))).as("text_md5"))
      .withColumn("r_len",
        (col("n_tokens") >= 30 && col("n_tokens") <= 1000).cast("long"))
      .withColumn("r_wordlen",
        (col("mean_len_e4") >= 20000L && col("mean_len_e4") <= 120000L).cast("long"))
      .withColumn("r_stop", (col("n_stop_types") >= 1).cast("long"))
      .withColumn("r_rep", (col("dup_e6") < 600000L).cast("long"))
      .withColumn("keep",
        (col("r_len") + col("r_wordlen") + col("r_stop") + col("r_rep") === 4L)
          .cast("long"))
  }

  val queries: Map[String, Q] = Map(
    // -- duplicate n-gram fraction per document: one narrow projection,
    //    no shuffle at all (the quality-filter shape: compute per-doc
    //    signals in a single pass, filter downstream)
    "text_dup_ngrams" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), grams(col("text")).as("g"))
        .select(col("doc_id"),
          size(col("g")).cast("long").as("n_grams"),
          (size(col("g")) - size(array_distinct(col("g")))).cast("long").as("n_dup"))
        .withColumn("dup_e6",
          floor(col("n_dup") * lit(1000000.0) / col("n_grams")).cast("long"))
        .orderBy("doc_id")
    }),

    // -- benchmark decontamination: docs (id >= 5) sharing >= 1 shingle
    //    with the probe docs (id < 5 stand in for the held-out benchmark).
    //    Probe set broadcasts; corpus shingles never shuffle.
    "contamination" -> ((s, d) => {
      val sets = DedupQueries.shingleSets(s, d)
      val probe = sets.filter(col("doc_id") < 5)
        .select(explode(col("sh")).as("sng")).distinct()
      val corpus = sets.filter(col("doc_id") >= 5)
        .select(col("doc_id"), explode(col("sh")).as("sng"))
      corpus.join(broadcast(probe), Seq("sng"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
        .orderBy("doc_id")
    }),

    // -- C4-style rule-based quality gate: the classic pre-training filter
    //    chain (length bounds, mean word length, stopword presence, low
    //    intra-doc repetition) as ONE narrow pass — each rule an integer
    //    predicate, keep = conjunction. Per-rule booleans surface so a
    //    pipeline can report per-rule rejection rates, not just the final
    //    keep count. No shuffle: every signal is per-document.
    "quality_c4_rules" -> ((s, d) => {
      c4RulesFrame(s, d)
        .select("doc_id", "n_tokens", "mean_len_e4", "n_stop_types", "dup_e6",
          "r_len", "r_wordlen", "r_stop", "r_rep", "keep")
        .orderBy("doc_id")
    }),

    // -- the END-TO-END curation pipeline as ONE optimizer DAG: C4 quality
    //    gate -> exact dedup among survivors (keep-first canonical) ->
    //    token counts -> GPT-style 256-token sequence packing. This is the
    //    composability claim made concrete: the same operators users run
    //    standalone chain into a single declarative plan — the quality
    //    signals stay a narrow no-shuffle pass, dedup is one shuffle on
    //    the 32 B md5 (never raw text), and packing reuses seq_pack's
    //    two-phase cumsum (per-bucket sums -> metadata-sized bucket cumsum
    //    broadcast back -> bucket-partitioned windows), so no stage drags
    //    the corpus into one task at 100 TB. Oracle replays the whole
    //    chain in SQL CTEs.
    "pipeline_curate_pack" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val C = 256L
      val B = 100L
      // the kept set feeds the canonical agg AND the survivor join — pin
      // so the C4 signal pass (shingles + md5 over the text) runs once;
      // at 100 TB this is the checkpointed post-filter table every
      // downstream stage reads
      val kept = graft.Caches.pin(
        c4RulesFrame(s, d).filter(col("keep") === 1L)
          .select(col("doc_id"), col("n_tokens").as("n_tok"), col("text_md5")))
      val canon = kept.groupBy("text_md5")
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_copies"))
      val surv = kept.join(canon,
          kept("text_md5") === canon("text_md5") &&
            kept("doc_id") === canon("canonical_id"))
        .select(kept("doc_id"), col("n_tok"), col("n_copies"))
        .withColumn("bkt", floor(col("doc_id") / B).cast("long"))
      val wB = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val base = surv.groupBy("bkt").agg(sum(col("n_tok")).as("bt"))
        .withColumn("base", coalesce(sum(col("bt")).over(wB), lit(0L)))
        .select("bkt", "base")
      val wIn = Window.partitionBy("bkt").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      surv.join(broadcast(base), "bkt")
        .withColumn("start_off",
          col("base") + coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
        .withColumn("start_block", floor(col("start_off") / C).cast("long"))
        .withColumn("end_block",
          floor((col("start_off") + col("n_tok") - 1) / C).cast("long"))
        .withColumn("n_blocks", col("end_block") - col("start_block") + 1)
        .select("doc_id", "n_tok", "n_copies", "start_off", "start_block",
          "end_block", "n_blocks")
        .orderBy("doc_id")
    }),

    // -- publish a training shard: the curation pipeline's end made
    //    DURABLE — curate (C4 rules) → exact-dedup to canonicals → join
    //    doc metadata back → write a Hive-partitioned parquet shard,
    //    pre-repartitioned ON the partition key so each lang directory
    //    compacts to ONE file (layout_compaction's discipline applied at
    //    publish time instead of as a second rewrite job) → read back
    //    with a partition filter. Plan-gated on PartitionFilters +
    //    selectedPartitions == 1, so the query PROVES the published
    //    layout prunes. Write-once stamped dir + staging/atomic-rename
    //    publish (jsonl_roundtrip's two-JVM-safe discipline). At 100 TB
    //    this is the daily "ship a shard" job: one signal pass, one md5
    //    shuffle, one range-free partitionBy write, zero driver data.
    "pipeline_publish" -> ((s, d) => {
      val srcP = java.nio.file.Paths.get(d, "documents.parquet")
      val stamp = s"${java.nio.file.Files.getLastModifiedTime(srcP).toMillis}" +
        s"_${java.nio.file.Files.size(srcP)}"
      val key = s"${d}_$stamp".replaceAll("[^A-Za-z0-9._-]", "_")
      val dir = s"${sys.props("java.io.tmpdir")}/graft_publish_$key"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))) {
        val kept = c4RulesFrame(s, d).filter(col("keep") === 1L)
          .select(col("doc_id"), col("n_tokens"), col("text_md5"))
        val canon = kept.groupBy("text_md5")
          .agg(min(col("doc_id")).as("canonical_id"))
        val pub = kept.join(canon,
            kept("text_md5") === canon("text_md5") &&
              kept("doc_id") === canon("canonical_id"))
          .select(kept("doc_id"), col("n_tokens"))
          .join(documents(s, d).select(col("doc_id"), col("lang"),
            col("source"), col("n_chars")), "doc_id")
        val staging = java.nio.file.Paths.get(
          s"$dir.staging-${java.util.UUID.randomUUID().toString.take(8)}")
        pub.repartition(col("lang"))
          .write.mode("overwrite").partitionBy("lang").parquet(staging.toString)
        try java.nio.file.Files.move(staging, java.nio.file.Paths.get(dir),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileSystemException =>
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(staging).iterator().asScala.toSeq
            .reverse.foreach(java.nio.file.Files.deleteIfExists)
        }
      }
      s.read.parquet(dir)
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens"), col("n_chars"))
    }),

    // -- Gopher-style quality rules (Rae et al. 2021, published rule set)
    //    — the second canonical pre-training filter chain next to C4:
    //    word-count bounds, mean-word-length band (3..10 chars), symbol-
    //    to-word ratio ('#' + '…'-as-'...'), alphabetic-word fraction,
    //    and >= 2 of the required stop words. One narrow per-doc pass, no
    //    shuffle; every signal exact integer arithmetic so the oracle
    //    reproduces it bit-for-bit. (This corpus has no newlines, so
    //    Gopher's line-level rules — bullet/ellipsis line fractions — are
    //    vacuous here and deliberately omitted rather than shipped
    //    untestable.)
    "quality_gopher_rules" -> ((s, d) => {
      val nt = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val w = split(nt, " ")
      documents(s, d)
        .select(col("doc_id"), col("text"), w.as("w"),
          length(nt).cast("long").as("nc"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_words"),
          floor((col("nc") - (size(col("w")) - 1)) * 10000 / size(col("w")))
            .as("mean_len_e4"),
          ((length(col("text")) - length(regexp_replace(col("text"), "#", "")))
            + (length(col("text"))
               - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
            .cast("long").as("n_sym"),
          size(filter(col("w"), x => x.rlike("[a-z]"))).cast("long")
            .as("n_alpha"),
          size(array_intersect(col("w"),
            array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
              .map(lit): _*))).cast("long").as("n_req_stop"))
        .withColumn("sym_e6",
          floor(col("n_sym") * lit(1000000.0) / col("n_words")).cast("long"))
        .withColumn("alpha_e6",
          floor(col("n_alpha") * lit(1000000.0) / col("n_words")).cast("long"))
        .withColumn("r_wc",
          (col("n_words") >= 50 && col("n_words") <= 100000L).cast("long"))
        .withColumn("r_mwl",
          (col("mean_len_e4") >= 30000L && col("mean_len_e4") <= 100000L)
            .cast("long"))
        .withColumn("r_sym", (col("sym_e6") < 100000L).cast("long"))
        .withColumn("r_alpha", (col("alpha_e6") > 800000L).cast("long"))
        .withColumn("r_stop", (col("n_req_stop") >= 2).cast("long"))
        .withColumn("keep",
          (col("r_wc") + col("r_mwl") + col("r_sym") + col("r_alpha")
            + col("r_stop") === 5L).cast("long"))
        .select("doc_id", "n_words", "mean_len_e4", "sym_e6", "alpha_e6",
          "n_req_stop", "r_wc", "r_mwl", "r_sym", "r_alpha", "r_stop", "keep")
        .orderBy("doc_id")
    }),

    // -- Gopher REPETITION rules (the other half of the Gopher quality
    //    table next to `quality_gopher_rules`' heuristics): most-frequent-
    //    word multiplicity + its character share, and the duplicate-word
    //    fraction. ZERO shuffles: the top word is found per row by a
    //    higher-order `aggregate` over the SORTED word array (max
    //    run-length — ties resolve to the lexicographically smallest word,
    //    which is the first max-run in sorted order), so no word ever
    //    leaves its document's row; the oracle replays the same argmax
    //    with a count + row_number window. The quality-filter scale shape:
    //    per-doc signals computed in a single narrow pass, thresholds
    //    applied downstream.
    "quality_repetition" -> ((s, d) => {
      val nt = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val ws = array_sort(split(nt, " "))
      val init = struct(lit(null).cast("string").as("prev"),
        lit(0L).as("run"), lit(0L).as("best"), lit("").as("bw"))
      val folded = aggregate(ws, init, (acc, x) => {
        val newRun = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1L))
        val better = newRun > acc.getField("best")
        struct(x.as("prev"), newRun.as("run"),
          when(better, newRun).otherwise(acc.getField("best")).as("best"),
          when(better, x).otherwise(acc.getField("bw")).as("bw"))
      })
      documents(s, d)
        .select(col("doc_id"), ws.as("ws"),
          length(nt).cast("long").as("nc"), folded.as("f"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
          col("f.bw").as("top_word"), col("f.best").as("top_cnt"), col("nc"))
        .withColumn("top_char_e6",
          floor(col("top_cnt") * length(col("top_word")) * lit(1000000.0)
            / greatest(col("nc"), lit(1L))).cast("long"))
        .withColumn("keep",
          (col("top_cnt") * 10 <= col("n_words") &&
            (col("n_words") - col("n_distinct")) * 2 <= col("n_words"))
            .cast("long"))
        .select("doc_id", "n_words", "n_distinct", "top_word", "top_cnt",
          "top_char_e6", "keep")
        .orderBy("doc_id")
    }),

    // -- unigram surprisal: the perplexity PROXY a filter pipeline can
    //    afford. Token surprisal log2(N/cnt) is approximated in PURE
    //    integers as bitlen(N) − bitlen(cnt) (within 1 bit of the float
    //    log, zero libm — the hash-safe stand-in; cf. bm25_search's
    //    rational idf). Per doc: token count, summed surprisal bits, and
    //    bits/token ×100 — the ranking that separates boilerplate (common
    //    tokens, low surprisal) from natural prose. Scale shape: ONE token
    //    explode; the unigram table is Zipf-small vs the corpus
    //    (broadcast-tier under AQE); the per-doc sum partial-aggregates;
    //    raw text never crosses an exchange.
    "quality_surprisal" -> ((s, d) => {
      def blen(c: Column): Column = length(bin(c)).cast("long")
      val tok = documents(s, d)
        .select(col("doc_id"),
          explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
            " ")).as("t"))
        .filter(col("t") =!= "")
      val uni = tok.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      val n = tok.count() // bounded driver scalar: the corpus token total
      val nBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n))
      tok.join(uni, "t")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          sum(lit(nBits.toLong) - blen(col("cnt"))).as("surprisal_bits"))
        .select(col("doc_id"), col("n_tok"), col("surprisal_bits"),
          floor(col("surprisal_bits") * lit(100L) / col("n_tok"))
            .cast("long").as("bits_per_tok_x100"))
        .orderBy("doc_id")
    }),

    // -- MODEL-BASED quality filter, the fastText/CCNet shape (Wenzek et
    //    al. 2020; FineWeb's classifier gate): score each doc with a
    //    LINEAR model over HASHED token features — the hashing trick
    //    means NO vocabulary table at all, so the filter is one
    //    stateless codegen'd pass at any corpus size. Weights here are a
    //    deterministic function of the feature hash (w = (fnv64(tok)
    //    mod 2^63) mod 2001 − 1000 ∈ [−1000, 1000]) standing in for
    //    trained parameters — the ARITHMETIC (hash → bounded integer
    //    weight → summed logit → threshold) is exactly a trained
    //    classifier's inference path, and being integer-exact it is
    //    hash-gated end-to-end (a float model would be rows-only).
    //    Output per doc: token count, logit, mean score ×1000, and the
    //    keep decision at threshold 0. Scale shape: one token explode,
    //    partial-aggregated sum on doc_id — raw text never crosses an
    //    exchange, and there is no model-table join to skew.
    "quality_classifier" -> ((s, d) => {
      import org.apache.spark.sql.graftbridge.Exprs
      import graft.functions.Fnv64
      val tok = documents(s, d)
        .select(col("doc_id"),
          explode(DedupQueries.tokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
      val h = Exprs.toColumn(Fnv64(Exprs.toExpr(col("t"))))
      val w = (h.bitwiseAND(lit(Long.MaxValue)) % lit(2001L)) - lit(1000L)
      tok.select(col("doc_id"), w.as("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("w")).as("logit"))
        .select(col("doc_id"), col("n_tok"), col("logit"),
          floor(col("logit") * lit(1000L) / col("n_tok")).cast("long")
            .as("score_x1000"),
          (col("logit") > 0).cast("long").as("keep"))
        .orderBy("doc_id")
    }),

    // -- BIGRAM-LM quality scoring (the CCNet/KenLM perplexity gate in
    //    its exact-integer form): train the bigram model ON the corpus —
    //    c2(w1,w2) bigram counts, c1(w1) = Σ_w2 c2 first-token totals —
    //    then score each doc by its mean conditional bigram probability
    //    P(w2|w1) = c2/c1 in ppm, floored per occurrence with BIGINT DIV
    //    so both engines agree bit-for-bit (a float log-perplexity would
    //    be rows-only; the ppm mean ranks docs identically to the
    //    perplexity it is a monotone transform of, per-doc-length). Low
    //    avg ⇒ improbable token transitions ⇒ gibberish / OCR noise;
    //    boilerplate scores high — the complement of quality_surprisal's
    //    unigram rarity signal. Scale shape: ONE bigram explode (narrow,
    //    from array slices — no self-join); the model table is
    //    vocab²-bounded (Zipf-small vs the corpus — AQE broadcasts it);
    //    the per-doc mean partial-aggregates on doc_id; raw text never
    //    crosses an exchange.
    "quality_lm_bigram" -> ((s, d) => {
      val tk = DedupQueries.tokens(col("text"))
      val big = documents(s, d)
        .select(col("doc_id"),
          explode(zip_with(
            slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
            slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
      big.join(c2.join(c1, "w1"), Seq("w1", "w2"))
        .select(col("doc_id"), expr("(1000000 * c2) DIV c1").as("ppm"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("sum_ppm"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("sum_ppm DIV n_bigrams").as("avg_cond_ppm"),
          (expr("sum_ppm DIV n_bigrams") >= 34500L).cast("long").as("keep"))
        .orderBy("doc_id")
    }),

    // -- distribution DRIFT between corpus sources (the snapshot-vs-
    //    snapshot monitoring a training-data pipeline runs before
    //    admitting a new crawl): per-source doc-length histograms
    //    (bucket = n_chars DIV 100) compared pairwise by the two-sample
    //    χ² in the product form χ² = Σ_b (N_a+N_b)·(c_a·N_b − c_b·N_a)²
    //    / (N_a·N_b·(c_a+c_b)) — floored PER BUCKET with BIGINT DIV, so
    //    the statistic is an exact integer in both engines (no libm, no
    //    float accumulation). Scale shape: ONE narrow pass → (source,
    //    bucket) counts (the only data-sized shuffle); the histogram
    //    grid, source totals, and the pair join are all metadata-sized
    //    (sources² · buckets), exactly like a production drift monitor
    //    that reduces 100 TB to a few-KB sketch before comparing.
    "profile_drift" -> ((s, d) => {
      val cnt = documents(s, d)
        .select(col("source"), (col("n_chars").cast("long") / 100)
          .cast("long").as("bkt"))
        .groupBy(col("source"), col("bkt")).agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("n"))
      val grid = tot.select(col("source"))
        .crossJoin(cnt.select(col("bkt")).distinct())
        .join(cnt, Seq("source", "bkt"), "left")
        .select(col("source"), col("bkt"), coalesce(col("c"), lit(0L)).as("c"))
      def side(p: String): DataFrame = grid
        .join(tot, "source")
        .select(col("source").as(s"source_$p"), col("bkt").as(s"bkt_$p"),
          col("c").as(s"c_$p"), col("n").as(s"n_$p"))
      side("a").join(side("b"),
          col("bkt_a") === col("bkt_b") && col("source_a") < col("source_b"))
        .filter(col("c_a") + col("c_b") > 0)
        .groupBy(col("source_a"), col("source_b"))
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          // chi-squared numerator is O(n^5) in per-source doc count —
          // BIGINT saturates near n ~= 6e3 docs/source, so the statistic
          // is computed in DECIMAL(38,0) int128 (DuckDB: HUGEINT), exact
          // to n ~= 4e7 docs/source. Past that, compute on per-mille
          // histogram SHARES instead of raw counts (the pair relation is
          // metadata-sized, so the wide math costs nothing).
          sum(expr("""(CAST(n_a + n_b AS DECIMAL(38,0))
            * (CAST(c_a AS DECIMAL(19,0)) * n_b - CAST(c_b AS DECIMAL(19,0)) * n_a)
            * (CAST(c_a AS DECIMAL(19,0)) * n_b - CAST(c_b AS DECIMAL(19,0)) * n_a))
            DIV (CAST(n_a AS DECIMAL(19,0)) * n_b * (c_a + c_b))"""))
            .as("chi2"))
        .orderBy("source_a", "source_b")
    }),

    // -- sequence packing (GPT-style): concatenate the token stream in
    //    doc_id order and split at fixed C=256-token block boundaries;
    //    per doc surface its absolute token offset and the blocks it
    //    spans. The global ordered cumsum is TWO-PHASE so no window ever
    //    sees unbounded data: per-bucket sums (bucket = doc_id/100, one
    //    shuffle), a cumsum over the tiny bucket-total relation (metadata-
    //    sized — safe in a single partition at any corpus size), broadcast
    //    back, then a window PARTITIONED by bucket for the within-bucket
    //    prefix. A naive Window.orderBy with no partition would drag the
    //    full corpus into one task — the classic global-window scale trap.
    "seq_pack" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val C = 256L
      val B = 100L
      val t = documents(s, d)
        .select(col("doc_id"),
          size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))
            .cast("long").as("n_tok"))
        .withColumn("bkt", floor(col("doc_id") / B).cast("long"))
      val wB = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val base = t.groupBy("bkt").agg(sum(col("n_tok")).as("bt"))
        .withColumn("base", coalesce(sum(col("bt")).over(wB), lit(0L)))
        .select("bkt", "base")
      val wIn = Window.partitionBy("bkt").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.join(broadcast(base), "bkt")
        .withColumn("start_off",
          col("base") + coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
        .withColumn("start_block", floor(col("start_off") / C).cast("long"))
        .withColumn("end_block",
          floor((col("start_off") + col("n_tok") - 1) / C).cast("long"))
        .withColumn("n_blocks", col("end_block") - col("start_block") + 1)
        .select("doc_id", "n_tok", "start_off", "start_block", "end_block",
          "n_blocks")
        .orderBy("doc_id")
    }),

    // -- deterministic content-addressed sampling (md5 prefix in {0,1} =
    //    1/8 rate) with per-(lang, source) stratum accounting. The sample
    //    decision depends only on content — identical across cluster
    //    sizes, partitionings and re-runs, which rand()-sampling is not.
    // -- EXACT-k deterministic reservoir sample per source (the fixed-
    //    budget sibling of rate-based sample_stratified): the k docs with
    //    the smallest md5(doc_id) per source — content-addressed, so the
    //    sample is stable under re-partitioning, re-ingest order and
    //    cluster resize, exactly what a reproducible eval-set draw needs.
    //    The rank is NOT a per-source global window (one source = one
    //    task at corpus scale — the global-window trap): the house
    //    two-phase bucketed rank buckets by the first 2 hash hex digits,
    //    cumsums the 256-per-source bucket counts on a metadata-sized
    //    relation, and row_numbers only WITHIN each (source, bucket) —
    //    every corpus-sized window stays bucket-partitioned (plan-gated).
    "sample_reservoir" -> ((s, d) =>
      reservoirTopK(documents(s, d).select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h")), 64)
        .select(col("grp").as("source"), col("rk"), col("id").as("doc_id"))
        .orderBy("source", "rk")),

    // -- CLASS-BALANCED downsampling (the third sampling mode next to
    //    rate-based sample_stratified and fixed-k sample_reservoir):
    //    every language class is cut to the SMALLEST class's size — the
    //    classifier-training balance step. The target m is one 1-row
    //    scalar (min over class counts — bounded driver state, like
    //    cluster_kmeans' centroids); the draw is the content-addressed
    //    smallest-md5 prefix per class via the same two-phase bucketed
    //    rank as sample_reservoir (every corpus-sized window stays
    //    bucket-partitioned), so the balanced set is stable under
    //    re-partitioning, re-ingest order and cluster resize.
    "sample_balanced" -> ((s, d) => {
      val docs = documents(s, d).select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      // bounded 1-row scalar: the balance target. Empty corpus → m = 0 →
      // empty result (matches the oracle); a >2³¹ smallest class would
      // WRAP .toInt negative and silently return an empty sample (wrong
      // result, loud-failure discipline applies — rank with a Long k
      // past that scale)
      val mRow = docs.groupBy("lang").count().agg(min("count")).head()
      val mLong = if (mRow.isNullAt(0)) 0L else mRow.getLong(0)
      require(mLong <= Int.MaxValue,
        s"sample_balanced: smallest class has $mLong rows — .toInt would " +
          "wrap; switch reservoirTopK to a Long k for this scale")
      reservoirTopK(docs, mLong.toInt)
        .select(col("grp").as("lang"), col("rk"), col("id").as("doc_id"))
        .orderBy("lang", "rk")
    }),

    "sample_stratified" -> ((s, d) => {
      documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(substring(md5(DedupQueries.norm(col("text"))), 1, 1)
            .isin("0", "1"), 1L).otherwise(0L)).as("n_sampled"))
        .withColumn("rate_e6",
          floor(col("n_sampled") * lit(1000000.0) / col("n_total")).cast("long"))
        .orderBy("lang", "source")
    }),

    // -- IMPORTANCE-weighted sampling (the quality-aware downsampling
    //    step between filtering and mixing: keep MORE of the better
    //    docs instead of a flat rate). Each doc gets a quality tier
    //    q = 1 + min(3, n_tok DIV 40) ∈ [1,4] (token count as the cheap
    //    stand-in for a quality score — any integer signal slots in) and
    //    an acceptance rate q/8, decided content-addressed: keep iff the
    //    doc's 3-hex md5 prefix (0..4095) < q·512. Deterministic under
    //    re-partitioning / re-ingest / cluster resize — the property
    //    rand()-weighted sampling lacks — and exact-integer end-to-end.
    //    Scale shape: ONE stateless corpus pass (hash + compare in the
    //    scan stage, no joins, no shuffle before the final ordering);
    //    per-tier accounting partial-aggregates to 4 rows.
    "sample_importance" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"),
          size(DedupQueries.tokens(col("text"))).cast("long").as("n_tok"),
          conv(substring(md5(DedupQueries.norm(col("text"))), 1, 3), 16, 10)
            .cast("long").as("hv"))
        .withColumn("q", lit(1L) + least(lit(3L), expr("n_tok DIV 40")))
        .filter(col("hv") < col("q") * 512L)
        .select("doc_id", "n_tok", "q", "hv")
        .orderBy("doc_id")
    }),

    // -- deterministic k-fold split (the train/val/test assignment step
    //    of an eval pipeline, as a PURE function of content): fold =
    //    3-hex-digit md5 prefix of the NORMALIZED TEXT mod k —
    //    content-addressed like every sample_* decision (stable under
    //    re-partitioning, re-ingest, cluster resize), and keyed on the
    //    text rather than the id, so EXACT duplicates land in the SAME
    //    fold by construction: the classic split-leakage bug (one string
    //    in train and test under two ids) is impossible before any dedup
    //    pass even runs. Scale shape: one stateless scan-stage projection
    //    (hash + mod, codegen'd), no join, no shuffle before the final
    //    ordering. (Near-dup leakage needs the dedup_* cluster ops —
    //    at 100 TB assign folds to cluster REPRESENTATIVES' md5 instead;
    //    same expression, one extra join.)
    "sample_kfold" -> ((s, d) => {
      val k = 5L
      documents(s, d).select(col("doc_id"),
          size(DedupQueries.tokens(col("text"))).cast("long").as("n_tok"),
          pmod(conv(substring(md5(DedupQueries.norm(col("text"))), 1, 3), 16, 10)
            .cast("long"), lit(k)).as("fold"))
        .orderBy("doc_id")
    }),

    // -- domain-mix rebalancing (the data-mixing step of a pre-training
    //    pipeline): given a target mix — uniform across sources here —
    //    compute each source's deterministic acceptance threshold
    //    thresh = min(4096, floor(4096 * total / (n_sources * n_source)))
    //    and keep a doc iff its 3-hex-digit md5 prefix (0..4095) falls
    //    below it. Over-represented sources get down-sampled toward the
    //    target share; under-represented ones pass whole (thresh = 4096).
    //    All arithmetic is exact integers, the decision is content-
    //    addressed (stable under re-partitioning / re-ingest / cluster
    //    size), and the plan is ONE corpus pass: the per-source count
    //    relation is source-cardinality-sized, broadcast back onto the
    //    scan, and the final agg map-side-combines to |sources| rows —
    //    the corpus itself never shuffles.
    "mix_rebalance" -> ((s, d) => {
      val docs = documents(s, d).select(col("source"), col("text"))
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
      val tot = counts.agg(sum(col("n_total")).as("t"),
        count(lit(1)).as("ns"))
      val rates = counts.crossJoin(broadcast(tot))
        .withColumn("thresh", least(lit(4096L),
          floor(lit(4096L) * col("t") / (col("ns") * col("n_total"))))
          .cast("long"))
        .select("source", "n_total", "thresh")
      docs
        .withColumn("hv",
          conv(substring(md5(DedupQueries.norm(col("text"))), 1, 3), 16, 10)
            .cast("long"))
        .join(broadcast(rates), "source")
        .groupBy(col("source"), col("n_total"), col("thresh"))
        .agg(sum(when(col("hv") < col("thresh"), 1L).otherwise(0L))
          .as("n_kept"))
        .withColumn("kept_e6",
          floor(col("n_kept") * lit(1000000.0) / col("n_total")).cast("long"))
        .select("source", "n_total", "thresh", "n_kept", "kept_e6")
        .orderBy("source")
    }),

    // -- TEMPERATURE-SCALED domain mixing (the multilingual sampling rule
    //    of the T5/mT5 line: target share ∝ n^α with α = 1/2) — flattens
    //    the source distribution toward but not all the way to
    //    mix_rebalance's uniform target. sqrt is the one non-integer in
    //    the rule, so it is computed as EXACT integer isqrt: the double
    //    floor(sqrt(n)) estimate corrected ±1 by integer comparisons —
    //    both engines land on the identical BIGINT no matter what their
    //    libm did. From there it is mix_rebalance's machinery unchanged:
    //    exact-integer thresholds, content-addressed md5 acceptance, the
    //    source-cardinality rates broadcast onto ONE corpus pass.
    "mix_temperature" -> ((s, d) => {
      val docs = documents(s, d).select(col("source"), col("text"))
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
      val isqrt = {
        val t0 = floor(sqrt(col("n_total").cast("double"))).cast("long")
        val t1 = when(t0 * t0 > col("n_total"), t0 - 1L).otherwise(t0)
        when((t1 + 1L) * (t1 + 1L) <= col("n_total"), t1 + 1L).otherwise(t1)
      }
      val withSq = counts.withColumn("sq", isqrt)
      val tot = withSq.agg(sum(col("n_total")).as("t"), sum(col("sq")).as("ssq"))
      val rates = withSq.crossJoin(broadcast(tot))
        .withColumn("thresh", least(lit(4096L),
          floor(lit(4096L) * col("sq") * col("t") /
            (col("ssq") * col("n_total")))
          .cast("long")))
        .select("source", "n_total", "sq", "thresh")
      docs
        .withColumn("hv",
          conv(substring(md5(DedupQueries.norm(col("text"))), 1, 3), 16, 10)
            .cast("long"))
        .join(broadcast(rates), "source")
        .groupBy(col("source"), col("n_total"), col("sq"), col("thresh"))
        .agg(sum(when(col("hv") < col("thresh"), 1L).otherwise(0L))
          .as("n_kept"))
        .select("source", "n_total", "sq", "thresh", "n_kept")
        .orderBy("source")
    }),

    // -- EPOCH-BASED domain up-sampling (the replication half of data
    //    mixing — the Pile/Llama "epochs per dataset" recipe, complement
    //    of mix_rebalance/mix_temperature's down-sampling): each source
    //    carries a target epoch count from its mixing table — stood in
    //    for here by a deterministic function of the source name
    //    (1 + fnv64(source) mod 4 ∈ [1,4], the same trained-config
    //    stand-in discipline as quality_classifier's weights) — and
    //    every doc is replicated once per epoch with its epoch index.
    //    Because the epoch count is a pure per-row function of `source`,
    //    the WHOLE query is one codegen'd projection + explode: no
    //    aggregate, no join, no shuffle, at any corpus size — the ideal
    //    plan for materializing a training-run manifest. Downstream
    //    consumers shuffle the replicated stream at most once (their own
    //    packing/shards), never this operator.
    "mix_epochs" -> ((s, d) => {
      import org.apache.spark.sql.graftbridge.Exprs
      import graft.functions.Fnv64
      val h = Exprs.toColumn(Fnv64(Exprs.toExpr(col("source"))))
      documents(s, d)
        .select(col("doc_id"), col("source"),
          (lit(1L) + (h.bitwiseAND(lit(Long.MaxValue)) % lit(4L)))
            .as("n_epochs"))
        .select(col("doc_id"), col("source"), col("n_epochs"),
          explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))
    }),

    // -- deterministic negative sampling (the contrastive-pairs step of an
    //    embedding-training pipeline): every anchor doc (doc_id ≡ 0 mod 10)
    //    draws k=3 pseudo-random negatives via exact BIGINT hash arithmetic
    //    over a DENSE document index — no RNG, no engine hash, so the draw
    //    is a pure function of the data that is stable under
    //    re-partitioning, re-ingest and cluster size (the same
    //    content-determinism argument as sample_stratified). The dense
    //    index is built with the two-phase bucketed cumsum (per-bucket
    //    counts → metadata-sized bucket window → per-bucket row_number —
    //    never a global-window rank), a self-collision bumps to the next
    //    index mod n, and the draw resolves to a doc via one equi join
    //    against the index (node-sized; AQE broadcasts it while small).
    //    Scale shape: anchors×k rows total, embarrassingly parallel in the
    //    anchor key — the corpus itself is read once for the index and
    //    never shuffled again.
    "sample_negatives" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val B = 100L
      val ids = documents(s, d).select(col("doc_id"))
        .withColumn("bkt", floor(col("doc_id") / B).cast("long"))
      val wB = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
      val bases = ids.groupBy("bkt").agg(count(lit(1)).as("c"))
        .withColumn("base", coalesce(sum(col("c")).over(wB), lit(0L)))
        .select("bkt", "base")
      val wIn = Window.partitionBy("bkt").orderBy("doc_id")
      val idx = graft.Caches.pin(ids.join(broadcast(bases), "bkt")
        .withColumn("i", (col("base") + row_number().over(wIn) - 1).cast("long"))
        .select("doc_id", "i"))
      val nn = idx.agg(count(lit(1)).as("n"))
      idx.filter(col("doc_id") % 10 === 0)
        .crossJoin(broadcast(nn))
        .select(col("doc_id"), col("i"), col("n"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
        .withColumn("raw",
          (col("i") * 2654435761L + col("j") * 1000003L) % col("n"))
        .withColumn("ni", when(col("raw") === col("i"),
          (col("raw") + 1) % col("n")).otherwise(col("raw")))
        .join(idx.select(col("i").as("ni"), col("doc_id").as("neg_doc_id")), "ni")
        .select(col("doc_id"), col("j"), col("neg_doc_id"))
        .orderBy("doc_id", "j")
    }),

    // -- corpus-level bigram novelty (a CCNet-style commonness signal
    //    computed from the corpus itself instead of an external LM): a
    //    doc's bigram is "known" if it occurs in >= 2 distinct documents;
    //    novelty = the fraction of a doc's bigram stream that is NOT
    //    known. Boilerplate scores near 0, unique prose near 1e6. The
    //    bigram stream is built NARROWLY per row (transform over the
    //    token array — no window, no explode-then-lag), and every
    //    exchange carries 64-bit xxhash64 bigram keys, never the strings:
    //    at 100 TB the bigram df table is the big side, and hashing cuts
    //    its exchange width ~10x (collisions at 64 bits only perturb df
    //    counts marginally — acceptable for a quality SIGNAL; the oracle
    //    replays exact strings and sf0.01 has no colliding pairs).
    "quality_novelty" -> ((s, d) => {
      val nt = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val base = documents(s, d)
        .select(col("doc_id"), split(nt, " ").as("w"))
        .select(col("doc_id"), col("w"),
          greatest(size(col("w")) - 1, lit(0)).cast("long").as("n_bigrams"))
      val occ = base
        .select(col("doc_id"), explode(expr(
          "transform(slice(w, 1, greatest(size(w) - 1, 0)), " +
            "(x, i) -> xxhash64(concat(x, ' ', element_at(w, i + 2))))"))
          .as("b"))
      val known = occ.select("doc_id", "b").distinct()
        .groupBy("b").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
        .select("b")
      val perDoc = occ.join(known, Seq("b"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_known"))
      base.join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bigrams"),
          coalesce(col("n_known"), lit(0L)).as("n_known"))
        .withColumn("novelty_e6",
          when(col("n_bigrams") === 0L, lit(1000000L))
            .otherwise(floor((col("n_bigrams") - col("n_known"))
              * lit(1000000.0) / col("n_bigrams")).cast("long")))
        .orderBy("doc_id")
    }),

    // -- k-anonymity release planning (the privacy gate a corpus passes
    //    before metadata is published alongside training data): each doc's
    //    quasi-identifier is (lang, source, 128-char length bucket); a doc
    //    releases at level 0 if its exact QID class has ≥ k members,
    //    generalizes source→'*' (level 1) if the coarser (lang, bucket)
    //    class reaches k, else is suppressed (level 2). Deterministic
    //    full-domain generalization — class sizes are data facts, so the
    //    whole decision ladder is exact-integer and oracle-checkable.
    //    Scale shape: two partial-aggregated class-size tables (QID
    //    cardinality ≪ corpus — broadcast joins back), corpus scanned
    //    once, no window over the corpus.
    "anon_kanonymity" -> ((s, d) => {
      val k = 8L
      val docs = documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          expr("n_chars div 128").as("len_bkt"))
      val s0 = docs.groupBy("lang", "source", "len_bkt")
        .agg(count(lit(1)).as("n0"))
      val s1 = docs.groupBy("lang", "len_bkt")
        .agg(count(lit(1)).as("n1"))
      docs
        .join(broadcast(s0), Seq("lang", "source", "len_bkt"))
        .join(broadcast(s1), Seq("lang", "len_bkt"))
        .withColumn("level",
          when(col("n0") >= k, lit(0L))
            .when(col("n1") >= k, lit(1L)).otherwise(lit(2L)))
        .select(col("doc_id"), col("level"),
          when(col("level") === 2L, lit("*")).otherwise(col("lang"))
            .as("rel_lang"),
          when(col("level") === 0L, col("source")).otherwise(lit("*"))
            .as("rel_source"),
          when(col("level") === 2L, lit(-1L))
            .otherwise(col("len_bkt")).as("rel_len_bkt"),
          when(col("level") === 0L, col("n0"))
            .when(col("level") === 1L, col("n1")).otherwise(lit(0L))
            .as("class_size"))
        .orderBy("doc_id")
    }),

    // -- l-diversity release gate (k-anonymity's successor: class SIZE is
    //    not enough — a class where every member shares the sensitive
    //    value leaks it even at n ≥ k). Sensitive attribute = lang;
    //    quasi-identifier = (source, 128-char length bucket). A doc
    //    releases at level 0 if its exact class has ≥ k members AND ≥ l
    //    distinct langs, generalizes the bucket 128→512 (level 1) if the
    //    coarser class passes both tests, else is suppressed (level 2).
    //    Same scale shape as anon_kanonymity: two partial-aggregated
    //    class tables (QID cardinality ≪ corpus) broadcast back onto ONE
    //    corpus pass — the distinct-lang counts live on the class
    //    tables, never a corpus-sized distinct.
    "anon_ldiversity" -> ((s, d) => {
      val k = 8L
      val l = 3L
      val docs = documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          expr("n_chars div 128").as("b128"),
          expr("n_chars div 512").as("b512"))
      val s0 = docs.groupBy("source", "b128")
        .agg(count(lit(1)).as("n0"), countDistinct(col("lang")).as("l0"))
      val s1 = docs.groupBy("source", "b512")
        .agg(count(lit(1)).as("n1"), countDistinct(col("lang")).as("l1"))
      docs
        .join(broadcast(s0), Seq("source", "b128"))
        .join(broadcast(s1), Seq("source", "b512"))
        .withColumn("level",
          when(col("n0") >= k && col("l0") >= l, lit(0L))
            .when(col("n1") >= k && col("l1") >= l, lit(1L))
            .otherwise(lit(2L)))
        .select(col("doc_id"), col("level"),
          when(col("level") === 0L, col("n0"))
            .when(col("level") === 1L, col("n1")).otherwise(lit(0L))
            .as("class_size"),
          when(col("level") === 0L, col("l0"))
            .when(col("level") === 1L, col("l1")).otherwise(lit(0L))
            .as("class_langs"))
        .orderBy("doc_id")
    }),

    // -- t-closeness audit (the third rung of the anonymity ladder:
    //    a class can be large AND diverse yet still leak if its
    //    sensitive-attribute DISTRIBUTION deviates from the corpus).
    //    Quasi-identifier = source; sensitive attribute = the ORDERED
    //    128-char length bucket; distance = the 1-D earth-mover's
    //    distance EMD(P_src, P_corpus) = Σ_b |cum(P_src − P_corpus)|
    //    / (B−1). Distributions are quantized to exact ppm shares
    //    (1e6·c DIV n) BEFORE differencing, so every intermediate is a
    //    bounded integer (|cum diff| ≤ B·1e6 ≈ 4e7 at ANY corpus size —
    //    no cross-multiplied n·N product to overflow) and both engines
    //    agree bit-for-bit. Scale shape: one narrow pass → (source,
    //    bucket) counts; the dense source×bucket grid, the cumsum
    //    window, and the EMD sum all run on a metadata-sized relation
    //    (|sources|·|buckets| rows) — the corpus never shuffles twice.
    "anon_tcloseness" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = 60000L // t·1e6: flag sources farther than 0.06 from corpus
      val docs = documents(s, d)
        .select(col("source"), expr("n_chars div 128").as("bkt"))
      val cnt = docs.groupBy("source", "bkt").agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy("source").agg(sum(col("c")).as("n"))
      val glob = docs.groupBy("bkt").agg(count(lit(1)).as("g"))
      val nAll = docs.agg(count(lit(1)).as("nn"), countDistinct(col("bkt")).as("nb"))
      // dense grid: every source × every global bucket (zero-filled), so
      // cumulative shares line up even where a source has no docs in a
      // bucket — metadata-sized (|sources| × |buckets|)
      val grid = tot.select(col("source"), col("n"))
        .crossJoin(glob)
        .join(cnt, Seq("source", "bkt"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(nAll))
        .select(col("source"), col("bkt"), col("n"), col("nb"),
          (expr("(1000000 * c) DIV n") - expr("(1000000 * g) DIV nn"))
            .as("dppm"))
      val w = Window.partitionBy(col("source")).orderBy(col("bkt"))
      grid.withColumn("cum", sum(col("dppm")).over(w))
        .groupBy(col("source"), col("n"), col("nb"))
        .agg(sum(abs(col("cum"))).as("emd_sum"))
        // greatest(nb-1, 1): a degenerate single-bucket corpus has EMD 0
        // by definition — without the guard Spark's DIV returns NULL
        // while DuckDB's // raises division-by-zero, so the engines
        // would diverge instead of agreeing (oracle mirrors the guard)
        .select(col("source"), col("n"),
          expr("emd_sum DIV greatest(nb - 1, 1)").as("emd_ppm"),
          (expr("emd_sum DIV greatest(nb - 1, 1)") <= t).cast("long")
            .as("t_close"))
        .orderBy("source")
    }),

    // -- DIFFERENTIALLY-PRIVATE count release (the top anonymity rung
    //    after k-anon / l-div / t-closeness: publish per-(event_type, day)
    //    activity counts with ε-DP noise instead of suppressing them).
    //    Mechanism: truncated DISCRETE LAPLACE (two-sided geometric,
    //    α = 1/2 ⇒ ε = ln 2 for sensitivity-1 counts; truncation at ±10
    //    renormalizes tail mass < 1e-3 of the distribution — the standard
    //    bounded-noise variant). The noise draw is EXACT INTEGER
    //    inverse-CDF: slot widths 2^B (z=0) and 2^(B−k) (z=±k) over
    //    W = 3·2^B − 2 equally-likely values, u = (48-bit md5 prefix of
    //    the group key) mod W, and a shared fence table drives both the
    //    Spark when-chain and the oracle's CASE chain — no float, no RNG,
    //    so the release is hash-gated end to end.
    //    ***NOT A PRIVACY GUARANTEE AS SHIPPED*** (ADVICE r8): the draw
    //    is a DETERMINISTIC function of the PUBLISHED group key, so
    //    anyone can recompute the noise and subtract it exactly — this
    //    query is a MECHANISM-SHAPE REPLAY (fence geometry, exact
    //    inverse-CDF, clipping-as-post-processing, all oracle-gated),
    //    not a usable ε-DP release. Production MUST swap the key-derived
    //    hash for a secret-seeded PRF (one-line change at the `u`
    //    expression: hmac(secret, key) mod W) — the mechanism and every
    //    plan property are identical; key-derived is solely what makes
    //    the DuckDB oracle replayable.
    //    max(0, ·) clipping is DP post-processing. Scale shape: one
    //    stateless scan + partial-aggregated count to a metadata-sized
    //    (types × days) relation; the noise is a per-GROUP projection, so
    //    the release costs the same as the count it protects.
    "anon_dp_geometric" -> ((s, d) => {
      val ec = events(s, d).select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("eday"))
      val counts = ec.groupBy("event_type", "eday").agg(count(lit(1)).as("n"))
      val u = pmod(
        conv(substring(md5(concat(col("event_type"), lit("|"),
          col("eday").cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(dpW))
      val noise = dpFences.foldRight(lit(dpFences.last._2): org.apache.spark.sql.Column) {
        case ((ub, zv), rest) => when(col("u") < ub, lit(zv)).otherwise(rest)
      }
      counts.withColumn("u", u)
        .select(col("event_type"), col("eday"),
          greatest(lit(0L), col("n") + noise).as("n_noisy"))
        .orderBy("event_type", "eday")
    }))

  /** Inverse-CDF fence posts of the truncated discrete Laplace (α = 1/2,
    * |z| ≤ B = 10) over W = [[dpW]] equally-likely integers: ordered
    * (upperBound, z) pairs — z = 0 owns the first 2^B slots, then ±k own
    * 2^(B−k) each. Shared verbatim by anon_dp_geometric's when-chain and
    * its oracle's CASE chain so both engines replay the same mechanism. */
  private val dpB = 10
  private[graft] val dpW: Long = 3L * (1L << dpB) - 2
  private[graft] val dpFences: Seq[(Long, Long)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var cum = 1L << dpB
    buf += ((cum, 0L))
    for (k <- 1 to dpB; sgn <- Seq(1L, -1L)) {
      cum += 1L << (dpB - k)
      buf += ((cum, sgn * k))
    }
    buf.toSeq
  }

  /** The oracle-side twins: 48-bit hex-prefix parse (DuckDB has no conv)
    * and the fence CASE chain. */
  private def dpHexSql(mdExpr: String): String =
    (1 to 12).map(i =>
      s"(strpos('0123456789abcdef', substr($mdExpr, $i, 1)) - 1) * ${1L << (4 * (12 - i))}")
      .mkString("(", "\n             + ", ")")
  private def dpNoiseSql: String =
    "CASE " + dpFences.dropRight(1).map { case (ub, zv) =>
      s"WHEN u < $ub THEN $zv" }.mkString(" ") +
      s" ELSE ${dpFences.last._2} END"

  val oracleSql: Map[String, String] = Map(
    "anon_dp_geometric" ->
      s"""WITH c AS (SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS eday,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         h AS (SELECT event_type, CAST(eday AS BIGINT) AS eday, n,
             ${dpHexSql("md5(event_type || '|' || CAST(eday AS VARCHAR))")}
               % $dpW AS u
           FROM c)
         SELECT event_type, eday,
           GREATEST(CAST(0 AS BIGINT), n + ($dpNoiseSql)) AS n_noisy
         FROM h ORDER BY event_type, eday""",
    "quality_lm_bigram" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
               ' ') AS w
           FROM documents),
         b AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
           FROM w, unnest(range(1, len(w))) AS t(i)),
         c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
           FROM b GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1
           FROM c2 GROUP BY 1),
         sc AS (SELECT b.doc_id, (1000000 * c2.c2) // c1.c1 AS ppm
           FROM b JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
           JOIN c1 ON c1.w1 = b.w1),
         a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(ppm) AS BIGINT) AS sum_ppm
           FROM sc GROUP BY 1)
         SELECT doc_id, n_bigrams,
           CAST(sum_ppm // n_bigrams AS BIGINT) AS avg_cond_ppm,
           CAST(CASE WHEN sum_ppm // n_bigrams >= 34500 THEN 1 ELSE 0 END
             AS BIGINT) AS keep
         FROM a ORDER BY doc_id""",
    "sample_importance" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(string_split(regexp_replace(lower(trim(text)),
               '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tok,
             CAST((strpos('0123456789abcdef', substr(md5(regexp_replace(
                 lower(trim(text)), '\s+', ' ', 'g')), 1, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substr(md5(regexp_replace(
                 lower(trim(text)), '\s+', ' ', 'g')), 2, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(regexp_replace(
                 lower(trim(text)), '\s+', ' ', 'g')), 3, 1)) - 1)
               AS BIGINT) AS hv
           FROM documents),
         q AS (SELECT doc_id, n_tok, hv,
             CAST(1 + LEAST(3, n_tok // 40) AS BIGINT) AS q FROM d)
         SELECT doc_id, n_tok, q, hv FROM q
         WHERE hv < q * 512 ORDER BY doc_id""",
    "anon_tcloseness" ->
      """WITH d AS (SELECT source, n_chars // 128 AS bkt FROM documents),
         cnt AS (SELECT source, bkt, CAST(COUNT(*) AS BIGINT) AS c
           FROM d GROUP BY 1, 2),
         tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
           FROM cnt GROUP BY 1),
         gb AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS g
           FROM d GROUP BY 1),
         nall AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(COUNT(DISTINCT bkt) AS BIGINT) AS nb FROM d),
         grid AS (SELECT t.source, gl.bkt, t.n, na.nb,
             (1000000 * COALESCE(c.c, 0)) // t.n
               - (1000000 * gl.g) // na.nn AS dppm
           FROM tot t CROSS JOIN gb gl
           LEFT JOIN cnt c ON c.source = t.source AND c.bkt = gl.bkt
           CROSS JOIN nall na),
         cum AS (SELECT source, n, nb,
             SUM(dppm) OVER (PARTITION BY source ORDER BY bkt) AS cum
           FROM grid),
         e AS (SELECT source, n, nb, CAST(SUM(ABS(cum)) AS BIGINT) AS emd_sum
           FROM cum GROUP BY 1, 2, 3)
         SELECT source, n,
           CAST(emd_sum // GREATEST(nb - 1, 1) AS BIGINT) AS emd_ppm,
           CAST(CASE WHEN emd_sum // GREATEST(nb - 1, 1) <= 60000
             THEN 1 ELSE 0 END AS BIGINT) AS t_close
         FROM e ORDER BY source""",
    "anon_ldiversity" ->
      """WITH d AS (SELECT doc_id, lang, source,
           n_chars // 128 AS b128, n_chars // 512 AS b512 FROM documents),
         s0 AS (SELECT source, b128, COUNT(*) AS n0,
             COUNT(DISTINCT lang) AS l0
           FROM d GROUP BY 1, 2),
         s1 AS (SELECT source, b512, COUNT(*) AS n1,
             COUNT(DISTINCT lang) AS l1
           FROM d GROUP BY 1, 2),
         j AS (SELECT d.doc_id, s0.n0, s0.l0, s1.n1, s1.l1,
             CASE WHEN s0.n0 >= 8 AND s0.l0 >= 3 THEN 0
                  WHEN s1.n1 >= 8 AND s1.l1 >= 3 THEN 1 ELSE 2 END AS level
           FROM d
           JOIN s0 ON s0.source = d.source AND s0.b128 = d.b128
           JOIN s1 ON s1.source = d.source AND s1.b512 = d.b512)
         SELECT doc_id, CAST(level AS BIGINT) AS level,
           CAST(CASE WHEN level = 0 THEN n0 WHEN level = 1 THEN n1 ELSE 0 END
             AS BIGINT) AS class_size,
           CAST(CASE WHEN level = 0 THEN l0 WHEN level = 1 THEN l1 ELSE 0 END
             AS BIGINT) AS class_langs
         FROM j ORDER BY doc_id""",
    "anon_kanonymity" ->
      """WITH d AS (SELECT doc_id, lang, source, n_chars // 128 AS len_bkt
           FROM documents),
         s0 AS (SELECT lang, source, len_bkt, COUNT(*) AS n0
           FROM d GROUP BY 1, 2, 3),
         s1 AS (SELECT lang, len_bkt, COUNT(*) AS n1 FROM d GROUP BY 1, 2),
         j AS (SELECT d.doc_id, d.lang, d.source, d.len_bkt, s0.n0, s1.n1,
             CASE WHEN s0.n0 >= 8 THEN 0 WHEN s1.n1 >= 8 THEN 1 ELSE 2 END
               AS level
           FROM d
           JOIN s0 ON s0.lang = d.lang AND s0.source = d.source
                  AND s0.len_bkt = d.len_bkt
           JOIN s1 ON s1.lang = d.lang AND s1.len_bkt = d.len_bkt)
         SELECT doc_id, CAST(level AS BIGINT) AS level,
           CASE WHEN level = 2 THEN '*' ELSE lang END AS rel_lang,
           CASE WHEN level = 0 THEN source ELSE '*' END AS rel_source,
           CAST(CASE WHEN level = 2 THEN -1 ELSE len_bkt END AS BIGINT)
             AS rel_len_bkt,
           CAST(CASE WHEN level = 0 THEN n0 WHEN level = 1 THEN n1 ELSE 0 END
             AS BIGINT) AS class_size
         FROM j ORDER BY doc_id""",
    "sample_negatives" ->
      """WITH idx AS MATERIALIZED (
           SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i
           FROM documents),
         nn AS (SELECT COUNT(*) AS n FROM idx),
         a AS (SELECT doc_id, i FROM idx WHERE doc_id % 10 = 0),
         e AS (SELECT a.doc_id, a.i, j.j, nn.n,
             (a.i * 2654435761 + j.j * 1000003) % nn.n AS raw
           FROM a, nn, (SELECT unnest([1, 2, 3]) AS j) j),
         x AS (SELECT doc_id, j,
             CASE WHEN raw = i THEN (raw + 1) % n ELSE raw END AS ni
           FROM e)
         SELECT x.doc_id, CAST(x.j AS BIGINT) AS j, b.doc_id AS neg_doc_id
         FROM x JOIN idx b ON b.i = x.ni
         ORDER BY x.doc_id, j""",
    "quality_repetition" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
             len(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS nc
           FROM documents),
         u AS (SELECT doc_id, unnest(w) AS word FROM w),
         wc AS (SELECT doc_id, word, COUNT(*) AS c FROM u GROUP BY doc_id, word),
         top AS (SELECT doc_id, word, c FROM (
             SELECT doc_id, word, c, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY c DESC, word ASC) AS rn FROM wc)
           WHERE rn = 1),
         base AS (SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_words,
             CAST(len(list_distinct(w.w)) AS BIGINT) AS n_distinct,
             w.nc, top.word AS top_word, CAST(top.c AS BIGINT) AS top_cnt
           FROM w JOIN top ON w.doc_id = top.doc_id)
         SELECT doc_id, n_words, n_distinct, top_word, top_cnt,
           CAST(FLOOR(top_cnt * len(top_word) * 1000000.0 / GREATEST(nc, 1))
             AS BIGINT) AS top_char_e6,
           CAST((top_cnt * 10 <= n_words)
             AND ((n_words - n_distinct) * 2 <= n_words) AS BIGINT) AS keep
         FROM base ORDER BY doc_id""",
    "profile_drift" ->
      """WITH cnt AS (SELECT source, n_chars // 100 AS bkt, COUNT(*) AS c
           FROM documents GROUP BY source, n_chars // 100),
         tot AS (SELECT source, SUM(c) AS n FROM cnt GROUP BY source),
         grid AS (SELECT t.source, b.bkt, COALESCE(cnt.c, 0) AS c
           FROM tot t CROSS JOIN (SELECT DISTINCT bkt FROM cnt) b
           LEFT JOIN cnt ON cnt.source = t.source AND cnt.bkt = b.bkt),
         sd AS (SELECT g.source, g.bkt, g.c, t.n
           FROM grid g JOIN tot t ON t.source = g.source)
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(MAX(a.n) AS BIGINT) AS n_a, CAST(MAX(b.n) AS BIGINT) AS n_b,
           CAST(SUM((CAST(a.n + b.n AS HUGEINT)
             * (CAST(a.c AS HUGEINT) * b.n - CAST(b.c AS HUGEINT) * a.n)
             * (CAST(a.c AS HUGEINT) * b.n - CAST(b.c AS HUGEINT) * a.n))
             // (CAST(a.n AS HUGEINT) * b.n * (a.c + b.c)))
             AS BIGINT) AS chi2
         FROM sd a JOIN sd b
           ON a.bkt = b.bkt AND a.source < b.source
         WHERE a.c + b.c > 0
         GROUP BY a.source, b.source
         ORDER BY source_a, source_b""",
    "quality_surprisal" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
           FROM documents),
         tok AS (SELECT doc_id, t FROM w WHERE t <> ''),
         uni AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
         n AS (SELECT length(bin(COUNT(*))) AS nbits FROM tok)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(n.nbits - length(bin(uni.cnt))) AS BIGINT)
             AS surprisal_bits,
           CAST(FLOOR(SUM(n.nbits - length(bin(uni.cnt))) * 100 / COUNT(*))
             AS BIGINT) AS bits_per_tok_x100
         FROM tok JOIN uni USING (t) CROSS JOIN n
         GROUP BY doc_id ORDER BY doc_id""",
    "quality_classifier" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
           FROM documents),
         tok AS (SELECT doc_id, t FROM w WHERE t <> ''),
         hh AS (SELECT doc_id,
             list_reduce(
               list_prepend(CAST(14695981039346656037 AS HUGEINT),
                 list_transform(range(1, len(t)+1),
                   i -> CAST(ord(substr(t, i, 1)) AS HUGEINT))),
               (h, b) -> (xor(h, b) * 1099511628211)
                 % 18446744073709551616) AS h
           FROM tok),
         ws AS (SELECT doc_id,
             CAST((h % 9223372036854775808) % 2001 - 1000 AS BIGINT) AS w
           FROM hh)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(w) AS BIGINT) AS logit,
           CAST(FLOOR(SUM(w) * 1000 / COUNT(*)) AS BIGINT) AS score_x1000,
           CAST(SUM(w) > 0 AS BIGINT) AS keep
         FROM ws GROUP BY doc_id ORDER BY doc_id""",
    "quality_gopher_rules" ->
      """WITH w AS (SELECT doc_id, text,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
             len(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS nc
           FROM documents),
         b AS (SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(FLOOR((nc - (len(w) - 1)) * 10000 / len(w)) AS BIGINT) AS mean_len_e4,
             CAST((len(text) - len(replace(text, '#', '')))
               + (len(text) - len(replace(text, '...', ''))) // 3 AS BIGINT) AS n_sym,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_intersect(w,
               ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_req_stop
           FROM w),
         r AS (SELECT doc_id, n_words, mean_len_e4,
             CAST(FLOOR(n_sym * 1000000.0 / n_words) AS BIGINT) AS sym_e6,
             CAST(FLOOR(n_alpha * 1000000.0 / n_words) AS BIGINT) AS alpha_e6,
             n_req_stop
           FROM b),
         g AS (SELECT doc_id, n_words, mean_len_e4, sym_e6, alpha_e6, n_req_stop,
             CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS r_wc,
             CAST(mean_len_e4 BETWEEN 30000 AND 100000 AS BIGINT) AS r_mwl,
             CAST(sym_e6 < 100000 AS BIGINT) AS r_sym,
             CAST(alpha_e6 > 800000 AS BIGINT) AS r_alpha,
             CAST(n_req_stop >= 2 AS BIGINT) AS r_stop
           FROM r)
         SELECT doc_id, n_words, mean_len_e4, sym_e6, alpha_e6, n_req_stop,
           r_wc, r_mwl, r_sym, r_alpha, r_stop,
           CAST(r_wc + r_mwl + r_sym + r_alpha + r_stop = 5 AS BIGINT) AS keep
         FROM g ORDER BY doc_id""",
    "seq_pack" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tok
           FROM documents),
         o AS (SELECT doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
           FROM t)
         SELECT doc_id, n_tok, CAST(start_off AS BIGINT) AS start_off,
           CAST(start_off // 256 AS BIGINT) AS start_block,
           CAST((start_off + n_tok - 1) // 256 AS BIGINT) AS end_block,
           CAST((start_off + n_tok - 1) // 256 - start_off // 256 + 1 AS BIGINT) AS n_blocks
         FROM o ORDER BY doc_id""",
    "quality_c4_rules" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
           FROM documents),
         g AS (SELECT doc_id, w, len(nt) AS nc,
             CASE WHEN len(w) >= 3 THEN list_transform(
                    range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [nt] END AS g
           FROM w),
         b AS (SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(FLOOR((nc - (len(w) - 1)) * 10000 / len(w)) AS BIGINT) AS mean_len_e4,
             CAST(len(list_intersect(w,
               ['the','and','of','to','in','is','it','for','on','with'])) AS BIGINT) AS n_stop_types,
             CAST(FLOOR((len(g) - len(list_distinct(g))) * 1000000.0 / len(g)) AS BIGINT) AS dup_e6
           FROM g),
         r AS (SELECT doc_id, n_tokens, mean_len_e4, n_stop_types, dup_e6,
             CAST(n_tokens BETWEEN 30 AND 1000 AS BIGINT) AS r_len,
             CAST(mean_len_e4 BETWEEN 20000 AND 120000 AS BIGINT) AS r_wordlen,
             CAST(n_stop_types >= 1 AS BIGINT) AS r_stop,
             CAST(dup_e6 < 600000 AS BIGINT) AS r_rep
           FROM b)
         SELECT doc_id, n_tokens, mean_len_e4, n_stop_types, dup_e6,
           r_len, r_wordlen, r_stop, r_rep,
           CAST(r_len + r_wordlen + r_stop + r_rep = 4 AS BIGINT) AS keep
         FROM r ORDER BY doc_id""",
    "pipeline_curate_pack" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
           FROM documents),
         g AS (SELECT doc_id, w, nt, len(nt) AS nc,
             CASE WHEN len(w) >= 3 THEN list_transform(
                    range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [nt] END AS g
           FROM w),
         b AS (SELECT doc_id, md5(nt) AS text_md5,
             CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(FLOOR((nc - (len(w) - 1)) * 10000 / len(w)) AS BIGINT) AS mean_len_e4,
             CAST(len(list_intersect(w,
               ['the','and','of','to','in','is','it','for','on','with'])) AS BIGINT) AS n_stop_types,
             CAST(FLOOR((len(g) - len(list_distinct(g))) * 1000000.0 / len(g)) AS BIGINT) AS dup_e6
           FROM g),
         k AS (SELECT doc_id, n_tokens AS n_tok, text_md5 FROM b
           WHERE n_tokens BETWEEN 30 AND 1000
             AND mean_len_e4 BETWEEN 20000 AND 120000
             AND n_stop_types >= 1 AND dup_e6 < 600000),
         canon AS (SELECT text_md5, MIN(doc_id) AS canonical_id,
             COUNT(*) AS n_copies
           FROM k GROUP BY text_md5),
         surv AS (SELECT k.doc_id, k.n_tok, c.n_copies
           FROM k JOIN canon c
             ON k.text_md5 = c.text_md5 AND k.doc_id = c.canonical_id),
         o AS (SELECT doc_id, n_tok, n_copies,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
           FROM surv)
         SELECT doc_id, n_tok, n_copies, CAST(start_off AS BIGINT) AS start_off,
           CAST(start_off // 256 AS BIGINT) AS start_block,
           CAST((start_off + n_tok - 1) // 256 AS BIGINT) AS end_block,
           CAST((start_off + n_tok - 1) // 256 - start_off // 256 + 1 AS BIGINT) AS n_blocks
         FROM o ORDER BY doc_id""",
    "pipeline_publish" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
           FROM documents),
         g AS (SELECT doc_id, w, nt, len(nt) AS nc,
             CASE WHEN len(w) >= 3 THEN list_transform(
                    range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [nt] END AS g
           FROM w),
         b AS (SELECT doc_id, md5(nt) AS text_md5,
             CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(FLOOR((nc - (len(w) - 1)) * 10000 / len(w)) AS BIGINT) AS mean_len_e4,
             CAST(len(list_intersect(w,
               ['the','and','of','to','in','is','it','for','on','with'])) AS BIGINT) AS n_stop_types,
             CAST(FLOOR((len(g) - len(list_distinct(g))) * 1000000.0 / len(g)) AS BIGINT) AS dup_e6
           FROM g),
         k AS (SELECT doc_id, n_tokens, text_md5 FROM b
           WHERE n_tokens BETWEEN 30 AND 1000
             AND mean_len_e4 BETWEEN 20000 AND 120000
             AND n_stop_types >= 1 AND dup_e6 < 600000),
         canon AS (SELECT text_md5, MIN(doc_id) AS cid FROM k GROUP BY 1)
         SELECT d.doc_id, d.lang, d.source, k.n_tokens, d.n_chars
         FROM k JOIN canon c ON k.text_md5 = c.text_md5 AND k.doc_id = c.cid
         JOIN documents d ON d.doc_id = k.doc_id
         WHERE d.lang = 'en' ORDER BY d.doc_id""",
    "text_dup_ngrams" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
           FROM documents),
         g AS (SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN list_transform(
                    range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [nt] END AS g
           FROM w)
         SELECT doc_id, len(g) AS n_grams,
           len(g) - len(list_distinct(g)) AS n_dup,
           CAST(FLOOR((len(g) - len(list_distinct(g))) * 1000000.0 / len(g)) AS BIGINT) AS dup_e6
         FROM g ORDER BY doc_id""",
    "contamination" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
           FROM documents),
         sh AS (SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
                    range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [nt] END AS sh
           FROM w),
         ex AS (SELECT doc_id, unnest(sh) AS sng FROM sh),
         probe AS (SELECT DISTINCT sng FROM ex WHERE doc_id < 5)
         SELECT e.doc_id, COUNT(*) AS n_overlap
         FROM ex e JOIN probe p ON e.sng = p.sng
         WHERE e.doc_id >= 5
         GROUP BY e.doc_id ORDER BY doc_id""",
    "sample_reservoir" ->
      """SELECT source, rk, doc_id FROM (
           SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
           FROM documents)
         WHERE rk <= 64 ORDER BY source, rk""",
    "sample_balanced" ->
      """WITH m AS (SELECT MIN(c) AS m FROM (
             SELECT COUNT(*) AS c FROM documents GROUP BY lang)),
         r AS (SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
           FROM documents)
         SELECT lang, rk, doc_id FROM r, m
         WHERE rk <= m.m ORDER BY lang, rk""",
    "sample_kfold" ->
      """SELECT doc_id,
         CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tok,
         CAST(((strpos('0123456789abcdef', substr(md5(regexp_replace(
                 lower(trim(text)), '\s+', ' ', 'g')), 1, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substr(md5(regexp_replace(
                 lower(trim(text)), '\s+', ' ', 'g')), 2, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(regexp_replace(
                 lower(trim(text)), '\s+', ' ', 'g')), 3, 1)) - 1)) % 5
           AS BIGINT) AS fold
         FROM documents ORDER BY doc_id""",
    "sample_stratified" ->
      """SELECT lang, source, COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 1)
                       IN ('0', '1') THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         CAST(FLOOR(SUM(CASE WHEN substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 1)
                       IN ('0', '1') THEN 1 ELSE 0 END) * 1000000.0 / COUNT(*)) AS BIGINT) AS rate_e6
         FROM documents GROUP BY lang, source ORDER BY lang, source""",
    "mix_rebalance" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
         t AS (SELECT SUM(n_total) AS t, COUNT(*) AS ns FROM c),
         r AS (SELECT c.source, CAST(c.n_total AS BIGINT) AS n_total,
             LEAST(4096, CAST(FLOOR(4096 * t.t / (t.ns * c.n_total)) AS BIGINT)) AS thresh
           FROM c, t),
         h AS (SELECT source,
             (strpos('0123456789abcdef', substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 2, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 3, 1)) - 1) AS hv
           FROM documents)
         SELECT r.source, r.n_total, r.thresh,
           CAST(SUM(CASE WHEN h.hv < r.thresh THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(FLOOR(SUM(CASE WHEN h.hv < r.thresh THEN 1 ELSE 0 END)
             * 1000000.0 / r.n_total) AS BIGINT) AS kept_e6
         FROM h JOIN r ON h.source = r.source
         GROUP BY r.source, r.n_total, r.thresh ORDER BY r.source""",
    "mix_temperature" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total
           FROM documents GROUP BY source),
         q0 AS (SELECT source, n_total,
             CAST(FLOOR(SQRT(CAST(n_total AS DOUBLE))) AS BIGINT) AS t0 FROM c),
         q1 AS (SELECT source, n_total,
             CASE WHEN t0 * t0 > n_total THEN t0 - 1 ELSE t0 END AS t1 FROM q0),
         q2 AS (SELECT source, n_total,
             CASE WHEN (t1 + 1) * (t1 + 1) <= n_total THEN t1 + 1 ELSE t1 END
               AS sq FROM q1),
         t AS (SELECT CAST(SUM(n_total) AS BIGINT) AS t,
             CAST(SUM(sq) AS BIGINT) AS ssq FROM q2),
         r AS (SELECT q2.source, q2.n_total, q2.sq,
             LEAST(4096, CAST(FLOOR(4096 * q2.sq * t.t / (t.ssq * q2.n_total))
               AS BIGINT)) AS thresh
           FROM q2, t),
         h AS (SELECT source,
             (strpos('0123456789abcdef', substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 2, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 3, 1)) - 1) AS hv
           FROM documents)
         SELECT r.source, r.n_total, r.sq, r.thresh,
           CAST(SUM(CASE WHEN h.hv < r.thresh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
         FROM h JOIN r ON h.source = r.source
         GROUP BY r.source, r.n_total, r.sq, r.thresh ORDER BY r.source""",
    "mix_epochs" ->
      """WITH hh AS (SELECT doc_id, source,
             list_reduce(
               list_prepend(CAST(14695981039346656037 AS HUGEINT),
                 list_transform(range(1, len(source)+1),
                   i -> CAST(ord(substr(source, i, 1)) AS HUGEINT))),
               (h, b) -> (xor(h, b) * 1099511628211)
                 % 18446744073709551616) AS h
           FROM documents),
         ep AS (SELECT doc_id, source,
             CAST(1 + (h % 9223372036854775808) % 4 AS BIGINT) AS n_epochs
           FROM hh)
         SELECT doc_id, source, n_epochs, CAST(e AS BIGINT) AS epoch
         FROM ep, unnest(generate_series(1, n_epochs)) AS r(e)""",
    "quality_novelty" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
           FROM documents),
         b AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i + 1])) AS b
           FROM w),
         df AS (SELECT b, COUNT(DISTINCT doc_id) AS df FROM b GROUP BY b),
         k AS (SELECT b.doc_id, COUNT(*) AS n_known
           FROM b JOIN df ON b.b = df.b WHERE df.df >= 2 GROUP BY b.doc_id),
         base AS (SELECT doc_id,
             CAST(CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END AS BIGINT) AS n_bigrams
           FROM w)
         SELECT base.doc_id, base.n_bigrams,
           CAST(COALESCE(k.n_known, 0) AS BIGINT) AS n_known,
           CAST(CASE WHEN base.n_bigrams = 0 THEN 1000000
                ELSE FLOOR((base.n_bigrams - COALESCE(k.n_known, 0))
                  * 1000000.0 / base.n_bigrams) END AS BIGINT) AS novelty_e6
         FROM base LEFT JOIN k ON base.doc_id = k.doc_id
         ORDER BY base.doc_id""")
}
