package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.multimodal.Multimodal

/** Multimodal feature extraction as a declared query: binary payload
  * column -> batched per-partition (stub-)decode -> numeric features.
  * Features are payload-defined so DuckDB reproduces them from the text
  * bytes (ASCII corpus: codepoint == byte). */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> ((s, d) => {
      Multimodal.features(s, documents(s, d))
        .select(col("doc_id"), col("payload_len"), col("byte_sum"), col("n_frames"))
        .orderBy("doc_id")
    }),

    // -- the full media pipeline: batched stub-decode -> 8x8 nearest-
    //    neighbor resize (checksummed) -> 32-byte frame sampling at
    //    stride 4. The resize/sampling INDEX MATH is exact and the oracle
    //    replays it from the payload bytes; only the pixel content is the
    //    deterministic stub. Payloads never cross a shuffle — the whole
    //    pipeline runs in the scan stage, ~40 B/row flows downstream.
    "multimodal_pipeline" -> ((s, d) => {
      Multimodal.pipeline(s, documents(s, d))
        .select(col("doc_id"), col("rs_sum"), col("n_frames_total"),
          col("n_sampled"), col("first_frame_sum"))
        .orderBy("doc_id")
    }),

    // -- near-duplicate MEDIA detection: the image analogue of
    //    dedup_simhash. Batched stub decode -> fixed-geometry 8x8
    //    perceptual hash (four 16-bit bands, see Multimodal.phashBatch) in
    //    the scan stage — payloads never cross a shuffle, 5 longs/doc do.
    //    Candidates come from a banded equi-join (a pair collides iff some
    //    band matches exactly — at 100 TB cap pathological buckets by
    //    band-value frequency like dedup_ngram_jaccard's df cap), then the
    //    cheap exact verify: total Hamming distance over the four bands
    //    <= 12 of 64 bits. Identical payloads land at hamming 0; the
    //    corpus's planted near-dup texts perturb only a few sampled bytes.
    // -- AUDIO features (the modality shape images/video don't cover:
    //    OVERLAPPING windows): stub PCM = payload bytes centered at the
    //    ASCII midpoint, short-time energy over 64-sample windows at hop
    //    32 plus a zero-crossing count — see [[Multimodal.audioBatch]].
    //    Payloads never cross a shuffle; 5 longs/doc flow downstream.
    "multimodal_audio" -> ((s, d) =>
      Multimodal.audio(s, documents(s, d))
        .select(col("doc_id"), col("n_samples"), col("n_windows"),
          col("energy_total"), col("energy_max"), col("n_zero_cross"))
        .orderBy("doc_id")),

    "multimodal_dedup" -> ((s, d) => {
      val h = graft.Caches.pin(Multimodal.phash(s, documents(s, d)))
      val bands = (0 to 3).map { j =>
        h.select(col("doc_id"), lit(j).as("band"), col(s"b$j").as("v"))
      }.reduce(_ unionByName _)
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      def side(p: String): DataFrame = h.select(
        col("doc_id").as(p),
        col("b0").as(p + "0"), col("b1").as(p + "1"),
        col("b2").as(p + "2"), col("b3").as(p + "3"))
      cand.join(side("a"), "a").join(side("b"), "b")
        .select(col("a"), col("b"),
          (bit_count(col("a0").bitwiseXOR(col("b0"))) +
            bit_count(col("a1").bitwiseXOR(col("b1"))) +
            bit_count(col("a2").bitwiseXOR(col("b2"))) +
            bit_count(col("a3").bitwiseXOR(col("b3"))))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 12)
        .orderBy("a", "b")
    }))

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id, len(text) AS payload_len,
         CAST(list_sum(list_transform(range(1, len(text) + 1),
           i -> unicode(text[i]))) AS BIGINT) AS byte_sum,
         CAST(len(text) // 32 + 1 AS BIGINT) AS n_frames
         FROM documents ORDER BY doc_id""",
    // resize index math replayed exactly: rs[p] = payload[(sy*w + sx) mod L]
    // with sy = (p//8)*h//8, sx = (p%8)*w//8, w = doc_id%64+1,
    // h = doc_id%48+1 (ASCII corpus: unicode(char) == byte)
    "multimodal_pipeline" ->
      """SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 64), p ->
           unicode(text[((((p // 8) * (doc_id % 48 + 1) // 8) * (doc_id % 64 + 1)
             + ((p % 8) * (doc_id % 64 + 1) // 8)) % len(text)) + 1]))) AS BIGINT) AS rs_sum,
         CAST(len(text) // 32 AS BIGINT) AS n_frames_total,
         CAST((len(text) // 32 + 3) // 4 AS BIGINT) AS n_sampled,
         CAST(CASE WHEN len(text) >= 32
           THEN list_sum(list_transform(range(1, 33), i -> unicode(text[i])))
           ELSE 0 END AS BIGINT) AS first_frame_sum
         FROM documents ORDER BY doc_id""",
    // window/hop math replayed exactly: window wi covers samples
    // [wi*32, wi*32+64), sample i = unicode(char i) - 64 (ASCII corpus)
    "multimodal_audio" ->
      """WITH s AS (SELECT doc_id, len(text) AS n,
             list_transform(range(1, len(text) + 1),
               i -> unicode(text[i]) - 64) AS sv
           FROM documents),
         w AS (SELECT doc_id, n, sv,
             CASE WHEN n >= 64 THEN (n - 64) // 32 + 1 ELSE 0 END
               AS n_windows
           FROM s),
         e AS (SELECT doc_id, n, sv, n_windows,
             list_transform(range(0, n_windows), wi ->
               list_sum(list_transform(range(0, 64), i ->
                 sv[wi * 32 + i + 1] * sv[wi * 32 + i + 1]))) AS energies
           FROM w)
         SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
           CAST(n_windows AS BIGINT) AS n_windows,
           CAST(COALESCE(list_sum(energies), 0) AS BIGINT) AS energy_total,
           CAST(COALESCE(list_max(energies), 0) AS BIGINT) AS energy_max,
           CAST(COALESCE(list_sum(list_transform(range(2, n + 1), i ->
             CASE WHEN (sv[i - 1] < 0) <> (sv[i] < 0) THEN 1 ELSE 0 END)),
             0) AS BIGINT) AS n_zero_cross
         FROM e ORDER BY doc_id""",
    // phash replayed exactly from the bytes: rs[p] = payload[(2*(p//8)*16
    // + 2*(p%8)) mod len], bit p iff 64*rs[p] > sum; four 16-bit bands;
    // naive OR-join stands in for the banded equi-join (same pair set)
    "multimodal_dedup" ->
      """WITH sm AS (SELECT doc_id, list_transform(range(0, 64), p ->
             unicode(text[((2 * (p // 8) * 16 + 2 * (p % 8)) % len(text)) + 1]))
             AS rs FROM documents),
         t AS (SELECT doc_id, rs, list_sum(rs) AS tot FROM sm),
         b AS (SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 16), i ->
               CASE WHEN 64 * rs[i + 1] > tot THEN (1 << i) ELSE 0 END))
               AS BIGINT) AS b0,
             CAST(list_sum(list_transform(range(0, 16), i ->
               CASE WHEN 64 * rs[16 + i + 1] > tot THEN (1 << i) ELSE 0 END))
               AS BIGINT) AS b1,
             CAST(list_sum(list_transform(range(0, 16), i ->
               CASE WHEN 64 * rs[32 + i + 1] > tot THEN (1 << i) ELSE 0 END))
               AS BIGINT) AS b2,
             CAST(list_sum(list_transform(range(0, 16), i ->
               CASE WHEN 64 * rs[48 + i + 1] > tot THEN (1 << i) ELSE 0 END))
               AS BIGINT) AS b3
           FROM t),
         cand AS (SELECT x.doc_id AS a, y.doc_id AS b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
               + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
               AS BIGINT) AS hamming
           FROM b x JOIN b y ON x.doc_id < y.doc_id
             AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3))
         SELECT a, b, hamming FROM cand WHERE hamming <= 12 ORDER BY a, b""")
}
