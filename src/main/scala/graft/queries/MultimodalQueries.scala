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
         FROM documents ORDER BY doc_id""")
}
