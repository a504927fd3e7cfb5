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
    }))

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id, len(text) AS payload_len,
         CAST(list_sum(list_transform(range(1, len(text) + 1),
           i -> unicode(text[i]))) AS BIGINT) AS byte_sum,
         CAST(len(text) // 32 + 1 AS BIGINT) AS n_frames
         FROM documents ORDER BY doc_id""")
}
