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

  /** Word 3-grams WITHOUT dedup (repetition needs multiplicity); short
    * docs fall back to the whole text, mirroring [[DedupQueries.shingles]]
    * — same native expression, distinct off. */
  private def grams(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Exprs
    Exprs.toColumn(graft.functions.Shingles(Exprs.toExpr(c), 3, distinct = false))
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

    // -- deterministic content-addressed sampling (md5 prefix in {0,1} =
    //    1/8 rate) with per-(lang, source) stratum accounting. The sample
    //    decision depends only on content — identical across cluster
    //    sizes, partitionings and re-runs, which rand()-sampling is not.
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
    }))

  val oracleSql: Map[String, String] = Map(
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
    "sample_stratified" ->
      """SELECT lang, source, COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 1)
                       IN ('0', '1') THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         CAST(FLOOR(SUM(CASE WHEN substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 1)
                       IN ('0', '1') THEN 1 ELSE 0 END) * 1000000.0 / COUNT(*)) AS BIGINT) AS rate_e6
         FROM documents GROUP BY lang, source ORDER BY lang, source""")
}
