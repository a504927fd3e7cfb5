package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2.3 + §2.4): each
  * entry is a named DataFrame program over the parquet testdata at `dir`,
  * and (where SQL-expressible) `oracleSql` carries the DuckDB-dialect
  * equivalent the driver hash-compares against.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every entry is wrapped with a [[Caches.sweep]]: building query N+1
    * releases whatever query N pinned (persisted intermediates, GraphX
    * graphs), so the surface is self-cleaning — no consumer of this map
    * can accumulate cached storage across queries, which is what poisoned
    * the round-3 bench (10 unchanged queries regressed 3–66x under leaked
    * caches). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, fn) =>
      name -> { (s: SparkSession, d: String) =>
        Caches.sweep(s)
        fn(s, d)
      }
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TpchQueries.queries ++ GraphQueries.queries ++
      GraphAlgos.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries ++ CurationQueries.queries ++
      ScaleOps.queries ++ graft.streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ TpchQueries.oracleSql ++ GraphQueries.oracleSql ++
      GraphAlgos.oracleSql ++ DedupQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ TextQueries.oracleSql ++
      MultimodalQueries.oracleSql ++ CurationQueries.oracleSql ++
      ScaleOps.oracleSql ++ graft.streaming.StreamingOps.oracleSql
}
