package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Query-owned cache hygiene for the declared query surface.
  *
  * Iterative/multi-consumer queries must persist intermediates (a peel loop
  * that references its previous round twice would otherwise double its
  * lineage per round), but a query that persists and never unpersists
  * poisons every query that runs after it in the same session: storage
  * memory fills, later stages pay GC + spill, and at 100 TB the "cache"
  * becomes the OOM. The round-3 bench measured exactly that — 10 unchanged
  * queries regressed 3–66x purely from accumulated caches.
  *
  * The contract: a query [[pin]]s what it persists (or [[defer]]s an
  * arbitrary release, e.g. GraphX graphs), and the query SURFACE releases
  * the previous query's pins when the next query is built
  * (SparkEntry.queries wraps every entry with a [[sweep]]). Bench/Verify
  * additionally [[hardSweep]] between queries so no query's measured cost
  * depends on what ran before it.
  */
object Caches {
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[SparkContext, ArrayBuffer[() => Unit]]()

  private def buf(sc: SparkContext): ArrayBuffer[() => Unit] =
    reg.computeIfAbsent(sc, _ => ArrayBuffer.empty[() => Unit])

  /** Persist `df` and register its release with the session's pin set.
    * The release runs at the next [[sweep]] — i.e. after the query's
    * result has been consumed, when the cache has served its purpose. */
  def pin(df: DataFrame): DataFrame = {
    df.persist()
    val b = buf(df.sparkSession.sparkContext)
    b.synchronized { b += (() => df.unpersist(blocking = false)) }
    df
  }

  /** Register an arbitrary cleanup with the session's pin set (GraphX
    * graphs, frames persisted before the call). */
  def defer(s: SparkSession)(f: => Unit): Unit = {
    val b = buf(s.sparkContext)
    b.synchronized { b += (() => f) }
  }

  /** Release every pinned cache of this session (idempotent; failures in
    * individual releases are swallowed — an already-stopped session must
    * not mask the remaining releases). */
  def sweep(s: SparkSession): Unit = {
    val b = buf(s.sparkContext)
    val thunks = b.synchronized { val t = b.toList; b.clear(); t }
    thunks.foreach(t => try t() catch { case _: Exception => () })
  }

  /** Full session cache reset: [[sweep]] + drop the cross-query minhash
    * pair memo + clear the SQL cache + unpersist any stray RDDs (GraphX
    * internals cache aggressively and not every generation is reachable
    * from user code). Bench runs this between queries so per-query times
    * are order-independent. */
  def hardSweep(s: SparkSession): Unit = {
    sweep(s)
    queries.DedupQueries.clearPairsCache()
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
