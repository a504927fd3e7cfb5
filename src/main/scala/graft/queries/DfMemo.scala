package graft.queries

import org.apache.spark.sql.DataFrame

/** A bounded, access-ordered (LRU) memo of persisted DataFrames.
  *
  * Cross-query memos (the minhash pair table) persist their value so
  * downstream queries skip the expensive build — but an UNBOUNDED memo in
  * a long session over many corpus dirs pins an unbounded set of pair
  * tables, which is the same leak class as a query that never unpersists.
  * This memo caps the live entries: inserting past `cap` evicts the
  * least-recently-used entry and unpersists its DataFrame (the evicted
  * value stays CORRECT for any holder — it just recomputes uncached).
  */
private[graft] final class DfMemo[K](val cap: Int) {
  require(cap >= 1, "cap must be >= 1")

  // accessOrder = true: get() refreshes recency, so the hot dir survives
  private val m = new java.util.LinkedHashMap[K, DataFrame](16, 0.75f, true)

  private def release(df: DataFrame): Unit =
    try df.unpersist(blocking = false) catch { case _: Exception => () }

  /** Current value for `k`, building (and persisting, inside `mk`) on miss;
    * evicts+unpersists the LRU entry when the cap is exceeded. */
  def getOrElseUpdate(k: K)(mk: => DataFrame): DataFrame = synchronized {
    val hit = m.get(k)
    if (hit != null) hit
    else {
      val v = mk
      m.put(k, v)
      while (m.size() > cap) {
        val it = m.entrySet().iterator()
        val eldest = it.next()
        release(eldest.getValue)
        it.remove()
      }
      v
    }
  }

  /** Remove one key, unpersisting its value if present. */
  def invalidate(k: K): Unit = synchronized {
    val v = m.remove(k)
    if (v != null) release(v)
  }

  /** Drop everything, unpersisting each value. */
  def clear(): Unit = synchronized {
    m.values().forEach(release(_))
    m.clear()
  }

  def keys: Seq[K] = synchronized {
    val b = Seq.newBuilder[K]
    m.keySet().forEach(k => b += k)
    b.result()
  }

  def size: Int = synchronized(m.size())
}
