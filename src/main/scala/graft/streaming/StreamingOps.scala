package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` schema (SURVEY.md §2.3
  * "Streaming" row — absent in the reference, declared in the engine plan):
  * watermarked tumbling/sliding window aggregation and stateful
  * sessionization via `flatMapGroupsWithState`.
  *
  * Scale notes: both operators shuffle once on their grouping key
  * (window x type, user_id) and hold bounded state — window state is
  * dropped once the watermark passes, session state dies with its timeout.
  * That bounded-state property is what lets the same code run against an
  * unbounded 100 TB/day stream; sizing is state-per-key x active keys,
  * independent of stream length.
  */
object StreamingOps {

  case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionOut(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Long, sum_value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Tumbling (slide == width) or sliding event-time window counts with a
    * watermark: late rows beyond `watermark` are dropped, window state is
    * reclaimed as the watermark advances. */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes",
      width: String = "5 minutes", slide: Option[String] = None): DataFrame = {
    val w = slide.map(sl => window(col("ts"), width, sl))
      .getOrElse(window(col("ts"), width))
    events
      .withWatermark("ts", watermark)
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Gap-based sessionization: events for a user belong to one session
    * while consecutive gaps stay under `gapMs`; a session closes when the
    * event-time watermark passes its end + gap (EventTimeTimeout), keeping
    * per-user state O(1). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
      (implicit s: SparkSession): Dataset[SessionOut] = {
    import s.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(st.start),
              new Timestamp(st.end), st.n, st.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.end <= gapMs =>
                  cur = Some(SessionState(st.start, math.max(st.end, t),
                    st.n + 1, st.total + e.value))
                case Some(st) =>
                  closed ::= SessionOut(userId, new Timestamp(st.start),
                    new Timestamp(st.end), st.n, st.total)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact deduplication — the ingestion-side twin of
    * [[graft.queries.DedupQueries]]'s `dedup_exact`: keep the first
    * arrival per key, dropping re-deliveries whose event time falls
    * within the watermark window. State is one entry per key seen in the
    * window and is reclaimed as the watermark advances — bounded by
    * (arrival rate x window), independent of stream length, which is
    * what makes it runnable against an unbounded 100 TB/day feed. */
  def dedupStream(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream interval join (the attribution shape: each `click` is
    * matched to the same user's `view`s within `horizonSec` after it).
    * Both sides carry a watermark and the join condition bounds r.ts
    * relative to l.ts, so each side's buffered state is watermark +
    * horizon deep — bounded regardless of stream length (the condition
    * Structured Streaming needs to reclaim join state at all). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      watermark: String = "10 minutes", horizonSec: Long = 600L): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r,
      col("l.user_id") === col("r.user_id") &&
        col("l.event_type") === "click" && col("r.event_type") === "view" &&
        col("r.ts") >= col("l.ts") &&
        col("r.ts") <= col("l.ts") + expr(s"interval $horizonSec seconds"))
      .select(col("l.user_id").as("user_id"), col("l.ts").as("click_ts"),
        col("r.ts").as("view_ts"), col("r.value").as("view_value"))
  }

  /** Stream-static enrichment join: each streaming event picks up its
    * user's dimension row (the per-microbatch lookup every ingestion
    * pipeline runs). The static side is broadcast per micro-batch — no
    * streaming state at all (unlike stream-stream joins), so the operator
    * is stateless and restart-safe; at 100 TB/day the dimension either
    * broadcasts or the join flips to a shuffle on the key, but never
    * buffers the stream. */
  def streamStaticJoin(events: DataFrame, dim: DataFrame,
      streamKey: String = "user_id", dimKey: String = "c_custkey"): DataFrame =
    events.join(broadcast(dim), col(streamKey) === col(dimKey))
      .select(col(streamKey), col("ts"), col("event_type"), col("value"),
        col("c_name"), col("c_nationkey"))

  /** The one streaming operator that is ORACLE-gated (not just spec-gated):
    * the events table replayed through a genuine Structured Streaming
    * session-window aggregation with a deterministic micro-batch +
    * watermark schedule, hash-compared against the same gaps-and-islands
    * SQL that gates the batch twin (`session_window_agg`).
    *
    * Determinism argument (every step is a pure function of the data):
    *  - rows are split into two micro-batches at the midpoint event time;
    *    every batch-2 row is strictly later than batch 1's maximum, so the
    *    watermark after batch 1 (max₁ − delay) can never drop a batch-2
    *    row — zero late-drops, which is what makes the streaming result
    *    equal the batch result by construction rather than by luck;
    *  - two sentinel events (user −1, far future) then push the watermark
    *    past every real session's end + gap: sentinel batch 1 advances the
    *    watermark, sentinel batch 2 executes under it and flushes ALL real
    *    sessions through the append-mode sink. The sentinel's own session
    *    stays open (never emitted) and is filtered out regardless.
    *
    * The driver-side collect is the REPLAY HARNESS, not the operator: the
    * aggregation itself is the same shuffle-once, bounded-state
    * session_window plan that [[windowedAgg]]/production `readStream`
    * would run against a real source — at 100 TB/day the source is Kafka
    * or files and no collect exists anywhere. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_session_window" -> ((s, d) => {
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val rows = graft.Tables.events(s, d)
        .select(col("user_id").cast("long"), unix_micros(col("ts")),
          floor(col("value") * 100).cast("long"))
        .as[(Long, Long, Long)].collect()
      val minUs = rows.iterator.map(_._2).min
      val maxUs = rows.iterator.map(_._2).max
      val midUs = minUs + (maxUs - minUs) / 2
      val (b1, b2) = rows.partition(_._2 <= midUs)
      val gapUs = 30L * 60 * 1000000L
      val delayUs = 10L * 60 * 1000000L
      val sentinelUs = maxUs + gapUs + delayUs + 3600L * 1000000L
      val stream = MemoryStream[(Long, Long, Long)]
      val agg = stream.toDF().toDF("user_id", "us", "v_cents")
        .withColumn("ts", timestamp_micros(col("us")))
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("win"))
        .agg(count(lit(1)).as("n_events"), sum(col("v_cents")).as("value_cents"))
        .select(col("user_id"),
          unix_micros(col("win.start")).as("start_us"),
          unix_micros(col("win.end")).as("end_us"),
          col("n_events"), col("value_cents"))
      val sink = "stream_session_window_sink"
      s.catalog.dropTempView(sink) // re-runs in one session replace the sink
      // the streaming agg inherits shuffle.partitions as its STATE STORE
      // partition count for the query's lifetime; ~1.5k session keys do
      // not need 32 state partitions x per-batch commit files, and each
      // micro-batch pays the store overhead — 8 partitions and a 3-batch
      // schedule (sentinel-1 rides with the second half: it is later than
      // every real row, so the zero-drop argument is unchanged) measured
      // 10.6 s -> ~4 s at sf0.1
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        // batch 0 pins shuffle.partitions into the query's offset metadata;
        // only after it has run is the session conf safe to restore
        stream.addData(b1.toSeq); q.processAllAvailable()
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        stream.addData(b2.toSeq :+ ((-1L, sentinelUs, 0L))); q.processAllAvailable()
        stream.addData(Seq((-1L, sentinelUs + 1000000L, 0L))); q.processAllAvailable()
      } finally {
        q.stop()
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      }
      s.table(sink).filter(col("user_id") >= 0)
        .orderBy("user_id", "start_us")
    }))

  /** Identical to the batch `session_window_agg` oracle: the streaming
    * schedule above drops nothing and flushes everything, so the two
    * engines must agree row-for-row. */
  val oracleSql: Map[String, String] = Map(
    "stream_session_window" ->
      """WITH e AS (SELECT user_id, value, epoch_us(ts) AS us FROM events),
         l AS (SELECT *, LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev FROM e),
         n AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM l),
         sx AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                  ROWS UNBOUNDED PRECEDING) AS sess_no FROM n)
         SELECT user_id, MIN(us) AS start_us,
           MAX(us) + 1800000000 AS end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM sx GROUP BY user_id, sess_no ORDER BY user_id, start_us""")

  /** File-based streaming read of an events directory (the batch parquet
    * becomes a stream source unchanged — same schema, same downstream
    * operators). */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // file stream sources take directories; point at the SF dir and
    // glob-filter to the events file(s)
    s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
  }
}
