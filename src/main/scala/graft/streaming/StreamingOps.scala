package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
