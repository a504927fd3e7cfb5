package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

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
    * per-user state O(1). State tracks event time in MICROSECONDS
    * (`Timestamp.getTime` is ms and would truncate the testdata's real
    * µs components — the emitted boundaries must round-trip exactly for
    * the oracle hash gate); the state-timeout clock is ms-granular, so
    * the timeout rounds UP one ms — firing a sub-ms late never changes
    * the output, firing early could. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermark: Option[String] = Some("10 minutes"))
      (implicit s: SparkSession): Dataset[SessionOut] = {
    import s.implicits._
    val gapUs = gapMs * 1000L
    def usOf(t: Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def tsOf(us: Long): Timestamp = Timestamp.from(
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L))
    watermark.fold(events)(w => events.withWatermark("ts", w))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, tsOf(st.start),
              tsOf(st.end), st.n, st.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => usOf(e.ts))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = usOf(e.ts)
              cur match {
                case Some(st) if t - st.end <= gapUs =>
                  cur = Some(SessionState(st.start, math.max(st.end, t),
                    st.n + 1, st.total + e.value))
                case Some(st) =>
                  closed ::= SessionOut(userId, tsOf(st.start),
                    tsOf(st.end), st.n, st.total)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp((st.end + gapUs) / 1000L + 1L)
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

  /** One replayed event row — the shared schema for every ORACLE-gated
    * streaming query (session windows, tumbling windows, dedup). */
  case class Replay(event_id: Long, user_id: Long, us: Long,
      v_cents: Long, event_type: String)

  case class RunOut(event_id: Long, user_id: Long, run_n: Long, run_cents: Long)
  // public: the state encoder's generated code must reach the accessors
  case class RunTotals(n: Long, cents: Long)

  /** Per-user running totals on the NEW arbitrary-state API
    * (`transformWithState`, Spark 4 — the typed-state successor to
    * flatMapGroupsWithState, RocksDB-backed): one ValueState[RunTotals]
    * per user, rows folded in (event-time, event_id) order within each
    * micro-batch. The time-ordered replay makes every emitted prefix
    * deterministic — batch k's rows are all earlier than batch k+1's and
    * the handler sorts within the batch — so the streaming output equals
    * the batch window-function result the oracle replays. State is two
    * longs per user (production would bound idle keys with a TTLConfig);
    * no timers — this is the pure cross-batch state-fold shape. */
  case class ScdOut(user_id: Long, event_type: String, valid_from_us: Long,
      valid_to_us: Long, n_events: Long)
  case class ScdState(event_type: String, since_us: Long, n: Long)

  /** Streaming SCD-2 maintenance — the CDC-feed dimension-history shape,
    * the streaming twin of the batch `scd2_intervals`: per-user
    * ValueState holds the OPEN version (type, since, count); a row with
    * a different type CLOSES it (emit) and opens the next. Append-mode
    * emission is exactly the closed-interval set — the batch query's
    * rows minus its NULL-valid_to open rows, which is what the oracle
    * selects. Same determinism argument as [[RunningTotals]]: time-split
    * batches + in-handler sort give a total (ts, event_id) order. */
  private class ScdIntervals extends StatefulProcessor[Long, Replay, ScdOut] {
    @transient private var st: ValueState[ScdState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ScdState]("scd",
        org.apache.spark.sql.Encoders.product[ScdState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Replay],
        tv: TimerValues): Iterator[ScdOut] = {
      val sorted = rows.toArray.sortBy(r => (r.us, r.event_id))
      var cur = if (st.exists()) st.get() else null
      val out = scala.collection.mutable.ArrayBuffer.empty[ScdOut]
      for (r <- sorted) {
        if (cur == null) cur = ScdState(r.event_type, r.us, 1L)
        else if (cur.event_type == r.event_type) cur = cur.copy(n = cur.n + 1)
        else {
          out += ScdOut(key, cur.event_type, cur.since_us, r.us, cur.n)
          cur = ScdState(r.event_type, r.us, 1L)
        }
      }
      if (cur != null) st.update(cur)
      out.iterator
    }
  }

  case class TimerSessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, value_cents: Long)
  // public: janino's encoder codegen must reach the accessors
  case class TimerSessionState(start_us: Long, end_us: Long, n: Long,
      cents: Long, timer_ms: Long)

  /** Gap sessionization on `transformWithState` with EVENT-TIME TIMERS —
    * the third arbitrary-state feature after ValueState (stream_tws_running)
    * and change-detection (stream_scd2): instead of flatMapGroupsWithState's
    * single implicit timeout, the processor OWNS its timer set
    * (registerTimer/deleteTimer on the handle; handleExpiredTimer fires
    * when the watermark passes the registered event time). Each user holds
    * one open session and exactly one live timer at end + gap: rows extend
    * the session (delete old timer, register the new one) or close it
    * in-batch on a gap; the watermark closes the last session through the
    * timer callback. The timeout clock is ms-granular so the timer rounds
    * UP one ms — firing sub-ms late never changes output (state times stay
    * µs-exact, same discipline as [[sessionize]]). */
  private class TimerSessions(gapUs: Long)
      extends StatefulProcessor[Long, Replay, TimerSessionOut] {
    @transient private var st: ValueState[TimerSessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TimerSessionState]("sess",
        org.apache.spark.sql.Encoders.product[TimerSessionState], TTLConfig.NONE)
    private def timerFor(endUs: Long): Long = (endUs + gapUs) / 1000L + 1L
    override def handleInputRows(key: Long, rows: Iterator[Replay],
        tv: TimerValues): Iterator[TimerSessionOut] = {
      val sorted = rows.toArray.sortBy(r => (r.us, r.event_id))
      var cur = if (st.exists()) Option(st.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[TimerSessionOut]
      for (r <- sorted) cur match {
        case Some(c) if r.us - c.end_us <= gapUs =>
          cur = Some(c.copy(end_us = math.max(c.end_us, r.us), n = c.n + 1,
            cents = c.cents + r.v_cents))
        case Some(c) =>
          out += TimerSessionOut(key, c.start_us, c.end_us, c.n, c.cents)
          cur = Some(TimerSessionState(r.us, r.us, 1L, r.v_cents, c.timer_ms))
        case None =>
          cur = Some(TimerSessionState(r.us, r.us, 1L, r.v_cents, -1L))
      }
      cur.foreach { c =>
        val t = timerFor(c.end_us)
        if (c.timer_ms != t) {
          if (c.timer_ms >= 0) getHandle.deleteTimer(c.timer_ms)
          getHandle.registerTimer(t)
        }
        st.update(c.copy(timer_ms = t))
      }
      out.iterator
    }
    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[TimerSessionOut] = {
      if (st.exists() && st.get().timer_ms == info.getExpiryTimeInMs) {
        val c = st.get()
        st.clear()
        Iterator.single(TimerSessionOut(key, c.start_us, c.end_us, c.n, c.cents))
      } else Iterator.empty
    }
  }

  case class TypeCountOut(event_id: Long, user_id: Long, event_type: String,
      type_n: Long)

  /** Per-user per-event-type running counts on MapState — the fourth
    * arbitrary-state shape (after ValueState, change-detection and
    * timers): a composite-keyed sub-map per stream key, the state layout
    * behind per-entity feature counters (clicks per campaign, errors per
    * endpoint). On the RocksDB store each (user, type) entry is its own
    * store key, so updating one type never rewrites the user's whole map
    * — which is the point of MapState over a ValueState[Map[...]] at
    * scale. Every row emits its type's new count, so the oracle
    * value-checks each individual map-entry round-trip across batches. */
  private class TypeCounts extends StatefulProcessor[Long, Replay, TypeCountOut] {
    @transient private var st: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Replay],
        tv: TimerValues): Iterator[TypeCountOut] = {
      val sorted = rows.toArray.sortBy(r => (r.us, r.event_id))
      sorted.iterator.map { r =>
        val n = (if (st.containsKey(r.event_type)) st.getValue(r.event_type)
                 else 0L) + 1L
        st.updateValue(r.event_type, n)
        TypeCountOut(r.event_id, key, r.event_type, n)
      }
    }
  }

  case class LagOut(event_id: Long, user_id: Long, prev1: Long, prev2: Long,
      prev3: Long)

  /** Per-user bounded recent-history buffer on ListState — the fifth
    * arbitrary-state shape: the last-K-events window behind streaming
    * feature lags, fraud n-grams and micro-pattern detectors. Each row
    * emits the previous 3 event ids (−1-padded), i.e. streaming LAG 1–3;
    * the buffer is rewritten trimmed to K=3 via put(), so state per key
    * is K longs regardless of stream length. The batch-window oracle
    * (LAG over (user, time)) value-checks every buffer round-trip —
    * a list restored wrong in batch 2 corrupts that user's whole
    * lag suffix. */
  private class RecentEvents extends StatefulProcessor[Long, Replay, LagOut] {
    @transient private var st: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Long]("recent",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Replay],
        tv: TimerValues): Iterator[LagOut] = {
      val sorted = rows.toArray.sortBy(r => (r.us, r.event_id))
      var buf = if (st.exists()) st.get().toArray else Array.empty[Long]
      val out = sorted.map { r =>
        val o = LagOut(r.event_id, key,
          if (buf.length > 0) buf(0) else -1L,
          if (buf.length > 1) buf(1) else -1L,
          if (buf.length > 2) buf(2) else -1L)
        buf = (r.event_id +: buf).take(3)
        o
      }
      st.put(buf)
      out.iterator
    }
  }

  private class RunningTotals extends StatefulProcessor[Long, Replay, RunOut] {
    @transient private var st: ValueState[RunTotals] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RunTotals]("totals",
        org.apache.spark.sql.Encoders.product[RunTotals], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Replay],
        tv: TimerValues): Iterator[RunOut] = {
      val sorted = rows.toArray.sortBy(r => (r.us, r.event_id))
      var cur = if (st.exists()) st.get() else RunTotals(0L, 0L)
      val out = sorted.map { r =>
        cur = RunTotals(cur.n + 1, cur.cents + r.v_cents)
        RunOut(r.event_id, key, cur.n, cur.cents)
      }
      st.update(cur)
      out.iterator
    }
  }

  /** State-store parallelism for the replay harnesses, parameterised
    * (GRAFT_STREAM_PARTS): a production deployment sizes state
    * partitions to keys/sec, never to the box's core count — batch 0
    * pins the value into the checkpoint's offset metadata either way,
    * so it is a per-pipeline choice. 8 stays the local default: the r11
    * A/B at 4 read within run-to-run noise (18.2 vs 19.7 s over the
    * 5-query stream sample), so there is no local win to chase and the
    * committed records stay comparable. Results are
    * partition-count-invariant (the oracle gate pins that). */
  private def streamShufflePartitions: String =
    sys.env.getOrElse("GRAFT_STREAM_PARTS", "8")

  private def replayRows(s: SparkSession, d: String): Array[Replay] = {
    import s.implicits._
    graft.Tables.events(s, d)
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        unix_micros(col("ts")), floor(col("value") * 100).cast("long"),
        col("event_type"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => Replay(r._1, r._2, r._3, r._4, r._5))
  }

  /** Deterministic replay harness behind the oracle-gated streaming
    * queries: the events table pushed through a REAL Structured Streaming
    * query (watermark, append mode, state store, memory sink) on a
    * micro-batch + watermark schedule that is a pure function of the data:
    *
    *  - rows split into two micro-batches at the midpoint event time;
    *    every batch-2 row is strictly later than batch 1's maximum, so the
    *    watermark after batch 1 (max₁ − delay) can never drop a row —
    *    zero late-drops, which makes the streaming result equal the batch
    *    result by construction rather than by luck;
    *  - a far-future sentinel rides with batch 2 to advance the watermark
    *    past every real window/session end, and a second sentinel batch
    *    executes under that watermark to flush all real state through the
    *    append sink. Sentinel rows (negative ids) never finalize and are
    *    filtered from the output regardless.
    *
    * The state store runs at 8 partitions (a few thousand keys do not
    * need 32 partitions of per-batch commit files; `shuffle.partitions`
    * is pinned into the query's offset metadata at batch 0 and the
    * session conf restored right after). The driver-side collect is the
    * REPLAY HARNESS, not the operator: the streaming plan is the same
    * shuffle-once, bounded-state query a production `readStream` would
    * run — at 100 TB/day the source is Kafka or files and no collect
    * exists anywhere.
    *
    * Since round 10 the declared stream surface runs [[replayThroughFiles]]
    * (the production file-ingest path, zero collects); this MemoryStream
    * path is kept for exactly TWO declared twins (`stream_time_window`,
    * `stream_chained_agg`) whose file variants share their oracles — the
    * pair pins, round after round, that memory-vs-file ingest is
    * result-invisible for both the 1-deep and 2-deep stateful shapes.
    *
    * `expand` perturbs each batch before it is fed (e.g. duplicating rows
    * to simulate at-least-once redelivery for the dedup query). */
  private def replayThroughStream(s: SparkSession, d: String, sink: String,
      expand: Seq[Replay] => Seq[Replay],
      build: DataFrame => DataFrame,
      sentinelGapUs: Long = 2L * 3600L * 1000000L,
      sentinelTypes: Seq[String] = Seq("~sentinel"),
      outputMode: String = "append",
      flushBatches: Int = 1): DataFrame = {
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val rows = replayRows(s, d)
    val minUs = rows.iterator.map(_.us).min
    val maxUs = rows.iterator.map(_.us).max
    val midUs = minUs + (maxUs - minUs) / 2
    val (b1, b2) = rows.partition(_.us <= midUs)
    // default gap clears every session end (+gap), window end (+1h) and
    // watermark (+10m); queries whose state out-lives windows (the outer
    // interval join's 24h click horizon) pass a wider gap
    val sentinelUs = maxUs + sentinelGapUs
    // sentinel rows must REACH the watermark operator to advance it —
    // Catalyst pushes deterministic filters below EventTimeWatermark, so
    // a query whose branches filter on event_type (the interval joins)
    // must use sentinel types that pass its own filters (negative ids
    // keep them out of the declared output regardless)
    def sentinels(usv: Long) = sentinelTypes.map(t => Replay(-1L, -1L, usv, 0L, t))
    val stream = MemoryStream[Replay]
    val src = stream.toDF()
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "10 minutes")
    val out = build(src)
    s.catalog.dropTempView(sink) // re-runs in one session replace the sink
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", streamShufflePartitions)
    // no-data micro-batches off — same argument as [[replayThroughFiles]]:
    // the flush data batches perform every propagation an empty batch
    // would, so the empty batches were pure per-trigger commit overhead
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = s.conf.get(noDataKey)
    s.conf.set(noDataKey, "false")
    // explicit checkpoint on scratch (tmpfs when available): the default
    // temp checkpoint lands in /tmp on the OS disk, and the state store's
    // per-batch delta/commit files + offset log are the bulk of a short
    // replay's wall-clock there ([[graft.Scratch]]); deleted in finally —
    // a leaked tmpfs checkpoint is leaked RAM
    val ckpt = graft.Scratch.dir(s"ckpt_$sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .outputMode(outputMode).start()
    try {
      // batch 0 pins shuffle.partitions into the query's offset metadata;
      // only after it has run is the session conf safe to restore
      stream.addData(expand(b1.toSeq)); q.processAllAvailable()
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      stream.addData(expand(b2.toSeq) ++ sentinels(sentinelUs))
      q.processAllAvailable()
      // trailing sentinel batches under the advanced watermark flush all
      // real state through the append sink; CHAINED stateful operators
      // need one flush batch per extra stateful stage (operator k's final
      // rows are produced in the batch where operator k-1 emitted them,
      // so an n-deep chain drains over n batches)
      for (i <- 1 to math.max(1, flushBatches)) {
        stream.addData(sentinels(sentinelUs + i * 1000000L))
        q.processAllAvailable()
      }
    } finally {
      // a throwing stop() must not leak the conf override or the tmpfs
      // checkpoint (leaked tmpfs = leaked RAM)
      try q.stop() finally {
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        s.conf.set(noDataKey, prevNoData)
        graft.Scratch.delete(ckpt)
      }
    }
    s.table(sink)
  }

  /** FILE-SOURCE replay harness — the scale ingest path (at 100 TB/day
    * events arrive as files or Kafka): the same two-batch + sentinel
    * watermark schedule as [[replayThroughStream]], but the source is
    * `readStream` over a parquet DIRECTORY the corpus is dropped into in
    * file batches, and NOTHING here collects a corpus row to the driver —
    * the batch boundary comes from one 1-row min/max aggregate, the batch
    * files are distributed writes, and per-trigger arrival is a file
    * rename into the watched directory (atomic per file). Every batch-2
    * row is strictly later than batch 1's max, so the watermark can never
    * drop a row and the streaming result equals the batch result by
    * construction; `flushBatches` trailing sentinel files drain chained
    * stateful stages exactly like the MemoryStream harness (one flush
    * batch per extra stateful operator). Callers share the batch twins'
    * oracles — the gate is identical to the MemoryStream path's.
    *
    * Parameter-for-parameter twin of [[replayThroughStream]] so every
    * declared stream query can run the production ingest path: `expand`
    * perturbs each DATA batch before it is staged (a DataFrame transform —
    * e.g. self-union to simulate at-least-once redelivery — never a
    * driver-side Seq), `sentinelTypes`/`sentinelGapUs` shape the
    * watermark-advancing flush rows, and `outputMode` passes through to
    * the sink (complete-mode queries need no flush choreography but run
    * the identical schedule for comparability). */
  private def replayThroughFiles(s: SparkSession, d: String, sink: String,
      build: DataFrame => DataFrame,
      expand: DataFrame => DataFrame = identity,
      sentinelGapUs: Long = 2L * 3600L * 1000000L,
      sentinelTypes: Seq[String] = Seq("~sentinel"),
      outputMode: String = "append",
      flushBatches: Int = 1): DataFrame = {
    import s.implicits._
    val ev = graft.Tables.events(s, d)
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100).cast("long").as("v_cents"),
        col("event_type"))
    val mm = ev.agg(min(col("us")), max(col("us"))).head() // 1-row scalar
    val (minUs, maxUs) = (mm.getLong(0), mm.getLong(1))
    val midUs = minUs + (maxUs - minUs) / 2
    val sentinelUs = maxUs + sentinelGapUs
    val root = java.nio.file.Paths.get(graft.Scratch.dir(s"file_$sink"))
    java.nio.file.Files.createDirectories(root)
    val inDir = root.resolve("in")
    java.nio.file.Files.createDirectories(inDir)
    graft.Caches.defer(s) { // the memory sink holds the result; the
      import scala.jdk.CollectionConverters._ // files are harness-only
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists)
    }
    def sentinelDf(usv: Long) =
      sentinelTypes.map(t => (-1L, -1L, usv, 0L, t))
        .toDF("event_id", "user_id", "us", "v_cents", "event_type")
    // distributed writes into staging; arrival = renaming the part
    // files into the watched directory (atomic per file)
    def staged(df: DataFrame, name: String): Seq[java.nio.file.Path] = {
      val out = root.resolve(name)
      df.write.parquet(out.toString)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(out).iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
    }
    val b1 = staged(expand(ev.filter(col("us") <= midUs)), "b1")
    val b2 = staged(expand(ev.filter(col("us") > midUs))
      .unionByName(sentinelDf(sentinelUs)), "b2")
    val flushes = (1 to math.max(1, flushBatches)).map(i =>
      staged(sentinelDf(sentinelUs + i * 1000000L), s"b${2 + i}"))
    def arrive(files: Seq[java.nio.file.Path], pfx: String): Unit =
      files.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.move(f, inDir.resolve(s"${pfx}_$i.parquet")) }
    val src = s.readStream.schema(ev.schema).parquet(inDir.toString)
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "10 minutes")
    s.catalog.dropTempView(sink)
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", streamShufflePartitions)
    // No-data micro-batches OFF (optimization round 10): the harness's
    // flush choreography already provides one DATA batch per stateful
    // stage, which is exactly the propagation a no-data batch performs —
    // with the default on, every watermark-advancing data batch was
    // followed by a redundant empty micro-batch paying the full commit
    // path (offset/commit log fsyncs + one state-store commit per
    // partition per stateful operator). Results are identical BY
    // CONSTRUCTION of the schedule (every emission a no-data batch would
    // perform happens in the next flush data batch instead, and a flush
    // batch exists for every stage); the oracle gate and the
    // batch-equality specs pin it per query. At scale the same flag
    // removes one cluster-wide barrier per trigger.
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = s.conf.get(noDataKey)
    s.conf.set(noDataKey, "false")
    val q = build(src)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .outputMode(outputMode).start()
    try {
      // the FIRST batch that runs pins shuffle.partitions=8 into the
      // query's offset metadata; an `expand` may leave batch 1 with zero
      // files (the harness floor feeds empty data batches), so the
      // restore happens in `finally` — nothing else in this function
      // reads the session conf while the query drains
      arrive(b1, "b1"); q.processAllAvailable()
      arrive(b2, "b2"); q.processAllAvailable()
      flushes.zipWithIndex.foreach { case (fs, i) =>
        arrive(fs, s"b${3 + i}"); q.processAllAvailable()
      }
    } finally {
      try q.stop()
      finally {
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        s.conf.set(noDataKey, prevNoData)
      }
    }
    s.table(sink)
  }

  /** The replay harness's OWN cost, isolated: the identical batch +
    * sentinel schedule every stream_* query runs — batch-boundary
    * aggregate, staged parquet writes, file renames, checkpoint init,
    * micro-batch commits, state-store plumbing, memory sink — driving a
    * minimal windowed count with ZERO real rows (every data batch is
    * emptied by `expand`; only sentinels flow). Runs the FILE-SOURCE
    * path because that is what the declared stream surface runs (the two
    * MemoryStream twins kept for ingest-invariance carry a slightly
    * different floor — no staging writes, one driver collect instead).
    * [[graft.Bench]] records its median as `stream_harness_floor` so
    * each stream row's operator cost and harness cost are separable —
    * round 8's stream_chained_agg measured 5.7/9.3/11.0 s across records
    * on unchanged code, and the moving part was this floor, not the
    * operator. Not an oracle query: the output is empty by construction
    * (the sentinel window is filtered exactly as every stream query
    * filters its sentinels). */
  def harnessFloor(s: SparkSession, d: String): DataFrame =
    replayThroughFiles(s, d, "stream_harness_floor_sink",
      expand = _.limit(0),
      build = src => src
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") < 0))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- session windows through the streaming engine; hash-compared
    //    against the same gaps-and-islands SQL that gates the batch twin
    //    (`session_window_agg`). Sessions merge across batches in the
    //    state store; the sentinel flush emits them all.
    "stream_session_window" -> ((s, d) =>
      replayThroughFiles(s, d, "stream_session_window_sink",
        build = src => src
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("win"))
          .agg(count(lit(1)).as("n_events"), sum(col("v_cents")).as("value_cents"))
          .select(col("user_id"),
            unix_micros(col("win.start")).as("start_us"),
            unix_micros(col("win.end")).as("end_us"),
            col("n_events"), col("value_cents")))
        .filter(col("user_id") >= 0)
        .orderBy("user_id", "start_us")),

    // -- CUSTOM-STATE sessionization through the streaming engine: the
    //    same gap rule as stream_session_window but implemented with
    //    [[sessionize]]'s flatMapGroupsWithState — hand-managed per-user
    //    state, EventTimeTimeout eviction — instead of the built-in
    //    session_window. This is the escape hatch for session semantics
    //    the built-in cannot express (value-dependent gaps, session
    //    budgets, inline enrichment), oracle-gated here to prove the
    //    custom-state machinery (state round-trip through the store,
    //    cross-batch merge, timeout flush) is value-correct, not just
    //    spec-shaped. Emitted ends are LAST-EVENT times (the built-in
    //    reports end+gap), value is exact integer cents carried through
    //    the double state field (< 2^53, order-free).
    "stream_custom_sessionize" -> ((s, d) => {
      implicit val ss: SparkSession = s
      import s.implicits._
      replayThroughFiles(s, d, "stream_custom_sessionize_sink",
        build = src => sessionize(
          src.select(col("ts"), col("user_id"), col("event_type"),
            col("v_cents").cast("double").as("value")).as[Event],
          watermark = None) // the replay source is already watermarked
          .toDF()
          .select(col("user_id"),
            unix_micros(col("start")).as("start_us"),
            unix_micros(col("end")).as("end_us"),
            col("n_events"),
            col("sum_value").cast("long").as("value_cents")))
        .filter(col("user_id") >= 0)
        .orderBy("user_id", "start_us")
    }),

    // -- the Spark 4 ARBITRARY-STATE API (transformWithState) through the
    //    oracle gate: per-user running (count, cents) prefix totals — the
    //    per-key accumulator shape (running balances, rate counters,
    //    feature aggregates) that production state pipelines run on the
    //    RocksDB store. Every input row emits its prefix, so the gate
    //    value-checks the cross-batch state round-trip (batch 1's totals
    //    must be restored exactly when batch 2's rows fold in), not just
    //    the final state. Scale: one shuffle on user_id per batch,
    //    state = two longs per active key, independent of stream length.
    "stream_tws_running" -> ((s, d) => {
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        replayThroughFiles(s, d, "stream_tws_running_sink",
          build = src => src
            .select(col("event_id"), col("user_id"), col("us"),
              col("v_cents"), col("event_type"))
            .as[Replay]
            .groupByKey(_.user_id)
            .transformWithState(new RunningTotals, TimeMode.None(),
              OutputMode.Append())
            .toDF())
          .filter(col("event_id") >= 0)
          .orderBy("user_id", "run_n")
      } finally {
        prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
    }),

    // -- transformWithState with LISTSTATE (the 14th oracle-gated
    //    streaming query, fifth arbitrary-state shape): per-user bounded
    //    last-3-events buffer — every row emits its lags, the buffer
    //    rewrites trimmed, and the LAG-window oracle value-checks every
    //    cross-batch list round-trip.
    "stream_tws_liststate" -> ((s, d) => {
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        replayThroughFiles(s, d, "stream_tws_liststate_sink",
          build = src => src
            .select(col("event_id"), col("user_id"), col("us"),
              col("v_cents"), col("event_type"))
            .as[Replay]
            .groupByKey(_.user_id)
            .transformWithState(new RecentEvents, TimeMode.None(),
              OutputMode.Append())
            .toDF())
          .filter(col("event_id") >= 0)
          .orderBy("user_id", "event_id")
      } finally {
        prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
    }),

    // -- transformWithState with MAPSTATE (the 13th oracle-gated streaming
    //    query, fourth arbitrary-state shape): per-user per-event-type
    //    running counts — each (user, type) entry is its own RocksDB store
    //    key, so one type's update never rewrites the user's whole map.
    //    Every row emits its type's new count; the gate value-checks every
    //    individual map-entry round-trip across batches (an entry restored
    //    wrong in batch 2 shifts that type's whole suffix).
    "stream_tws_mapstate" -> ((s, d) => {
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        replayThroughFiles(s, d, "stream_tws_mapstate_sink",
          build = src => src
            .select(col("event_id"), col("user_id"), col("us"),
              col("v_cents"), col("event_type"))
            .as[Replay]
            .groupByKey(_.user_id)
            .transformWithState(new TypeCounts, TimeMode.None(),
              OutputMode.Append())
            .toDF())
          .filter(col("event_id") >= 0)
          .orderBy("user_id", "event_type", "type_n")
      } finally {
        prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
    }),

    // -- transformWithState with EVENT-TIME TIMERS (the 12th oracle-gated
    //    streaming query, and the third arbitrary-state shape): gap
    //    sessionization where the processor owns its timer set —
    //    registerTimer/deleteTimer per open session, handleExpiredTimer
    //    closing it when the watermark passes end + gap. Same session
    //    semantics as stream_custom_sessionize (last-event ends, exact
    //    integer cents), so the same gaps-and-islands oracle hash-gates
    //    the timer machinery: registration, replacement on extension,
    //    firing order vs input rows, and state clear on expiry.
    "stream_tws_timers" -> ((s, d) => {
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        replayThroughFiles(s, d, "stream_tws_timers_sink",
          build = src => src
            .select(col("event_id"), col("user_id"), col("us"),
              col("v_cents"), col("event_type"))
            .as[Replay]
            .groupByKey(_.user_id)
            .transformWithState(new TimerSessions(30L * 60L * 1000000L),
              TimeMode.EventTime(), OutputMode.Append())
            .toDF())
          .filter(col("user_id") >= 0)
          .orderBy("user_id", "start_us")
      } finally {
        prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
    }),

    // -- streaming SCD-2 dimension maintenance (transformWithState +
    //    change detection): closed type-intervals emit as the NEXT
    //    version opens — the CDC-feed history build running continuously
    //    instead of as a batch window job. Oracle = the batch
    //    scd2_intervals chain restricted to closed rows; the open rows
    //    live in state, exactly SCD-2's current versions. Scale: one
    //    shuffle on user_id per batch, state = one (type, since, n)
    //    triple per key.
    "stream_scd2" -> ((s, d) => {
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        replayThroughFiles(s, d, "stream_scd2_sink",
          build = src => src
            .select(col("event_id"), col("user_id"), col("us"),
              col("v_cents"), col("event_type"))
            .as[Replay]
            .groupByKey(_.user_id)
            .transformWithState(new ScdIntervals, TimeMode.None(),
              OutputMode.Append())
            .toDF())
          .filter(col("user_id") >= 0)
          .orderBy("user_id", "valid_from_us")
      } finally {
        prev match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
    }),

    // -- tumbling event-time windows through the streaming engine — the
    //    streaming twin of `time_window_agg`, same oracle SQL. Window
    //    state lives per (window x event_type) and is emitted once the
    //    watermark passes the window end. DELIBERATELY stays on the
    //    MemoryStream path: with the rest of the surface on file ingest,
    //    this query and stream_file_time_window share one oracle, so the
    //    pair pins memory-vs-file ingest invariance every round.
    "stream_time_window" -> ((s, d) =>
      replayThroughStream(s, d, "stream_time_window_sink",
        expand = identity,
        build = src => src
          .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("value_cents"))
          .select(col("win.start").as("win_start"), col("event_type"),
            col("n"), col("value_cents")))
        .filter(col("event_type") =!= "~sentinel")
        .orderBy("win_start", "event_type")),

    // -- FILE-SOURCE ingest through the streaming engine: the SAME
    //    tumbling-window aggregation as stream_time_window, but the
    //    source is `readStream` over a parquet DIRECTORY the corpus is
    //    dropped into in two file batches — the scale ingest path (at
    //    100 TB/day events arrive as files or Kafka; unlike the
    //    MemoryStream replay harness, NOTHING here collects a corpus row
    //    to the driver: the batch boundary comes from one 1-row min/max
    //    aggregate, the batch files are distributed writes, and
    //    per-trigger arrival is a file rename into the watched
    //    directory). Same two-batch + sentinel watermark schedule — every
    //    batch-2 row is strictly later than batch 1's max, so the
    //    watermark can never drop a row and the streaming result equals
    //    the batch result by construction — and the same oracle as the
    //    batch twin gates it.
    "stream_file_time_window" -> ((s, d) =>
      replayThroughFiles(s, d, "stream_file_time_window_sink",
        build = src => src
          .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("value_cents"))
          .select(col("win.start").as("win_start"), col("event_type"),
            col("n"), col("value_cents")))
        .filter(col("event_type") =!= "~sentinel")
        .orderBy("win_start", "event_type")),

    // -- CHAINED STATEFUL AGGREGATION over FILE-SOURCE ingest: the
    //    heaviest stateful shape in the surface (two watermark-bounded
    //    stateful operators — 15-minute quarter counts re-aggregated by
    //    `window_time` into hourly peak-quarter stats) run end-to-end on
    //    the production ingest path instead of the MemoryStream replay:
    //    `readStream` over a watched parquet directory, zero driver
    //    collects anywhere (the MemoryStream twin's collect is harness
    //    scaffolding; this one's batch boundary is a 1-row min/max
    //    aggregate and its batches are distributed file writes). The
    //    2-deep chain drains over flushBatches=2 trailing sentinel files
    //    — one per stateful stage — and the SAME oracle as
    //    stream_chained_agg gates it: file-vs-memory ingest must be
    //    result-invisible.
    "stream_file_chained_agg" -> ((s, d) =>
      replayThroughFiles(s, d, "stream_file_chained_agg_sink",
        build = src => src
          .groupBy(window(col("ts"), "15 minutes").as("w1"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("vc"))
          .groupBy(window(window_time(col("w1")), "1 hour").as("w2"),
            col("event_type"))
          .agg(max(col("n")).as("max_q"), sum(col("n")).as("n_events"),
            sum(col("vc")).as("value_cents"))
          .select(col("w2.start").as("win_start"), col("event_type"),
            col("max_q"), col("n_events"), col("value_cents")),
        flushBatches = 2)
        .filter(col("event_type") =!= "~sentinel")
        .orderBy("win_start", "event_type")),

    // -- SLIDING event-time windows through the streaming engine (1 h
    //    width, 30 min slide — each event lands in exactly 2 overlapping
    //    windows): the trend-smoothing shape dashboards run. State is one
    //    row per (window × type) and both windows of an event are emitted
    //    once the watermark passes their ends; the sentinel flush drains
    //    the final slide. The oracle expands each event into its two
    //    30-min-grid window starts and re-aggregates — Spark's epoch-
    //    aligned window grid equals DuckDB's time_bucket grid.
    "stream_sliding_window" -> ((s, d) =>
      replayThroughFiles(s, d, "stream_sliding_window_sink",
        build = src => src
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("value_cents"))
          .select(col("win.start").as("win_start"), col("event_type"),
            col("n"), col("value_cents")))
        .filter(col("event_type") =!= "~sentinel")
        .orderBy("win_start", "event_type")),

    // -- CHAINED STATEFUL AGGREGATION (two stateful operators in one
    //    streaming query — supported since Spark 3.4's per-operator
    //    watermark work): 15-minute quarter-hour counts, re-aggregated by
    //    `window_time` into hourly peak-quarter stats ("peak sub-window
    //    rate per hour" — the burst-detection shape a rate-limit monitor
    //    runs). BOTH levels hold watermark-bounded state and finalize in
    //    append mode: a quarter emits once the watermark passes its end,
    //    and the hour that contains it emits one batch later (the
    //    harness's flushBatches=2 drains the 2-deep chain — one flush
    //    batch per stateful stage). State: level 1 is (quarters × types)
    //    within the watermark horizon, level 2 is (hours × types) —
    //    both corpus-size-independent. The oracle recomputes both levels
    //    from the batch table; quarters nest exactly in hours, so
    //    Spark's epoch-aligned windows equal DuckDB's time_bucket grid.
    //    DELIBERATELY stays on the MemoryStream path (see
    //    stream_time_window): its shared oracle with
    //    stream_file_chained_agg pins ingest invariance for the 2-deep
    //    stateful chain.
    "stream_chained_agg" -> ((s, d) =>
      replayThroughStream(s, d, "stream_chained_agg_sink",
        expand = identity,
        build = src => src
          .groupBy(window(col("ts"), "15 minutes").as("w1"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("vc"))
          .groupBy(window(window_time(col("w1")), "1 hour").as("w2"),
            col("event_type"))
          .agg(max(col("n")).as("max_q"), sum(col("n")).as("n_events"),
            sum(col("vc")).as("value_cents"))
          .select(col("w2.start").as("win_start"), col("event_type"),
            col("max_q"), col("n_events"), col("value_cents")),
        flushBatches = 2)
        .filter(col("event_type") =!= "~sentinel")
        .orderBy("win_start", "event_type")),

    // -- streaming windowed TOP-K (the trending-now shape): the STREAMING
    //    stage is the watermarked per-(window × type) count — bounded
    //    state, finalized exactly once by append mode — and the rank runs
    //    as the standard downstream pass over the finalized window rows.
    //    That split is forced and correct: a window's top-k does not
    //    exist until the watermark closes the window, and the finalized
    //    relation is window-grain (hours × types — metadata-sized at any
    //    corpus scale), so the per-window rank window is trivially
    //    parallel in win_start and never sees corpus-sized data.
    "stream_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val agg = replayThroughFiles(s, d, "stream_topk_sink",
        build = src => src
          .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("win.start").as("win_start"), col("event_type"),
            col("n")))
        .filter(col("event_type") =!= "~sentinel")
      val w = Window.partitionBy(col("win_start"))
        .orderBy(col("n").desc, col("event_type"))
      agg.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 2)
        .orderBy("win_start", "rk")
    }),

    // -- streaming exact dedup under at-least-once delivery: every batch
    //    is fed TWICE (exact redelivery), dropDuplicatesWithinWatermark
    //    keeps the first arrival per event_id — duplicates carry identical
    //    payloads, so the kept row is deterministic and the output is
    //    exactly the distinct event set the oracle reads off the table.
    "stream_dedup" -> ((s, d) =>
      replayThroughFiles(s, d, "stream_dedup_sink",
        expand = b => b.unionByName(b), // exact at-least-once redelivery
        build = src => src
          .dropDuplicatesWithinWatermark("event_id")
          .select(col("event_id"), col("user_id"), col("us"),
            col("v_cents"), col("event_type")))
        .filter(col("event_id") >= 0)
        .orderBy("event_id")),

    // -- stream-stream interval join (the attribution shape) as a
    //    streaming SELF-join: one watermarked source filtered into click
    //    and view branches, views matched within 24h after each click.
    //    Inner joins emit eagerly as pairs meet, so completeness needs no
    //    sentinel flush — and the time-ordered schedule makes state
    //    eviction safe: a click is evicted only once the watermark passes
    //    click.ts + horizon, and every view that could match it has
    //    ts ≤ click.ts + horizon < watermark, i.e. it was already fed in
    //    an earlier (or the same) batch and the pair already emitted. The
    //    bounded condition is also exactly what lets Spark reclaim join
    //    state at all — the unbounded variant would buffer both streams
    //    forever at 100 TB/day.
    "stream_interval_join" -> ((s, d) =>
      replayThroughFiles(s, d, "stream_interval_join_sink",
        build = src => {
          val c = src.filter(col("event_type") === "click").alias("c")
          val v = src.filter(col("event_type") === "view").alias("v")
          c.join(v,
            col("c.user_id") === col("v.user_id") &&
              col("v.ts") >= col("c.ts") &&
              col("v.ts") <= col("c.ts") + expr("interval 24 hours"))
            .select(col("c.user_id").as("user_id"),
              col("c.us").as("click_us"), col("v.us").as("view_us"),
              col("v.v_cents").as("view_v_cents"))
        })
        .orderBy("user_id", "click_us", "view_us")),

    // -- LEFT OUTER stream-stream interval join: same attribution shape,
    //    but clicks with NO view inside the horizon must still emit (with
    //    null view columns) — the semantics batch LEFT JOIN gives for
    //    free and streaming must earn: a null-extended row may only emit
    //    once the watermark proves no matching view can still arrive
    //    (click.ts + horizon < watermark), at state eviction in a LATER
    //    batch. The replay's sentinel gap is widened past horizon +
    //    watermark delay so every real click's state provably evicts and
    //    the second sentinel batch flushes the null rows. Null view
    //    columns surface as -1 (never a real us/cents value) so the
    //    oracle compare is null-free.
    // -- COMPLETE-mode streaming aggregation: running per-type totals,
    //    the live-dashboard shape. Unlike the append-mode queries no
    //    watermark/flush choreography is needed — every micro-batch emits
    //    the FULL refreshed aggregate and the memory sink snapshot after
    //    the last batch IS the final answer, so the result is independent
    //    of the batch split by construction. State is one row per group
    //    key (bounded by event-type cardinality, not stream length);
    //    sums are exact integer cents so incremental accumulation across
    //    batches is order-free and hash-comparable.
    "stream_agg_complete" -> ((s, d) =>
      replayThroughFiles(s, d, "stream_agg_complete_sink",
        build = src => src
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("value_cents")),
        outputMode = "complete")
        .filter(col("event_type") =!= "~sentinel")
        .orderBy("event_type")),

    "stream_interval_join_outer" -> ((s, d) =>
      replayThroughFiles(s, d, "stream_interval_join_outer_sink",
        build = src => {
          val c = src.filter(col("event_type") === "click").alias("c")
          val v = src.filter(col("event_type") === "view").alias("v")
          c.join(v,
            col("c.user_id") === col("v.user_id") &&
              col("v.ts") >= col("c.ts") &&
              col("v.ts") <= col("c.ts") + expr("interval 24 hours"),
            "leftOuter")
            .select(col("c.event_id").as("click_id"),
              col("c.user_id").as("user_id"), col("c.us").as("click_us"),
              coalesce(col("v.us"), lit(-1L)).as("view_us"),
              coalesce(col("v.v_cents"), lit(-1L)).as("view_v_cents"))
        },
        sentinelGapUs = 26L * 3600L * 1000000L,
        sentinelTypes = Seq("click", "view"))
        .filter(col("click_id") >= 0)
        .orderBy("user_id", "click_us", "view_us")),

    // -- stream-static enrichment through the streaming engine: each
    //    micro-batch inner-joins the broadcast customer dimension — the
    //    STATELESS streaming join ([[streamStaticJoin]]): no watermark
    //    state, no buffering, restart-safe, so the replay needs no
    //    sentinel flush at all (sentinel user_id -1 simply finds no
    //    dimension row). The oracle is the same join run as batch SQL.
    "stream_static_join" -> ((s, d) => {
      val dim = graft.Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      replayThroughFiles(s, d, "stream_static_join_sink",
        build = src => src
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
          .select(col("event_id"), col("user_id"), col("c_name"),
            col("c_nationkey").cast("long").as("c_nationkey"),
            col("v_cents")))
        .filter(col("event_id") >= 0)
        .orderBy("event_id")
    }),

    // -- foreachBatch incremental MERGE — the production sink pattern the
    //    memory/append sinks above don't exercise: each micro-batch is
    //    applied as a latest-wins upsert into a VERSIONED external state
    //    table (one parquet snapshot per batch id — the Delta-style MERGE
    //    INTO loop, minus the log). Per batch: the batch pre-aggregates
    //    map-side to one max_by row per user (batch-sized, not
    //    state-sized), then ONE full-outer join against the previous
    //    snapshot under the (ts, event_id) total order — cdc_upsert's
    //    exact merge plan, run incrementally. Latest-wins is associative,
    //    so the final snapshot provably equals the batch full recompute
    //    the oracle runs; the gate proves the cross-batch fold loses
    //    nothing. Writing to a NEW directory per batch keeps the read
    //    (old snapshot) and write (new snapshot) disjoint — the
    //    snapshot-isolation a real table format provides. No watermark:
    //    the merge itself is the state, so the engine holds none — and
    //    no sentinels either: nothing watermark-bounded needs flushing.
    //    Ingest is the production FILE path (readStream over a watched
    //    parquet directory, batch boundary from a 1-row min/max
    //    aggregate, distributed staged writes, rename-per-file arrival) —
    //    zero driver collects anywhere in this query.
    "stream_foreachbatch_merge" -> ((s, d) => {
      import s.implicits._
      val ev = graft.Tables.events(s, d)
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"),
          unix_micros(col("ts")).as("us"),
          floor(col("value") * 100).cast("long").as("v_cents"),
          col("event_type"))
      val mm = ev.agg(min(col("us")), max(col("us"))).head() // 1-row scalar
      val midUs = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
      val root = java.nio.file.Paths
        .get(graft.Scratch.dir("file_stream_foreachbatch_merge"))
      java.nio.file.Files.createDirectories(root)
      val inDir = root.resolve("in")
      java.nio.file.Files.createDirectories(inDir)
      val base = root.resolve("state").toString
      def staged(df: DataFrame, name: String): Seq[java.nio.file.Path] = {
        val out = root.resolve(name)
        df.write.parquet(out.toString)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(out).iterator().asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".parquet"))
      }
      val b1 = staged(ev.filter(col("us") <= midUs), "b1")
      val b2 = staged(ev.filter(col("us") > midUs), "b2")
      def arrive(files: Seq[java.nio.file.Path], pfx: String): Unit =
        files.zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f, inDir.resolve(s"${pfx}_$i.parquet")) }
      def latest(df: DataFrame) = df.groupBy("user_id")
        .agg(max_by(
          struct(col("us"), col("event_id"), col("event_type"),
            col("v_cents")),
          struct(col("us"), col("event_id"))).as("r"))
      var cur: Option[String] = None
      val q = s.readStream.schema(ev.schema).parquet(inDir.toString)
        .writeStream
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          val bl = latest(batch.toDF()).withColumnRenamed("r", "d")
          val merged = cur match {
            case None => bl.withColumnRenamed("d", "w")
            case Some(dir) =>
              val st = batch.sparkSession.read.parquet(dir)
                .withColumnRenamed("w", "s")
              st.join(bl, Seq("user_id"), "full_outer")
                .select(col("user_id"),
                  when(col("s").isNull || (col("d").isNotNull &&
                    struct(col("d.us"), col("d.event_id")) >
                      struct(col("s.us"), col("s.event_id"))), col("d"))
                    .otherwise(col("s")).as("w"))
          }
          val next = s"$base/v$id"
          merged.write.mode("overwrite").parquet(next)
          val prev = cur
          cur = Some(next)
          // the superseded snapshot has no readers once `cur` moves on —
          // delete it so the version chain holds exactly one live dir
          // (plus the in-flight write), not one per batch forever
          prev.foreach(StreamingOps.deleteRecursively)
          ()
        }
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .start()
      try {
        arrive(b1, "b1"); q.processAllAvailable()
        arrive(b2, "b2"); q.processAllAvailable()
      } finally q.stop()
      // the final snapshot must outlive THIS query's consumption only —
      // defer the scratch-root removal to the session's next sweep (the
      // same post-consumption hook that unpins caches), so repeated
      // bench/verify runs don't leak one scratch dir per invocation
      graft.Caches.defer(s) { StreamingOps.deleteRecursively(root.toString) }
      s.read.parquet(cur.get)
        .select(col("user_id"), col("w.us").as("last_ts_us"),
          col("w.event_type").as("last_type"),
          col("w.v_cents").as("last_value_cents"))
        .orderBy("user_id")
    }))

  /** Best-effort recursive delete for the foreachBatch snapshot chain. */
  private[streaming] def deleteRecursively(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.deleteIfExists)
    } catch { case _: Exception => () }

  /** Batch replays of the streaming queries: the replay schedule drops
    * nothing and flushes everything, so each streaming result must equal
    * its batch SQL row-for-row. `stream_session_window` reuses the
    * gaps-and-islands SQL that gates the batch twin; `stream_time_window`
    * reuses the `time_window_agg` bucketing; `stream_dedup`'s first
    * arrivals under exact redelivery are simply the distinct event set. */
  val oracleSql: Map[String, String] = Map(
    // full recompute of latest-per-user — the incremental foreachBatch
    // fold must land on exactly this (cdc_upsert's oracle, same columns)
    "stream_foreachbatch_merge" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             event_type, CAST(FLOOR(value * 100) AS BIGINT) AS value_cents,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT user_id, ts_us AS last_ts_us, event_type AS last_type,
           value_cents AS last_value_cents
         FROM r WHERE rn = 1 ORDER BY user_id""",
    "stream_scd2" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
           FROM events),
         l AS (SELECT *, LAG(event_type) OVER (PARTITION BY user_id
             ORDER BY us, event_id) AS prev FROM e),
         n AS (SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
             THEN 1 ELSE 0 END AS chg FROM l),
         v AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
             ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS ver FROM n),
         g AS (SELECT user_id, ver, event_type, MIN(us) AS valid_from_us,
             COUNT(*) AS n_events FROM v GROUP BY 1, 2, 3),
         iv AS (SELECT user_id, event_type, valid_from_us,
             CAST(n_events AS BIGINT) AS n_events,
             LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY ver)
               AS valid_to_us
           FROM g)
         SELECT user_id, event_type, valid_from_us, valid_to_us, n_events
         FROM iv WHERE valid_to_us IS NOT NULL
         ORDER BY user_id, valid_from_us""",
    "stream_tws_running" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events)
         SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS run_n,
           CAST(SUM(cents) OVER w AS BIGINT) AS run_cents
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
           ROWS UNBOUNDED PRECEDING)
         ORDER BY user_id, run_n""",
    "stream_static_join" ->
      """SELECT e.event_id, e.user_id, c.c_name,
         CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
         CAST(FLOOR(e.value * 100) AS BIGINT) AS v_cents
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY e.event_id""",
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
         FROM sx GROUP BY user_id, sess_no ORDER BY user_id, start_us""",
    "stream_tws_liststate" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
         SELECT event_id, user_id,
           COALESCE(LAG(event_id, 1) OVER w, -1) AS prev1,
           COALESCE(LAG(event_id, 2) OVER w, -1) AS prev2,
           COALESCE(LAG(event_id, 3) OVER w, -1) AS prev3
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ORDER BY user_id, event_id""",
    "stream_tws_mapstate" ->
      """SELECT event_id, user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             ORDER BY epoch_us(ts), event_id) AS type_n
         FROM events ORDER BY user_id, event_type, type_n""",
    "stream_tws_timers" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
             CAST(FLOOR(value * 100) AS BIGINT) AS vc FROM events),
         l AS (SELECT *, LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev FROM e),
         n AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM l),
         sx AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                  ROWS UNBOUNDED PRECEDING) AS sess_no FROM n)
         SELECT user_id, MIN(us) AS start_us, MAX(us) AS end_us,
           COUNT(*) AS n_events, CAST(SUM(vc) AS BIGINT) AS value_cents
         FROM sx GROUP BY user_id, sess_no ORDER BY user_id, start_us""",
    "stream_custom_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
             CAST(FLOOR(value * 100) AS BIGINT) AS vc FROM events),
         l AS (SELECT *, LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev FROM e),
         n AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM l),
         sx AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                  ROWS UNBOUNDED PRECEDING) AS sess_no FROM n)
         SELECT user_id, MIN(us) AS start_us, MAX(us) AS end_us,
           COUNT(*) AS n_events, CAST(SUM(vc) AS BIGINT) AS value_cents
         FROM sx GROUP BY user_id, sess_no ORDER BY user_id, start_us""",
    "stream_time_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "stream_file_time_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "stream_chained_agg" ->
      """WITH q AS (SELECT time_bucket(INTERVAL '15 minutes', ts) AS q_start,
             time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS vc
           FROM events GROUP BY 1, 2, 3)
         SELECT win_start, event_type, CAST(MAX(n) AS BIGINT) AS max_q,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(vc) AS BIGINT) AS value_cents
         FROM q GROUP BY 1, 2 ORDER BY win_start, event_type""",
    // same oracle as stream_chained_agg: file-source ingest must be
    // result-invisible vs the MemoryStream replay of the same query
    "stream_file_chained_agg" ->
      """WITH q AS (SELECT time_bucket(INTERVAL '15 minutes', ts) AS q_start,
             time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS vc
           FROM events GROUP BY 1, 2, 3)
         SELECT win_start, event_type, CAST(MAX(n) AS BIGINT) AS max_q,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(vc) AS BIGINT) AS value_cents
         FROM q GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "stream_sliding_window" ->
      """WITH e AS (SELECT ts, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS vc FROM events),
         w AS (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
               time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
             AS win_start, event_type, vc FROM e)
         SELECT win_start, event_type, COUNT(*) AS n,
           CAST(SUM(vc) AS BIGINT) AS value_cents
         FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "stream_topk" ->
      """WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
             event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY win_start
             ORDER BY n DESC, event_type) AS BIGINT) AS rk FROM c)
         SELECT win_start, event_type, n, rk FROM r
         WHERE rk <= 2 ORDER BY win_start, rk""",
    "stream_dedup" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100) AS BIGINT) AS v_cents, event_type
         FROM events ORDER BY event_id""",
    "stream_interval_join" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
             CAST(FLOOR(value * 100) AS BIGINT) AS v_cents, event_type
           FROM events)
         SELECT c.user_id AS user_id, c.us AS click_us, v.us AS view_us,
           v.v_cents AS view_v_cents
         FROM e c JOIN e v
           ON c.user_id = v.user_id
          AND c.event_type = 'click' AND v.event_type = 'view'
          AND v.us >= c.us AND v.us <= c.us + CAST(86400000000 AS BIGINT)
         ORDER BY user_id, click_us, view_us""",
    "stream_agg_complete" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY event_type ORDER BY event_type""",
    "stream_interval_join_outer" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(FLOOR(value * 100) AS BIGINT) AS v_cents, event_type
           FROM events)
         SELECT c.event_id AS click_id, c.user_id AS user_id,
           c.us AS click_us, COALESCE(v.us, -1) AS view_us,
           COALESCE(v.v_cents, -1) AS view_v_cents
         FROM e c LEFT JOIN e v
           ON c.user_id = v.user_id AND v.event_type = 'view'
          AND v.us >= c.us AND v.us <= c.us + CAST(86400000000 AS BIGINT)
         WHERE c.event_type = 'click'
         ORDER BY user_id, click_us, view_us""")

  /** File-based streaming read of an events directory (the batch parquet
    * becomes a stream source unchanged — same schema, same downstream
    * operators). `ts` is normalized to an instant-typed TimestampType
    * exactly like [[graft.Tables.events]] so watermarks and window()
    * behave identically to the batch twins across parquet vintages. */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // file stream sources take directories; point at the SF dir and
    // glob-filter to the events file(s)
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // raw nanos vintage
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
