package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.operators.FlowLog

/** Structured Streaming wrappers (SURVEY.md §7.2 phase E). The batch and
  * streaming paths share the same logical plan: Firehose's per-batch
  * decorator invocation (decorator/index.js:243-262) is exactly Spark's
  * micro-batch model. Dimensions are static broadcast sides of
  * stream-static joins, refreshed per restart (the reference refetches
  * the ENI table once per Firehose batch, decorator/index.js:246).
  */
object FlowLogStream {

  /** The decorator pipeline over a streaming frame of raw lines
    * (columns: id, line). Stateless → plain append-mode transforms.
    * `@timestamp` is OP-11's processing-time stamp
    * (decorator/index.js:111) — it lives only on this streaming surface;
    * the oracle-compared batch queries exclude it as nondeterministic
    * (SURVEY.md §7.3). */
  def decorate(lines: DataFrame, eni: DataFrame, geo: DataFrame): DataFrame =
    FlowLog.packageRecords(
      FlowLog.enrich(FlowLog.parseFlowLines(lines), eni, geo))
      .withColumn("@timestamp", current_timestamp())

  /** Event-time tumbling/sliding window aggregation with watermark
    * (charter extension — the reference has event-time fields but never
    * windows them, SURVEY.md §2.1). `events` needs (ts: timestamp,
    * event_type: string, value: double). */
  def windowedCounts(events: DataFrame, watermarkDelay: String,
      windowLen: String, slide: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  case class Ev(user_id: Long, ts_ms: Long, value: Double)
  case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  /** Gap-based sessionization with custom state
    * (flatMapGroupsWithState): a session closes when a later event for
    * the same user arrives more than `gapMs` after it (in-batch or
    * across batches), or via `timeout` for users that never return
    * (NoTimeout by default — deterministic for tests and batch replays;
    * use ProcessingTime/EventTimeTimeout in a live deployment to flush
    * idle users). Emits closed sessions.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.startMs, s.lastMs, s.n, s.sum))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts_ms, e.value))
            var closed = List.empty[Session]
            var cur = state.getOption
            for (e <- sorted) {
              cur match {
                case Some(s) if e.ts_ms - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.startMs, e.ts_ms, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(userId, s.startMs, s.lastMs, s.n, s.sum)
                  cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
                state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream inner join with watermarks on both sides (the
    * streaming analog of q_asof_join's equi-key + time-range predicate):
    * for each left event, the right events by the same user within the
    * preceding `boundSeconds`. The watermarks bound the join state, so
    * at scale state size tracks the time window — not the stream length.
    * Left columns: (user_id, l_ts); right: (r_user_id, r_ts, r_value).
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      watermarkDelay: String, boundSeconds: Int): DataFrame =
    left.withWatermark("l_ts", watermarkDelay)
      .join(right.withWatermark("r_ts", watermarkDelay),
        expr(s"""user_id = r_user_id AND
                |r_ts BETWEEN l_ts - INTERVAL $boundSeconds seconds AND l_ts
                |""".stripMargin))

  /** Streaming exact deduplication with bounded state: duplicate
    * event_ids are dropped if they re-arrive within the watermark
    * horizon, and state older than the horizon is evicted — the
    * streaming face of Dedup.exactDuplicates (at-least-once sources
    * redeliver; this makes the sink effectively-once per horizon).
    */
  def dedupStream(events: DataFrame, watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  case class SrcTotals(srcaddr: String, n_flows: Long, total_bytes: Long)

  /** Spark 4 arbitrary-state processor (the transformWithState successor
    * to [GroupState]): a running per-source flow counter held in a
    * ValueState. State lives in the RocksDB state store (required by
    * this API), so per-key state is spillable and scales with keyspace,
    * not memory. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), SrcTotals] {
    import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders, streaming => ss}
    @transient private var totals: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: ss.TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: ss.TimerValues): Iterator[SrcTotals] = {
      var (n, b) = if (totals.exists()) totals.get() else (0L, 0L)
      for ((_, bytes) <- rows) { n += 1; b += bytes }
      totals.update((n, b))
      Iterator(SrcTotals(key, n, b))
    }
  }

  /** Running totals per source address over a stream of flows
    * (columns: srcaddr, bytes) via transformWithState — emits the
    * updated cumulative (flow count, byte total) for each source seen
    * in the micro-batch. Callers must run with the RocksDB state store
    * provider (see StreamingSpec). */
  def runningTotals(flows: DataFrame): Dataset[SrcTotals] = {
    import flows.sparkSession.implicits._
    flows.select(col("srcaddr"), col("bytes").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** OP-22 as streaming-safe side-output counters: an `observe`
    * observation named `flow_counters` with total/failed record tallies
    * per batch (the reference's imperative success/failure log,
    * decorator/index.js:208-232). Works on batch frames too — read via
    * `org.apache.spark.sql.Observation` or a streaming query listener. */
  def withCounters(packaged: DataFrame): DataFrame =
    packaged.observe("flow_counters",
      count(lit(1)).as("n_records"),
      sum(when(col("result") === "ProcessingFailed", 1L).otherwise(0L))
        .as("n_failed"))

  /** Run the decorator as a streaming query into an in-memory table
    * (the test/verification sink; swap format for a real sink). */
  def startToMemory(lines: DataFrame, eni: DataFrame, geo: DataFrame,
      queryName: String): StreamingQuery =
    decorate(lines, eni, geo).writeStream
      .format("memory").queryName(queryName)
      .outputMode("append").start()
}
