package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events shape (event_id, ts,
  * user_id, event_type, value). The reference is batch-only (SURVEY.md
  * §2.11); this module is the engine-level extension: the same aggregations
  * expressed incrementally, so the 100 TB batch pipeline and its streaming
  * ingest share one DataFrame dialect.
  *
  * Scale posture: watermarks bound state (late data beyond the watermark is
  * dropped, state for closed windows is evicted); sessionization state is
  * per-key and timeout-evicted — no unbounded driver or executor state.
  */
object EventStream {

  /** Tumbling-window count+sum per event_type with a watermark. Works on
    * any streaming or batch frame with (ts: timestamp, event_type, value).
    */
  def windowedTypeCounts(
      events: DataFrame,
      window: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  /** `start`/`lastSeen` are µs-since-epoch (the batch twins' resolution —
    * ms-truncated arithmetic diverged from [[sessionizeBatch]] on same-ms
    * event pairs).
    */
  case class SessionState(count: Long, start: Long, lastSeen: Long)
  case class SessionOut(user_id: Long, events: Long, durationMs: Long,
      closed: Boolean)

  /** µs-since-epoch of a Timestamp (getTime is ms-truncated; the
    * sub-second field carries the full precision).
    */
  private def tsMicros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  /** Gap-based sessionization with explicit state: a session closes after
    * `gapMs` of event-time silence per user. Demonstrates
    * flatMapGroupsWithState — the engine's escape hatch for custom
    * streaming state machines. Emits every CLOSED session exactly once
    * (whether closed by a gap-separated successor event or by the
    * watermark timeout) plus an open-session progress row per batch, and
    * splits on every intra-batch gap — the same boundaries as
    * [[sessionizeBatch]].
    *
    * Event-time timeout + watermark, so state is bounded: a key's state is
    * evicted (and its session emitted as closed) once the watermark passes
    * lastSeen + gap. (ProcessingTimeTimeout is avoided deliberately — on
    * Spark 4.1.2 it degenerates into continuous empty micro-batches.)
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val gapUs = gapMs * 1000L
          def durMs(s: SessionState): Long = (s.lastSeen - s.start) / 1000
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionOut(userId, s.count, durMs(s), closed = true))
          } else {
            // µs arithmetic throughout — the batch twin's resolution
            // (ms-truncated gaps merged sessions the batch split)
            val times = batch.map(e => tsMicros(e.ts)).toVector.sorted
            if (times.isEmpty) Iterator.empty
            else {
              val closed = Vector.newBuilder[SessionOut]
              var open = state.getOption
              // STALE COHORT first: events older than start - gap can
              // never join the running session, but adjacent stale events
              // chain with EACH OTHER under the same gap rule (the batch
              // formulation's grouping — emitting each as a singleton
              // under-counted late sessions). Ascending order makes the
              // cohort a prefix.
              val (stale, live) = open match {
                case Some(s) => times.partition(_ < s.start - gapUs)
                case None => (Vector.empty[Long], times)
              }
              var chain: Option[SessionState] = None
              stale.foreach { t =>
                chain = chain match {
                  case Some(c) if t <= c.lastSeen + gapUs =>
                    Some(SessionState(c.count + 1, c.start,
                      math.max(c.lastSeen, t)))
                  case Some(c) =>
                    closed += SessionOut(userId, c.count, durMs(c),
                      closed = true)
                    Some(SessionState(1, t, t))
                  case None => Some(SessionState(1, t, t))
                }
              }
              chain.foreach(c =>
                closed += SessionOut(userId, c.count, durMs(c), closed = true))
              live.foreach { t =>
                open = open match {
                  // within gap of the session interval [start, lastSeen]
                  // (covers late out-of-order events inside the watermark:
                  // merge WITHOUT rewinding lastSeen, so durations never go
                  // negative and later gap checks use the true latest time)
                  case Some(s) if t >= s.start - gapUs && t <= s.lastSeen + gapUs =>
                    Some(SessionState(s.count + 1, math.min(s.start, t),
                      math.max(s.lastSeen, t)))
                  case Some(s) if t > s.lastSeen + gapUs =>
                    // gap forward: close the running session, start anew
                    closed += SessionOut(userId, s.count, durMs(s),
                      closed = true)
                    Some(SessionState(1, t, t))
                  case Some(s) => // unreachable: stale cohort already split
                    closed += SessionOut(userId, 1, 0, closed = true)
                    Some(s)
                  case None => Some(SessionState(1, t, t))
                }
              }
              open match {
                case Some(cur) =>
                  state.update(cur)
                  // timeout API is ms; state is µs. Must be strictly
                  // beyond the current watermark
                  state.setTimeoutTimestamp(
                    math.max(cur.lastSeen / 1000 + gapMs,
                      state.getCurrentWatermarkMs() + 1))
                  (closed.result() :+
                    SessionOut(userId, cur.count, durMs(cur),
                      closed = false)).iterator
                case None => closed.result().iterator
              }
            }
          }
      }
  }

  case class ItemEvent(event_id: Long, ts: Timestamp, user_id: Long, item: Long)
  case class LastItem(item: Long, ts: Long, eventId: Long)
  case class Transition(user_id: Long, src: Long, dst: Long)

  /** Incremental click-graph mining — the streaming twin of
    * [[graft.operators.LinkGraph.transitionEdges]]: per-user state holds
    * only the LAST seen item, each micro-batch sorts its slice by
    * (ts, event_id) (the batch window's order), and every consecutive
    * distinct-item pair — including the pair bridging the previous
    * batch via state — emits one (user, src, dst) transition. Downstream,
    * the same (src, dst) → weight aggregation as batch runs per
    * micro-batch (e.g. in foreachBatch upserting the edge artifact), so
    * the stored graph PageRank/HITS/walks consume stays fresh without
    * ever rescanning history.
    *
    * State is one 3-long record per active user, evicted by event-time
    * timeout once the watermark passes the user's last activity PLUS the
    * `retention` horizon — the bounded-state contract every operator in
    * this module keeps, with the horizon making the bridging guarantee
    * explicit: a user's next event within `retention` of their last one
    * still finds the state and emits the cross-batch transition (a
    * timeout at the bare last-activity instant would let any quiet gap
    * longer than the watermark delay silently drop the bridge edge —
    * transitions across gaps BEYOND the horizon are deliberately
    * session-bounded, the standard click-graph cut). Micro-batch slices
    * sort by (µs event time, event_id) — the batch window's exact
    * order, same-µs ties broken identically. In-order arrivals within
    * the horizon reproduce the batch window's transitions exactly
    * (spec-pinned); an event arriving out of order ACROSS batches
    * (inside the watermark) contributes a transition from the
    * then-current state — the standard incremental-mining tradeoff.
    */
  def transitionsStream(
      events: Dataset[ItemEvent],
      watermark: String = "10 minutes",
      retentionMs: Long = 60L * 60 * 1000): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastItem, Transition](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[ItemEvent], state: GroupState[LastItem]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = batch.toVector.sortBy(e => (tsMicros(e.ts), e.event_id))
            if (evs.isEmpty) Iterator.empty
            else {
              val out = Vector.newBuilder[Transition]
              var last = state.getOption
              evs.foreach { e =>
                last.foreach { l =>
                  if (l.item != e.item) out += Transition(userId, l.item, e.item)
                }
                last = Some(LastItem(e.item, tsMicros(e.ts), e.event_id))
              }
              val cur = last.get
              state.update(cur)
              // ts is µs; the timeout API is ms
              state.setTimeoutTimestamp(
                math.max(cur.ts / 1000 + retentionMs,
                  state.getCurrentWatermarkMs() + 1))
              out.result().iterator
            }
          }
      }
  }

  /** Streaming dedup: emit the first event seen per
    * (user_id, event_type, minute) key; duplicate arrivals inside the
    * watermark are dropped and per-key dedup state is evicted once the
    * watermark passes — bounded state, unlike a plain
    * `dropDuplicates` whose key set grows forever on a stream.
    */
  def dedupStream(events: DataFrame, watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("minute_start", date_trunc("minute", col("ts")))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute_start")
      .select("event_id", "user_id", "event_type", "minute_start")

  /** Stream-stream interval join: attribute each event to the purchase
    * windows [purchase_ts, purchase_ts + 1h) of the same user — the
    * streaming twin of the batch `j6_range_join`
    * ([[graft.operators.Relational.rangeJoinBucketed]]).
    *
    * Both sides carry watermarks and the join condition bounds event time
    * against purchase time from BOTH directions, so Spark can compute how
    * long each side's rows must be retained and evict join state as the
    * watermarks advance — without the time bound, stream-stream join state
    * grows forever.
    */
  def attributionJoinStream(
      events: DataFrame,
      purchases: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val e = events
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    e.join(p,
      col("user_id") === col("p_user")
        && col("ts") >= col("p_ts")
        && col("ts") < col("p_ts") + expr("interval 1 hour")
        && col("event_id") =!= col("purchase_id"))
      .select("event_id", "purchase_id", "user_id")
  }

  /** Stream-stream LEFT OUTER interval join — the hard half of streaming
    * joins: matched (purchase, event) pairs emit as they join, and a
    * purchase whose window closes with NO matching event emits ONE
    * null-padded row — but only once the event-side watermark proves no
    * future match can arrive (Spark holds the outer row in state until
    * then; without the two-sided time bound + both watermarks the state
    * could never be declared complete and the null row never fires).
    * Streaming twin of the batch `j6b_range_join_left`.
    */
  def attributionJoinLeftOuterStream(
      purchases: DataFrame,
      events: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val e = events
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
    p.join(e,
      col("p_user") === col("user_id")
        && col("ts") >= col("p_ts")
        && col("ts") < col("p_ts") + expr("interval 1 hour")
        && col("event_id") =!= col("purchase_id"),
      "left_outer")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("event_id").as("attributed_event"))
  }

  /** Idempotent micro-batch file sink (foreachBatch): every micro-batch
    * lands in its own batchId-keyed directory with overwrite semantics, so
    * a batch REPLAYED after failure recovery (same batchId, re-read from
    * the checkpoint's write-ahead offset log) overwrites its own directory
    * instead of appending duplicates — exactly-once file output on top of
    * at-least-once micro-batch execution. This is the standard sink
    * pattern when the target lacks transactions; with Append mode over a
    * watermarked aggregation, each window row is emitted in exactly one
    * batch, so the union of batch directories IS the final result.
    *
    * At scale the same shape fans out unchanged: the per-batch write is a
    * normal distributed parquet write, and `checkpointDir` (offsets +
    * operator state) must live on reliable shared storage.
    */
  def idempotentParquetSink(
      aggregated: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    aggregated.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, outDir)
      }
      .start()

  /** The per-micro-batch write of [[idempotentParquetSink]] — overwrite
    * into a batchId-keyed directory. Exposed so the replay property is
    * testable without forcing a real checkpoint-recovery cycle.
    */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Stream-static ENRICHMENT join: attach dimension attributes to each
    * event from a static table — the canonical "enrich the click with
    * the customer record" production shape. Stateless by construction
    * (no watermark, no state store): every micro-batch hash-joins
    * against the pinned dimension snapshot, and with the dimension
    * broadcast the stream side never shuffles — at 100-TB-of-events the
    * per-batch cost is a map-side lookup. LEFT join: an event with no
    * dimension row passes through null-padded rather than vanishing
    * (loss here would silently bias every downstream metric).
    */
  def enrichStream(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      broadcast(dim.select(col("c_custkey").as("user_id"),
        col("c_mktsegment"), col("c_acctbal"))),
      Seq("user_id"), "left")

  /** Batch twin of [[enrichStream]] over the stored tables — the
    * registered, DuckDB-oracle-able face (ts omitted: the join is what
    * the row certifies, and event_id pins identity; timestamp
    * resolution differences between engines stay out of the hash).
    */
  def enrichBatch(spark: SparkSession, sfDir: String): DataFrame =
    enrichStream(
      spark.read.parquet(s"$sfDir/events.parquet"),
      spark.read.parquet(s"$sfDir/customer.parquet"))
      .select("event_id", "user_id", "event_type", "value",
        "c_mktsegment", "c_acctbal")
      .orderBy("event_id")

  /** Batch twin of [[dedupStream]] with a deterministic survivor (lowest
    * event_id per key) and the duplicate multiplicity — DuckDB-oracle-able;
    * StreamingSpec pins that the stream emits exactly these keys.
    */
  def dedupEventsBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev
      .withColumn("tus", graft.operators.EventTime.tsUs(ev))
      .withColumn("minute_bucket", expr("tus div 60000000"))
      .groupBy("user_id", "event_type", "minute_bucket")
      .agg(min("event_id").as("keep_id"), count(lit(1)).as("copies"))
      .orderBy("user_id", "event_type", "minute_bucket")
  }

  /** Batch-mode sessionization of the same semantics (gap-based session ids
    * via lag + running sum) — lets the batch table and the stream agree on
    * session boundaries, and is DuckDB-oracle-able.
    *
    * All event-time arithmetic (ordering, gap comparison, duration) runs at
    * MICROSECOND resolution (the schema-aware
    * [[graft.operators.EventTime.tsUs]]): DuckDB's TIMESTAMP is µs, so any
    * finer-grained arithmetic diverges from the oracle wherever independent
    * min/max truncation crosses a boundary (observed: one duration off by
    * 1 ms in 95k sessions at sf0.1) — µs on both sides makes every
    * comparison identical.
    */
  def sessionizeBatch(
      spark: SparkSession,
      sfDir: String,
      gapNs: Long = 30L * 60 * 1000 * 1000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapNs / 1000
    val byUser = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val sess = Window.partitionBy("user_id").orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev
      .withColumn("tus", graft.operators.EventTime.tsUs(ev))
      .withColumn("prev_tus", lag("tus", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_tus").isNull || col("tus") - col("prev_tus") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(sess))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("events"),
        expr("(max(tus) - min(tus)) div 1000").as("duration_ms"))
      .orderBy("user_id", "session_seq")
  }

  /** Ordered conversion funnel over the events table: per user, the first
    * `view`, the first `click` strictly AFTER that view, and the first
    * `purchase` strictly after that click; the summary row counts users
    * reaching each stage (monotone by construction). The product-analytics
    * staple that is NOT a plain groupBy — each stage's anchor depends on
    * the previous stage's timestamp.
    *
    * Plan shape: three chained window aggregates over the SAME user_id
    * partitioning (one exchange, no sort needed for unordered MIN frames)
    * + the final single-row summary. Event-time arithmetic runs at µs like
    * [[sessionizeBatch]] (ns-vs-µs truncation must not flip a strict
    * inequality against the oracle).
    */
  def funnelSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev
      .select(col("user_id"), col("event_type"),
        graft.operators.EventTime.tsUs(ev).as("tus"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("tus"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("tus") > col("t_view"),
          col("tus"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("tus") > col("t_click"),
          col("tus"))).over(w))
      .groupBy("user_id")
      .agg(max("t_view").as("t_view"), max("t_click").as("t_click"),
        max("t_purchase").as("t_purchase"))
      .agg(
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view_users"),
        sum(when(col("t_click").isNotNull, 1L).otherwise(0L)).as("n_click_users"),
        sum(when(col("t_purchase").isNotNull, 1L).otherwise(0L)).as("n_purchase_users"))
  }
}
