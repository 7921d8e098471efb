package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured Streaming specs: the transforms run against a real
  * MemoryStream (incremental execution, state store, watermark), not just
  * their batch twins.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed counts aggregate incrementally over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventStream.windowedTypeCounts(mem.toDF(), "1 minute", "2 minutes")
    val q = out.writeStream
      .format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:00:10"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:00:50"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 00:01:10"), 1, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("window_start", "event_type", "cnt", "sum_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 00:01:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming ingest gate: a one-batch stream reproduces the batch decision trail") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val arrivals = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val mem = MemoryStream[(Long, String, Long)]
    val outDir = graft.sources.IO.scratchDir("stream_gate")
    val q = graft.operators.Curate.ingestGateStream(spark, Sf,
      mem.toDF().toDF("doc_id", "text", "n_chars"), outDir)
    try {
      mem.addData(arrivals.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamedRows = spark.read.parquet(s"$outDir/decisions")
      .select("doc_id", "exact_dup", "near_dup", "contaminated",
        "passes_quality", "admit", "reason")
      .collect().map(_.toSeq)
    val batchRows = graft.operators.Curate.ingestDecisions(spark, Sf, gramWidth = 4)
      .collect().map(_.toSeq)
    // multiplicity-sensitive: a replayed/duplicated micro-batch write
    // would inflate the row count even when the SET of decisions matches
    assert(streamedRows.length == batchRows.length,
      s"one decision row per arrival (${streamedRows.length} vs ${batchRows.length})")
    assert(streamedRows.toSet == batchRows.toSet,
      "stream gate must equal the batch trail")
    assert(streamedRows.nonEmpty)
  }

  test("embedding ingest stream: a one-batch stream reproduces the batch verdicts") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val arrivals = spark.read.parquet(s"$Sf/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0)
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val outDir = graft.sources.IO.scratchDir("emb_stream")
    val q = graft.operators.Similarity.embIngestStream(spark, Sf,
      mem.toDF().toDF("vec_id", "embedding"), outDir)
    try {
      mem.addData(arrivals.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$outDir/verdicts")
      .select("vec_id", "is_new", "dup_of", "cos")
      .collect().map(_.toSeq)
    val batch = graft.operators.Similarity.incrementalSemanticNearDup(spark, Sf)
      .collect().map(_.toSeq)
    assert(streamed.length == batch.length && streamed.toSet == batch.toSet,
      "stream verdicts must equal the batch row")
    assert(streamed.nonEmpty)
  }

  test("media ingest stream: two micro-batches reproduce the batch near-dup verdicts") {
    implicit val sqlCtx = spark.sqlContext
    // sf0.01: the driver's own gate cut, with %10-endpoint pairs under
    // the fingerprint windows so the matched path engages
    val sf01 = "/root/testdata/sf0.01"
    val arrivals = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val mem = MemoryStream[Long]
    val outDir = graft.sources.IO.scratchDir("media_stream")
    val q = graft.operators.Multimodal.mediaIngestStream(spark, sf01,
      mem.toDF().toDF("media_id"), outDir)
    try {
      mem.addData(first.toSeq)
      q.processAllAvailable()
      mem.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$outDir/verdicts")
      .select("media_id", "is_new", "dup_of", "hamming", "l1_fix")
      .collect().map(_.toSeq)
    val batch = graft.operators.Multimodal.incrementalNearDup(spark, sf01)
      .collect().map(_.toSeq)
    // multiplicity-sensitive: a replayed micro-batch write would inflate
    // the count even when the verdict SET matches
    assert(streamed.length == batch.length && streamed.toSet == batch.toSet,
      "stream verdicts must equal the batch row")
    assert(streamed.count(_(1) == false) > 0,
      "sf0.01 must exercise the matched (non-new) path through the stream")
  }

  test("media gate stream: two micro-batches reproduce the batch admission trails") {
    implicit val sqlCtx = spark.sqlContext
    val sf001 = "/root/testdata/sf0.001"
    val arrivals = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val mem = MemoryStream[Long]
    val outDir = graft.sources.IO.scratchDir("media_gate_stream")
    val q = graft.operators.Multimodal.mediaGateStream(spark, sf001,
      mem.toDF().toDF("media_id"), outDir)
    try {
      mem.addData(first.toSeq)
      q.processAllAvailable()
      mem.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val cols = Seq("media_id", "fmt", "quality_ok", "contaminated",
      "eval_id", "dup_of", "hamming", "l1_fix", "decision")
    val streamed = spark.read.parquet(s"$outDir/decisions")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq)
    val batch = graft.operators.Multimodal.ingestDecisions(spark, sf001)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq)
    // multiplicity-sensitive, the mediaIngestStream convention
    assert(streamed.length == batch.length && streamed.toSet == batch.toSet,
      "stream admission trails must equal the batch gate")
    assert(streamed.exists(_(8) != "new"),
      "the stream must exercise a non-trivial admission branch")
  }

  test("retention ingest stream: per-batch deltas equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val raw = graft.sources.IO.table(spark, Sf, "events")
    val batchRows = raw
      .filter(graft.operators.EventTime.tsAtLeastUs(raw, graft.operators.Events.RetentionSplitUs))
      .withColumn("tus", graft.operators.EventTime.tsUs(raw))
      .selectExpr("user_id", "tus div 86400000000 as day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mem = MemoryStream[(Long, Long)]
    val outDir = graft.sources.IO.scratchDir("retention_stream")
    val q = graft.operators.Events.retentionIngestStream(spark, Sf,
      mem.toDF().toDF("user_id", "day"), outDir)
    try {
      mem.addData(batchRows.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$outDir/deltas")
      .select("cohort_day", "offset_days", "active_users")
      .collect().map(_.toSeq)
    val batch = graft.operators.Events.retentionIncremental(spark, Sf)
      .collect().map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed.length == batch.length && streamed.toSet == batch.toSet,
      "stream deltas must equal the batch row")
  }

  test("scd2 ingest stream: per-batch deltas equal the batch twin against the same artifact") {
    implicit val sqlCtx = spark.sqlContext
    val raw = graft.sources.IO.table(spark, Sf, "events")
    val batchRows = raw
      .filter(graft.operators.EventTime.tsAtLeastUs(raw, graft.operators.Snapshot.Scd2SplitUs))
      .withColumn("tus", graft.operators.EventTime.tsUs(raw))
      .select("user_id", "tus", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val mem = MemoryStream[(Long, Long, Long, String)]
    val outDir = graft.sources.IO.scratchDir("scd2_stream")
    val q = graft.operators.Snapshot.scd2IngestStream(spark, Sf,
      mem.toDF().toDF("user_id", "tus", "event_id", "event_type"), outDir)
    try {
      mem.addData(batchRows.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$outDir/deltas")
      .select("user_id", "valid_from", "valid_to", "is_current", "event_type")
      .collect().map(_.toSeq)
    val batch = graft.operators.Snapshot.eventsScd2Incremental(spark, Sf)
      .collect().map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed.length == batch.length && streamed.toSet == batch.toSet,
      "stream deltas must equal the batch row")
  }

  test("ingest gate replay: re-running a micro-batch overwrites, never duplicates") {
    import org.apache.spark.sql.functions.col
    val arrivals = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text", "n_chars")
    val outDir = graft.sources.IO.scratchDir("gate_replay")
    // the foreachBatch body, invoked twice with the SAME batch id — the
    // checkpoint-recovery shape where the write committed but the offset
    // did not
    def writeOnce(): Unit =
      graft.operators.Curate.ingestGateBatch(spark, Sf, arrivals)
        .write.mode("overwrite").parquet(s"$outDir/decisions/batch_id=7")
    writeOnce()
    val first = spark.read.parquet(s"$outDir/decisions").count()
    writeOnce()
    val second = spark.read.parquet(s"$outDir/decisions").count()
    assert(first == second && first == arrivals.count(),
      s"replay must be a no-op: $first then $second")
  }

  test("stream-static enrichment joins each micro-batch against the broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val dim = Seq((1L, "cust 1", 10, 100.0, "BUILDING"),
      (2L, "cust 2", 11, 200.0, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = EventStream.enrichStream(mem.toDF(), dim)
    val q = out.writeStream
      .format("memory").queryName("enriched")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:00:10"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:00:20"), 9, "view", 2.0))
      q.processAllAvailable()
      // second micro-batch joins against the same pinned snapshot
      mem.addData(Event(3, ts("2024-01-01 00:00:30"), 2, "purchase", 3.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("event_id", "user_id", "c_mktsegment")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getString(2)))).toSet
      assert(rows == Set(
        (1L, 1L, Some("BUILDING")),
        (2L, 9L, None), // no dimension row: null-padded, never dropped
        (3L, 2L, Some("MACHINERY"))))
    } finally q.stop()
  }

  test("sessionize keeps per-user state across micro-batches and closes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventStream.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L)
    val q = out.writeStream
      .format("memory").queryName("sessions")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 7, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts("2024-01-01 10:20:00"), 7, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past user 7's lastSeen + gap
      mem.addData(Event(4, ts("2024-01-01 14:00:00"), 9, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(5, ts("2024-01-01 16:00:00"), 9, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user_id", "events", "durationMs", "closed")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      // user 7's state accumulated across micro-batches (10:20 within the
      // 30-min gap of 10:10), then closed by watermark: 3 events, 20 min
      assert(rows.contains((7L, 3L, 20 * 60 * 1000L, true)),
        s"expected closed 3-event session for user 7, got ${rows.mkString(", ")}")
      // user 9's 14:00 session must be emitted closed when the
      // gap-separated 16:00 successor arrives (not silently dropped)
      assert(rows.contains((9L, 1L, 0L, true)),
        s"expected closed 1-event session for user 9, got ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("transition mining bridges a quiet gap longer than the watermark delay") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.ItemEvent]
    // watermark delay 1 min, retention 1 h: user 1 goes quiet for 20 min
    // while user 2's events advance the watermark far past user 1's last
    // activity — the bridge edge must still emit on return
    val out = EventStream.transitionsStream(mem.toDS(), "1 minute")
    val q = out.writeStream
      .format("memory").queryName("trans_gap")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData(EventStream.ItemEvent(1, ts("2024-01-01 00:00:10"), 1, 10))
      q.processAllAvailable()
      // other-user traffic pushes the watermark past 00:00:10 + delay
      mem.addData(
        EventStream.ItemEvent(2, ts("2024-01-01 00:10:00"), 2, 30),
        EventStream.ItemEvent(3, ts("2024-01-01 00:15:00"), 2, 40))
      q.processAllAvailable()
      // user 1 returns 20 min after their last event — in order
      mem.addData(EventStream.ItemEvent(4, ts("2024-01-01 00:20:10"), 1, 20))
      q.processAllAvailable()
      val got = spark.table("trans_gap")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got.contains((1L, 10L, 20L)),
        s"the quiet-gap bridge edge must survive state eviction: $got")
    } finally q.stop()
  }

  test("sessionize: µs-resolution gap test and stale-cohort chaining match batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    import EventStream.Event
    // two events exactly gap + 500µs apart: ms arithmetic would merge
    // them (truncation erases the excess), µs splits — the batch twin's
    // call
    val t1 = ts("2024-01-01 01:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 01:30:00.0005")
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_us")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Event(1, t1, 7, "view", 1.0), Event(2, t2, 7, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_us")
        .collect().map(r => (r.getLong(1), r.getBoolean(3)))
      assert(rows.contains((1L, true)),
        s"µs gap must split: one closed singleton expected, got ${rows.toSeq}")
    } finally q.stop()

    // stale cohort: two late events within gap of each other arrive after
    // the session has advanced far ahead — ONE closed 2-event session
    val mem2 = MemoryStream[Event]
    val q2 = EventStream.sessionize(mem2.toDS(), gapMs = 30 * 60 * 1000L,
      watermark = "10 hours")
      .writeStream.format("memory").queryName("sess_stale")
      .outputMode(OutputMode.Update()).start()
    try {
      mem2.addData(Event(1, ts("2024-01-01 13:00:00"), 9, "view", 1.0))
      q2.processAllAvailable()
      mem2.addData(
        Event(2, ts("2024-01-01 10:00:00"), 9, "view", 1.0),
        Event(3, ts("2024-01-01 10:01:00"), 9, "view", 1.0))
      q2.processAllAvailable()
      val stale = spark.table("sess_stale")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .filter(_._3)
      assert(stale.contains((2L, 60000L, true)),
        s"late cohort must chain into one 2-event 60 s session: ${stale.toSeq}")
    } finally q2.stop()
  }

  test("streaming transition mining bridges micro-batches and matches the batch window's pairs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.ItemEvent]
    val out = EventStream.transitionsStream(mem.toDS(), "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("transitions")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1: user 1 walks 10→20→20 (self-loop dropped); user 2 at 30
      mem.addData(
        EventStream.ItemEvent(1, ts("2024-01-01 00:00:10"), 1, 10),
        EventStream.ItemEvent(2, ts("2024-01-01 00:00:20"), 1, 20),
        EventStream.ItemEvent(3, ts("2024-01-01 00:00:30"), 1, 20),
        EventStream.ItemEvent(4, ts("2024-01-01 00:00:15"), 2, 30))
      q.processAllAvailable()
      // batch 2: state bridges 20→40 for user 1 and 30→10 for user 2
      mem.addData(
        EventStream.ItemEvent(5, ts("2024-01-01 00:01:10"), 1, 40),
        EventStream.ItemEvent(6, ts("2024-01-01 00:01:20"), 2, 10))
      q.processAllAvailable()
      val got = spark.table("transitions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 10L, 20L), (1L, 20L, 40L), (2L, 30L, 10L)))
      // exactly what the batch lag-window yields on the same events
      val batch = Seq((1L, ts("2024-01-01 00:00:10"), 10L),
        (2L, ts("2024-01-01 00:00:20"), 20L), (3L, ts("2024-01-01 00:00:30"), 20L),
        (4L, ts("2024-01-01 00:00:15"), 30L), (5L, ts("2024-01-01 00:01:10"), 40L),
        (6L, ts("2024-01-01 00:01:20"), 10L))
        .toDF("event_id", "ts", "item")
        .withColumn("user_id", when(col("event_id").isin(4L, 6L), 2L).otherwise(1L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val twin = batch.withColumn("src", lag("item", 1).over(w))
        .where(col("src").isNotNull && col("src") =!= col("item"))
        .select("user_id", "src", "item")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == twin, "stream transitions must equal the batch window's pairs")
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates and matches the batch twin's keys") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventStream.dedupStream(mem.toDF(), "2 minutes")
    val q = out.writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:00:10"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:00:40"), 1, "click", 2.0), // dup key
        Event(3, ts("2024-01-01 00:00:50"), 2, "view", 3.0),
        Event(4, ts("2024-01-01 00:01:10"), 1, "click", 4.0)) // next minute
      q.processAllAvailable()
      // advance the watermark so appended rows flush
      mem.addData(Event(9, ts("2024-01-01 00:10:00"), 3, "view", 0.0))
      q.processAllAvailable()
      val keys = spark.table("dedup_stream")
        .select("user_id", "event_type", "minute_start")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).toString))
        .toSet
      assert(keys.contains((1L, "click", "2024-01-01 00:00:00.0")))
      assert(keys.contains((1L, "click", "2024-01-01 00:01:00.0")))
      assert(keys.contains((2L, "view", "2024-01-01 00:00:00.0")))
      // the duplicate (event 2) must NOT add a second row for its key
      assert(spark.table("dedup_stream")
        .filter("user_id = 1 AND minute_start = timestamp'2024-01-01 00:00:00'")
        .count() == 1)
    } finally q.stop()
  }

  test("foreachBatch sink writes batchId-keyed parquet; closed windows land exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val outDir = graft.sources.IO.scratchDir("fb_sink")
    val ckDir = graft.sources.IO.scratchDir("fb_ck")
    val q = EventStream.idempotentParquetSink(
      EventStream.windowedTypeCounts(mem.toDF(), "1 minute", "2 minutes"),
      outDir, ckDir)
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:00:10"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:00:50"), 2, "click", 2.0))
      q.processAllAvailable()
      // advance the watermark past the first window so it closes and flushes
      mem.addData(Event(3, ts("2024-01-01 00:10:00"), 3, "view", 1.0))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir) // batch_id partition discovered
      val closed = out.filter(col("event_type") === "click").collect()
      assert(closed.length == 1, "closed window emitted in exactly ONE batch dir")
      val r = closed(0)
      assert(r.getAs[Long]("cnt") == 2L && r.getAs[Double]("sum_value") == 3.0)
      // the append-mode contract behind idempotent replay: batch dirs are
      // disjoint per window, so re-writing any batchId cannot duplicate rows
      assert(out.groupBy("window_start", "event_type").count()
        .filter(col("count") > 1).count() == 0)
      // simulate failure replay: re-execute a batch write with the same
      // batchId and payload — the overwrite must leave the output identical
      val before = out.collect().map(_.toString).sorted.toSeq
      val replayDir = new java.io.File(outDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .maxBy(f => spark.read.parquet(f.getPath).count())
      val bid = replayDir.getName.stripPrefix("batch_id=").toLong
      // materialize the payload before overwriting the dir it comes from
      val src = spark.read.parquet(replayDir.getPath)
      val payload = spark.createDataFrame(
        spark.sparkContext.parallelize(src.collect().toSeq), src.schema)
      EventStream.writeBatch(payload, bid, outDir)
      val after = spark.read.parquet(outDir).collect().map(_.toString).sorted.toSeq
      assert(after == before, "replaying a batchId must not change the output")
    } finally q.stop()
  }

  test("cosine_sim returns null when a scored element is null (matches HOF)") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)) AS s,
                cosine_sim(array(1.0D, 2.0D), array(1.0D, 2.0D)) AS ok""").collect()(0)
    assert(r.isNullAt(0), "null element must null the score")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("batch sessionization agrees with itself on session invariants") {
    val sess = EventStream.sessionizeBatch(spark, Sf)
    val events = spark.read.parquet(s"$Sf/events.parquet").count()
    assert(sess.agg(sum("events")).collect()(0).getLong(0) == events,
      "every event lands in exactly one session")
    assert(sess.filter(col("duration_ms") < 0).count() == 0)
  }

  test("stream-stream interval join attributes events to purchase windows") {
    implicit val sqlCtx = spark.sqlContext
    val evMem = MemoryStream[Event]
    val puMem = MemoryStream[Event]
    val out = EventStream.attributionJoinStream(evMem.toDF(), puMem.toDF())
    val q = out.writeStream
      .format("memory").queryName("attribution")
      .outputMode(OutputMode.Append())
      .start()
    try {
      puMem.addData(Event(100, ts("2024-01-01 10:00:00"), 1, "purchase", 9.99))
      evMem.addData(
        Event(1, ts("2024-01-01 10:20:00"), 1, "click", 0.0), // inside window
        Event(2, ts("2024-01-01 11:20:00"), 1, "view", 0.0),  // outside (>1h)
        Event(3, ts("2024-01-01 10:30:00"), 2, "click", 0.0)) // other user
      q.processAllAvailable()
      // advance both watermarks so joined rows flush in append mode
      puMem.addData(Event(101, ts("2024-01-01 15:00:00"), 9, "purchase", 1.0))
      evMem.addData(Event(9, ts("2024-01-01 15:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val pairs = spark.table("attribution")
        .select("event_id", "purchase_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 100L)), s"in-window event must join: $pairs")
      assert(!pairs.contains((2L, 100L)), "out-of-window event must not join")
      assert(!pairs.contains((3L, 100L)), "other user's event must not join")
    } finally q.stop()
  }

  test("left-outer interval join null-pads purchases whose window closes empty") {
    implicit val sqlCtx = spark.sqlContext
    val puMem = MemoryStream[Event]
    val evMem = MemoryStream[Event]
    val out = EventStream.attributionJoinLeftOuterStream(puMem.toDF(), evMem.toDF())
    val q = out.writeStream
      .format("memory").queryName("attribution_left")
      .outputMode(OutputMode.Append())
      .start()
    try {
      puMem.addData(
        Event(100, ts("2024-01-01 10:00:00"), 1, "purchase", 9.99), // will match
        Event(200, ts("2024-01-01 10:00:00"), 2, "purchase", 5.00)) // never matches
      evMem.addData(Event(1, ts("2024-01-01 10:20:00"), 1, "click", 0.0))
      q.processAllAvailable()
      // push both watermarks far past window close so the unmatched
      // purchase's state is declared complete and its null row emits
      puMem.addData(Event(900, ts("2024-01-02 00:00:00"), 9, "purchase", 1.0))
      evMem.addData(Event(901, ts("2024-01-02 00:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("attribution_left")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .toSet
      assert(rows.contains((100L, 1L)), s"matched pair must emit: $rows")
      assert(rows.contains((200L, -1L)),
        s"empty-window purchase must emit one null-padded row: $rows")
    } finally q.stop()
  }

  test("native dot_product expression matches the HOF fold bitwise; null element nulls it") {
    val df = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .limit(50)
    val a = df.as("a"); val b = df.as("b")
    val both = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(
        expr("dot_product(a.v, b.v)").as("native"),
        graft.operators.Similarity.dot(col("a.v"), col("b.v")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    val n = spark.sql(
      "SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)) AS s")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("native cosine_sim expression matches the HOF composition bitwise") {
    val df = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .limit(50)
    val a = df.as("a"); val b = df.as("b")
    val both = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(
        expr("cosine_sim(a.v, b.v)").as("native"),
        graft.operators.Similarity.cosine(col("a.v"), col("b.v")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }
}
