package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Streaming behavior: drive the file source over the real events
  * parquet with a memory sink and check the incremental answer equals
  * the batch answer. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, sf0001}

  test("streaming daily windows match the batch q21 time-window query") {
    // the file stream source requires a directory; stage the table file
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStream.readStream(spark, dir.toString)
    assert(stream.isStreaming)
    val q = EventStream.dailyTypeCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("daily_counts")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      // append mode only emits watermark-closed windows; advance the
      // watermark by... all data is historical (2024), so after one batch
      // the watermark sits at max(ts)-1h and every earlier window closed.
      // A second empty micro-batch flushes them.
      q.processAllAvailable()
      val got = spark.table("daily_counts")
        .select("day", "event_type", "n", "sum_value")
      val want = SparkEntry.queries("q21_time_window")(spark, sf0001)
      val missing = want.exceptAll(got).count()
      // the final day's window may still be open (watermark holds it back)
      assert(missing <= want.groupBy("day").count().count())
      assert(got.count() > 0)
      // every emitted row must agree with batch exactly
      assert(got.exceptAll(want).count() == 0)
    } finally q.stop()
  }

  test("streaming dedup with watermark drops replayed events") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"), dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"), dir.resolve("b.parquet"))
    val stream = EventStream.readStream(spark, dir.toString)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("deduped_events")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt2").toString)
      .start()
    try {
      q.processAllAvailable()
      val n = spark.table("deduped_events").count()
      val distinct = Tables.events(spark, sf0001).count()
      assert(n == distinct, s"expected $distinct deduped rows, got $n from a 2x replay")
    } finally q.stop()
  }

  test("stream-static join enriches streaming events with a dimension table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ss-join")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"), dir.resolve("events.parquet"))
    val stream = EventStream.readStream(spark, dir.toString)
    val dim = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    import spark.implicits._
    val q = stream.join(dim, Seq("user_id"), "inner")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("seg_counts")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("seg_counts").as[(String, Long)].collect().toMap
      val want = Tables.events(spark, sf0001).join(dim, Seq("user_id"))
        .groupBy("c_mktsegment").count().as[(String, Long)].collect().toMap
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("watermarked stream-stream join matches the batch time-range join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"), dir.resolve("events.parquet"))
    val q = EventStream.viewToPurchase(EventStream.readStream(spark, dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("view_purchase")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt3").toString)
      .start()
    try {
      q.processAllAvailable()
      q.processAllAvailable() // flush watermark-closed state
      val got = spark.table("view_purchase")
      val batch = EventStream.viewToPurchase(Tables.events(spark, sf0001))
      // every emitted streaming row appears in the batch answer...
      assert(got.exceptAll(batch).count() == 0)
      // ...and the join found real matches
      assert(got.count() > 0)
    } finally q.stop()
  }

  test("idempotent foreachBatch sink: replayed batches do not duplicate rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sink")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val out = java.nio.file.Files.createTempDirectory("graft-sink-out").resolve("events").toString
    val q = EventStream.idempotentParquetSink(
      EventStream.readStream(spark, dir.toString), out,
      java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString)
    try q.processAllAvailable() finally q.stop()
    val total = Tables.events(spark, sf0001).count()
    assert(spark.read.parquet(out).count() == total)
    // simulate a failure/retry: the SAME batch id is delivered again —
    // dynamic partition overwrite must replace, not append
    val replay = spark.read.parquet(out).filter(col("batch_id") === 0).drop("batch_id")
    EventStream.writeBatchIdempotent(replay, 0L, out)
    assert(spark.read.parquet(out).count() == total,
      "replaying batch 0 must leave the row count unchanged")
  }

  test("streaming session snapshot converges to the batch 30-minute-gap answer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sess")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStream.readStream(spark, dir.toString)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[EventStream.Event]
    val q = EventStream.sessionCountsSnapshot(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("session_snapshot")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    // update mode re-emits per batch; the LAST emission per user is the total
    val got = spark.table("session_snapshot")
      .groupBy("user_id").agg(max("n_sessions").as("s"), max("n_events").as("e"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the batch answer IS the declared q25 operator — reuse it, per-user grain
    val want = SparkEntry.queries("q25_sessionize")(spark, sf0001)
      .select("user_id", "n_sessions", "n_events")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("streaming z-score monitor emits exactly the batch q80 anomalies") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zstream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStream.readStream(spark, dir.toString)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStream.TypedEvent]
    val q = EventStream.zscoreAnomalies(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("z_anomalies")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-z-ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("z_anomalies")
      .select("event_id", "trailing_mean", "n_prev", "z")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    val want = SparkEntry.queries("q80_event_zscore")(spark, sf0001)
      .select("event_id", "trailing_mean", "n_prev", "z")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(want.nonEmpty, "batch twin must flag something at sf0.001 or the parity is vacuous")
    assert(got == want, "streaming anomalies = batch anomalies, bit-for-bit incl. rounding")
  }

  test("streaming funnel stage counts equal the batch q102 table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStream.readStream(spark, dir.toString)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStream.TypedEvent]
    val q = EventStream.funnelStages(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_stages")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-funnel-ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("funnel_stages")
      .groupBy("stage").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = SparkEntry.queries("q102_event_funnel")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).filter(_._2 > 0).toMap
    assert(got == want, s"stream stage counts must equal batch q102: got=$got want=$want")

    // narrowing case (sf0.001's 15 users all convert): the planted
    // out-of-order users from the batch fixture must stall mid-funnel
    // in the stream exactly as they do in batch
    val dir2 = java.nio.file.Files.createTempDirectory("graft-funnel-stream2")
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ev(id: Long, user: Long, typ: String, minute: Long) =
      (id, base.plusSeconds(minute * 60).toEpochMilli * 1000000L, user, typ, 1.0)
    Seq(
      ev(1, 1, "view", 1), ev(2, 1, "click", 2), ev(3, 1, "purchase", 3),
      ev(4, 2, "purchase", 1), ev(5, 2, "view", 2), ev(6, 2, "click", 3),
      ev(7, 3, "click", 1), ev(8, 3, "view", 2),
      ev(9, 4, "view", 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir2/events.parquet")
    val stream2 = EventStream.readStream(spark, s"$dir2/events.parquet")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStream.TypedEvent]
    val q2 = EventStream.funnelStages(stream2)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_stages2")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-funnel-ckpt2").toString)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val got2 = spark.table("funnel_stages2")
      .groupBy("stage").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 4L, 2L -> 2L, 3L -> 1L),
      s"planted out-of-order users must stall mid-funnel: $got2")
  }

  test("declared stream schemas match the batch-inferred schemas of the live testdata") {
    // streaming sources cannot infer, so DocStream/VecStream declare
    // their schemas — a drift between declaration and the driver's
    // parquet stays LATENT until a consumer projects the mismatched
    // column (label was declared string over int32 data and no probe
    // read it). Pin declaration == inference so a regen flips this
    // test, not a production query.
    assert(graft.streaming.DocStream.docSchema ==
      Tables.documents(spark, sf0001).schema,
      "DocStream.docSchema drifted from the documents parquet")
    assert(graft.streaming.VecStream.vecSchema ==
      Tables.embeddings(spark, sf0001).schema,
      "VecStream.vecSchema drifted from the embeddings parquet")
  }

  test("weekStartDay matches Spark's date_trunc(week) across a year of days") {
    import spark.implicits._
    // the retention parity holds only if the stream's Scala-side week
    // truncation and the batch plan's date_trunc agree on every day —
    // including year boundaries and the Sunday/Monday edge
    val rows = spark.range(0, 366)
      .select(expr("timestamp'2023-12-25 13:45:06' + make_interval(0,0,0,CAST(id AS INT),0,0,0)").as("ts"))
      .select(col("ts"), datediff(date_trunc("week", col("ts")), lit("1970-01-01")).as("want"))
      .collect()
    rows.foreach { r =>
      assert(EventStream.weekStartDay(r.getTimestamp(0)) == r.getInt(1).toLong,
        s"week start mismatch at ${r.getTimestamp(0)}")
    }
  }

  test("streaming retention weeks fold into the batch q101 cohort matrix") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-retention-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStream.readStream(spark, dir.toString)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[EventStream.Event]
    val q = EventStream.retentionWeeks(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("retention_weeks")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-retention-ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = EventStream.retentionMatrix(spark.table("retention_weeks"))
      .collect().map(_.toSeq).toSeq
    val want = SparkEntry.queries("q101_retention_cohorts")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty, "batch q101 must produce cohorts at sf0.001")
    assert(got == want,
      s"stream-folded retention matrix must equal batch q101 row-for-row")
  }

  test("retention parity survives out-of-order multi-batch delivery") {
    import spark.implicits._
    // a user's EARLIEST week arrives in a LATER micro-batch — the
    // regime a first-seen cohort pin would get wrong; the set-of-weeks
    // emission + min(week) fold is order-independent by construction
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z") // a Monday
    def ev(id: Long, user: Long, week: Long) =
      (id, base.plusSeconds(week * 7 * 86400).toEpochMilli * 1000L, user, "view", 1.0,
        """{}""")
    val early = Seq(ev(1, 1, 0), ev(2, 2, 0))           // week 0 events
    val late = Seq(ev(3, 1, 2), ev(4, 2, 1), ev(5, 3, 1)) // weeks 1-2
    val dir = java.nio.file.Files.createTempDirectory("graft-ooo-ret")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    def writeFlat(rows: Seq[(Long, Long, Long, String, Double, String)], name: String): Unit = {
      // the file source lists flat files, not nested part dirs — stage
      // the single part file and move it to dir/<name>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-ooo-stage-$name")
      rows.toDF(cols: _*).select(col("event_id"),
          expr("cast(timestamp_micros(ts) as timestamp_ntz)").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, dir.resolve(name))
    }
    // file 'a' sorts FIRST but carries the LATER weeks (file-source
    // ordering is by path), so with one file per trigger the stream
    // sees the out-of-order regime
    writeFlat(late, "a.parquet")
    writeFlat(early, "b.parquet")
    val stream = spark.readStream
      .schema(EventStream.rawSchema(org.apache.spark.sql.types.TimestampNTZType))
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = EventStream.retentionWeeks(
        Tables.normalizeTs(stream)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .as[EventStream.Event])
      .writeStream.outputMode("append")
      .format("memory").queryName("ooo_retention")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ooo-ret-ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = EventStream.retentionMatrix(spark.table("ooo_retention"))
      .collect().map(_.toSeq).toSeq
    // batch twin over the union of both files
    val batchDir = java.nio.file.Files.createTempDirectory("graft-ooo-batch")
    (early ++ late).toDF(cols: _*).select(col("event_id"),
        expr("cast(timestamp_micros(ts) as timestamp_ntz)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$batchDir/events.parquet")
    val want = SparkEntry.queries("q101_retention_cohorts")(spark, batchDir.toString)
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"out-of-order delivery must not skew cohorts: got=$got want=$want")
  }

  test("stateful session counting works on the batch execution path too") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val events = Seq(
      EventStream.Event(1L, 10L, at(0), 1.0),
      EventStream.Event(1L, 11L, at(10), 1.0),   // same session (10 min gap)
      EventStream.Event(1L, 12L, at(60), 1.0),   // new session (50 min gap)
      EventStream.Event(2L, 13L, at(5), 1.0),
    ).toDS()
    // flatMapGroupsWithState on a batch Dataset: state starts empty and
    // times out never; output comes from the per-group iterator pass
    val got = events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[EventStream.Event],
         state: org.apache.spark.sql.streaming.GroupState[EventStream.SessionState]) => {
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var sessions = 0L; var last = Long.MinValue
          sorted.foreach { e =>
            if (last == Long.MinValue || e.ts.getTime - last > 30 * 60000) sessions += 1
            last = e.ts.getTime
          }
          Iterator(EventStream.UserSessions(userId, sessions, sorted.size))
        })
      .collect().map(u => u.user_id -> ((u.n_sessions, u.n_events))).toMap
    assert(got(1L) == ((2L, 3L)))
    assert(got(2L) == ((1L, 1L)))
  }

  test("streaming line dedup keeps exactly the batch q59 survivors under id-ordered arrival") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // 10-word segments by construction: segA/segB/segC are exact spans
    def seg(w: String) = (1 to 10).map(i => s"$w$i").mkString(" ")
    val (segA, segB, segC) = (seg("a"), seg("b"), seg("c"))
    val docs = Seq(
      1L -> s"$segA $segB",
      2L -> s"$segB $segC", // segB is a replay — must be dropped
      3L -> segA)           // whole doc is a replay — nothing survives
    // batch answer on the same fixture
    val dir = java.nio.file.Files.createTempDirectory("graft-linededup").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val want = graft.operators.TextAnalysis.q59LineDedup(spark, dir)
      .select("doc_id", "clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // stream the docs one micro-batch per doc, in doc_id order
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream.lineDedup(ms.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("line_dedup_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ld-ckpt").toString)
      .start()
    try {
      docs.foreach { d => ms.addData(d); q.processAllAvailable() }
      val kept = spark.table("line_dedup_stream")
        .groupBy("doc_id")
        .agg(array_join(expr(
          "transform(sort_array(collect_list(struct(seg_idx, seg))), x -> x.seg)"), " ")
          .as("clean_text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // doc 3 emits nothing in the stream; batch says clean_text = ''
      assert(kept == want.filter(_._2.nonEmpty),
        s"streaming survivors $kept != batch $want")
      assert(!kept.contains(3L))
      assert(kept(2L) == segC)
    } finally q.stop()
  }

  test("streaming incremental dedup matches the batch q73 classification under id-ordered arrival") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // static corpus index — the stored hash table a deployed ingest probes
    val corpus = Seq(3L -> "existing corpus text", 4L -> "other corpus text")
      .toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"))
      .groupBy("content_hash").agg(min("doc_id").as("corpus_canonical"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStream
      .incrementalDedup(ms.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.outputMode("append")
      .format("memory").queryName("incr_dedup_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-id-ckpt").toString)
      .start()
    try {
      // one micro-batch per doc: the dup_batch case (27 after 7) crosses
      // micro-batches, so it exercises the state store, not batch-local sort
      Seq(7L -> "fresh shard text", 17L -> "existing corpus text",
        27L -> "fresh shard text", 37L -> "unique shard text")
        .foreach { d => ms.addData(d); q.processAllAvailable() }
      val got = spark.table("incr_dedup_stream").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      // q73's exact classification on the same fixture (QueriesSpec twin)
      assert(got == Map(
        7L  -> (("new", 7L)),
        17L -> (("dup_corpus", 3L)),
        27L -> (("dup_batch", 7L)),
        37L -> (("new", 37L))))
    } finally q.stop()
  }

  test("streaming decontamination emits exactly the batch q70 rows") {
    // the last major text operator without an ingest-time twin: probe
    // arriving docs against the static eval-shingle set. Stateless, so
    // parity is unconditional (no arrival-order caveat).
    val dir = java.nio.file.Files.createTempDirectory("graft-decon-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    val evalSet = graft.operators.TextAnalysis.evalShingleSet(spark, sf0001)
    val q = graft.streaming.DocStream
      .decontaminate(graft.streaming.DocStream.readStream(spark, dir.toString), evalSet)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-decon-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("decon_stream")
      val want = SparkEntry.queries("q70_decontaminate")(spark, sf0001)
      assert(got.count() == want.count())
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        "streaming decontamination must equal batch q70 row-for-row")
      assert(want.filter(col("contaminated") === 1).count() > 0,
        "fixture must contain real contamination or the parity is vacuous")
    } finally q.stop()
  }

  test("streaming snapshot-delta probe equals batch q106 minus its removed rows") {
    // the new crawl ARRIVES as a stream and probes the old snapshot's
    // static fingerprint index; added/changed verdicts must match the
    // batch delta exactly, and `removed` is exactly the set the stream
    // cannot know (closed by the batch anti-join at end of crawl)
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val revisionDir = java.nio.file.Files.createTempDirectory("graft-delta-stream")
    graft.operators.TextAnalysis.syntheticRevision(docs)
      .write.parquet(revisionDir.resolve("documents.parquet").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(revisionDir.resolve("documents.parquet").toString)
    val q = graft.streaming.DocStream
      .snapshotDeltaProbe(stream, graft.streaming.DocStream.fingerprintIndex(docs))
      .writeStream.outputMode("append")
      .format("memory").queryName("delta_probe")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-delta-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val live = spark.table("delta_probe").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = SparkEntry.queries("q106_snapshot_delta")(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val removed = batch.filter(_._2 == "removed")
      assert(removed.nonEmpty, "fixture must exercise removals or the split is vacuous")
      assert(live == batch -- removed,
        s"stream verdicts must equal batch delta minus removed; diff: ${
          (live diff (batch -- removed)) ++ ((batch -- removed) diff live)}")
    } finally q.stop()
  }

  test("streaming embedding-drift stats converge to the batch q104 comparison") {
    // the stream maintains the per-dimension stats table incrementally
    // (complete mode, O(d) state); streaming only the ODD-id vectors
    // and comparing against a static even-id baseline must reproduce
    // the batch q104 parity-split drift exactly
    val dir = java.nio.file.Files.createTempDirectory("graft-vecdrift-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/embeddings.parquet"),
      dir.resolve("embeddings.parquet"))
    val q = graft.streaming.VecStream
      .ingestDimStats(
        graft.streaming.VecStream.readStream(spark, dir.toString)
          .filter(col("vec_id") % 2 =!= 0))
      .writeStream.outputMode("complete")
      .format("memory").queryName("vec_dim_stats")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-vecdrift-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val live = spark.table("vec_dim_stats")
      val emb = Tables.embeddings(spark, sf0001)
      val baseline = graft.operators.LinAlg.dimStats(
        emb.filter(col("vec_id") % 2 === 0))
      val got = graft.operators.LinAlg.dimDrift(baseline, live).collect()
        .map(r => r.getLong(0) -> (1 to 5).map(r.getDouble)).toMap
      val want = SparkEntry.queries("q104_embedding_drift")(spark, sf0001)
        .collect().map(r => r.getLong(0) -> (1 to 5).map(r.getDouble)).toMap
      assert(got.keySet == want.keySet && got.nonEmpty)
      for (d <- want.keys; c <- 0 until 5)
        assert(math.abs(got(d)(c) - want(d)(c)) <= 1e-6 + 1e-12,
          s"dim $d col $c: ${got(d)(c)} vs ${want(d)(c)}")
    } finally q.stop()
  }

  test("streaming drift monitor converges to the batch q98 comparison") {
    // the stream maintains the q98 cell table incrementally (complete
    // mode, O(lang × source) state); once the source drains, drift
    // against a static baseline must equal the batch two-snapshot query
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    val q = graft.streaming.DocStream
      .ingestCells(graft.streaming.DocStream.readStream(spark, dir.toString))
      .writeStream.outputMode("complete")
      .format("memory").queryName("drift_cells")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-drift-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val live = spark.table("drift_cells")
      val docs = Tables.documents(spark, sf0001)
      // baseline: a skewed half of the corpus, so drift is non-trivial
      val baseline = graft.operators.TextAnalysis.corpusCells(
        docs.filter(col("doc_id") % 3 === 0))
      val got = graft.operators.TextAnalysis.cellDrift(baseline, live)
      val want = graft.operators.TextAnalysis.snapshotDrift(
        docs.filter(col("doc_id") % 3 === 0), docs)
      assert(got.count() == want.count())
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        "monitor drift must equal the batch snapshot comparison row-for-row")
      assert(want.filter(col("share_drift") > 0).count() > 0,
        "fixture must produce real drift or the parity is vacuous")
    } finally q.stop()
  }

  test("streaming PII scrub rewrites arriving docs exactly as batch q69 would") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii-stream")
    Seq(
      (1L, "contact alice.smith+dev@example.co.uk or call +1 (415) 555-0123 now", "en", "s0"),
      (2L, "server at 10.0.142.7 responded", "en", "s1"),
      (3L, "plain prose with no identifiers at all", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val q = graft.streaming.DocStream
      .piiScrub(graft.streaming.DocStream.readStream(spark, s"$dir/documents.parquet"))
      .writeStream.outputMode("append")
      .format("memory").queryName("pii_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-pii-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("pii_stream").select("doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = graft.operators.TextAnalysis.q69PiiScrub(spark, dir.toString)
        .select("doc_id", "clean_text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, "stream-scrubbed text must equal the batch q69 clean_text")
      assert(!got(1L).contains("alice") && got(1L).contains("<EMAIL>"),
        "planted email must be redacted at ingest")
      assert(got(3L) == "plain prose with no identifiers at all",
        "clean prose must pass through untouched")
    } finally q.stop()
  }

  test("streaming quality gate admits exactly the batch q37 rows above threshold") {
    // stateless twin sharing q37's scorer verbatim: parity is
    // unconditional and the gate can never disagree with batch curation
    val dir = java.nio.file.Files.createTempDirectory("graft-qgate-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    val q = graft.streaming.DocStream
      .qualityGate(graft.streaming.DocStream.readStream(spark, dir.toString), 0.6)
      .writeStream.outputMode("append")
      .format("memory").queryName("qgate_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-qgate-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("qgate_stream")
      val want = SparkEntry.queries("q37_quality_score")(spark, sf0001)
        .filter(col("quality") >= 0.6)
      assert(got.count() == want.count())
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        "streaming quality gate must equal the batch q37 filter row-for-row")
      val total = SparkEntry.queries("q37_quality_score")(spark, sf0001).count()
      assert(want.count() > 0 && want.count() < total,
        "threshold must genuinely split the fixture or the parity is vacuous")
    } finally q.stop()
  }

  test("online BQ retrieval answers a query stream bit-identically to batch q84") {
    import org.apache.spark.sql.DataFrame
    val dir = java.nio.file.Files.createTempDirectory("graft-vec-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/embeddings.parquet"),
      dir.resolve("embeddings.parquet"))
    val corpus = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val corpusSig = graft.operators.Quantize.binarySignatures(corpus)
    val queries = spark.readStream
      .schema(spark.read.parquet(s"$dir/embeddings.parquet").schema)
      .parquet(dir.toString)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double)]
    val q = queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = graft.streaming.VecStream.bqProbe(corpusSig, batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        results.synchronized { results ++= out }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-vec-ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val want = SparkEntry.queries("q84_binary_quant_knn")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(results.nonEmpty && results.toSet == want.toSet,
      s"online answers must equal the batch top-k (got ${results.size}, want ${want.length})")
  }

  test("streaming source cap admits exactly the batch q67 winners under priority-ordered ids") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dir = java.nio.file.Files.createTempDirectory("graft-cap-stream")
    // doc ids assigned in ascending content-hash priority, so within
    // every source ascending doc_id == q67's (prio, doc_id) fill order
    // — the arrival-order contract under which the ingest gate and the
    // batch cap admit the same docs
    val raw = (1 to 60).map { i =>
      (i.toLong, s"document body number $i with marker $i", "en", s"src${i % 3}")
    }.toDF("tmp", "text", "lang", "source")
    raw
      .withColumn("prio", graft.functions.Portable.tokenId(col("text")))
      .withColumn("doc_id",
        row_number().over(Window.orderBy("prio", "tmp")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).orderBy("doc_id")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val want = SparkEntry.queries("q67_source_cap")(spark, dir.toString).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap // source -> n_kept
    val q = graft.streaming.DocStream
      .sourceCap(graft.streaming.DocStream.readStream(
        spark, dir.resolve("documents.parquet").toString), cap = 15)
      .writeStream.outputMode("append")
      .format("memory").queryName("cap_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cap-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("cap_stream").collect()
      assert(got.length == 60, "every arriving doc gets a decision")
      got.groupBy(_.getString(1)).foreach { case (src, rows) =>
        assert(rows.map(_.getLong(2)).sorted.sameElements(1L to rows.length),
          s"slots must be dense per source: $src")
        val kept = rows.filter(_.getLong(3) == 1L)
        assert(kept.length.toLong == want(src),
          s"stream must admit exactly the batch winners for $src")
        assert(kept.forall(_.getLong(2) <= 15L))
        // under priority-ordered ids the admitted docs are the lowest ids
        val keptIds = kept.map(_.getLong(0)).sorted.toSeq
        val allIds = rows.map(_.getLong(0)).sorted.toSeq
        assert(keptIds == allIds.take(kept.length))
      }
    } finally q.stop()
  }

  test("streaming packing manifest equals batch q90 row for row under id-ordered arrival") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pack-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    val q = graft.streaming.DocStream
      .packingManifest(graft.streaming.DocStream.readStream(spark, dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("pack_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-pack-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("pack_stream")
        .select("bin", "slot", "doc_id", "bin_offset", "n_tokens")
      val want = SparkEntry.queries("q90_packing_manifest")(spark, sf0001)
      assert(got.count() == want.count() && got.count() > 0)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        "ingest-time slots must equal the batch manifest exactly")
    } finally q.stop()
  }

  test("per-row text kernels (repetition stats, PII scrub) run unchanged on a doc stream") {
    // the text-pipeline scalar operators are stateless per-row plans, so
    // the SAME expressions work at ingest time with no code changes —
    // assert the streaming answer equals the batch answer on real docs
    val dir = java.nio.file.Files.createTempDirectory("graft-textstream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    def signals(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.plans.RepetitionStats.repetitionStats(split(col("text"), " ")).as("st"),
      graft.operators.TextAnalysis.redactPii(col("text")).as("clean"))
      .select(col("doc_id"), col("st.n_distinct").as("nd"), col("clean"))
    val q = signals(graft.streaming.DocStream.readStream(spark, dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("text_signals_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ts-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("text_signals_stream")
      val want = signals(Tables.documents(spark, sf0001))
      assert(got.count() == want.count())
      assert(got.exceptAll(want).count() == 0)
    } finally q.stop()
  }

  test("eventMicros keeps sub-millisecond precision that getTime truncates") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    ts.setNanos(123456789) // 123.456789 ms into the second
    assert(ts.getTime % 1000 == 123L, "getTime floors to milliseconds")
    assert(EventStream.eventMicros(ts) % 1000000L == 123456L,
      "micros must carry the sub-ms digits the batch q25 sort key sees")
    // ordering: two events 1µs apart must not compare equal
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    t2.setNanos(123457789)
    assert(EventStream.eventMicros(t2) == EventStream.eventMicros(ts) + 1)
  }
}
