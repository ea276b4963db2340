package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EmbedDedup, Multimodal}
import graft.streaming.StreamOps

/** Local-Spark tests for the multimodal plumbing, SRP-LSH signatures, and
  * the Structured Streaming surface (MemoryStream-driven).
  */
class MultimodalStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mm-stream-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    // events reader prerequisite - see Tables.NanosAsLongConf
    .config(graft.ops.Tables.NanosAsLongConf, "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs far away"),
      (1L, "tiny"),
      (2L, "a" * 100))
      .toDF("doc_id", "text")
  }

  test("mediaMeta: deterministic dims within bounds, digest matches md5 of text") {
    val rows = Multimodal.mediaMeta(docsDf).orderBy("doc_id").collect()
    assert(rows.length == 3)
    val r0 = rows(0)
    assert(r0.getAs[String]("modality") == "image")
    assert(rows(1).getAs[String]("modality") == "audio")
    val text0 = "the quick brown fox jumps over the lazy dog and runs far away"
    assert(r0.getAs[Long]("byte_len") == text0.getBytes("UTF-8").length.toLong)
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(text0.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r0.getAs[String]("digest") == expectMd5)
    rows.foreach { r =>
      assert(r.getAs[Long]("width") >= 1 && r.getAs[Long]("width") <= 1920)
      assert(r.getAs[Long]("height") >= 1 && r.getAs[Long]("height") <= 1080)
    }
  }

  test("quarantine: each corruption class flagged, first failing check wins") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "", 0L),                                        // empty
      (2L, "tiny", 4L),                                    // too_small
      (3L, "long enough but claims more chars", 999L),     // len_mismatch
      (4L, "has a NUL \u0000 byte embedded in the text", 10L), // embedded_nul
      (5L, "a perfectly healthy payload of normal size", 42L) // ok
    ).toDF("doc_id", "text", "n_chars")
    val out = Multimodal.quarantine(docs, minBytes = 16)
      .collect().map(r => r.getLong(0) -> (r.getString(3), r.getBoolean(4))).toMap
    assert(out(1L) == ("empty", false))
    assert(out(2L) == ("too_small", false))
    assert(out(3L) == ("len_mismatch", false))
    assert(out(4L) == ("embedded_nul", false))
    assert(out(5L) == ("ok", true))
  }

  test("frameSample: frame count and sampled digests for exact/ragged/short payloads") {
    val rows = Multimodal.frameSample(docsDf, 32, 2).orderBy("doc_id").collect()
    def digests(i: Int): Seq[String] =
      rows(i).getSeq[String](rows(i).fieldIndex("frame_digests")).toSeq
    // doc 0: 62 bytes -> 2 frames of 32 -> sampled indices {0} -> 1 digest
    assert(rows(0).getAs[Long]("n_frames") == 2L)
    assert(digests(0).length == 1)
    // doc 1: 4 bytes -> 1 frame -> 1 digest, digest of whole payload
    assert(rows(1).getAs[Long]("n_frames") == 1L)
    val tinyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("tiny".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(digests(1) == Seq(tinyMd5))
    // doc 2: 100 bytes -> 4 frames -> sampled {0, 2} -> 2 digests
    assert(rows(2).getAs[Long]("n_frames") == 4L)
    assert(digests(2).length == 2)
  }

  test("decodeResize: deterministic across runs, one row per doc, no shuffle in plan") {
    val out = Multimodal.decodeResize(docsDf, Multimodal.FakeCodec, side = 4, batchSize = 2)
    val a = out.orderBy("doc_id").collect()
    val b = Multimodal.decodeResize(docsDf, Multimodal.FakeCodec, side = 4, batchSize = 64)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "batch size must not change results")
    assert(a.length == 3)
    assert(a.forall(_.getAs[Long]("thumb_checksum") >= 0))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decodeResize must be map-only, got:\n$plan")
  }

  test("SRP signatures: bucket bit strings are deterministic and plane values portable") {
    // plane values must derive from the portable h60 (matches SQL oracle)
    val v = EmbedDedup.planeVal(0, 0)
    assert(v >= -1.0 && v <= 1.0)
    assert(v == (graft.functions.SimHashUtil.h60("p:0:0") % 2001L - 1000L) / 1000.0)
    import spark.implicits._
    val embs = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(8)(1.0f)),        // identical -> identical signature
      (2L, Array.fill(8)(-1.0f)))       // antipodal -> complementary bits
      .toDF("vec_id", "embedding")
    val sig = EmbedDedup.srpBuckets(embs, 8).orderBy("id", "band").collect()
    val byId = sig.groupBy(_.getAs[Long]("id")).view
      .mapValues(_.map(r => (r.getAs[Int]("band"), r.getAs[String]("bucket"))).sorted.toSeq)
    assert(byId(0L) == byId(1L))
    val flip = byId(2L).map { case (b, s) =>
      (b, s.map(c => if (c == '1') '0' else '1'))
    }
    assert(byId(0L) == flip)
    // identical vectors form a candidate pair with cosine 1.0
    val pairs = EmbedDedup.nearDupPairs(embs, 8, 0.9).collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 1L
      && r.getAs[Double]("cos_sim") == 1.0))
  }

  test("streaming hourlyStats emits closed windows under watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.hourlyStatsStream(df, "0 seconds").writeStream
      .format("memory").queryName("hourly_t").outputMode("append").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((t(10, 5), "click", 1.0), (t(10, 40), "click", 2.0), (t(10, 20), "view", 5.0))
    q.processAllAvailable()
    mem.addData((t(12, 1), "click", 9.0)) // watermark -> 12:01, closes hour 10
    q.processAllAvailable()
    val got = spark.table("hourly_t").orderBy("hour", "event_type").collect()
    q.stop()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq(("2024-01-01 10:00:00", "click", 2L, 3.0),
          ("2024-01-01 10:00:00", "view", 1L, 5.0)))
  }

  test("streaming sessionize: gap closes a session, timeout closes on watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamOps.Evt]
    val withWm = mem.toDS().withWatermark("ts", "0 seconds")
    val q = StreamOps.sessionize(withWm, gapMinutes = 30).writeStream
      .format("memory").queryName("sessions_t").outputMode("append").start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: two events 10 min apart (one session), then an event 2h later
    mem.addData(StreamOps.Evt(1L, ts(9, 0), 1.0), StreamOps.Evt(1L, ts(9, 10), 2.0))
    q.processAllAvailable()
    mem.addData(StreamOps.Evt(1L, ts(11, 0), 4.0)) // gap > 30min -> closes session 1
    q.processAllAvailable()
    // push watermark far ahead so the open session times out
    mem.addData(StreamOps.Evt(2L, ts(15, 0), 8.0))
    q.processAllAvailable()
    mem.addData(StreamOps.Evt(2L, ts(23, 0), 0.5))
    q.processAllAvailable()
    val got = spark.table("sessions_t")
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
    q.stop()
    assert(got.contains((1L, ts(9, 0), ts(9, 10), 2L, 3.0)), s"got: ${got.mkString}")
    assert(got.contains((1L, ts(11, 0), ts(11, 0), 1L, 4.0)), s"got: ${got.mkString}")
    assert(got.contains((2L, ts(15, 0), ts(15, 0), 1L, 8.0)), s"got: ${got.mkString}")
  }

  test("transformWithState event-time timers: inactivity closes sessions at the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.Evt]
      val withWm = mem.toDS().withWatermark("ts", "0 seconds")
      val q = StreamOps.inactivitySessions(withWm, gapMinutes = 30).writeStream
        .format("memory").queryName("tws_timer_t").outputMode("update").start()
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      mem.addData(StreamOps.Evt(1L, ts(9, 0), 1.0), StreamOps.Evt(1L, ts(9, 10), 2.0))
      q.processAllAvailable()
      // watermark jumps to 15:00 -> user 1's 9:40 TIMER fires and closes
      // the open session from handleExpiredTimer
      mem.addData(StreamOps.Evt(2L, ts(15, 0), 8.0))
      q.processAllAvailable()
      // same-user event past the gap -> user 2's first session closes
      // IN-BATCH (handleInputRows), no timer involved
      mem.addData(StreamOps.Evt(2L, ts(23, 0), 0.5))
      q.processAllAvailable()
      val got = spark.table("tws_timer_t")
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      q.stop()
      // user 2's 23:00 session stays OPEN (watermark never passes 23:30)
      assert(got == Set(
        (1L, ts(9, 0), ts(9, 10), 2L, 3.0),
        (2L, ts(15, 0), ts(15, 0), 1L, 8.0)), s"got: $got")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState running totals: multi-batch delivery converges to the batch aggregate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.Evt]
      val q = StreamOps.runningUserTotals(mem.toDS()).writeStream
        .format("memory").queryName("tws_t").outputMode("update").start()
      def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      // user 1's rows deliberately split across three micro-batches
      mem.addData(StreamOps.Evt(1L, ts(9), 1.50), StreamOps.Evt(2L, ts(9), 2.00))
      q.processAllAvailable()
      mem.addData(StreamOps.Evt(1L, ts(10), 2.25))
      q.processAllAvailable()
      mem.addData(StreamOps.Evt(1L, ts(11), 0.25), StreamOps.Evt(2L, ts(11), 1.00))
      q.processAllAvailable()
      val emissions = spark.table("tws_t").as[StreamOps.UserAgg].collect()
      q.stop()
      // per-batch cumulative emissions for user 1: (1,150), (2,375), (3,400)
      val u1 = emissions.filter(_.user_id == 1L).sortBy(_.n_events)
      assert(u1.map(a => (a.n_events, a.total_cents)).toSeq ==
        Seq((1L, 150L), (2L, 375L), (3L, 400L)), s"got: ${u1.mkString(",")}")
      // final state per user == batch aggregate, independent of batching
      val finalByUser = emissions.groupBy(_.user_id)
        .map { case (u, as) => u -> as.maxBy(_.n_events) }
      assert(finalByUser(1L).total_cents == 400L && finalByUser(1L).n_events == 3L)
      assert(finalByUser(2L).total_cents == 300L && finalByUser(2L).n_events == 2L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("file-driven streaming: readStream over the events corpus matches batch hourly stats") {
    // stream the sf0.001 events table as files and check the windowed agg
    // equals the batch plan over the same data (same Catalyst window node)
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = graft.ops.Tables.events(spark, sfDir)
      .select("ts", "event_type", "value")
    // stage as a parquet dir Spark's file stream can ingest (µs timestamps)
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    batchEvents.write.mode("overwrite").parquet(stage)
    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(stage)
    val q = StreamOps.hourlyStatsStream(stream, "0 seconds").writeStream
      .format("memory").queryName("hourly_file_t").outputMode("append").start()
    q.processAllAvailable()
    // the watermark advances at the END of the data batch; closed windows
    // flush in a follow-up no-data micro-batch — wait for it
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (spark.table("hourly_file_t").isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(200)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("hourly_file_t")
      .select("hour", "event_type", "n_events", "sum_value")
      .orderBy("hour", "event_type").collect().toSeq
    val expectAll = graft.ops.Events.hourlyStats(batchEvents.withColumn("props", lit("{}")))
      .select("hour", "event_type", "n_events", "sum_value")
      .orderBy("hour", "event_type").collect().toSeq
    // append mode withholds windows the watermark has not passed — the
    // emitted set must be a prefix of the batch answer and cover all but
    // the final open hour(s)
    assert(got.nonEmpty && expectAll.startsWith(got))
    assert(expectAll.size - got.size <= 5, s"${expectAll.size} batch vs ${got.size} emitted")
  }

  test("batch sessionize agrees with streaming semantics on a closed history") {
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      (1L, ts(9, 0), 1.0, 100L), (1L, ts(9, 10), 2.0, 101L), (1L, ts(11, 0), 4.0, 102L),
      (2L, ts(15, 0), 8.0, 103L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = graft.ops.Events.sessionize(events, 30)
      .orderBy("user_id", "sid").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("session_start"),
        r.getAs[String]("session_end"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 09:00:00", "2024-01-01 09:10:00", 2L, 3.0),
      (1L, "2024-01-01 11:00:00", "2024-01-01 11:00:00", 1L, 4.0),
      (2L, "2024-01-01 15:00:00", "2024-01-01 15:00:00", 1L, 8.0)))
  }

  test("foreachBatchDigest: per-batch V2 digest commits combine to the batch answer") {
    import graft.functions._
    val sfDir = "/root/testdata/sf0.001"
    val ev = StreamOps.eventsStream(spark, sfDir)
      .select(h60(col("event_id").cast("string")).as("digest"))
    val got = StreamOps.foreachBatchDigest(spark, ev).collect()(0)
    val batch = graft.ops.Tables.events(spark, sfDir)
      .select(h60(col("event_id").cast("string")).as("digest"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(digest)").as("x")).collect()(0)
    assert(got.getLong(0) == batch.getLong(0), "row count")
    assert(got.getLong(1) == batch.getLong(1), "xor digest")
  }

  test("stream-static broadcast join matches the batch join") {
    val sfDir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("stream_static_join")(spark, sfDir).collect()
    val ev = graft.ops.Tables.events(spark, sfDir).where(col("event_type") === "purchase")
    val cust = graft.ops.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    val expect = ev.join(cust, col("user_id") === col("c_custkey"))
      .select("event_id", "user_id", "c_nationkey", "value")
      .orderBy("event_id").collect()
    assert(got.length == expect.length && got.toSeq == expect.toSeq)
  }

  test("streaming dedup keeps the first occurrence; watermark bounds state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long)]
    val df = mem.toDF().toDF("ts", "digest", "doc_id")
    // 1-hour watermark: duplicates within the hour are suppressed; the
    // seen-keys state is evicted (bounded) once the watermark passes
    val q = StreamOps.dedupStream(df, Seq("digest"), "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_t").outputMode("append").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // d1 arrives three times in-window, d2 once
    mem.addData((t(10, 0), "d1", 1L), (t(10, 1), "d1", 2L), (t(10, 2), "d2", 3L))
    q.processAllAvailable()
    mem.addData((t(10, 3), "d1", 4L))
    q.processAllAvailable()
    val got = spark.table("dedup_t").orderBy("digest")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    q.stop()
    // exactly one row per digest, and it is the FIRST-seen doc_id
    assert(got.toSeq == Seq(("d1", 1L), ("d2", 3L)))
  }

  test("nearDupProbeStream: arrival slicing cannot change the flagged pair set") {
    val sp = spark; import sp.implicits._
    implicit val sc = spark.sqlContext
    val baseTexts = Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "one two three four five six seven eight nine ten",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "completely different text about astronomy and distant stars")
    val base = baseTexts.toDF("doc_id", "text")
    // 10/13 are exact copies of base docs (every band matches — flagged
    // deterministically), 11 a near copy, 12 unrelated
    val incSeq = Seq(
      10L -> baseTexts(0)._2,
      11L -> "one two three four five six seven eight nine maybe",
      12L -> "unrelated musings on cooking pasta with garlic sauces",
      13L -> baseTexts(2)._2)
    val (k, bands, n) = (6, 3, 3)
    val store = graft.ops.Dedup.signatureStore(base, k, bands, n).localCheckpoint()
    val batch = graft.ops.Dedup
      .incrNearDup(store, incSeq.toDF("doc_id", "text"), k, bands, n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.contains((10L, 0L)) && batch.contains((13L, 2L)),
      s"exact copies must be flagged against their base docs: $batch")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamOps.nearDupProbeStream(stream, store, k, bands, n)
      .writeStream.format("memory").queryName("neardup_t")
      .outputMode("append").start()
    // two micro-batches, splitting the flagged docs across them — the
    // store is static, so slicing must be invisible in the output
    mem.addData(incSeq(0), incSeq(2))
    q.processAllAvailable()
    mem.addData(incSeq(1), incSeq(3))
    q.processAllAvailable()
    val streamed = spark.table("neardup_t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(streamed == batch,
      s"streaming probe diverged from batch incrNearDup: $streamed vs $batch")
  }
}
