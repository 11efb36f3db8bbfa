package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.JsonOps
import graft.sources.Tables

class StreamingOpsSpec extends SparkSpec {

  test("streaming windowed counts agree with the batch operator on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batchDf = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type", "value")
    val rows = batchDf
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, String, Double)]
      .collect()

    val stream = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    stream.addData(rows.toSeq)
    val streamingDf = stream.toDF()
      .toDF("event_id", "user_id", "ts", "event_type", "value")

    val q = StreamingOps.windowedCounts(streamingDf)
      .writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      // append mode only emits windows passed by the watermark; send a late
      // max-ts nudge so every fixture window closes
      stream.addData(Seq((-1L, -1L,
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), "nudge", 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("win_out")
      .filter(col("event_type") =!= "nudge")
      .select(col("hour_start").cast("timestamp").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")
      .collect()
    val batch = JsonOps.windowedCounts(batchDf)
      .select(col("hour_start").cast("timestamp").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b, s"$s != $b") }
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    stream.addData(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, ts("2024-01-01 00:01:00"), 2.0),
      (1L, ts("2024-01-01 00:00:00"), 1.0),   // replay of event 1
      (2L, ts("2024-01-01 00:01:30"), 2.5)))  // replayed id, later ts
    val q = StreamingOps.dedupEvents(
        stream.toDF().toDF("event_id", "ts", "value"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_out").orderBy("event_id")
      .as[(Long, java.sql.Timestamp, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // each id exactly once
  }

  test("file-source streaming: incremental parquet drops feed the windowed aggregation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def drop(rows: Seq[(Long, java.sql.Timestamp, String, Double)], part: Int): Unit =
      rows.toDF("event_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)

    drop(Seq((1L, ts("2024-01-01 00:10:00"), "click", 1.0),
             (2L, ts("2024-01-01 00:20:00"), "click", 2.0)), 0)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.outputMode("append").format("memory").queryName("file_win").start()
    try {
      q.processAllAvailable()
      // second micro-batch arrives as a new file; late nudge closes the window
      drop(Seq((3L, ts("2024-01-01 00:30:00"), "click", 3.0),
               (4L, ts("2024-01-02 00:00:00"), "nudge", 0.0)), 1)
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("file_win")
      .filter($"event_type" === "click").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n") == 3L) // both files' events in one window
  }

  test("streaming sliding windows agree with the batch operator on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batchDf = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type", "value")
    val rows = batchDf
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, String, Double)]
      .collect()

    val stream = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    stream.addData(rows.toSeq)
    val streamingDf = stream.toDF()
      .toDF("event_id", "user_id", "ts", "event_type", "value")

    val q = StreamingOps.slidingCounts(streamingDf)
      .writeStream.outputMode("append")
      .format("memory").queryName("slide_out").start()
    try {
      q.processAllAvailable()
      stream.addData(Seq((-1L, -1L,
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), "nudge", 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("slide_out")
      .filter(col("event_type") =!= "nudge")
      .select(col("win_start").cast("timestamp").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
      .collect()
    val batch = JsonOps.slidingCounts(batchDf)
      .select(col("win_start").cast("timestamp").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b, s"$s != $b") }
  }

  test("streaming content dedup drops same-text documents with different ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    stream.addData(Seq(
      (1L, "Hello,   World!", ts("2024-01-01 00:00:00")),
      (2L, "hello world", ts("2024-01-01 00:01:00")),    // same content, new id
      (3L, "different text", ts("2024-01-01 00:02:00"))))
    val q = StreamingOps.dedupByFingerprint(
        stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode("append").format("memory").queryName("fp_out").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("fp_out").select("doc_id")
      .as[Long].collect().sorted
    assert(ids.length == 2 && ids.head == 1L) // content-dup id 2 dropped
  }

  test("streaming decontamination agrees with the batch operator's contaminated set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // benchMod=10, n=3: doc 10 is the benchmark; 11 shares a trigram, 12 clean
    val rows = Seq(
      (10L, "alpha beta gamma delta", ts("2024-01-01 00:00:00")),
      (11L, "alpha beta gamma epsilon", ts("2024-01-01 00:01:00")),
      (12L, "zeta eta theta iota", ts("2024-01-01 00:02:00")))
    val batchDocs = rows.map(r => (r._1, r._2)).toDF("doc_id", "text")
    val batchContaminated = graft.operators.TextAnalysis
      .decontaminate(batchDocs, benchMod = 10, n = 3)
      .filter($"contaminated").select("doc_id").as[Long].collect().toSet

    val benchGrams = batchDocs.filter($"doc_id" % 10 === 0)
      .select(explode(graft.operators.TextAnalysis.wordGrams($"text", 3)).as("gram"))
      .distinct()
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    stream.addData(rows.filter(_._1 % 10 != 0))
    val q = StreamingOps.contaminatedIds(
        stream.toDF().toDF("doc_id", "text", "ts"), benchGrams, n = 3)
      .writeStream.outputMode("append").format("memory").queryName("decon_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("decon_out").as[Long].collect().toSet
    assert(streamed == batchContaminated && streamed == Set(11L))
  }

  test("streaming sessionization closes sessions on gap and emits batch-equal results") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamingOps._

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[Event]
    stream.addData(Seq(
      Event(1, 7, ts("2024-01-01 00:00:00"), 1.0),
      Event(2, 7, ts("2024-01-01 00:10:00"), 1.0),
      Event(3, 7, ts("2024-01-01 02:00:00"), 1.0), // gap > 30min -> new session
      Event(4, 8, ts("2024-01-01 00:00:00"), 1.0)))

    val q = sessionize(stream.toDS()).writeStream
      .outputMode("append").format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      stream.addData(Seq(Event(99, 9, ts("2024-02-01 00:00:00"), 0.0))) // advance watermark
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_out")
      .filter(col("user_id") === 7L)
      .as[SessionOut].collect().sortBy(_.session_seq)
    // session 1 of user 7 must be closed by the gap with 2 events
    assert(got.nonEmpty)
    assert(got.head.session_seq == 1L && got.head.n_events == 2L)
    assert(got.head.session_start == ts("2024-01-01 00:00:00").getTime / 1000)
    assert(got.head.session_end == ts("2024-01-01 00:10:00").getTime / 1000)
  }

  test("streaming upsertLatest agrees with the batch Merge form, stale updates lose") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // (id, key, ts, value) — key "a" gets three versions across two batches,
    // the LAST-delivered being stale (out-of-order CDC)
    val b1 = Seq((1L, "a", ts("2024-01-01 00:00:00"), 1.0),
                 (2L, "b", ts("2024-01-01 00:00:00"), 2.0),
                 (3L, "a", ts("2024-01-01 02:00:00"), 3.0))
    val b2 = Seq((4L, "a", ts("2024-01-01 01:00:00"), 4.0), // stale: loses to id 3
                 (5L, "c", ts("2024-01-01 00:30:00"), 5.0))
    val stream = MemoryStream[(Long, String, java.sql.Timestamp, Double)]
    val q = StreamingOps.upsertLatest(
        stream.toDF().toDF("event_id", "key", "ts", "value"),
        keys = Seq("key"), version = "ts",
        tiebreak = Seq("event_id"), payload = Seq("value"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("upsert_out").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("upsert_out")
      .select("key", "ts", "event_id", "value").orderBy("key").collect()
    val all = (b1 ++ b2).toDF("event_id", "key", "ts", "value")
    val batch = graft.operators.Merge.upsertLatest(
        all.limit(0), all, Seq("key"), col("ts"), Seq(col("event_id")))
      .select("key", "ts", "event_id", "value").orderBy("key").collect()
    assert(streamed.toSeq == batch.toSeq, s"${streamed.toSeq} != ${batch.toSeq}")
    // the stale row (id 4) must not have won key "a"
    assert(streamed.find(_.getAs[String]("key") == "a")
      .get.getAs[Long]("event_id") == 3L)
  }

  test("native session_window streams with bounded state and agrees with the batch form") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 7: two events 10 min apart (one session), then a 2-hour gap (new
    // session); user 8: a single event
    val rows = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 7L, ts("2024-01-01 10:10:00"), "view", 0.0),
      (3L, 7L, ts("2024-01-01 12:30:00"), "click", 0.0),
      (4L, 8L, ts("2024-01-01 11:00:00"), "view", 0.0))
    val stream = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val streaming = graft.operators.JsonOps.sessionWindows(
        stream.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
          .withWatermark("ts", "1 hour"))
    val q = streaming.writeStream.outputMode("complete").format("memory")
      .queryName("sw_out").start()
    try { stream.addData(rows); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sw_out")
      .select("user_id", "session_start", "session_end", "n_events", "first_event")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = graft.operators.JsonOps.sessionWindows(
        rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.size == 3)
    // the merged session spans both events + the 30-min tail
    assert(streamed.contains((7L,
      ts("2024-01-01 10:00:00").getTime / 1000,
      ts("2024-01-01 10:40:00").getTime / 1000, 2L, 1L)))
  }

  test("stream-stream attribution join agrees with the batch form; out-of-window rows excluded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (2L, 7L, ts("2024-01-01 10:30:00"), "click", 0.0), // pairs with view 1
      (3L, 7L, ts("2024-01-01 08:00:00"), "view", 0.0),  // > 1h before click 2
      (4L, 8L, ts("2024-01-01 10:15:00"), "view", 0.0),  // other user
      (5L, 7L, ts("2024-01-01 11:45:00"), "click", 0.0), // pairs with view 6 only
      (6L, 7L, ts("2024-01-01 11:00:00"), "view", 0.0))
    val stream = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val q = StreamingOps.attributionJoin(
        stream.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()
    try { stream.addData(rows); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("attr_out").select("click_id", "view_id")
      .as[(Long, Long)].collect().toSet
    assert(streamed == Set((2L, 1L), (5L, 6L)))
    val batch = StreamingOps.attributionJoin(
        rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
      .select("click_id", "view_id").as[(Long, Long)].collect().toSet
    assert(batch == streamed)
  }

  test("attribution join streams over TIMESTAMP_NTZ (the fixture tables' type)") {
    // bench/oracle events read as TIMESTAMP_NTZ (Tables.events); the
    // watermark + stream-stream interval join combination must hold for
    // that type too, not just TimestampType
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (2L, 7L, ts("2024-01-01 10:30:00"), "click", 0.0), // pairs with view 1
      (3L, 7L, ts("2024-01-01 08:00:00"), "view", 0.0),  // > 1h before click 2
      (4L, 8L, ts("2024-01-01 10:15:00"), "view", 0.0),  // other user
      (5L, 7L, ts("2024-01-01 11:45:00"), "click", 0.0), // pairs with view 6 only
      (6L, 7L, ts("2024-01-01 11:00:00"), "view", 0.0))
    def ntz(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    val stream = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val q = StreamingOps.attributionJoin(
        ntz(stream.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")))
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_ntz_out").start()
    try { stream.addData(rows); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("attr_ntz_out").select("click_id", "view_id")
      .as[(Long, Long)].collect().toSet
    assert(streamed == Set((2L, 1L), (5L, 6L)))
    val batch = StreamingOps.attributionJoin(
        ntz(rows.toDF("event_id", "user_id", "ts", "event_type", "value")))
      .select("click_id", "view_id").as[(Long, Long)].collect().toSet
    assert(batch == streamed)
  }

  test("streaming distinct counts agree EXACTLY with batch incrementalDistinct") {
    // register-wise-max mergeability: stream accumulation over two triggers
    // must land on the same HLL estimate as snapshot-sketch UNION delta-sketch
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batch1 = (1 to 60).map(i => (s"t${i % 3}", i.toLong * 7 % 23))
    val batch2 = (1 to 40).map(i => (s"t${i % 3}", i.toLong * 11 % 31))
    val stream = MemoryStream[(String, Long)]
    val q = StreamingOps.distinctCounts(
        stream.toDF().toDF("event_type", "user_id"),
        Seq("event_type"), "user_id")
      .select("event_type", "n_distinct_est")
      .writeStream.outputMode("update").format("memory")
      .queryName("dv_out").start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    // update mode re-emits a key per trigger it received input; estimates
    // are monotone (registers only grow), so max = the final emission
    val streamed = spark.table("dv_out")
      .groupBy("event_type").agg(max("n_distinct_est").as("est"))
      .as[(String, Double)].collect().toMap
    val merged = graft.operators.Merge.incrementalDistinct(
        graft.operators.Merge.distinctSnapshot(
          batch1.toDF("event_type", "user_id"), Seq("event_type"), "user_id"),
        batch2.toDF("event_type", "user_id"), Seq("event_type"), "user_id")
      .select("event_type", "n_distinct_est")
      .as[(String, Double)].collect().toMap
    assert(streamed == merged)
    // and the estimate family is sane: within HLL rsd of the exact counts
    val exact = (batch1 ++ batch2).groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).distinct.size }
    exact.foreach { case (k, n) =>
      assert(math.abs(streamed(k) - n) <= 0.05 * n + 1, s"$k: ${streamed(k)} vs $n")
    }
  }

  test("classifier inference streams stateless and agrees with the batch scores") {
    // the map-literal form has no aggregation across rows, so it runs in
    // append mode with NO watermark and NO state store — model inference
    // over a document stream is just the narrow map per micro-batch
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    stream.addData(rows.take(rows.length / 2))
    val q = graft.operators.Classifier.scoreUnsorted(
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("clf_out").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2)) // second trigger
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("clf_out").orderBy("doc_id").collect().toSeq
    val batch = graft.operators.Classifier.score(
      rows.toDF("doc_id", "text")).collect().toSeq
    assert(streamed == batch)
  }

  test("streaming upsertLatest update mode: per-batch emissions carry current winners") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b1 = Seq((1L, "a", ts("2024-01-01 00:00:00"), 1.0),
                 (2L, "b", ts("2024-01-01 00:00:00"), 2.0),
                 (3L, "a", ts("2024-01-01 02:00:00"), 3.0))
    val b2 = Seq((4L, "a", ts("2024-01-01 01:00:00"), 4.0), // stale for key a
                 (5L, "c", ts("2024-01-01 00:30:00"), 5.0))
    val stream = MemoryStream[(Long, String, java.sql.Timestamp, Double)]
    val q = StreamingOps.upsertLatest(
        stream.toDF().toDF("event_id", "key", "ts", "value"),
        keys = Seq("key"), version = "ts",
        tiebreak = Seq("event_id"), payload = Seq("value"))
      .writeStream.outputMode("update").format("memory")
      .queryName("upsert_upd").start()
    def emitted(): Seq[(String, Long)] =
      spark.table("upsert_upd").select("key", "event_id")
        .as[(String, Long)].collect().toSeq
    try {
      stream.addData(b1); q.processAllAvailable()
      val batch1 = emitted()
      stream.addData(b2); q.processAllAvailable()
      val batch2 = emitted().diff(batch1)
      // batch 1 emits each touched key's winner once: a -> id 3, b -> id 2
      assert(batch1.sorted == Seq(("a", 3L), ("b", 2L)))
      // batch 2: new key c emits its winner; untouched key b is NOT
      // re-emitted; and whether or not touched-but-unchanged key a
      // re-emits, any emission must carry the UNCHANGED winner id 3 —
      // the stale id-4 row can never surface
      assert(batch2.contains(("c", 5L)))
      assert(!batch2.exists(_._1 == "b"))
      assert(batch2.filter(_._1 == "a").forall(_ == ("a", 3L)))
      info(s"batch-2 update-mode emissions: $batch2")
    } finally q.stop()
  }

  test("streaming passage-digest counts accumulate to the batch counts exactly") {
    // digest-count state is mergeable (plain counts), so accumulating the
    // corpus over TWO triggers must land on the same per-digest counts as
    // one batch pass — and the >1 digests must be exactly the passages the
    // batch span detector builds its islands from
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val rows = docs.as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps.duplicatedDigestCounts(
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update").format("memory")
      .queryName("pass_out").start()
    try {
      stream.addData(rows.take(rows.length / 2)); q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2)); q.processAllAvailable()
    } finally q.stop()
    // update mode re-emits a digest per trigger that grew it; counts are
    // monotone, so max = final
    val streamed = spark.table("pass_out")
      .groupBy("h").agg(max("n_copies").as("n_copies"))
      .as[(String, Long)].collect().toMap
    val batch = StreamingOps.duplicatedDigestCounts(docs)
      .as[(String, Long)].collect().toMap
    assert(streamed == batch)
    val dupDigests = batch.filter(_._2 > 1)
    assert(dupDigests.nonEmpty, "fixture plants duplicated passages")
    // the digest state IS the cross-doc signal: the docs the batch lane
    // reports as passage-duplicated are exactly the docs carrying at least
    // one globally-duplicated digest
    val flagged = graft.operators.Dedup.duplicatedPassages(docs)
      .select("doc_id").as[Long].collect().toSet
    val dupSet = dupDigests.keySet
    val w = split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
    val window = 16
    val carriers = docs.select(col("doc_id"), w.as("__w"))
      .filter(size(col("__w")) >= window)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("__w")) - (window - 1)),
        i => md5(concat_ws(" ", slice(col("__w"), i, lit(window)))))).as("h"))
      .filter(col("h").isin(dupSet.toSeq: _*))
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(carriers == flagged)
  }

  test("streaming near-dup hits vs static history agree with the batch lane") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    // the persisted history sketch (the batch lane's artifact)
    val historySigs = graft.operators.NearDup.signatures(history)
      .select("doc_id", "sh", "sig").localCheckpoint()
    val rows = batch.as[(Long, String)].collect().toSeq
    def ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.nearDupHitsVsHistory(
        stream.toDF().toDF("doc_id", "text", "ts"), historySigs)
      .writeStream.outputMode("append").format("memory")
      .queryName("ndh_out").start()
    try {
      stream.addData(rows.take(rows.length / 2).map(r => (r._1, r._2, ts0)))
      q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2).map(r => (r._1, r._2, ts0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ndh_out").select("doc_id").as[Long].collect().toSet
    // batch truth: everything the survivor lane would NOT keep
    val survivors = graft.operators.NearDup
      .nearDupSurvivorsVsHistory(batch, history)
      .select("doc_id").as[Long].collect().toSet
    val expected = rows.map(_._1).toSet -- survivors
    assert(expected.nonEmpty, "fixture plants cross-set near-dups")
    assert(streamed == expected)
  }

  test("streaming quality-bucket assignment with frozen cuts agrees with batch") {
    // production shape: boundaries frozen from a reference snapshot
    // broadcast to the stream; assignment is stateless append mode
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val cuts = graft.operators.TextAnalysis.qualityCuts(docs)
    val rows = docs.as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps.qualityBucketAssign(
        stream.toDF().toDF("doc_id", "text"), cuts)
      .writeStream.outputMode("append").format("memory")
      .queryName("qb_out").start()
    try {
      stream.addData(rows.take(rows.length / 2)); q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("qb_out")
      .orderBy("doc_id").as[(Long, Double, Long)].collect().toSeq
    val batch = graft.operators.TextAnalysis.qualityBuckets(docs)
      .orderBy("doc_id").as[(Long, Double, Long)].collect().toSeq
    assert(streamed == batch)
    assert(batch.map(_._3).distinct.size >= 2, "cuts split the corpus")
  }

  test("blocklist filtering streams stateless and agrees with the batch form") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val phrases = Seq("slow join", "fast scan", "purple elephant")
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.blocklistFilter(
        stream.toDF().toDF("doc_id", "text"), phrases)
      .writeStream.outputMode("append").format("memory")
      .queryName("bl_out").start()
    try {
      stream.addData(rows.take(rows.length / 2)); q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("bl_out").orderBy("doc_id").collect().toSeq
    val batch = graft.operators.TextAnalysis.blocklistFilter(
      rows.toDF("doc_id", "text"), phrases).orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
    assert(batch.exists(_.getBoolean(1)), "some docs hit the blocklist")
  }

  test("streaming admission funnel agrees with the batch form (history-only stages)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val history = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val norm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val historyFps = history.select(md5(norm).as("fp")).distinct()
    val historySigs = graft.operators.NearDup
      .signatures(history.select("doc_id", "text"))

    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = batch.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t, ts0) }.toSeq
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.admitStream(
        stream.toDF().toDF("doc_id", "text", "ts"), historyFps, historySigs)
      .writeStream.outputMode("append").format("memory")
      .queryName("admit_out").start()
    try {
      stream.addData(rows.take(rows.length / 2)); q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2)); q.processAllAvailable()
      // watermark nudge to close the window
      stream.addData(Seq((-1L, "nudge",
        java.sql.Timestamp.valueOf("2030-01-01 00:00:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("admit_out").filter(col("doc_id") >= 0)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val batchRes = graft.operators.CurationPipeline
      .admitBatch(batch, history, withinBatch = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(streamed == batchRes)
    assert(streamed.map(_._2).distinct.size >= 3, "several stages fire")
  }

  test("centroid scoring with frozen centroids streams stateless, flags agree") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val cents = graft.operators.Similarity.labelCentroids(emb)
    // frozen per-label outlier thresholds: the bottomK-th cosine from the
    // reference corpus (what a production stream would pin at deploy time)
    val batch = graft.operators.Similarity.centroidOutliers(emb, bottomK = 5)
      .collect()
    val thresholds: Map[Int, Double] = batch.groupBy(_.getInt(1)).map {
      case (l, rows) =>
        l -> rows.filter(_.getBoolean(4)).map(_.getDouble(2)).max
    }
    val rows = emb.select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)].collect().toSeq
    val stream = MemoryStream[(Long, Array[Float], Int)]
    val q = graft.operators.Similarity.centroidScores(
        stream.toDF().toDF("vec_id", "embedding", "label"), cents)
      .writeStream.outputMode("append").format("memory")
      .queryName("cent_out").start()
    try {
      stream.addData(rows.take(rows.length / 2)); q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cent_out").orderBy("vec_id").collect()
    // scores bit-identical to the batch lane's cos_centroid column
    assert(streamed.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      batch.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    // frozen-threshold flags reproduce the batch rank flags (cosines are
    // distinct on this fixture, so threshold == rank semantics)
    val streamFlags = streamed.map(r =>
      r.getLong(0) -> (r.getDouble(2) <= thresholds(r.getInt(1)))).toMap
    batch.foreach { r =>
      assert(streamFlags(r.getLong(0)) == r.getBoolean(4), s"vec ${r.getLong(0)}")
    }
  }

  test("DSIR frozen-weight scoring streams stateless and agrees with batch") {
    // train once on the static corpus, apply to the stream — the
    // vec_assign_new contract for importance weights: history never rescans
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val (w, default) = graft.operators.Dsir.trainedWeights(
      docs, col("source").isin("src0", "src1"))
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val q = graft.operators.Dsir.scoreWith(
        stream.toDF().toDF("doc_id", "text"), w, default)
      .writeStream.outputMode("append").format("memory")
      .queryName("dsir_out").start()
    try {
      stream.addData(rows.take(rows.length / 2)); q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dsir_out").orderBy("doc_id").collect().toSeq
    val batch = graft.operators.Dsir.scoreWith(
        rows.toDF("doc_id", "text"), w, default)
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming funnel's final stage counts agree with the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamingOps.{FunnelEvent, FunnelOut}
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 converts fully; user 2's purchase precedes its click (stops at
    // 2); user 3 clicks without viewing (stage 0); user 4's click falls
    // outside the 7-day window
    val rows = Seq(
      FunnelEvent(1, 1, ts("2024-01-01 10:00:00"), "view"),
      FunnelEvent(2, 1, ts("2024-01-01 11:00:00"), "click"),
      FunnelEvent(3, 2, ts("2024-01-01 10:00:00"), "view"),
      FunnelEvent(4, 2, ts("2024-01-01 10:30:00"), "purchase"),
      FunnelEvent(5, 3, ts("2024-01-01 09:00:00"), "click"),
      FunnelEvent(6, 4, ts("2024-01-01 10:00:00"), "view"),
      // --- batch 2 (later event times: watermark-ordered split) ---
      FunnelEvent(7, 1, ts("2024-01-01 12:00:00"), "purchase"),
      FunnelEvent(8, 2, ts("2024-01-01 13:00:00"), "click"),
      FunnelEvent(9, 4, ts("2024-01-20 10:00:00"), "click"))
    val stream = MemoryStream[FunnelEvent]
    val q = StreamingOps.conversionFunnel(stream.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_out").start()
    try {
      stream.addData(rows.take(6)); q.processAllAvailable()
      stream.addData(rows.drop(6)); q.processAllAvailable()
    } finally q.stop()

    // update mode: the LAST emission per user is the final state
    val emitted = spark.table("funnel_out").as[FunnelOut].collect()
    val finalStage = emitted.groupBy(_.user_id)
      .view.mapValues(_.maxBy(_.stage_reached).stage_reached).toMap
    // batch counts per stage == number of users at-or-past that stage
    val batchEvents = rows
      .map(e => (e.event_id, e.ts, e.user_id, e.event_type, 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = graft.operators.Funnel.conversionFunnel(batchEvents).collect()
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
    (1 to 3).foreach { s =>
      val streamedN = finalStage.values.count(_ >= s).toLong
      assert(streamedN === batch(s.toLong), s"stage $s: $finalStage vs $batch")
    }
    assert(finalStage === Map(1L -> 3L, 2L -> 2L, 4L -> 1L))
  }

  test("streaming count-min cells accumulate to EXACTLY the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps.cmsCounts(
        stream.toDF().toDF("doc_id", "text"), d = 2, w = 64)
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_out").start()
    try {
      stream.addData(docs.take(docs.length / 2)); q.processAllAvailable()
      stream.addData(docs.drop(docs.length / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cms_out")
      .orderBy("sketch_row", "bucket").collect().toSeq
    val batch = graft.operators.TextAnalysis.cmsSketch(
        docs.toDF("doc_id", "text"), d = 2, w = 64)
      .orderBy("sketch_row", "bucket").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming drift timeline matches the batch TV on closed days") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(day: Int, t: String, n: Int) = (1 to n).map(i =>
      (day * 1000L + i,
        java.sql.Timestamp.valueOf(f"2024-03-$day%02d 06:00:00"), t))
    val rows = (1 to 7).flatMap(d => ev(d, "a", 6) ++ ev(d, "b", 2)) ++
      ev(8, "a", 3) ++ ev(8, "b", 1) ++ ev(9, "c", 5) ++ ev(10, "a", 2) ++
      ev(12, "a", 1) // sentinel advances the watermark past day 10
    val batch = graft.operators.Funnel.driftTimeline(
        rows.toDF("event_id", "ts", "event_type"), refDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(3)).toMap
    val refMix = Map("a" -> 42L, "b" -> 14L) // first-7-day mix, frozen
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingOps.driftTimeline(
        stream.toDF().toDF("event_id", "ts", "event_type"), refMix)
      .writeStream.outputMode("append").format("memory")
      .queryName("drift_out").start()
    try {
      stream.addData(rows.take(40)); q.processAllAvailable()
      stream.addData(rows.drop(40)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("drift_out").collect()
      .map(r => r.getDate(0).toString -> r.getDouble(2)).toMap
    assert(streamed.nonEmpty)
    // every closed day the stream emitted matches the batch bit-for-bit
    streamed.foreach { case (day, tv) => assert(batch(day) == tv, day) }
    assert(streamed.contains("2024-03-08") && streamed.contains("2024-03-09"))
    assert(streamed("2024-03-09") == 1.0)
  }

  test("streaming quantile sample accumulates to EXACTLY the batch sample") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = (1 to 2000).map(i => (i.toLong, (i * 7 % 500).toDouble))
    val stream = MemoryStream[(Long, Double)]
    val q = StreamingOps.quantileSample(
        stream.toDF().toDF("id", "v"), k = 64)
      .writeStream.outputMode("complete").format("memory")
      .queryName("qsamp_out").start()
    try {
      stream.addData(rows.take(700)); q.processAllAvailable()
      stream.addData(rows.drop(700)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("qsamp_out").orderBy("sid")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = graft.operators.Merge.quantileSample(
        rows.toDF("id", "v"), k = 64)
      .orderBy("sid").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(streamed == batch)
    assert(streamed.size == 64)
  }

  test("streamed quantile STATE yields the full batch sketch REPORT bit-for-bit") {
    // the ext_quantile_sketch claim in full: the single-agg streaming state
    // is the sketch — feeding the streamed sample into the report derivation
    // reproduces batch quantileSketch exactly (estimates AND rank audit)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = (1 to 1500).map(i => (i.toLong, (i * 13 % 300).toDouble))
    val pop = rows.toDF("id", "v")
    val stream = MemoryStream[(Long, Double)]
    val q = StreamingOps.quantileSample(
        stream.toDF().toDF("id", "v"), k = 64)
      .writeStream.outputMode("complete").format("memory")
      .queryName("qsketch_state_out").start()
    try {
      stream.addData(rows.take(500)); q.processAllAvailable()
      stream.addData(rows.drop(500)); q.processAllAvailable()
    } finally q.stop()
    val streamedState = spark.table("qsketch_state_out")
    def report(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    val fromStream = report(graft.operators.Merge.quantileSketchFromSample(
      pop, streamedState, "v", Seq(0.1, 0.25, 0.5, 0.75, 0.9)))
    val fromBatch = report(graft.operators.Merge.quantileSketch(
      pop, k = 64, id = "id", valueCol = "v"))
    assert(fromStream == fromBatch)
    assert(fromStream.size == 5)
  }

  test("streaming KMV sketch accumulates to EXACTLY the batch sketch and estimate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // items with heavy cross-batch duplication: the aggregator's internal
    // dedupe (one stateful op) must land on the batch result bit-for-bit
    val items = (0 until 3000).map(i => s"item_${i % 1000}")
    val stream = MemoryStream[String]
    val q = StreamingOps.kmvDistinct(stream.toDF().toDF("item"), k = 64)
      .writeStream.outputMode("complete").format("memory")
      .queryName("kmv_out").start()
    try {
      stream.addData(items.take(1000)); q.processAllAvailable()
      stream.addData(items.drop(1000)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("kmv_out").collect().head
    val batch = graft.operators.Merge.kmvSketch(items.toDF("item"), k = 64)
      .collect().head
    assert(streamed.getAs[scala.collection.Seq[Long]]("kmv") == batch.getAs[scala.collection.Seq[Long]]("kmv"))
    assert(streamed.getAs[Double]("d_est") == batch.getAs[Double]("d_est"))
  }

  test("streaming retraction counts accumulate to the batch signed-fold state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val inserts = Seq((1L, "a", 10.5, 1), (1L, "a", 2.25, 1), (2L, "b", 7.0, 1))
    val deletes = Seq((1L, "a", 2.25, -1), (2L, "b", 7.0, -1))
    val stream = MemoryStream[(Long, String, Double, Int)]
    val q = StreamingOps.retractCounts(
        stream.toDF().toDF("k", "t", "value", "op"), Seq("k", "t"), "value")
      .writeStream.outputMode("complete").format("memory")
      .queryName("retract_out").start()
    try {
      stream.addData(inserts); q.processAllAvailable()
      stream.addData(deletes); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("retract_out").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        r.getDecimal(3).doubleValue)).toSeq
    // key 2 fully retracted: the stream EMITS n=0 (delete marker) — sinks
    // apply it; the batch form filters. Compare against the unfiltered fold.
    val batch = graft.operators.Merge.retractSnapshot(
        (inserts ++ deletes).toDF("k", "t", "value", "op"), Seq("k", "t"), "value")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2),
        r.getDecimal(3).doubleValue)).toSeq
    assert(streamed == batch)
    assert(streamed.exists { case (k, n, _) => k == 2L && n == 0L })
  }

  test("streaming entity resolution adopts frozen-history entities, agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val history = Seq(
      (1L, "alice", "a@x.com"), (2L, "alicia", "a@x.com"), // entity 1
      (3L, "carol", "c@x.com"))                            // entity 3
      .toDF("id", "name", "email")
    val hEnt = graft.operators.EntityResolution.resolve(history, "id",
      Seq(col("name"), col("email")))
    // no intra-batch edges (the stream contract): adoption-only records
    val rows = Seq(
      (10L, "ALICE", "a@x.com"),  // entity 1 via email
      (11L, "carol", "q@x.com"),  // entity 3 via name
      (12L, "dave", "d@x.com"))   // new entity
    val stream = MemoryStream[(Long, String, String)]
    stream.addData(rows.take(2))
    val q = StreamingOps.resolveStream(
        stream.toDF().toDF("id", "name", "email"),
        history, hEnt, "id", Seq(col("name"), col("email")))
      .writeStream.outputMode("append").format("memory")
      .queryName("er_out").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(2)) // second trigger — no cross-trigger state
      q.processAllAvailable()
      // stateless: no state store rows at all
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
    val streamed = spark.table("er_out").orderBy("record_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val batch = graft.operators.EntityResolution.resolveIncremental(
        history, hEnt, rows.toDF("id", "name", "email"), "id",
        Seq(col("name"), col("email")))
      .orderBy("record_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(streamed === batch)
    assert(streamed === Seq((10L, 1L, false), (11L, 3L, false), (12L, 12L, true)))
  }

  test("streaming line doc-frequency accumulates to EXACTLY the batch docFreq (and its merge)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val wpl = 4
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").limit(120)
      .as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps.lineDocFreq(
        stream.toDF().toDF("doc_id", "text"), wordsPerLine = wpl)
      .writeStream.outputMode("complete").format("memory")
      .queryName("ldf_out").start()
    try {
      stream.addData(docs.take(50)); q.processAllAvailable()
      stream.addData(docs.drop(50)); q.processAllAvailable()
    } finally q.stop()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("__h", "line", "doc_freq").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val streamed = key(spark.table("ldf_out"))
    // (a) stream state == batch docFreq over the full corpus
    val full = key(graft.operators.LineDedup.docFreq(
      docs.toDF("doc_id", "text"), wpl))
    assert(streamed.nonEmpty && streamed == full)
    // (b) ...== mergeDocFreq over the two halves' batch states — the
    // sum-mergeable-state claim, proven directly
    val merged = key(graft.operators.LineDedup.mergeDocFreq(
      graft.operators.LineDedup.docFreq(docs.take(50).toDF("doc_id", "text"), wpl),
      graft.operators.LineDedup.docFreq(docs.drop(50).toDF("doc_id", "text"), wpl)))
    assert(merged == full)
  }

  test("streaming compaction tail state places new files bit-identically to batch assignIncremental") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val history = (1L to 40L).map(i =>
      (s"dt=${i % 4}", i, 37L + (i * 13 % 91)))
    val newFiles = (41L to 60L).map(i =>
      (s"dt=${i % 4}", i, 29L + (i * 7 % 83)))
    val stream = MemoryStream[(String, Long, Long)]
    val q = StreamingOps.compactionTails(
        stream.toDF().toDF("part", "file_id", "bytes"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("ctails_out").start()
    try {
      stream.addData(history.take(17)); q.processAllAvailable()
      stream.addData(history.drop(17)); q.processAllAvailable()
    } finally q.stop()
    val streamedTails = spark.table("ctails_out")
    def placement(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("part", "file_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val viaStream = placement(graft.operators.Compaction
      .assignIncrementalFromTails(streamedTails,
        newFiles.toDF("part", "file_id", "bytes"), target = 256L))
    val viaBatch = placement(graft.operators.Compaction.assignIncremental(
      history.toDF("part", "file_id", "bytes"),
      newFiles.toDF("part", "file_id", "bytes"), target = 256L))
    assert(viaStream.nonEmpty && viaStream == viaBatch)
  }
}
