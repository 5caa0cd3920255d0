package graft.streaming

import graft.SparkSpecBase
import graft.model.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpecBase {

  test("batch dailyCounts matches a direct day-truncated aggregation") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val viaWindow = EventStreams.dailyCounts(events)
      .select(col("day"), col("event_type"), col("cnt"))
    val direct = events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(viaWindow.except(direct).count() === 0)
    assert(direct.except(viaWindow).count() === 0)
  }

  test("streaming dailyCounts over a memory stream equals the batch result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val input = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.dailyCounts(input)
      .writeStream.format("memory").queryName("daily_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "click", 2.0),
        (java.sql.Timestamp.valueOf("2024-01-02 09:00:00"), "view", 3.0))
      q.processAllAvailable()
      val out = s.sql("SELECT day, event_type, cnt, sum_value FROM daily_test ORDER BY day, event_type")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(out === Array(
        ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2024-01-02 00:00:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("file-source streaming with watermark matches batch daily counts") {
    val s = spark
    // stage events as a normal (non-ns) parquet file the stream can ingest
    val staged = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Tables.events(s, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$staged/events")
    val q = EventStreams.streamDailyCounts(s, s"$staged/events")
      .writeStream.format("memory").queryName("stream_daily")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT day, event_type, cnt FROM stream_daily")
      val batch = EventStreams.dailyCounts(Tables.events(s, "/root/testdata/sf0.001"))
        .select("day", "event_type", "cnt")
      assert(streamed.except(batch).count() === 0)
      assert(batch.except(streamed).count() === 0)
    } finally q.stop()
  }

  test("streaming sliding + session windows equal their batch results") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      // u1: one burst (3 events within 6h), silence, second burst
      (1L, "2024-01-01 08:00:00", "click", 1.0),
      (1L, "2024-01-01 10:30:00", "view", 2.0),
      (1L, "2024-01-01 13:00:00", "click", 3.0),
      (1L, "2024-01-02 09:00:00", "click", 4.0),
      // u2: single event
      (2L, "2024-01-01 23:30:00", "view", 5.0)
    ).map { case (u, t, e, v) => (u, java.sql.Timestamp.valueOf(t), e, v) }
    val batchDf = rows.toDF("user_id", "ts", "event_type", "value")

    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val input = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q1 = EventStreams.slidingCounts(input)
      .writeStream.format("memory").queryName("slide_test")
      .outputMode(OutputMode.Complete()).start()
    val q2 = EventStreams.sessionCounts(input)
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(rows: _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      val slideStream = s.sql("SELECT * FROM slide_test")
      val slideBatch = EventStreams.slidingCounts(batchDf)
      assert(slideStream.except(slideBatch).count() === 0)
      assert(slideBatch.except(slideStream).count() === 0)
      val sessStream = s.sql("SELECT * FROM session_test")
      val sessBatch = EventStreams.sessionCounts(batchDf)
      assert(sessStream.except(sessBatch).count() === 0)
      assert(sessBatch.except(sessStream).count() === 0)
      // session semantics: u1 bursts merge within the 6h gap, split across it
      val u1 = sessBatch.filter(col("user_id") === 1).orderBy("session_start")
        .collect().map(r => (r.getLong(3), r.getDouble(4)))
      assert(u1 === Array((3L, 6.0), (1L, 4.0)))
    } finally { q1.stop(); q2.stop() }
  }

  test("streaming dedup drops repeats within the watermark horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStreams.dedupedStream(mem.toDF().toDF("event_id", "ts"), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val t2 = java.sql.Timestamp.valueOf("2024-01-01 10:00:05")
      mem.addData((1L, t), (1L, t), (2L, t)) // duplicate id 1 in-batch
      q.processAllAvailable()
      // duplicate id 1 across batches with a RE-STAMPED ingest ts — the
      // at-least-once-producer case: the id-only dedup key must drop it
      mem.addData((1L, t2), (3L, t))
      q.processAllAvailable()
      val ids = s.sql("SELECT event_id FROM dedup_stream").collect().map(_.getLong(0)).sorted
      assert(ids === Array(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming jump detection matches batch jumpsOnly across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    val q = JumpStream.detect(s, mem.toDF().toDF("personId", "ts", "company"))
      .writeStream.format("memory").queryName("jumps_stream")
      .outputMode("append").start()
    try {
      // batch 1: p1 A A B; p2 C
      mem.addData(("p1", 1L, "A"), ("p1", 2L, "A"), ("p1", 3L, "B"), ("p2", 1L, "C"))
      q.processAllAvailable()
      // batch 2: p1 returns to A (state must remember B); p2 stays at C (no jump)
      mem.addData(("p1", 4L, "A"), ("p2", 2L, "C"))
      q.processAllAvailable()
      val out = s.sql("SELECT personId, ts, company, jumpIndex FROM jumps_stream ORDER BY personId, ts")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      assert(out === Array(
        ("p1", 1L, "A", 1L), ("p1", 3L, "B", 2L), ("p1", 4L, "A", 3L),
        ("p2", 1L, "C", 1L)))
      // equivalence with the batch engine on the same data
      val batch = graft.analytics.Jumps.jumpsOnly(
        Seq(("p1", 1L, "A"), ("p1", 2L, "A"), ("p1", 3L, "B"), ("p1", 4L, "A"),
            ("p2", 1L, "C"), ("p2", 2L, "C")).toDF("person", "ts", "company"),
        graft.analytics.Jumps.Keys("person", Seq("ts"), "company"))
        .select("person", "ts", "company").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(t => (t._1, t._2))
      assert(out.map(t => (t._1, t._2, t._3)).toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch twin") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clicks = Seq(
      (1L, "2024-01-01 09:00:00", 102L, 1.0),  // matches u1's 08:00 view
      (1L, "2024-01-02 10:00:00", 103L, 2.0),  // 26h after it -> outside horizon
      (2L, "2024-01-01 11:00:00", 105L, 3.0)   // u2's view is AFTER the click
    ).map { case (u, t, id, v) => (u, java.sql.Timestamp.valueOf(t), id, v) }
    val views = Seq(
      (1L, "2024-01-01 08:00:00", 10.0),
      (2L, "2024-01-01 12:00:00", 20.0)
    ).map { case (u, t, v) => (u, java.sql.Timestamp.valueOf(t), v) }
    val clicksDf = clicks.toDF("user_id", "ts", "event_id", "value")
    val viewsDf = views.toDF("user_id", "ts", "value")
    val batch = EventStreams.clickViewJoin(clicksDf, viewsDf)

    val memC = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val memV = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = EventStreams.clickViewJoin(
        memC.toDF().toDF("user_id", "ts", "event_id", "value"),
        memV.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      // views before clicks across separate micro-batches: the join must
      // buffer the view side until the matching click arrives
      memV.addData(views: _*)
      q.processAllAvailable()
      memC.addData(clicks: _*)
      q.processAllAvailable()
      val streamed = s.sql("SELECT * FROM ssj_test")
      assert(streamed.except(batch).count() === 0)
      assert(batch.except(streamed).count() === 0)
      val out = streamed.collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(5)))
      assert(out === Array((1L, 102L, 10.0)))
    } finally q.stop()
  }

  test("per-user session summaries fold counts and totals (mapGroupsWithState)") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "view", 3.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "click", 5.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = EventStreams.sessionSummaries(spark, events).collect()
      .map(ss => ss.user_id -> ((ss.n_events, ss.total_value))).toMap
    assert(out(1L) === ((2L, 5.0)))
    assert(out(2L) === ((1L, 5.0)))
  }
}
