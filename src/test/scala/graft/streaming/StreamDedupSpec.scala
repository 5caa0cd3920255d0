package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class StreamDedupSpec extends SparkSpecBase {

  test("streaming near-dup flags a doc against earlier bucket occupants, across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and then it sleeps in the sun"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamDedup.flagStream(s, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, base), (2L, "completely different words about ships"))
      q.processAllAvailable()
      // batch 2: near-copy of doc 1 must be flagged against STATE (doc 1
      // arrived in a previous micro-batch); the unrelated doc must not
      mem.addData((3L, base.replace("lazy", "sleepy")), (4L, "unrelated prose on alpine meadows"))
      q.processAllAvailable()
      val flags = s.sql("SELECT doc, dupOf FROM neardup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(flags.toSet === Set((3L, 1L)))
    } finally q.stop()
  }

  test("stateTtlMs evicts buckets untouched past the TTL") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val page = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // StreamContainmentSpec's TTL harness shape: with ProcessingTimeTimeout
    // the engine keeps constructing no-data batches to fire timeouts, so
    // processAllAvailable never sees quiescence — progress is observed
    // through SENTINEL pairs (identical docs always flag, estimate 1.0)
    // polled in the sink instead.
    val q = StreamDedup.flagStream(s, mem.toDF().toDF("doc_id", "text"),
        stateTtlMs = Some(500L))
      .writeStream.format("memory").queryName("neardup_ttl")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .outputMode("append").start()
    def awaitFlag(doc: Long, dupOf: Long): Unit = {
      val t0 = System.currentTimeMillis()
      while (!s.sql("SELECT doc, dupOf FROM neardup_ttl").collect()
               .exists(r => r.getLong(0) == doc && r.getLong(1) == dupOf)) {
        assert(System.currentTimeMillis() - t0 < 60000L,
          s"timed out waiting for sentinel flag ($doc, $dupOf)")
        Thread.sleep(100L)
      }
    }
    try {
      mem.addData((1L, page),
        (10L, "first sentinel corpus speaks of rivers and bridges tonight"),
        (11L, "first sentinel corpus speaks of rivers and bridges tonight"))
      awaitFlag(11L, 10L) // batch with doc 1 committed
      Thread.sleep(1500L) // let doc 1's bucket deadlines (500 ms) expire
      mem.addData(
        (12L, "second sentinel mentions orchards and granite paths ahead"),
        (13L, "second sentinel mentions orchards and granite paths ahead"))
      awaitFlag(13L, 12L) // a post-deadline batch ran -> timeouts fired
      // an exact copy of the now-EVICTED page must no longer flag
      mem.addData((3L, page),
        (14L, "third sentinel counts lanterns along the harbor wall"),
        (15L, "third sentinel counts lanterns along the harbor wall"))
      awaitFlag(15L, 14L) // doc 3's batch committed
      val flags = s.sql("SELECT DISTINCT doc, dupOf FROM neardup_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!flags.contains((3L, 1L)), s"evicted page still flagged: $flags")
      assert(flags === Set((11L, 10L), (13L, 12L), (15L, 14L)), s"got $flags")
    } finally q.stop()
  }

  test("stream equals batch twin on real documents across id-ordered micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamDedup.flagStream(s, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_stream_full")
      .outputMode("append").start()
    try {
      // three id-ordered micro-batches (arrival order = id order, the
      // batch twin's definition of "earlier")
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // stream emits per-bucket flags; the comparable form is min dupOf per doc
      val streamed = s.sql("SELECT doc, min(dupOf) FROM neardup_stream_full GROUP BY doc")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val batch = StreamDedup.flaggedBatch(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamed === batch)
      assert(batch.nonEmpty, "corpus should contain near-dups")
    } finally q.stop()
  }

  test("stream-static enrichment matches the batch join across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((12L, "alice", "BUILDING"), (13L, "bob", "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = EventStreams.enriched(
        mem.toDF().toDF("event_id", "user_id"), dim, "user_id", "c_custkey",
        Seq("c_name", "c_mktsegment"))
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, 12L), (2L, 99L)) // 99 has no dim row → left-join null
      q.processAllAvailable()
      mem.addData((3L, 13L))
      q.processAllAvailable()
      val out = s.sql("SELECT event_id, c_name, c_mktsegment FROM enrich_stream ORDER BY event_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(out === Array((1L, "alice", "BUILDING"), (2L, null, null), (3L, "bob", "MACHINERY")))
    } finally q.stop()
  }
}
