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
