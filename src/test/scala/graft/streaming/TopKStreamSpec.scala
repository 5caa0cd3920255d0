package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TopKStreamSpec extends SparkSpecBase {

  test("stream counts across micro-batches equal the batch execution") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = TopKStream.counts(s, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        mem.addData(chunk.toSeq); q.processAllAvailable()
      }
      // live counts = max-ver emission per bucket
      val streamed = s.sql(
        """SELECT term, cnt FROM topk_stream t
          |WHERE ver = (SELECT max(ver) FROM topk_stream x WHERE x.bucket = t.bucket)
          |""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = TopKStream.counts(s, docs).collect()
        .map(b => b.term -> b.cnt).toMap
      assert(streamed === batch)
      // and both equal the plain word count
      val exact = docs.select(explode(split(lower(col("text")), "\\s+")).as("t"))
        .filter(length(col("t")) > 0)
        .groupBy("t").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(batch === exact)
    } finally q.stop()
  }

  test("space-saving eviction keeps the overestimate bound and the heavy term") {
    val s = spark
    import s.implicits._
    // one bucket, capacity 2, heavy term 'aaa' x 10 against 5 singletons:
    // the heavy term must survive with cnt >= true count (overestimate
    // only), and the table never exceeds capacity
    val words = (Seq.fill(10)("aaa") ++ Seq("b", "c", "d", "e", "f"))
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val out = TopKStream.counts(s, docs, buckets = 1, capacity = 2).collect()
    assert(out.length <= 2)
    val heavy = out.find(_.term == "aaa")
    assert(heavy.isDefined && heavy.get.cnt >= 10L)
    // the eviction counter surfaces sketch mode: 5 singletons through a
    // capacity-2 table must record evictions (exactness precondition
    // visibly violated), while an under-capacity stream records zero
    assert(out.forall(_.evictions > 0L), out.mkString(", "))
    val exact = TopKStream.counts(s, docs, buckets = 1, capacity = 64).collect()
    assert(exact.forall(_.evictions == 0L))
    assert(exact.find(_.term == "aaa").get.cnt == 10L)
  }
}
