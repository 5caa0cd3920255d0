package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class IngestGateSpec extends SparkSpecBase {

  // 60 words, passes every gopher rule (stop hits: the/and/in/a/of)
  private val base = Array.fill(4)(
    "the quick brown fox jumps over a lazy dog and then sleeps in the warm sun of june"
  ).mkString(" ")

  test("chained gates: quality drop, in-stream exact drop, near-dup flag, clean admit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val other = Array.fill(4)(
      "a small ship sails to the cold north sea and the crew watches waves of grey salt water"
    ).mkString(" ")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = IngestGate.gateStream(s, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("ingest_gate")
      .outputMode("append").start()
    try {
      // batch 1: 1 = clean, 2 = exact copy of 1 (must be dropped by the
      // exact gate, so it can never become a bucket occupant), 4 = junk
      // that fails the quality gate
      mem.addData((1L, base), (2L, base), (4L, "### short junk"))
      q.processAllAvailable()
      // batch 2: 3 = near-copy of 1 (flag vs 1 — never vs the dropped 2),
      // 5 = unrelated clean doc (no flag)
      mem.addData((3L, base.replace("lazy", "sleepy")), (5L, other))
      q.processAllAvailable()
      val flags = s.sql("SELECT doc, dupOf FROM ingest_gate").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(flags.toSet === Set((3L, 1L)),
        s"expected exactly the near-dup flag (3,1), got ${flags.toList}")

      // batch twin agrees end-to-end: admitted = 1 and 5 only
      val admitted = IngestGate.admittedBatch(
          Seq((1L, base), (2L, base), (3L, base.replace("lazy", "sleepy")),
            (4L, "### short junk"), (5L, other)).toDF("doc_id", "text"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(admitted.map(_._1).toSeq === Seq(1L, 5L))
      assert(admitted.forall(_._2 > 0))
    } finally q.stop()
  }

  test("bounded exact-gate state: horizon eviction re-admits the copy, and the " +
       "near-dup gate catches it instead") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val other = Array.fill(4)(
      "a small ship sails to the cold north sea and the crew watches waves of grey salt water"
    ).mkString(" ")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val q = IngestGate.gateStream(s,
        mem.toDF().toDF("doc_id", "text", "ts"),
        eventTime = Some("ts"), dedupHorizon = Some("10 minutes"))
      .writeStream.format("memory").queryName("ingest_gate_ttl")
      .outputMode("append").start()
    try {
      // copy WITHIN the horizon: dropped by the exact gate, no flag at all
      mem.addData((1L, base, ts(0)), (2L, base, ts(5)))
      q.processAllAvailable()
      // advance the watermark past 10:00 + 10min with an unrelated doc
      mem.addData((3L, other, ts(59)))
      q.processAllAvailable()
      // copy PAST the horizon: the exact gate's state for doc 1's hash is
      // evicted, the copy re-admits — and the near-dup gate flags it
      // against doc 1's still-held bucket occupancy (identical signature)
      mem.addData((4L, base, ts(59)))
      q.processAllAvailable()
      val flags = s.sql("SELECT doc, dupOf FROM ingest_gate_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(flags.toSet === Set((4L, 1L)),
        s"expected only the post-horizon copy flagged against the original, got ${flags.toList}")
    } finally q.stop()
  }

  test("out-of-order arrival never drops a near-dup pair: the flag lands on the " +
       "larger id, one representative per cluster survives") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // the ordering contract documented on gateStream: id-ordered feeding
    // reproduces batch bit-for-bit. This pins the guarantee WITHOUT it:
    // the exact gate keeps the FIRST ARRIVAL (here the larger id 9) and
    // silently drops the late exact copy (1); when the near-copy (3)
    // then probes the bucket, the pair (3, 9) must be FLAGGED — keyed on
    // the larger doc, batch orientation — not dropped because the
    // occupant's id happens to be larger (the StreamDedup twin of the
    // StreamContainment out-of-order fix). Which cluster member
    // represents the near-dup group legitimately differs from the batch
    // twin under arrival permutation (stream keeps 3 and flags 9; batch
    // keeps min-id 1 and flags 3) — the invariant is ONE representative
    // per near-dup cluster plus every non-dup doc, never zero or two.
    val other = Array.fill(4)(
      "a small ship sails to the cold north sea and the crew watches waves of grey salt water"
    ).mkString(" ")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = IngestGate.gateStream(s, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("ingest_gate_ooo")
      .outputMode("append").start()
    try {
      mem.addData((9L, base), (5L, other))    // larger id arrives FIRST
      q.processAllAvailable()
      mem.addData((1L, base))                 // the batch twin's winner, late
      q.processAllAvailable()
      mem.addData((3L, base.replace("lazy", "sleepy")))
      q.processAllAvailable()
      val flags = s.sql("SELECT doc, dupOf FROM ingest_gate_ooo").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(flags.toSet === Set((9L, 3L)), s"got ${flags.toList}")
      // admitted at read time: arrival-order exact survivors minus
      // flagged docs = {3 (the cluster's surviving member), 5} — exactly
      // one representative of the base/sleepy cluster plus the non-dup
      val flagged = flags.map(_._1).toSet
      val arrivalSurvivors = Set(9L, 5L, 3L) // 1 dropped by the exact gate
      val admitted = arrivalSurvivors -- flagged
      assert(admitted === Set(3L, 5L))
      // batch twin on the same rows admits the same CLUSTER STRUCTURE
      // with the min-id representative: {1, 5}
      val all = Seq((9L, base), (5L, other), (1L, base),
        (3L, base.replace("lazy", "sleepy")))
      val batchAdmitted = IngestGate.admittedBatch(all.toDF("doc_id", "text"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batchAdmitted === Set(1L, 5L))
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
    val q = IngestGate.gateStream(s, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("ingest_gate_full")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // admitted-at-read-time from the STREAMED flags must equal the
      // batch twin (which uses flaggedBatch internally) end to end
      val flaggedDocs = s.sql("SELECT DISTINCT doc FROM ingest_gate_full")
        .collect().map(_.getLong(0)).toSet
      val quality = graft.llm.TextAnalysis.gopherRules(docs, "text")
        .filter(col("gopher_pass")).select("doc_id", "text")
      val exact = graft.llm.Dedup.exactSurvivors(quality, "doc_id", "text")
      val streamedAdmitted = exact.collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .filterNot { case (id, _) => flaggedDocs.contains(id) }
        .map { case (id, t) =>
          (id, "\\w+|[^\\w\\s]".r.findAllIn(t).length) }
        .sortBy(_._1)
      val batchAdmitted = IngestGate.admittedBatch(docs)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(streamedAdmitted.toSeq === batchAdmitted)
      assert(batchAdmitted.nonEmpty)
    } finally q.stop()
  }
}
