package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class StreamContainmentSpec extends SparkSpecBase {

  test("sigOf is bit-equal to the estimate tier's Column signature on real docs") {
    val s = spark
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val colSide = graft.llm.Dedup.estimateSigTable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Long](2)))).toMap
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    rows.foreach { case (id, txt) =>
      val (nG, sig) = StreamContainment.sigOf(txt)
      val (cn, csig) = colSide(id)
      assert(nG === cn, s"doc $id gram count")
      assert(sig.toSeq === csig, s"doc $id signature")
    }
  }

  test("streaming gate flags a wrapped copy against earlier state, across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val page = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamContainment.flagStream(s, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("contain_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, page), (2L, "entirely different words about sailing ships at dawn"))
      q.processAllAvailable()
      // batch 2: page wrapped in boilerplate — containment of doc 1 in
      // doc 3 is high even though Jaccard is diluted; must flag against
      // STATE (doc 1 arrived in an earlier micro-batch)
      mem.addData((3L, "site header navigation menu " + page + " footer copyright terms"),
                  (4L, "unrelated prose on alpine meadows and quiet lakes"))
      q.processAllAvailable()
      val flags = s.sql("SELECT doc, partner FROM contain_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(flags.toSet === Set((3L, 1L)), s"got ${flags.toSet}")
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
    val q = StreamContainment.flagStream(s, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("contain_stream_full")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // stream emits per-bucket flags; comparable form = min partner per
      // doc (with that pair's c_est)
      val streamed = s.sql(
          """SELECT doc, min(struct(partner, cEst)) AS m FROM contain_stream_full
            |GROUP BY doc""".stripMargin)
        .select(col("doc"), col("m.partner"), col("m.cEst"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      val batch = StreamContainment.flaggedBatch(docs)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed === batch)
      assert(batch.nonEmpty, "corpus should contain flaggable near-containments")
    } finally q.stop()
  }

  test("sigOf matches the Column signature on edge-case texts") {
    val s = spark
    import s.implicits._
    // whitespace shapes and multi-byte chars: split/gram/md5 behavior at
    // the boundaries the real-docs pin never exercises
    val edge = Seq(
      (1L, ""),                         // empty → tk = [""]
      (2L, "   "),                      // leading/trailing whitespace runs
      (3L, "one"),                      // fewer tokens than the gram width
      (4L, "one two"),
      (5L, "Tabs\tand\nnewlines mix"),  // \s+ covers tabs + newlines
      (6L, "CASE Case case"),           // lowercase fold collapses grams
      (7L, "áccents über naïve façade again"), // multi-byte UTF-8 in md5
      (8L, "repeat repeat repeat repeat repeat") // heavy gram dedup
    ).toDF("doc_id", "text")
    val colSide = graft.llm.Dedup.estimateSigTable(edge, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Long](2)))).toMap
    edge.collect().map(r => (r.getLong(0), r.getString(1))).foreach { case (id, txt) =>
      val (nG, sig) = StreamContainment.sigOf(txt)
      assert((nG, sig.toSeq) === colSide(id), s"doc $id ('$txt')")
    }
  }

  test("gate->verify handoff: flagged pairs carry real containment, verify prunes the rest") {
    // the st11 contract: the stream emits the candidates the batch tier
    // would send to exact verification. Demonstrate the handoff — exact
    // word-gram containment over the flagged pairs confirms the planted
    // wrapped copy and rejects a sketch-level near-miss.
    val s = spark
    import s.implicits._
    val page = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val docs = Seq(
      (1L, page),
      (2L, "site header navigation menu " + page + " footer copyright terms"),
      // shares SOME vocabulary with the page but no long overlap: a
      // bucket collision candidate at best, never exact containment
      (3L, "alpha beta different words gamma delta unrelated tail " +
           "epsilon zeta something else entirely iota kappa end")
    ).toDF("doc_id", "text")
    val flags = StreamContainment.flaggedBatch(docs)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet // (partner, doc)
    assert(flags.contains((1L, 2L)), s"wrapped copy not flagged: $flags")
    // exact verify (dd19's definition: distinct word 3-grams) over every
    // flagged pair — the downstream merge-time step
    def grams(t: String): Set[String] = {
      val tk = t.toLowerCase.split("\\s+", -1)
      (0 until math.max(tk.length - 2, 1))
        .map(i => tk.slice(i, math.min(i + 3, tk.length)).mkString(" ")).toSet
    }
    val byId = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val verified = flags.filter { case (a, b) =>
      val (ga, gb) = (grams(byId(a)), grams(byId(b)))
      val shared = (ga intersect gb).size.toDouble
      math.max(shared / ga.size, shared / gb.size) >= 0.5
    }
    assert(verified.contains((1L, 2L)), "verify must confirm the wrapped copy")
    // doc 3 must not survive verification against either page doc even
    // if the sketch flagged it — that pruning is WHY verify runs
    assert(!verified.exists(p => p._1 == 3L || p._2 == 3L),
      s"near-miss survived exact verify: $verified")
  }

  test("out-of-order arrival: pair flagged keyed on the larger doc") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val page = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamContainment.flagStream(s, mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("contain_ooo")
      .outputMode("append").start()
    try {
      // the WRAPPED copy (larger id) arrives FIRST; the original page
      // (smaller id) arrives in a later micro-batch. Pre-fix the pair was
      // silently dropped (the occupant had the larger id and never
      // re-probes); now the arriving doc tests both directions and the
      // flag is keyed on the larger doc, matching batch orientation.
      mem.addData((3L, "site header navigation menu " + page + " footer copyright terms"))
      q.processAllAvailable()
      mem.addData((1L, page))
      q.processAllAvailable()
      val flags = s.sql("SELECT DISTINCT doc, partner FROM contain_ooo").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(flags === Set((3L, 1L)), s"got $flags")
      // and it agrees with the batch twin's min-partner result
      val batch = StreamContainment.flaggedBatch(
          Seq((1L, page), (3L, "site header navigation menu " + page +
            " footer copyright terms")).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === flags)
    } finally q.stop()
  }

  test("stateTtlMs evicts buckets untouched past the TTL") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val page = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // NOTE: with ProcessingTimeTimeout the engine keeps constructing
    // no-data batches to fire timeouts, so processAllAvailable never sees
    // quiescence — progress is observed through SENTINEL pairs (two
    // identical docs always flag each other) polled in the sink instead.
    val q = StreamContainment.flagStream(s, mem.toDF().toDF("doc_id", "text"),
        stateTtlMs = Some(500L))
      .writeStream.format("memory").queryName("contain_ttl")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .outputMode("append").start()
    def awaitFlag(doc: Long, partner: Long): Unit = {
      val t0 = System.currentTimeMillis()
      while (!s.sql("SELECT doc, partner FROM contain_ttl").collect()
               .exists(r => r.getLong(0) == doc && r.getLong(1) == partner)) {
        assert(System.currentTimeMillis() - t0 < 60000L,
          s"timed out waiting for sentinel flag ($doc, $partner)")
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
      // the wrapped copy of the now-EVICTED page must no longer flag
      mem.addData((3L, "site header navigation menu " + page + " footer copyright terms"),
        (14L, "third sentinel counts lanterns along the harbor wall"),
        (15L, "third sentinel counts lanterns along the harbor wall"))
      awaitFlag(15L, 14L) // doc 3's batch committed
      val flags = s.sql("SELECT DISTINCT doc, partner FROM contain_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!flags.contains((3L, 1L)), s"evicted page still flagged: $flags")
      assert(flags === Set((11L, 10L), (13L, 12L), (15L, 14L)), s"got $flags")
    } finally q.stop()
  }

  test("bucket occupancy cap: later arrivals probe but are not added") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // five identical docs, cap 2: docs 2..5 all flag against occupant 1
    // (the min earlier occupant), and docs 4/5 still flag even though
    // only 1 and 2 ever occupy any bucket
    val txt = "one two three four five six seven eight nine ten"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamContainment.flagStream(s, mem.toDF().toDF("doc_id", "text"),
        maxBucket = 2)
      .writeStream.format("memory").queryName("contain_cap")
      .outputMode("append").start()
    try {
      mem.addData((1L, txt), (2L, txt))
      q.processAllAvailable()
      mem.addData((4L, txt))
      q.processAllAvailable()
      mem.addData((5L, txt))
      q.processAllAvailable()
      val flags = s.sql("SELECT DISTINCT doc, partner FROM contain_cap").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(flags === Set((2L, 1L), (4L, 1L), (5L, 1L)), s"got $flags")
      // batch twin with the same cap agrees
      val docs = Seq((1L, txt), (2L, txt), (4L, txt), (5L, txt)).toDF("doc_id", "text")
      val batch = StreamContainment.flaggedBatch(docs, maxBucket = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === flags)
    } finally q.stop()
  }
}
