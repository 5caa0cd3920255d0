package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpecBase {

  test("step: baseline excludes current day, ring stays bounded") {
    import AnomalyStream._
    var ring = Ring(Nil)
    // first day: no baseline
    val (r1, mu1, z1, a1) = step(ring, 0, 10, lookback = 3, zThreshold = 2.0)
    assert(mu1.isEmpty && z1.isEmpty && !a1)
    ring = r1
    val (r2, mu2, z2, _) = step(ring, 1, 12, 3, 2.0)
    assert(mu2.contains(10.0) && z2.isEmpty) // one observation -> no sd
    ring = r2
    val (r3, _, z3, a3) = step(ring, 2, 30, 3, 2.0)
    // baseline {10, 12}: mu = 11, sd = sqrt(2) -> z = 19/1.4142 ≈ 13.435
    assert(z3.exists(z => math.abs(z - 13.435) < 1e-3) && a3)
    ring = r3
    // ring bounded at lookback
    val (r4, _, _, _) = step(ring, 3, 10, 3, 2.0)
    assert(r4.days.size == 3 && r4.days.head._1 == 1)
  }

  test("batch flag equals the declarative window form on testdata") {
    val s = spark
    val ev = graft.model.Tables.events(s, "/root/testdata/sf0.001")
    val stateful = AnomalyStream.flag(s, AnomalyStream.dailyCounts(ev))
      .toDF().orderBy("event_type", "day").collect().map(_.toString)
    val declarative = graft.analytics.EventAnalytics.dailyAnomalies(ev)
      .orderBy("event_type", "day").collect().map(_.toString)
    assert(stateful.length == declarative.length)
    stateful.zip(declarative).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("streaming ewma equals batch fold and the closed-form window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def d(i: Int) = java.sql.Date.valueOf(f"2020-01-${i + 1}%02d")
    val rows = (0 until 10).map(i => ("click", d(i), (5 + (i * 7) % 9).toLong))
    val mem = MemoryStream[(String, java.sql.Date, Long)]
    val q = AnomalyStream.ewma(s, mem.toDF().toDF("event_type", "day", "cnt"))
      .writeStream.format("memory").outputMode("append")
      .queryName("ewma_stream").start()
    try {
      rows.grouped(3).foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = s.table("ewma_stream").orderBy("day")
        .select("ewma").as[Double].collect()
      val batch = AnomalyStream.ewma(s, rows.toDF("event_type", "day", "cnt"))
        .toDF().orderBy("day").select("ewma").as[Double].collect()
      assert(streamed.toSeq == batch.toSeq)
      // against the declarative closed form (4dp tolerance: float paths differ)
      val events = rows.flatMap { case (t, day, n) =>
        (0 until n.toInt).map(_ => (t, java.sql.Timestamp.valueOf(day.toString + " 12:00:00")))
      }.toDF("event_type", "ts")
      val closed = graft.analytics.EventAnalytics.dailyEwma(events, alpha = 0.2)
        .orderBy("day").select("ewma").as[Double].collect()
      streamed.zip(closed).foreach { case (a, b) => assert(math.abs(a - b) < 5e-4) }
    } finally q.stop()
  }

  test("stream equals batch across day-ordered micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def d(i: Int) = java.sql.Date.valueOf(f"2020-01-${i + 1}%02d")
    val rows = (0 until 12).flatMap { i =>
      Seq(("click", d(i), (10 + (i * 3) % 7).toLong),
          ("view", d(i), (20 + (i * 5) % 11).toLong))
    } :+ (("click", d(12), 60L)) // spike
    val mem = MemoryStream[(String, java.sql.Date, Long)]
    val q = AnomalyStream.flag(s, mem.toDF().toDF("event_type", "day", "cnt"))
      .writeStream.format("memory").outputMode("append")
      .queryName("anomaly_stream").start()
    try {
      rows.grouped(6).foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = s.table("anomaly_stream")
        .orderBy("event_type", "day").collect().map(_.toString)
      val batch = AnomalyStream.flag(s, rows.toDF("event_type", "day", "cnt"))
        .toDF().orderBy("event_type", "day").collect().map(_.toString)
      assert(streamed.toSeq == batch.toSeq)
      // the planted spike is flagged
      val spike = s.table("anomaly_stream")
        .filter(col("event_type") === "click" && col("day") === d(12))
        .select("anomaly").as[Boolean].head()
      assert(spike)
    } finally q.stop()
  }
}
