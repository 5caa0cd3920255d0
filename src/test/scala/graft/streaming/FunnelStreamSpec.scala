package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class FunnelStreamSpec extends SparkSpecBase {
  import FunnelStream._

  test("advance: stage times set once, strictly-after semantics") {
    val e0 = FunnelState(None, None, None)
    val afterView = advance(e0, FunnelEvent(1, 100, "view"))
    assert(afterView == FunnelState(Some(100), None, None))
    // click at the same instant as the view does NOT qualify
    assert(advance(afterView, FunnelEvent(1, 100, "click")) == afterView)
    // click before any view does nothing
    assert(advance(e0, FunnelEvent(1, 50, "click")) == e0)
    val afterClick = advance(afterView, FunnelEvent(1, 150, "click"))
    assert(afterClick.tc.contains(150) && afterClick.stage == 2)
    // a second, later view/click never overwrites the first
    assert(advance(afterClick, FunnelEvent(1, 200, "view")) == afterClick)
    assert(advance(afterClick, FunnelEvent(1, 200, "click")) == afterClick)
    val afterBuy = advance(afterClick, FunnelEvent(1, 160, "purchase"))
    assert(afterBuy.stage == 3)
  }

  test("stream equals batch across in-order micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      // u1 full funnel split across batches; u2 click-before-view stalls
      // at stage 1; u3 view only; u4 purchase-with-no-view stays stage 0
      (1L, 100L, "view"), (2L, 90L, "click"), (3L, 100L, "view"), (4L, 100L, "purchase"),
      (1L, 200L, "click"), (2L, 200L, "view"),
      (1L, 300L, "purchase"), (2L, 250L, "error"))
    val batches = rows.grouped(4).toSeq

    val mem = MemoryStream[(Long, Long, String)]
    val stages = FunnelStream.stages(s,
      mem.toDF().toDF("user_id", "ts", "event_type"))
    val q = stages.writeStream.format("memory").outputMode("update")
      .queryName("funnel_stream").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = s.table("funnel_stream")
        .groupBy("user_id").agg(max("stage").as("stage")) // latest = max (monotone)
        .as[(Long, Int)].collect().toMap
      val batch = FunnelStream.stagesBatch(
          rows.toDF("user_id", "ts", "event_type"))
        .as[(Long, Int)].collect().toMap
      assert(streamed == batch)
      assert(batch == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0))
    } finally q.stop()
  }

  test("stagesBatch agrees with EventAnalytics.funnel aggregates on testdata") {
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
    val stages = FunnelStream.stagesBatch(ev)
    val fromStages = stages.agg(
      count(lit(1)).as("users"),
      sum(when(col("stage") >= 1, 1).otherwise(0)).as("v"),
      sum(when(col("stage") >= 2, 1).otherwise(0)).as("c"),
      sum(when(col("stage") >= 3, 1).otherwise(0)).as("p"))
      .collect()(0)
    val funnel = graft.analytics.EventAnalytics.funnel(ev).collect()(0)
    assert(fromStages.getLong(0) == funnel.getLong(0))
    assert(fromStages.getLong(1) == funnel.getLong(1))
    assert(fromStages.getLong(2) == funnel.getLong(2))
    assert(fromStages.getLong(3) == funnel.getLong(3))
  }
}
