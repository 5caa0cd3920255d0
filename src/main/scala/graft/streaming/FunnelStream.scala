package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel tracking — analytics/EventAnalytics.funnel as an
  * incremental operator: events arrive as a stream, per-user state holds
  * the first times each stage was legitimately reached (view →
  * click-after-view → purchase-after-click), and the user's current stage
  * is re-emitted whenever it advances.
  *
  * In-order arrival per user (events inside a micro-batch are sorted by
  * event time before folding — the streaming analog of the batch window
  * ORDER BY, same contract as JumpStream) makes the single-pass fold
  * exact: a stage time is only ever set once, to the first qualifying
  * event. An out-of-order deployment would buffer per-user events up to
  * the watermark before folding — the JumpStream/StreamDedup pattern.
  *
  * State is three optional timestamps per user — O(users) total, no
  * per-event growth, the shape mapGroupsWithState state stores are
  * built for.
  */
object FunnelStream {

  final case class FunnelEvent(user_id: Long, ts: Long, event_type: String)
  final case class FunnelState(tv: Option[Long], tc: Option[Long], tp: Option[Long]) {
    def stage: Int = if (tp.isDefined) 3 else if (tc.isDefined) 2 else if (tv.isDefined) 1 else 0
  }
  final case class UserStage(user_id: Long, stage: Int)

  /** Fold one in-order event run into the state. */
  private[streaming] def advance(st: FunnelState, e: FunnelEvent): FunnelState =
    e.event_type match {
      case "view" if st.tv.isEmpty => st.copy(tv = Some(e.ts))
      case "click" if st.tc.isEmpty && st.tv.exists(e.ts > _) => st.copy(tc = Some(e.ts))
      case "purchase" if st.tp.isEmpty && st.tc.exists(e.ts > _) => st.copy(tp = Some(e.ts))
      case _ => st
    }

  /** Streaming (or batch-equivalent) per-user funnel stage. Works on any
    * DataFrame with (user_id, ts, event_type); in streaming the source is
    * unbounded and output mode is Update. */
  def stages(spark: SparkSession, events: DataFrame): Dataset[UserStage] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts").cast("long"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, UserStage](GroupStateTimeout.NoTimeout) {
        case (uid, events, state: GroupState[FunnelState]) =>
          val st0 = state.getOption.getOrElse(FunnelState(None, None, None))
          val st = events.toSeq.sortBy(e => (e.ts, e.event_type))
            .foldLeft(st0)(advance)
          state.update(st)
          UserStage(uid, st.stage)
      }
  }

  /** Batch twin via the declarative window chain (EventAnalytics.funnel's
    * per-user intermediate): the correctness anchor the streaming spec
    * compares against, and the form the registry oracle-checks. */
  def stagesBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    events
      .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("tc", min(when(col("event_type") === "click" && col("ts") > col("tv"),
        col("ts"))).over(w))
      .withColumn("tp", min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
        col("ts"))).over(w))
      .groupBy("user_id")
      .agg(max("tv").as("tv"), max("tc").as("tc"), max("tp").as("tp"))
      .select(col("user_id"),
        when(col("tp").isNotNull, 3).when(col("tc").isNotNull, 2)
          .when(col("tv").isNotNull, 1).otherwise(0).as("stage"))
  }
}
