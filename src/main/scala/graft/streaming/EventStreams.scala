package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tier (SURVEY.md §2.9): the reference's time-slider is a
  * day-granularity event-time filter over a precomputed cube
  * (timeControl.js:135-141 — a "stamp" is a 1-day span). In Spark that is a
  * Structured Streaming job: 1-day tumbling windows with a watermark, plus a
  * stateful per-user session operator for the gap-filled occupancy semantics
  * (densityCalc.js:45-58's "present until next credit" is session state).
  *
  * `dailyCounts` is written so the SAME code runs batch (finite DataFrame)
  * and streaming (readStream) — the Dataset API is identical.
  */
object EventStreams {

  /** 1-day tumbling-window counts by event type. Works on a batch OR
    * streaming DataFrame with columns (ts timestamp, event_type string,
    * value double). */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("day"), col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming entry: parquet file source → watermarked daily counts.
    * `path` must point at the events data only (a directory of event
    * parquet files, or the single file) — NOT a directory shared with
    * other tables, since the file source globs everything under it. */
  def streamDailyCounts(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("day"), col("event_type"), col("cnt"))
  }

  /** Sliding-window counts (size/slide): each event contributes to
    * size/slide overlapping windows. Same code batch or streaming; in
    * streaming, pair with a watermark ≥ size so state stays bounded. */
  def slidingCounts(events: DataFrame, size: String = "2 days",
                    slide: String = "1 day"): DataFrame =
    events
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"))

  /** Session windows: per-user activity bursts separated by ≥ `gap` of
    * silence (session_window — start = first event, end = last event +
    * gap). The streaming face of the reference's "present until next
    * credit" occupancy semantics (densityCalc.js:45-58); batch and
    * streaming share this code, state is evicted by watermark+gap. */
  def sessionCounts(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("cnt"), col("sum_value"))

  /** Streaming exact dedup: drop repeated event ids within the watermark
    * horizon — the streaming face of the batch exact-dedup operator (state
    * is bounded by the watermark, so it runs forever). The dedup key is
    * the id columns ALONE: an at-least-once producer re-emits the same id
    * with a re-stamped ingest timestamp, which is exactly the duplicate
    * this operator exists to drop (`dropDuplicatesWithinWatermark` exists
    * precisely to allow id-only subsets with bounded state). */
  def dedupedStream(events: DataFrame, idCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-static dimension enrichment: the fact stream broadcast-joined
    * to a (small) dim table — the streaming face of the J-family dim
    * joins. Structured Streaming re-plans the static side per micro-batch,
    * so dim refreshes land without restarting the query; the broadcast
    * keeps the stream side shuffle-free (stateless, append-safe). Works
    * identically on a batch frame (the registry twin st5). */
  def enriched(events: DataFrame, dim: DataFrame, eventKey: String,
               dimKey: String, payload: Seq[String]): DataFrame = {
    val d = dim.select((dimKey +: payload).map(col): _*)
    events.join(broadcast(d), events(eventKey) === d(dimKey), "left").drop(d(dimKey))
  }

  /** Stream-stream interval join: each click matched to the same user's
    * views in the preceding `horizon` — the Structured Streaming join shape
    * where BOTH sides buffer state. The watermark plus the time-range
    * predicate bound that state (rows age out once the other side's
    * watermark passes them), so the join runs forever; out-of-order
    * arrival is correct up to the watermark delay. `withWatermark` is a
    * no-op on batch frames, so the identical code path is the registry
    * twin (st6) and the batch side of the spec's stream≡batch proof. */
  def clickViewJoin(clicks: DataFrame, views: DataFrame,
                    horizon: String = "1 day"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id"), col("value"))
      .withWatermark("click_ts", "1 day")
    val v = views
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("value").as("view_value"))
      .withWatermark("view_ts", "1 day")
    c.join(v,
        col("user_id") === col("v_user_id") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $horizon") &&
        col("view_ts") <= col("click_ts"))
      .drop("v_user_id")
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double)

  /** Custom state example: per-user running session summary via
    * mapGroupsWithState — the streaming analog of the reference's per-person
    * in-memory fold (dwwApi.js:80-142). Used with update-mode sinks. */
  def sessionSummaries(spark: SparkSession, events: DataFrame) = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_type"), col("value")).as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionSummary, SessionSummary](GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[SessionSummary]) =>
          val prev = state.getOption.getOrElse(SessionSummary(uid, 0L, 0.0))
          val evs = it.toSeq
          val next = SessionSummary(uid, prev.n_events + evs.size, prev.total_value + evs.map(_.value).sum)
          state.update(next)
          next
      }
  }
}
