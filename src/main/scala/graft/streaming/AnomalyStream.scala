package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming ingest monitoring — analytics/EventAnalytics.dailyAnomalies
  * as an incremental operator: finalized daily counts arrive per type (the
  * output of an upstream watermark-closed tumbling window), per-type state
  * holds the trailing `lookback` days, and each arriving day is z-scored
  * against the PRECEDING days only — exactly the batch frame
  * `ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING`.
  *
  * State is a bounded ring (≤ lookback (day, count) pairs per type) —
  * O(types · lookback), no growth with stream length. In-order arrival
  * per type is the contract (upstream watermark emission is in event-time
  * order); the fold sorts within a micro-batch like JumpStream.
  *
  * The SAME code runs in batch (mapGroupsWithState over a bounded
  * Dataset), which is what the registry oracle-checks; AnomalySpec proves
  * stream≡batch across micro-batches.
  */
object AnomalyStream {

  final case class DailyCount(event_type: String, day: java.sql.Date, cnt: Long)
  final case class Flagged(event_type: String, day: java.sql.Date, cnt: Long,
                           mu: Option[Double], z: Option[Double], anomaly: Boolean)
  final case class Ring(days: List[(Long, Long)]) // (epochDay, cnt), oldest first

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private[streaming] def step(ring: Ring, epochDay: Long, cnt: Long,
                              lookback: Int, zThreshold: Double): (Ring, Option[Double], Option[Double], Boolean) = {
    val xs = ring.days.map(_._2.toDouble)
    val mu = if (xs.isEmpty) None else Some(xs.sum / xs.size)
    val sd = if (xs.size < 2) None else {
      val m = xs.sum / xs.size
      Some(math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)))
    }
    val z = (mu, sd) match {
      case (Some(m), Some(s)) if s > 0 => Some((cnt - m) / s)
      case _ => None
    }
    val anomaly = z.exists(v => math.abs(v) > zThreshold)
    val next = Ring((ring.days :+ (epochDay, cnt)).takeRight(lookback))
    (next, mu.map(round4), z.map(round4), anomaly)
  }

  /** Stateful flagger; works identically on a streaming or batch Dataset
    * of finalized daily counts. */
  def flag(spark: SparkSession, daily: DataFrame,
           lookback: Int = 7, zThreshold: Double = 2.0): Dataset[Flagged] = {
    import spark.implicits._
    daily.select(col("event_type"), col("day").cast("date"), col("cnt").cast("long"))
      .as[DailyCount]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Ring, Flagged](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        case (etype, rows, state: GroupState[Ring]) =>
          var ring = state.getOption.getOrElse(Ring(Nil))
          val out = rows.toSeq.sortBy(_.day.toLocalDate.toEpochDay).map { r =>
            val (next, mu, z, an) =
              step(ring, r.day.toLocalDate.toEpochDay, r.cnt, lookback, zThreshold)
            ring = next
            Flagged(etype, r.day, r.cnt, mu, z, an)
          }
          state.update(ring)
          out.iterator
      }
  }

  /** Daily rollup feeding the flagger (batch twin of the upstream
    * tumbling-window aggregation). */
  def dailyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))

  final case class Smoothed(event_type: String, day: java.sql.Date, cnt: Long, ewma: Double)
  final case class EwmaState(s: Double, initialized: Boolean)

  /** Streaming EWMA: the textbook recursion s ← α·x + (1−α)·s as per-type
    * state (ONE double per type — the minimal streaming-state operator).
    * Batch-executes identically, and the batch run is oracle-checked
    * against EventAnalytics.dailyEwma's closed-form WINDOW SQL — proving
    * recursion ≡ scaled-cumsum closed form across engines (4dp). */
  def ewma(spark: SparkSession, daily: DataFrame, alpha: Double = 0.2): Dataset[Smoothed] = {
    import spark.implicits._
    daily.select(col("event_type"), col("day").cast("date"), col("cnt").cast("long"))
      .as[DailyCount]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, Smoothed](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        case (etype, rows, state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0.0, initialized = false))
          val out = rows.toSeq.sortBy(_.day.toLocalDate.toEpochDay).map { r =>
            st =
              if (!st.initialized) EwmaState(r.cnt.toDouble, initialized = true)
              else EwmaState(alpha * r.cnt + (1 - alpha) * st.s, initialized = true)
            Smoothed(etype, r.day, r.cnt, round4(st.s))
          }
          state.update(st)
          out.iterator
      }
  }
}
