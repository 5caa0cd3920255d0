package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream: semi-structured
  * extraction, funnel conversion, cohort retention, and EWMA smoothing.
  *
  * The reference's time-slider analytics (SURVEY §2.9 — timeControl.js
  * day-grain filters, densityCalc.js occupancy series) are point/range
  * queries over event time; these are the standard next analytics a team
  * asks of the same event data. All four are single-scan, declarative,
  * and partition by user/type — the only shuffles are the per-user hash
  * partition (funnel, retention) and the small per-type daily rollup
  * (EWMA), so each would run unchanged at 100 TB.
  */
object EventAnalytics {

  /** Semi-structured extraction: the `props` column carries JSON (like the
    * reference's ad-hoc JSON properties on Neo4j nodes, SURVEY §1.2);
    * `get_json_object` evaluates inside codegen — no UDF, and the parse
    * happens once per row in the same stage as the aggregate. */
  def propsStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        round(avg("k"), 4).as("avg_k"),
        countDistinct(col("k")).as("distinct_k"))

  /** Ordered funnel conversion (view → click → purchase): a user counts
    * for a stage only if the stage event happens strictly AFTER the
    * previous stage's first event. Three stacked window-min passes over
    * the SAME user partition — Catalyst plans one Exchange and reuses the
    * sort, so the whole funnel is a single shuffle at any scale. */
  def funnel(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = events
      .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("tc", min(when(col("event_type") === "click" && col("ts") > col("tv"),
        col("ts"))).over(w))
      .withColumn("tp", min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
        col("ts"))).over(w))
    staged.groupBy("user_id")
      .agg(max("tv").as("tv"), max("tc").as("tc"), max("tp").as("tp"))
      .agg(
        count(lit(1)).as("users"),
        count(col("tv")).as("users_view"),
        count(col("tc")).as("users_click"),
        count(col("tp")).as("users_purchase"))
  }

  /** Cohort retention: users grouped by their first-activity day, counted
    * per day-offset. The cohort day comes from a window min over the same
    * user partition the distinct-count aggregate needs — one shuffle, no
    * self-join. */
  def retention(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .withColumn("cohort", min("d").over(w))
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("users"))
  }

  /** Daily-volume anomaly detection: each (type, day) count is z-scored
    * against the trailing `lookback` OBSERVED days (mean / sample stddev
    * of the PRECEDING rows only — the current day never contaminates its
    * own baseline; for a type with gaps the frame spans more than
    * `lookback` calendar days). Days with ZERO events produce no row and
    * therefore cannot be flagged — a total-outage monitor must gap-fill
    * first (the Density.build sequence+explode pattern) so empty days
    * exist to score. One frame-bounded window per type. Days with fewer
    * than two preceding observations (or zero variance) yield a NULL
    * z-score. */
  def dailyAnomalies(events: DataFrame, lookback: Int = 7,
                     zThreshold: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-lookback, -1)
    daily
      .withColumn("mu", avg("x").over(w))
      .withColumn("sd", stddev_samp(col("x")).over(w))
      .select(col("event_type"), col("day"), col("x").cast("long").as("cnt"),
        round(col("mu"), 4).as("mu"),
        when(col("sd") > 0, round((col("x") - col("mu")) / col("sd"), 4)).as("z"),
        when(col("sd") > 0 && abs((col("x") - col("mu")) / col("sd")) > zThreshold, true)
          .otherwise(false).as("anomaly"))
  }

  /** Exact trailing-window distinct users per day (sliding DAU/WAU): each
    * (user, day) activity row fans out to the `window` days it
    * contributes to, then one distinct-count per window day — the
    * standard rewrite that turns "distinct over a sliding window" (not
    * decomposable as a frame aggregate) into a plain hash aggregate with
    * a bounded `window`× fan-out. Days past the last activity day are
    * clipped (they would be partial future windows). */
  def slidingDistinctUsers(events: DataFrame, window: Int = 7): DataFrame = {
    // window = 0 would NOT fail: sequence(d, d-1) auto-steps backwards,
    // silently fanning each day out to itself AND the previous day
    require(window >= 1, s"window must be >= 1, got $window")
    val activity = events.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val maxDay = activity.agg(max("d").as("max_d"))
    activity
      .withColumn("day", explode(sequence(col("d"), date_add(col("d"), window - 1))))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("max_d"))
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("users"))
  }

  /** First/last-touch conversion attribution: for every purchase, the
    * earliest and the most recent preceding touch event (view/click) of
    * the same user. One window pass — `first`/`last` with ignoreNulls
    * over a strictly-before frame — so attribution costs a single
    * shuffle on the user key, never a self-join of events to events
    * (the naive purchase⋈touches join is quadratic in events-per-user
    * and rebuilds the timeline the window already has). Purchases with
    * no prior touch keep null attribution (organic conversions). */
  def attribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("view", "click")
    val touchType = when(isTouch, col("event_type"))
    val touchTs = when(isTouch, col("ts"))
    events
      .withColumn("last_touch_type", last(touchType, ignoreNulls = true).over(w))
      .withColumn("last_touch_ts", last(touchTs, ignoreNulls = true).over(w))
      .withColumn("first_touch_type", first(touchType, ignoreNulls = true).over(w))
      .withColumn("first_touch_ts", first(touchTs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "last_touch_type", "last_touch_ts",
        "first_touch_type", "first_touch_ts")
  }

  /** Exponentially-weighted moving average of daily event counts per type
    * (s_t = α·x_t + (1−α)·s_{t−1}, s_0 = x_0), computed declaratively via
    * the scaled-cumsum closed form:
    *   s_t = (1−α)^t · (α·(C_t − u_0) + u_0),  C_t = Σ_{i≤t} x_i·(1−α)^{−i}
    * — one cumulative window per type, no recursion and no driver loop.
    * The (1−α)^{−i} factor grows exponentially in the day index, which is
    * fine for bounded horizons (10^Θ(days)·ulp ≪ the 4dp round below for
    * the ~150-day testdata); an unbounded-horizon deployment would reset
    * the index per calendar block and carry the block boundary value, the
    * same two-level trick as cur3's token packing. */
  def dailyEwma(events: DataFrame, alpha: Double = 0.2): DataFrame = {
    val decay = 1 - alpha
    val inv = 1 / decay
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("t", row_number().over(wOrd) - 1)
      .withColumn("u", col("x") * pow(lit(inv), col("t")))
      .withColumn("cu", sum("u").over(wCum))
      .withColumn("u0", first("u").over(wCum))
      .select(col("event_type"), col("day"), col("x").cast("long").as("cnt"),
        round(pow(lit(decay), col("t")) *
          (lit(alpha) * (col("cu") - col("u0")) + col("u0")), 4).as("ewma"))
  }

  /** Engagement concentration: how unevenly activity is distributed over
    * users — the Gini coefficient of per-user event counts plus the share
    * of events generated by the top-10% most active users (the power-user
    * curve's two headline numbers). Gini via the rank-weighted closed form
    *   G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n
    * over counts ranked ascending (ties broken by user id, so the rank —
    * and thus the output — is deterministic on both engines).
    *
    * Scale shape: one per-user count aggregate, then the two-level global
    * row number (operators/Ranking — never a single-reducer window), one
    * 1-row stats aggregate broadcast back, one final fold. Nothing here
    * holds more than (user, count) rows, so the pipeline is user-table
    * sized regardless of event volume. */
  def engagementConcentration(events: DataFrame): DataFrame = {
    val cnts = events.groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val ranked = graft.operators.Ranking
      .globalRowNumber(cnts, "i", col("cnt"), col("user_id"))
    // i·x and n·Σx are folded in DOUBLE, not LONG: at claimed event
    // volumes (n ~ 1e9 users, tot ~ 1e12 events) both products exceed
    // Long.MAX — a LONG fold silently wraps (non-ANSI) or throws (ANSI).
    // Double loses low-order bits past 2^53, which is exactly what a
    // 6-decimal Gini can afford; the oracle mirrors with ::DOUBLE.
    val stats = ranked.agg(count(lit(1)).as("n"), sum("cnt").as("tot"),
      sum(col("i").cast("double") * col("cnt")).as("iw"))
    ranked.crossJoin(broadcast(stats))
      .agg(
        first("n").as("n_users"),
        first("tot").as("total_events"),
        round(lit(2.0) * first("iw") / (first("n").cast("double") * first("tot"))
          - (first("n") + lit(1.0)) / first("n"), 6).as("gini"),
        round(sum(when(col("i") > col("n") - ceil(col("n") / lit(10.0)), col("cnt"))
            .otherwise(lit(0L))).cast("double") / first("tot"), 6).as("top10_share"))
  }
}
