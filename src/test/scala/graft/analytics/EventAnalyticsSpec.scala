package graft.analytics

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: stage events must come strictly after the previous stage") {
    // u1: full ordered funnel; u2: click BEFORE its view (stalls at view);
    // u3: view only; u4: purchase with no view at all (counts for nothing)
    val events = Seq(
      (1L, ts("2020-01-01 10:00:00"), "view"),
      (1L, ts("2020-01-01 11:00:00"), "click"),
      (1L, ts("2020-01-01 12:00:00"), "purchase"),
      (2L, ts("2020-01-01 09:00:00"), "click"),
      (2L, ts("2020-01-01 10:00:00"), "view"),
      (3L, ts("2020-01-01 10:00:00"), "view"),
      (4L, ts("2020-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.funnel(events).as[(Long, Long, Long, Long)].head()
    assert(r == ((4L, 3L, 1L, 1L))) // users, view, click-after-view, purchase-after-click
  }

  test("funnel: same-timestamp stage event does NOT count (strict after)") {
    val events = Seq(
      (1L, ts("2020-01-01 10:00:00"), "view"),
      (1L, ts("2020-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.funnel(events).as[(Long, Long, Long, Long)].head()
    assert(r == ((1L, 1L, 0L, 0L)))
  }

  test("retention: offsets are against the user's first-activity day") {
    val events = Seq(
      (1L, ts("2020-01-01 10:00:00")), (1L, ts("2020-01-03 10:00:00")),
      (2L, ts("2020-01-01 23:00:00")), (2L, ts("2020-01-03 01:00:00")),
      (3L, ts("2020-01-02 10:00:00"))
    ).toDF("user_id", "ts")
    val r = EventAnalytics.retention(events)
      .orderBy("cohort", "offset_days")
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (c, o, u) => (c.toString, o, u) }
    assert(r.toSeq == Seq(
      ("2020-01-01", 0, 2L), ("2020-01-01", 2, 2L), ("2020-01-02", 0, 1L)))
  }

  test("dailyEwma matches the recursive definition") {
    val events = (0 until 10).flatMap { day =>
      val n = 1 + (day * 7) % 5 // varying daily counts
      (0 until n).map(i => (day.toLong * 100 + i, ts(f"2020-01-${day + 1}%02d 12:00:00"), "click"))
    }.toDF("event_id", "ts", "event_type").drop("event_id")
    val got = EventAnalytics.dailyEwma(events, alpha = 0.2)
      .orderBy("day").select("cnt", "ewma").as[(Long, Double)].collect()
    // independent recursive replay: s_0 = x_0; s_t = 0.2 x_t + 0.8 s_{t-1}
    var s = got.head._1.toDouble
    got.zipWithIndex.foreach { case ((x, e), i) =>
      if (i > 0) s = 0.2 * x + 0.8 * s
      assert(math.abs(e - s) < 5e-4, s"day $i: $e vs $s")
    }
  }

  test("dailyAnomalies: baseline excludes the current day, flags the spike") {
    // 8 quiet days (10 events) then a 30-event spike
    val events = (0 until 9).flatMap { day =>
      val n = if (day == 8) 30 else 10
      (0 until n).map(i => (ts(f"2020-01-${day + 1}%02d 12:00:00"), "click"))
    }.toDF("ts", "event_type")
    val rows = EventAnalytics.dailyAnomalies(events)
      .orderBy("day").select("cnt", "mu", "z", "anomaly")
      .collect()
    // day 0: no preceding days -> null baseline, not anomalous
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2) && !rows(0).getBoolean(3))
    // days 1..7: flat history -> sd = 0 -> z null, not anomalous
    assert(!rows(5).getBoolean(3) && rows(5).isNullAt(2) && rows(5).getDouble(1) == 10.0)
    // day 8: spike over a flat baseline still has sd = 0 (all preceding
    // equal) -> z null; so instead make day 7 slightly off to give variance
    val events2 = events.toDF("ts", "event_type").union(
      Seq((ts("2020-01-08 13:00:00"), "click")).toDF("ts", "event_type"))
    val r2 = EventAnalytics.dailyAnomalies(events2)
      .orderBy("day").collect().last
    assert(r2.getLong(2) == 30 && !r2.isNullAt(4) && r2.getBoolean(5),
      s"spike day: $r2")
  }

  test("scd2 collapses runs into validity intervals") {
    val events = Seq(
      // key 1: A A B A  -> episodes A[d1,d3) B[d3,d4) A[d4,null)
      (1L, "A", ts("2020-01-01 00:00:00"), 1L), (1L, "A", ts("2020-01-02 00:00:00"), 2L),
      (1L, "B", ts("2020-01-03 00:00:00"), 3L), (1L, "A", ts("2020-01-04 00:00:00"), 4L),
      // key 2: single value -> one current episode
      (2L, "X", ts("2020-01-05 00:00:00"), 5L)
    ).toDF("k", "v", "t", "seq")
    val r = graft.etl.Scd.scd2(events, "k", "v", Seq("t", "seq"))
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from")
      .collect()
      .map(x => (x.getLong(0), x.getString(1),
        x.getTimestamp(2).toString.take(10),
        if (x.isNullAt(3)) "-" else x.getTimestamp(3).toString.take(10),
        x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (1L, "A", "2020-01-01", "2020-01-03", false),
      (1L, "B", "2020-01-03", "2020-01-04", false),
      (1L, "A", "2020-01-04", "-", true),
      (2L, "X", "2020-01-05", "-", true)))
  }

  test("zipfFit matches an independent OLS replay") {
    val doc = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .mkString(" ")
    val df = Seq(doc).toDF("text")
    val (n, slope, intercept) = graft.llm.Relevance.zipfFit(df, "text")
      .as[(Long, Double, Double)].head()
    assert(n == 4)
    // independent OLS on (ln rank, ln cnt)
    val pts = Seq((1.0, 8.0), (2.0, 4.0), (3.0, 2.0), (4.0, 1.0))
      .map { case (r, c) => (math.log(r), math.log(c)) }
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val m = (4 * sxy - sx * sy) / (4 * sxx - sx * sx)
    val b = (sy - m * sx) / 4
    assert(math.abs(slope - m) < 1e-3 && math.abs(intercept - b) < 1e-3)
    assert(slope < 0) // frequencies decay with rank
  }

  test("approx_top_k under eviction pressure still finds the dominant term") {
    // capacity 4 tracks far fewer than the 21 distinct terms; the sketch
    // must still surface the overwhelming heavy hitter with a bounded
    // estimate (frequent-items guarantee: est >= true - n/maxMapSize)
    val text = (Seq.fill(500)("hot") ++ (1 to 20).flatMap(i => Seq(s"t$i")))
      .mkString(" ")
    val r = Seq(text).toDF("text")
      .select(explode(split(col("text"), " ")).as("term"))
      .agg(expr("approx_top_k(term, 1, 4)").as("tk"))
      .select(explode(col("tk")).as("s")).select("s.*")
      .collect()(0)
    assert(r.getString(0) == "hot")
    val est = r.getLong(1)
    assert(est >= 500 - 520 / 4 && est <= 520, s"estimate $est")
  }

  test("propsStats: malformed JSON yields null k and drops from min/max/avg") {
    val events = Seq(
      ("click", """{"k": 10}"""), ("click", """{"k": 20}"""), ("click", "not-json")
    ).toDF("event_type", "props")
    val r = EventAnalytics.propsStats(events)
      .select("n", "sum_k", "min_k", "max_k", "avg_k", "distinct_k")
      .as[(Long, Long, Int, Int, Double, Long)].head()
    assert(r == ((3L, 30L, 10, 20, 15.0, 2L)))
  }

  test("slidingDistinctUsers: trailing window, same-day dedup, future clip") {
    // u1 active d1 and d3 (twice on d3 — counts once); u2 active d1 only.
    val events = Seq(
      (1L, ts("2020-01-01 10:00:00")), (1L, ts("2020-01-03 09:00:00")),
      (1L, ts("2020-01-03 22:00:00")), (2L, ts("2020-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val r = EventAnalytics.slidingDistinctUsers(events, window = 2)
      .orderBy("day").collect()
      .map(x => (x.getDate(0).toString, x.getLong(1)))
    // d1: {u1,u2}; d2 trailing-2 = {d1,d2} activity: {u1,u2}; d3: {u1};
    // d4 would be a partial future window → clipped at max activity day.
    assert(r === Array(("2020-01-01", 2L), ("2020-01-02", 2L), ("2020-01-03", 1L)))
  }

  test("attribution: first/last touch strictly before, organic stays null") {
    // u1: view → click → purchase (first=view, last=click); the same-ts
    // click tied to the purchase must NOT attribute (strictly before);
    // u2: purchase with no touches → organic (nulls); 'error' never counts
    val events = Seq(
      (1L, 1L, ts("2020-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2020-01-01 11:00:00"), "click"),
      (3L, 1L, ts("2020-01-01 12:00:00"), "error"),
      (4L, 1L, ts("2020-01-01 12:30:00"), "click"),
      (5L, 1L, ts("2020-01-01 12:30:00"), "purchase"),
      (6L, 2L, ts("2020-01-01 09:00:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = EventAnalytics.attribution(events).orderBy("event_id").collect()
    // event 5: events 4 and 5 share a timestamp; event_id tiebreak puts
    // the click before the purchase, so it IS the last touch
    assert(r(0).getLong(0) === 5L)
    assert(r(0).getString(3) === "click")
    assert(r(0).getTimestamp(4) === ts("2020-01-01 12:30:00"))
    assert(r(0).getString(5) === "view")
    assert(r(0).getTimestamp(6) === ts("2020-01-01 10:00:00"))
    assert(r(1).getLong(0) === 6L && r(1).isNullAt(3) && r(1).isNullAt(5))
  }

  test("engagementConcentration: uniform activity scores Gini 0") {
    // 4 users × 3 events each: perfectly equal → G = 0; top-10% = top-1
    // user (ceil(4/10) = 1) holds exactly 1/4 of the events
    val events = (1L to 4L).flatMap(u => (1 to 3).map(i =>
      (u, ts(f"2020-01-01 10:0$i:00")))).toDF("user_id", "ts")
    val r = EventAnalytics.engagementConcentration(events).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 12L)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === 0.25)
  }

  test("engagementConcentration: one dominant user matches the closed form") {
    // counts 1,1,1,7 ascending → ranks 1..4 (ties by user id)
    // G = 2*(1*1+2*1+3*1+4*7)/(4*10) - 5/4 = 68/40 - 1.25 = 0.45
    val events =
      ((1 to 7).map(i => (9L, ts(f"2020-01-01 10:0$i:00"))) ++
        Seq((1L, ts("2020-01-01 11:00:00")), (2L, ts("2020-01-01 11:00:00")),
          (3L, ts("2020-01-01 11:00:00")))).toDF("user_id", "ts")
    val r = EventAnalytics.engagementConcentration(events).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 10L)
    assert(r.getDouble(2) === 0.45)
    assert(r.getDouble(3) === 0.7) // the top user holds 7 of 10 events
  }
}
