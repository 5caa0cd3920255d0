package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** The per-person window engine (SURVEY.md §2.5: W1–W5, W7, plus A11).
  *
  * The reference streams rows sorted by (person, release) through imperative
  * loops (GetWeta.py:587-673 SetJumpRoles; dwwApi.js:80-142 assembly;
  * dwwApi.js:244-315 FormatRels). Spark-first: every one of those loops is a
  * `lag`/`lead` or run-length computation over
  * `Window.partitionBy(person).orderBy(time)` — hash-partition by person, sort
  * within partition only. No global sort, no collect, no driver loops, so the
  * same plan holds at 100 TB: each person's history is one partition-local
  * group and AQE handles skew.
  *
  * All entry points take explicit column names so the engine is reusable over
  * any fact table shape (the reference's credits, or the testdata's orders).
  */
object Jumps {

  /** Column bundle: partition key, total ordering within person, company key. */
  final case class Keys(person: String, order: Seq[String], company: String)

  private def w(k: Keys) =
    Window.partitionBy(col(k.person)).orderBy(k.order.map(col): _*)

  /** `changed` flag: true on the first row of each person and whenever the
    * company differs from the previous row (GetWeta.py:609-641 semantics). */
  def withChangeFlag(df: DataFrame, k: Keys): DataFrame = {
    val prev = lag(col(k.company), 1).over(w(k))
    df.withColumn("changed", prev.isNull || (col(k.company) =!= prev))
  }

  /** W2 — consecutive-company dedup (`jumpsOnly`, dwwApi.js:100-107):
    * keep a row only when the company differs from the previous row. */
  def jumpsOnly(df: DataFrame, k: Keys): DataFrame =
    withChangeFlag(df, k).filter(col("changed")).drop("changed")

  /** W1 — jump detection + consecutive-role tallies (GetWeta.py:587-673):
    * run-length segment id per person via a running sum of change flags,
    * then per-segment row counts (the reference's `tallyCount`). */
  def segments(df: DataFrame, k: Keys): DataFrame = {
    val flagged = withChangeFlag(df, k)
      .withColumn("seg_id", sum(when(col("changed"), 1L).otherwise(0L)).over(w(k)))
    flagged
      .groupBy(col(k.person), col("seg_id"), col(k.company))
      .agg(count(lit(1)).as("stay_count"))
  }

  /** W5 — directional jump filter (dwwApi.js:256-280). Applied AFTER
    * `jumpsOnly`. `in`: when row i is at target, emit row i-1 (the origin);
    * `out`: when row i-1 is at target, emit row i (the destination). The
    * first row of a person is only ever a comparison anchor (loop from i=1).
    * Matching is case-insensitive on `key`. */
  def directional(df: DataFrame, k: Keys, key: String, target: String, dir: String): DataFrame = {
    val win = w(k)
    dir match {
      case "in" =>
        val nextKey = lead(lower(col(key)), 1).over(win)
        df.withColumn("__next", nextKey).filter(col("__next") === lit(target.toLowerCase)).drop("__next")
      case "out" =>
        val prevKey = lag(lower(col(key)), 1).over(win)
        df.withColumn("__prev", prevKey).filter(col("__prev") === lit(target.toLowerCase)).drop("__prev")
      case other => throw new IllegalArgumentException(s"dir must be in|out, got $other")
    }
  }

  /** W4 — dummy in-transit synthesis (dwwApi.js:281-293): between each
    * consecutive pair of rels, insert a `dummy=true` record carrying the
    * PREVIOUS company, timestamped `next.time - tripDays(prev,next)` in ms.
    * Implemented as lead() + explode(array(real, dummy)) — one pass, no
    * self-join. `timeMs` must be epoch millis; lat/lon columns feed F5/F6.
    * Note the reference drops the first real rel unless unfiltered
    * (dwwApi.js:250-252 pushes rels[0] then starts at i=1 pushing dummy+real):
    * output = rels[0], then for each later rel (dummy_i, rel_i).
    */
  def withDummies(df: DataFrame, k: Keys, timeMs: String,
                  lat: String, lon: String): DataFrame =
    withDummies(df, k, timeMs, lat, lon, Nil, Nil).drop("seq")

  /** Payload-carrying form of W4: `carry` columns are copied onto both the
    * real and the dummy record (the dummy echoes the PREVIOUS rel's payload,
    * exactly dwwApi.js:283-291); `realOnly` columns are nulled on dummies
    * (the reference's dummy rels have no `location` key). `seq` is the
    * serving interleave position (real_i at 2i, its dummy at 2i+1) — the
    * exact array order of the reference's materialized jumps documents. */
  def withDummies(df: DataFrame, k: Keys, timeMs: String, lat: String, lon: String,
                  carry: Seq[String], realOnly: Seq[String]): DataFrame = {
    val win = w(k)
    // window expressions must be materialized BEFORE the generator — Spark
    // rejects window functions inside explode().
    val enriched = df
      .withColumn("__next_t", lead(col(timeMs), 1).over(win))
      .withColumn("__next_lat", lead(col(lat), 1).over(win))
      .withColumn("__next_lon", lead(col(lon), 1).over(win))
      .withColumn("__rn", row_number().over(win))
    val trip = Scalars.tripLengthDays(
      Scalars.haversineKm(col(lat), col(lon), col("__next_lat"), col("__next_lon")))
    val departMs = col("__next_t") - Scalars.daysToMs(trip)

    def rec(time: Column, dummy: Boolean, seq: Column, isReal: Boolean) =
      struct((Seq(seq.cast("long").as("seq"), col(k.company).as("company"),
                  time.as("time_ms"), lit(dummy).as("dummy")) ++
        carry.map(c => col(c).as(c)) ++
        realOnly.map(c =>
          (if (isReal) col(c) else lit(null).cast(df.schema(c).dataType)).as(c))): _*)
    val real = rec(col(timeMs), dummy = false, col("__rn") * 2 - 2, isReal = true)
    val dummyRec = rec(departMs, dummy = true, col("__rn") * 2 - 1, isReal = false)

    enriched
      .withColumn("rec", explode(
        when(col("__next_t").isNotNull, array(real, dummyRec)).otherwise(array(real))))
      .select(col(k.person) +:
        (Seq("seq", "company", "time_ms", "dummy") ++ carry ++ realOnly)
          .map(c => col(s"rec.$c")): _*)
  }

  /** W3 — per-person document assembly (dwwApi.js:80-142): rows folded into
    * `{id, name, rels:[...]}`. Spark: groupBy + sort_array(collect_list) —
    * the manual person-boundary loop disappears entirely. `relCols` become
    * the struct fields; the first ordering columns must make the sort total. */
  def assembleDocs(df: DataFrame, person: String, name: String, relCols: Seq[Column]): DataFrame =
    df.groupBy(col(person), col(name))
      .agg(sort_array(collect_list(struct(relCols: _*))).as("rels"))

  /** W7 — earliest-date first-match extraction (GetWeta.py:348-368 applied
    * per group): the FIRST row (by the window order) satisfying `pred`,
    * not the global min. */
  def firstMatch(df: DataFrame, k: Keys, pred: Column): DataFrame = {
    val win = w(k)
    df.filter(pred)
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A11 — grouped jumps (dwwApi.js:176-189): bucket rows by `key`, collect
    * the per-jump payloads and total per bucket. */
  def grouped(df: DataFrame, key: String, payload: Seq[Column]): DataFrame =
    df.groupBy(col(key))
      .agg(sort_array(collect_list(struct(payload: _*))).as("people"),
           count(lit(1)).as("total"))
}
