package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EtlSpec extends SparkSpecBase {

  test("Repair pads legacy dates, passes sentinels, and is idempotent (GetWeta.py:675-704)") {
    val s = spark; import s.implicits._
    val df = Seq("1996-3-5", "1996-03-05", "none", "2001-11-2", "garbage", null)
      .toDF("release")
    val once = Repair.fixUnpaddedDates(df, "release").collect().map(_.getString(0))
    assert(once === Array("1996-03-05", "1996-03-05", "none", "2001-11-02", "garbage", null))
    val twice = Repair.fixUnpaddedDates(Repair.fixUnpaddedDates(df, "release"), "release")
      .collect().map(_.getString(0))
    assert(twice === once)
    // the point of the repair: string order becomes chronological
    assert("1996-03-05" < "1996-11-02" && "1996-3-5" > "1996-11-2")
  }

  test("MapBuilder seeds first-wins entries from high-confidence matches (GetWeta.py:493-512)") {
    val s = spark; import s.implicits._
    val credits = Seq(
      // 'weta' search resolves two ways; the more frequent mapping wins
      ("weta", "Weta Digital", "c1", 95),
      ("weta", "Weta Digital", "c1", 95),
      ("weta", "Weta Workshop", "c9", 93),
      // below threshold → excluded entirely
      ("ilm?", "Industrial Light", "c2", 80)
    ).toDF("search", "name", "id", "ratio")
    val out = MapBuilder.seedCompanyMap(credits, "search", "name", "id", "ratio")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    assert(out === Array(("weta", "Weta Digital", 2L)))
  }

  test("MapBuilder excludes unmapped identity matches (fuzz(x,x)=100 must not seed)") {
    val s = spark; import s.implicits._
    val credits = Seq(
      ("weta", "Weta Digital", "c1", 95, true),
      // unmapped row: Normalize coalesced name = search, ratio 100
      ("unknown studio", "unknown studio", "", 100, false)
    ).toDF("search", "name", "id", "ratio", "isMapped")
    val out = MapBuilder.seedCompanyMap(credits, "search", "name", "id", "ratio")
      .collect().map(_.getString(0))
    assert(out === Array("weta"))
  }

  test("scd2 keeps NULL episodes and collapses consecutive NULLs") {
    val s = spark; import s.implicits._
    val events = Seq(
      ("k", Some("a"), 1L), ("k", None, 2L), ("k", None, 3L),
      ("k", Some("a"), 4L)
    ).toDF("key", "value", "ts")
    val out = Scd.scd2(events, "key", "value", Seq("ts"))
      .orderBy("valid_from")
      .collect().map(r => (Option(r.getString(1)), r.getLong(2)))
    // a@1, null@2 (the deletion episode — previously silently dropped),
    // a@4 (re-creation); consecutive nulls collapse into one episode
    assert(out === Array((Some("a"), 1L), (None, 2L), (Some("a"), 4L)))
  }

  test("termTally is case-insensitive and reports zero-match terms") {
    val s = spark; import s.implicits._
    val df = Seq("Red Fox", "red door", "blue sky").toDF("v")
    val out = graft.analytics.Catalog.termTally(df, "v", Seq("Red", "green"))
      .orderBy("term").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out === Array(("Red", 2L), ("green", 0L)))
  }
}
