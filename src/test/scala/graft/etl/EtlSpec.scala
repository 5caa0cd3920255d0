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
}
