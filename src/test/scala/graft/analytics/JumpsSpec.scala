package graft.analytics

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class JumpsSpec extends SparkSpecBase {

  private lazy val K = Jumps.Keys("person", Seq("ts", "seq"), "company")

  /** Micro-fixture shaped like the reference's sorted credit stream:
    * p1: A A B A  (stay, jump, jump-back)
    * p2: C        (single credit)
    * p3: B B B    (never jumps)
    */
  private lazy val fixture = {
    val s = spark; import s.implicits._
    Seq(
      ("p1", 1L, 1, "A"), ("p1", 2L, 2, "A"), ("p1", 3L, 3, "B"), ("p1", 4L, 4, "A"),
      ("p2", 1L, 1, "C"),
      ("p3", 1L, 1, "B"), ("p3", 2L, 2, "B"), ("p3", 3L, 3, "B")
    ).toDF("person", "ts", "seq", "company")
  }

  test("jumpsOnly keeps first row and company changes only (dwwApi.js:100-107)") {
    val out = Jumps.jumpsOnly(fixture, K)
      .select("person", "seq", "company").orderBy("person", "seq")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out === Array(
      ("p1", 1, "A"), ("p1", 3, "B"), ("p1", 4, "A"),
      ("p2", 1, "C"),
      ("p3", 1, "B")))
  }

  test("jumpsOnly invariant: no two consecutive rows share a company") {
    val out = Jumps.jumpsOnly(fixture, K)
    val bad = Jumps.withChangeFlag(out, K).filter(!col("changed")).count()
    assert(bad === 0L)
  }

  test("segments produces run-length tallies (GetWeta.py:663-669)") {
    val segs = Jumps.segments(fixture, K)
      .orderBy("person", "seg_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(segs === Array(
      ("p1", 1L, "A", 2L), ("p1", 2L, "B", 1L), ("p1", 3L, "A", 1L),
      ("p2", 1L, "C", 1L),
      ("p3", 1L, "B", 3L)))
  }

  test("directional in/out asymmetry (dwwApi.js:264-280): in→origin row, out→destination row") {
    val jumps = Jumps.jumpsOnly(fixture, K)
    // p1 jump stream: A(1) B(3) A(4)
    val in = Jumps.directional(jumps, K, "company", "B", "in")
      .select("person", "seq").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(in === Array(("p1", 1))) // origin of the move INTO B is row seq=1 (A)
    val out = Jumps.directional(jumps, K, "company", "B", "out")
      .select("person", "seq").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out === Array(("p1", 4))) // destination of the move OUT of B is seq=4 (A)
    // target never appears as its own origin (reference asserts this in logs)
    val inB = Jumps.directional(jumps, K, "company", "B", "in")
      .filter(lower(col("company")) === "b").count()
    assert(inB === 0L)
  }

  test("withDummies inserts one in-transit record per consecutive pair, carrying the previous company") {
    val s = spark; import s.implicits._
    // p1 at (0,0) then (0,100): ~11120 km → 111 days
    val df = Seq(
      ("p1", 1L, 1, "A", 0.0, 0.0, 0L),
      ("p1", 2L, 2, "B", 0.0, 100.0, 20L * 86400000L)
    ).toDF("person", "ts", "seq", "company", "lat", "lon", "time_ms")
    val out = Jumps.withDummies(df, K, "time_ms", "lat", "lon")
      .orderBy("time_ms").collect()
    assert(out.length === 3)
    val dummy = out.filter(_.getBoolean(3))
    assert(dummy.length === 1)
    assert(dummy.head.getString(1) === "A") // previous company
    // departure = next arrival - tripDays*86400000; trip for ~11120km = 111 days
    assert(dummy.head.getLong(2) === 20L * 86400000L - 111L * 86400000L)
  }

  test("firstMatch returns the first row by window order satisfying the predicate, not the min") {
    val out = Jumps.firstMatch(fixture, K, col("company") === "A")
      .select("person", "seq").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out === Array(("p1", 1)))
  }

  test("assembleDocs folds rows into sorted nested rels") {
    val docs = Jumps.assembleDocs(
      fixture.withColumn("name", concat(lit("name_"), col("person"))),
      "person", "name", Seq(col("ts"), col("seq"), col("company")))
    val p1 = docs.filter(col("person") === "p1").select("rels").head.getSeq[Any](0)
    assert(p1.length === 4)
    assert(docs.count() === 3)
  }
}
