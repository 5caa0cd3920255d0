package graft.analytics

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DensitySpec extends SparkSpecBase {

  private lazy val K = Density.Keys("person", Seq("ts", "seq"), "company", "role", "yr")

  private def cube(rows: Seq[(String, Long, Int, String, String, Int)]) = {
    val s = spark; import s.implicits._
    Density.build(rows.toDF("person", "ts", "seq", "company", "role", "yr"), K)
      .orderBy("company", "year", "role")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
  }

  test("gap fill: credit counts every year until the next credit (densityCalc.js:76-89)") {
    // one person: A@2000 then B@2003 → A fills 2000,2001,2002; B (final) only 2003
    val out = cube(Seq(
      ("p", 1L, 1, "A", "td", 2000),
      ("p", 2L, 2, "B", "td", 2003)))
    assert(out === Array(
      ("A", 2000, "td", 1L), ("A", 2001, "td", 1L), ("A", 2002, "td", 1L),
      ("B", 2003, "td", 1L)))
  }

  test("same-year same-company consecutive credits collapse BEFORE filling") {
    // A@2000, A@2000, A@2002: first row skipped (same yr+company as next),
    // second fills 2000..2001, final fills 2002 only
    val out = cube(Seq(
      ("p", 1L, 1, "A", "td", 2000),
      ("p", 2L, 2, "A", "td", 2000),
      ("p", 3L, 3, "A", "td", 2002)))
    assert(out === Array(
      ("A", 2000, "td", 1L), ("A", 2001, "td", 1L), ("A", 2002, "td", 1L)))
  }

  test("do/while runs once even when nextYear <= year (same-year different company)") {
    // A@2000 then B@2000: A is NOT skipped (different company), fill range
    // collapses to its own year exactly once
    val out = cube(Seq(
      ("p", 1L, 1, "A", "td", 2000),
      ("p", 2L, 2, "B", "td", 2000)))
    assert(out === Array(("A", 2000, "td", 1L), ("B", 2000, "td", 1L)))
  }

  test("last credit contributes a single year (densityCalc.js:45-58 assumption)") {
    val out = cube(Seq(("p", 1L, 1, "A", "sup", 1999)))
    assert(out === Array(("A", 1999, "sup", 1L)))
  }

  test("counts are credit-instances per role, not distinct people") {
    val out = cube(Seq(
      ("p1", 1L, 1, "A", "td", 2000),
      ("p2", 1L, 1, "A", "td", 2000),
      ("p2", 2L, 2, "A", "sup", 2001)))
    // p2's first credit fills 2000 only (next year 2001); second is final
    assert(out === Array(
      ("A", 2000, "td", 2L), ("A", 2001, "sup", 1L)))
  }

  test("totals exclude the unmapped-role bucket (densityCalc.js:119)") {
    val s = spark; import s.implicits._
    val c = Density.build(Seq(
      ("p1", 1L, 1, "A", "", 2000),
      ("p2", 1L, 1, "A", "td", 2000)).toDF("person", "ts", "seq", "company", "role", "yr"), K)
    val t = Density.totals(c).collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(t === Array(("A", 2000, 1L)))
  }
}
