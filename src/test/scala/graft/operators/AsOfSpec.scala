package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpecBase {

  test("backward as-of join: latest right row <= left time per key, ties match") {
    val s = spark; import s.implicits._
    val trades = Seq(
      ("A", 10L, "t1"), ("A", 25L, "t2"), ("A", 5L, "t0"),
      ("B", 10L, "t3")
    ).toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      ("A", 8L, 100.0), ("A", 10L, 101.0), ("A", 20L, 102.0),
      ("C", 1L, 999.0)
    ).toDF("sym", "ts", "px")

    val out = AsOf.joinBackward(trades, quotes, "sym", "ts", Seq("trade_id"), Seq("px"))
      .orderBy("sym", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(out === Array(
      ("A", 10L, "t1", 10L, 101.0),  // tie: quote at exactly ts=10 matches
      ("A", 25L, "t2", 20L, 102.0))) // latest <= 25 is ts=20
    // t0 (ts=5, before any quote) and B (no quotes) dropped — inner semantics
  }

  test("as-of join output has one row per matched left row (no fanout)") {
    val s = spark; import s.implicits._
    val left = Seq(("A", 100L, "x")).toDF("k", "ts", "payload")
    val right = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0)).toDF("k", "ts", "v")
    val out = AsOf.joinBackward(left, right, "k", "ts", Seq("payload"), Seq("v")).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(4) === 3.0)
  }
}
