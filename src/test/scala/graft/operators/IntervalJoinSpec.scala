package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpecBase {

  private def pairs(binWidth: Double) = {
    val s = spark; import s.implicits._
    val left = Seq(("L1", 0L, 5L), ("L2", 10L, 12L), ("L3", 100L, 200L))
      .toDF("lid", "l_lo", "l_hi")
    val right = Seq(("R1", 5L, 9L), ("R2", 13L, 20L), ("R3", 150L, 160L))
      .toDF("rid", "r_lo", "r_hi")
    IntervalJoin.joinOverlap(left, right, "l_lo", "l_hi", "r_lo", "r_hi", binWidth)
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1)))
      .sorted.toSeq
  }

  test("overlap join: inclusive endpoints, disjoint excluded, multi-bin deduped") {
    // L1[0,5] touches R1[5,9] at 5 → overlap; L2[10,12] vs R2[13,20] is
    // adjacent-but-disjoint → no pair; L3[100,200] spans many bins around
    // R3[150,160] → exactly one deduped pair
    assert(pairs(4.0) === Seq(("L1", "R1"), ("L3", "R3")))
  }

  test("overlap join is bin-size invariant") {
    assert(pairs(1.0) === pairs(7.0))
    assert(pairs(7.0) === pairs(1000.0))
  }

  test("concurrency: sweep counts touching intervals, not adjacent ones") {
    val s = spark; import s.implicits._
    // g1: [0,5]+[3,8] overlap (peak 2); [9,12] starts at 9 exactly where
    //     [3,8]'s end event lands (8+1) — the -1 applies first, so the
    //     peak stays 2, not 3
    // g2: [0,4] then [5,9] adjacent-but-disjoint → peak 1
    // g3: [0,5] and [5,9] genuinely touch at 5 → peak 2
    val iv = Seq(
      ("g1", 0L, 5L), ("g1", 3L, 8L), ("g1", 9L, 12L),
      ("g2", 0L, 4L), ("g2", 5L, 9L),
      ("g3", 0L, 5L), ("g3", 5L, 9L)
    ).toDF("g", "lo", "hi")
    val r = IntervalJoin.concurrency(iv, "g", "lo", "hi")
      .orderBy("g").collect().map(x => (x.getString(0), x.getInt(1)))
    assert(r === Array(("g1", 2), ("g2", 1), ("g3", 2)))
  }
}
