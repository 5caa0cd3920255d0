package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join — the interval×interval generalization of
  * [[RangeJoin]]'s point-in-interval form (custom-op tier (a), composed
  * from built-ins).
  *
  * `L JOIN R ON l.start <= r.end AND r.start <= l.end` is a pure theta
  * join, which Spark can only plan as a nested loop — O(|L|·|R|). The
  * scalable shape bins the shared value domain: EACH side explodes its
  * interval into the bins it touches, the join becomes an equi-join on
  * the bin id with the exact overlap predicate as a residual filter, and
  * a distinct on the output keys collapses pairs that co-occur in
  * several bins. Cost: Σ spans/binWidth per side + one hash join on the
  * bin key — candidate-bounded exactly like the LSH bucket joins, and
  * the result is bin-size invariant (any binWidth yields the same rows;
  * pick it near the median interval span so most intervals hit 1-2
  * bins).
  *
  * Overlap is inclusive on both ends (touching endpoints pair up),
  * matching the SQL predicate above.
  */
object IntervalJoin {

  /** left(lLo,lHi) ⨝ right(rLo,rHi) on interval overlap. The four bound
    * columns must be numeric (cast dates to day numbers upstream). The
    * caller projects each side to its key + bound columns first; output
    * = all left columns then all right columns, deduplicated. */
  def joinOverlap(left: DataFrame, right: DataFrame,
                  lLo: String, lHi: String, rLo: String, rHi: String,
                  binWidth: Double): DataFrame = {
    // binWidth = 0 would NOT fail: floor(x/0) = NULL bins, explode drops
    // every row, and the join silently reports zero overlaps
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    binned(left, lLo, lHi)
      .join(binned(right, rLo, rHi), Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .drop("__bin")
      .distinct()
  }

  /** Max concurrent overlapping intervals per group (sweep line): +1 at
    * each start, −1 one past each end (inclusive intervals), running sum
    * in event order, max per group. One shuffle on the group key, local
    * sort inside the window — never materializes pairs at all, so it
    * scales where even a binned pair join would not (the n-intervals-all-
    * overlapping group costs n, not n²). With the hi+1 end encoding an
    * end event sharing a position with a start means the two intervals do
    * NOT overlap ([a,h] vs [h+1,b]), so −1 sorts before +1 at a tie;
    * genuinely touching endpoints ([a,p] vs [p,b]) land at different
    * event positions and count as concurrent, matching [[joinOverlap]]'s
    * inclusive bounds. */
  def concurrency(intervals: DataFrame, group: String,
                  lo: String, hi: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = intervals
      .select(col(group), col(lo).as("pos"), lit(1).as("delta"))
      .union(intervals.select(col(group), col(hi) + 1, lit(-1)))
    val w = Window.partitionBy(group).orderBy(col("pos"), col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("open", sum(col("delta")).over(w))
      .groupBy(group).agg(max(col("open")).cast("int").as("max_concurrent"))
  }
}
