package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — the second operator Spark lacks
  * natively (custom-op tier (a), composed from built-ins).
  *
  * Naively, `points JOIN intervals ON p BETWEEN lo AND hi` plans a
  * BroadcastNestedLoopJoin — O(|P|·|I|). The scalable shape bins the value
  * domain: each interval explodes into the bins it covers
  * (sequence/explode — a generator, ~(hi-lo)/binWidth rows), each point
  * maps to one bin, and the join becomes an EQUI-join on the bin id with a
  * residual containment filter. Cost: |P| + Σ interval spans / binWidth,
  * with a plain shuffled hash join — the same pattern as the LSH bucket
  * joins. Choose binWidth near the median interval span.
  */
object RangeJoin {

  /** points(pointCol) ⨝ intervals(loCol, hiCol), inclusive bounds.
    * All three columns must be numeric (cast upstream). */
  def joinContains(points: DataFrame, intervals: DataFrame,
                   pointCol: String, loCol: String, hiCol: String,
                   binWidth: Double): DataFrame = {
    val pBinned = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val iBinned = intervals
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    pBinned.join(iBinned, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
