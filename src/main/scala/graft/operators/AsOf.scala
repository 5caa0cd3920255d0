package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (backward) join — an operator Spark lacks natively (custom-op
  * preference tier (a): compose existing ops, SURVEY §2.10).
  *
  * For each left row, attach the LATEST right row of the same key with
  * right.time <= left.time. Implemented as the classic union-and-carry:
  * tag both sides, union, sort per key by (time, side) with the right side
  * winning ties, carry the last right payload forward with
  * last(ignoreNulls) over an unbounded-preceding frame, then keep left
  * rows. ONE shuffle on the key — the same cost as a regular join — versus
  * a naive range-join's O(|L|·|R|) per key.
  */
object AsOf {

  /** Inner semantics: left rows with no prior right row are dropped
    * (matching SQL ASOF JOIN); right.time == left.time is a valid match.
    * Output: key, time, leftCols, r_<time>, r_<rightCols>.
    *
    * Requirement: every `rightCols` column must be an ORDERABLE type (no
    * maps) — the right payload struct is the deterministic tiebreak among
    * duplicate (key, time) right rows, so it participates in the window
    * sort and unorderable payloads fail analysis. Project a map column to
    * orderable fields (or `to_json` it) before joining. */
  def joinBackward(left: DataFrame, right: DataFrame, key: String, time: String,
                   leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    val rpaySchema = StructType(right
      .select(col(time).as("r_" + time) +: rightCols.map(c => col(c).as("r_" + c)): _*)
      .schema.fields)

    val lTagged = left
      .select(col(key) +: col(time).as("__t") +: lit(0).as("__side") +: leftCols.map(col): _*)
      .withColumn("__rpay", lit(null).cast(rpaySchema))
    val rTagged = right
      .select(col(key), col(time).as("__t"), lit(1).as("__side"),
        struct(col(time).as("r_" + time) +: rightCols.map(c => col(c).as("r_" + c)): _*)
          .as("__rpay"))

    // right rows sort BEFORE left rows at equal time → ties match; among
    // duplicate right (key, time) rows the payload struct is the final
    // tiebreak, so the carried match is deterministic run-to-run (the
    // field-wise-largest right payload wins).
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").desc, col("__rpay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0 && col("__match").isNotNull)
      .select((col(key) +: col("__t").as(time) +: leftCols.map(col)) ++
        (("r_" + time) +: rightCols.map("r_" + _)).map(f => col(s"__match.$f").as(f)): _*)
  }
}
