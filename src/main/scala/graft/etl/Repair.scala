package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The unpadded-date repair batch (FixUnpaddedDates, GetWeta.py:675-704):
  * legacy rows carry `"1996-3-5"`-style dates whose lexicographic order is
  * wrong; the repair zero-pads each component so string order ==
  * chronological order again (SURVEY §7.3.1). `"none"` sentinels and
  * already-clean rows pass through unchanged — the job is idempotent.
  */
object Repair {

  def padDate(c: Column): Column = {
    val parts = split(c, "-")
    when(c.isNull || c === "none" || size(parts) =!= 3, c)
      .otherwise(concat_ws("-",
        lpad(element_at(parts, 1), 4, "0"),
        lpad(element_at(parts, 2), 2, "0"),
        lpad(element_at(parts, 3), 2, "0")))
  }

  /** Repair `dateCol` in place over a whole table. */
  def fixUnpaddedDates(df: DataFrame, dateCol: String): DataFrame =
    df.withColumn(dateCol, padDate(col(dateCol)))
}
