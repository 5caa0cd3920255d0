package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A8/A9 — the headcount-density engine (densityCalc.js:39-121).
  *
  * Reference semantics (densityCalc.js:76-89, assumptions at :45-58), kept
  * exactly:
  *   1. Per person, credits are walked in order. A credit that has the SAME
  *      year AND SAME company as the NEXT credit is skipped ("continue")
  *      before any filling happens.
  *   2. Every surviving non-final credit contributes +1 to
  *      (company, y, role) for y in [year, nextYear-1] — but the do/while
  *      always runs once, so if nextYear <= year it still contributes its own
  *      year exactly once.
  *   3. The final credit contributes its own year only.
  *
  * Spark-first: lead() over the person window + explode(sequence(...)) — the
  * gap-fill is a generator, the tally a partial+final hash aggregate. No
  * driver loops; scales linearly in credits × mean gap length.
  */
object Density {

  final case class Keys(person: String, order: Seq[String], company: String, role: String, year: String)

  /** The density cube: (company, year, role, count). */
  def build(df: DataFrame, k: Keys): DataFrame = {
    val w = Window.partitionBy(col(k.person)).orderBy(k.order.map(col): _*)
    val nextYear = lead(col(k.year), 1).over(w)
    val nextComp = lead(col(k.company), 1).over(w)

    val skip = nextYear.isNotNull && (col(k.year) === nextYear) && (col(k.company) === nextComp)

    // fill range: own year .. max(own year, nextYear-1); final credit → own year.
    val fillEnd = when(nextYear.isNull, col(k.year))
      .otherwise(greatest(col(k.year), nextYear - 1))

    df.withColumn("__skip", skip)
      .withColumn("__end", fillEnd)
      .filter(!col("__skip"))
      .withColumn("year", explode(sequence(col(k.year), col("__end"))))
      .groupBy(col(k.company).as("company"), col("year"), col(k.role).as("role"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** A9 — point query + total-minus-unmapped (densityCalc.js:101-121):
    * per (company, year) the role breakdown total, excluding the unmapped
    * (`""`) role bucket from the reported total. */
  def totals(cube: DataFrame, unmappedRole: String = ""): DataFrame =
    cube.groupBy(col("company"), col("year"))
      .agg(sum(when(col("role") =!= lit(unmappedRole), col("cnt")).otherwise(lit(0L))).as("total"))
}
