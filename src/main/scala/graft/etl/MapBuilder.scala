package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.analytics.Catalog

/** Company-map seeding (A4, GetWeta.py:493-512): from the credit facts,
  * candidate (search → canonical) entries are the high-confidence matches
  * (`matchRatio > minRatio`), counted, with Python-dict first-wins per
  * search key made explicit as a deterministic row_number tiebreak
  * (SURVEY §7.3.5) — highest count, then name, wins.
  */
object MapBuilder {

  def seedCompanyMap(credits: DataFrame, search: String, name: String, id: String,
                     ratio: String, minRatio: Int = 90): DataFrame = {
    val counted = credits
      .filter(col(ratio) > minRatio)
      .groupBy(col(search), col(name), col(id), col(ratio))
      .agg(count(lit(1)).as("cnt"))
    Catalog.firstWins(counted, search, Seq(desc("cnt"), asc(name), asc(id), asc(ratio)))
      .select(col(search), col(name), col(id), col(ratio), col("cnt"))
  }
}
