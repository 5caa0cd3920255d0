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
    // unmapped rows must not seed: Normalize coalesces their name to the
    // raw search, so fuzz(x, x) = 100 would pass any threshold and seed a
    // bogus identity mapping — exactly what the curation review exists to
    // prevent. The flag is Normalize's isMapped when present.
    val mappedOnly =
      if (credits.columns.contains("isMapped")) credits.filter(col("isMapped"))
      else credits
    val counted = mappedOnly
      .filter(col(ratio) > minRatio)
      .groupBy(col(search), col(name), col(id), col(ratio))
      .agg(count(lit(1)).as("cnt"))
    Catalog.firstWins(counted, search, Seq(desc("cnt"), asc(name), asc(id), asc(ratio)))
      .select(col(search), col(name), col(id), col(ratio), col("cnt"))
  }
}
