package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** The §3.2 jumps serving endpoint (`GET /list/jumps`) end-to-end —
  * dwwApi.js:48-225 getAllPeopleAsJson + FormatRels, Spark-first.
  *
  * Input: the credits fact table (Normalize.credits schema). Column names
  * follow the reference's serving payloads (dwwApi.js:109-121).
  */
object DwwPipeline {

  private val K = Jumps.Keys("personId", Seq("releaseStr", "movieId"), "matchedCompanyName")

  /** P2 + O1: serving-quality rows (mapped, geocoded), person/date order. */
  def servingCredits(credits: DataFrame): DataFrame =
    credits.filter(col("isMapped") && col("geoLoc").isNotNull && col("geoLoc") =!= "" &&
                   col("location").isNotNull && col("location") =!= "")

  /** jumpsOnly=false document list (dwwApi.js:119-129 shape). */
  def allPeopleDocs(credits: DataFrame): DataFrame =
    Jumps.assembleDocs(servingCredits(credits), "personId", "personName", Seq(
      col("releaseStr"), col("movieId").as("imdbMovieId"),
      col("companySearch"), col("matchRatio").as("companyMatchRatio"),
      col("role").as("personRole"), col("trueRole").as("personMappedRole"),
      col("matchedCompanyId"), col("matchedCompanyName")))

  /** jumpsOnly=true rels with epoch-ms dates (dwwApi.js:109-117). */
  def jumpRels(credits: DataFrame): DataFrame =
    Jumps.jumpsOnly(servingCredits(credits), K)
      .withColumn("movieReleaseYear",
        unix_millis(to_timestamp(col("releaseStr"))))
      .withColumn("dummy", lit(false))

  /** The full no-filter jumps document: dummy in-transit records interleaved
    * (dwwApi.js:281-293), grouped per person. geoLoc is the packed
    * "lat,lon" string (SURVEY §7.3.3). */
  def jumpsWithDummies(credits: DataFrame): DataFrame = {
    val rels = jumpRels(credits)
      .withColumn("lat", Scalars.parseGeo(col("geoLoc")).getField("lat"))
      .withColumn("lon", Scalars.parseGeo(col("geoLoc")).getField("lon"))
    Jumps.withDummies(rels, K, "movieReleaseYear", "lat", "lon")
  }

  /** The unfiltered jumps documents (dwwApi.js:109-138 + FormatRels):
    * per person `{id, name, rels:[...]}` with dummy in-transit rels
    * interleaved in serving order. Rel fields mirror the reference's
    * materialized jumps payloads (region ≙ the company's city, location ≙
    * its packed coordinates; dummies carry the previous rel's payload and
    * no location — the exact shape golden-tested against jumps_(2).json). */
  def jumpsDocs(credits: DataFrame): DataFrame = {
    val rels = jumpRels(credits)
      .withColumn("lat", Scalars.parseGeo(col("geoLoc")).getField("lat"))
      .withColumn("lon", Scalars.parseGeo(col("geoLoc")).getField("lon"))
    Jumps.withDummies(rels, K, "movieReleaseYear", "lat", "lon",
        carry = Seq("personName", "movieId", "trueRole", "location"),
        realOnly = Seq("geoLoc"))
      .groupBy(col("personId").as("id"), col("personName").as("name"))
      .agg(sort_array(collect_list(struct(
        col("seq"),
        col("movieId").as("imdbMovieId"),
        col("trueRole").as("personMappedRole"),
        col("time_ms").as("movieReleaseYear"),
        col("dummy"),
        col("company").as("matchedCompanyName"),
        col("location").as("region"),
        col("geoLoc").as("location")))).as("rels"))
  }

  /** The full unfiltered serving envelope (dwwApi.js:218-223): jumps docs
    * plus the company-location echo and the geo dims. */
  def jumpsEnvelope(credits: DataFrame, regions: DataFrame,
                    globalRegions: DataFrame): DataFrame = {
    val served = servingCredits(credits)
    Envelope.unfiltered(
      jumpsDocs(credits),
      served.select(col("matchedCompanyName").as("company"), col("geoLoc")),
      regions, globalRegions)
  }

  /** dir=in/out filtered jumps (dwwApi.js:256-280); key is one of
    * matchedCompanyName | location | region (GetRelKeyFromFilter). The
    * serving alias "region" resolves to the credits frame's
    * globalRegion column (it is only renamed to `region` in the
    * terminal CSV/grouped projections). */
  def directionalJumps(credits: DataFrame, key: String, target: String, dir: String): DataFrame =
    Jumps.directional(jumpRels(credits), K,
      if (key == "region") "globalRegion" else key, target, dir)

  /** grouping=keys output (dwwApi.js:176-189): per key bucket, the jump
    * payloads + total. */
  def groupedJumps(credits: DataFrame, key: String, target: String, dir: String): DataFrame =
    Jumps.grouped(
      directionalJumps(credits, key, target, dir),
      key,
      Seq(col("personName").as("person"), col("trueRole").as("role"),
          col("movieReleaseYear").as("date"), col("matchedCompanyName").as("company"),
          lower(col("location")).as("location"), col("globalRegion").as("region")))

  /** S6: the jumps CSV projection (dwwApi.js:145 column contract). */
  def jumpsCsv(credits: DataFrame, key: String, target: String, dir: String): DataFrame =
    directionalJumps(credits, key, target, dir).select(
      col("personName").as("person"), col("trueRole").as("role"),
      col("movieReleaseYear").as("date"), col("matchedCompanyName").as("company"),
      lower(col("location")).as("location"), col("globalRegion").as("region"))
}
