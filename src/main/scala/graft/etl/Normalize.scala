package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Scalars
import graft.analytics.Catalog

/** The §3.1 build pipeline re-expressed as one declarative job
  * (GetWeta.py:117-228 ConnectPeopleToCompanies + enrichment passes):
  *
  *   raw credits (person, movie, release list, free-text notes)
  *     → parse notes (F1) → company-map lookup (J1, broadcast)
  *     → fuzzy score vs matched name (F4)
  *     → dedup on (person, company, movie) (J8, deterministic first-wins)
  *     → trueRole (J2) → locations/regions snowflake (J3)
  *     → credits fact table (SURVEY §1.3 schema)
  *
  * The reference's per-person HTTP/dict loops become broadcast joins; the
  * enrichment order (trueRoles → locations → jumps) follows the reference's
  * flag order (GetWeta.py:833-852). Every stage is a scan-level projection
  * or a broadcast join — the whole job is a single shuffle-free pass until
  * the dedup exchange.
  */
object Normalize {

  /** Raw schema: personId, personName, movieId, movieTitle, releaseDates
    * array<string>, notes string. Dims per SURVEY §1.3. */
  def credits(raw: DataFrame, companyMap: DataFrame, roleMap: DataFrame,
              locations: DataFrame, regions: DataFrame,
              companyTag: String = ""): DataFrame = {

    val parsed = raw
      .withColumn("releaseStr", Scalars.parseEarliestDate(col("releaseDates")))
      .withColumn("parsed", Scalars.parseNotes(col("notes"), lit(companyTag)))
      .withColumn("role", col("parsed.role"))
      .withColumn("companySearch", col("parsed.company"))
      .drop("parsed")

    // J1: company-map lookup; unmapped rows keep the raw search with isMapped=false
    val mapped = parsed
      .join(broadcast(companyMap.select(
        col("search"), col("name").as("matchedCompanyName"), col("id").as("matchedCompanyId"))),
        parsed("companySearch") === companyMap("search"), "left")
      .drop("search")
      .withColumn("isMapped", col("matchedCompanyName").isNotNull)
      .withColumn("matchedCompanyName", coalesce(col("matchedCompanyName"), col("companySearch")))
      .withColumn("matchedCompanyId", coalesce(col("matchedCompanyId"), lit("")))

    // F4: fuzzy confidence of the match (GetWeta.py:236-237)
    val scored = mapped.withColumn("matchRatio",
      Scalars.fuzzRatio(lower(trim(col("matchedCompanyName"))), lower(trim(col("companySearch")))))

    // P4: sentinel discard (zzz_baddata rows dropped, GetWeta.py:161-164)
    val clean = scored.filter(!col("matchedCompanyName").startsWith("zzz_baddata"))

    // J8: dedup on (person, company, movie) — deterministic first-wins.
    // The key is a STRUCT, not a delimiter-joined string: "acme|"+"m1"
    // and "acme"+"|m1" must not collide, and concat_ws silently skips
    // nulls. The ordering carries (role, companySearch) tiebreaks past
    // releaseStr/movieId — within a dedup group releaseStr is constant
    // (it derives from the shared movie), so without them the winner of
    // a same-person-same-movie-same-company double credit would be
    // partition-layout-dependent.
    val deduped = Catalog.firstWins(
      clean.withColumn("__k",
        struct(col("personId"), col("matchedCompanyName"), col("movieId"))),
      "__k",
      Seq(col("releaseStr"), col("movieId"), col("role"), col("companySearch")))
      .drop("__k")

    // J2: trueRole; unmapped and zzz_baddata roles become "" (GetWeta.py:539-540)
    val withRole = deduped
      .join(broadcast(roleMap.select(col("search").as("__rs"), col("name").as("__rn"))),
        lower(col("role")) === lower(col("__rs")), "left")
      .withColumn("trueRole",
        when(col("__rn").isNull || col("__rn").startsWith("zzz_baddata"), lit(""))
          .otherwise(col("__rn")))
      .drop("__rs", "__rn")

    // J3: 2-level geo snowflake with lowercase join keys (GetWeta.py:578-580)
    withRole
      .join(broadcast(locations.select(
          lower(col("company")).as("__lc"), col("location"), col("geoLoc"))),
        lower(col("matchedCompanyName")) === col("__lc"), "left")
      .drop("__lc")
      .join(broadcast(regions.select(
          lower(col("location")).as("__loc"), col("globalRegion"))),
        lower(col("location")) === col("__loc"), "left")
      .drop("__loc")
      .withColumn("releaseDate", to_date(col("releaseStr")))
  }

  /** The 100 TB deployment path: materialize normalized credits bucketed
    * (and sorted) by the person key. Every downstream per-person stage —
    * jump windows, dummy synthesis, doc assembly, density — then reads
    * co-partitioned data and plans with ZERO Exchange on personId
    * (asserted in ScaleSpec); the one big shuffle happens once, at write
    * time, instead of once per serving query. */
  def writeCreditsBucketed(credits: DataFrame, table: String, numBuckets: Int): Unit =
    graft.io.Sinks.writeBucketed(credits, table, Seq("personId"), numBuckets,
      Seq("personId", "releaseStr", "movieId"))
}
