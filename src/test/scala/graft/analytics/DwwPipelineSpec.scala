package graft.analytics

import graft.SparkSpecBase
import graft.etl.Normalize
import org.apache.spark.sql.functions._

/** End-to-end §3.1 + §3.2: raw notes → normalized credits → the jumps
  * serving endpoint, on a fixture shaped like the reference's data
  * (people/rels/dims per jsonReduced.json / companyMap.json shapes —
  * synthetic values, same structure). */
class DwwPipelineSpec extends SparkSpecBase {

  private lazy val credits = {
    val s = spark; import s.implicits._
    val raw = Seq(
      ("p1", "Alice", "m1", "Movie One", Seq("(premiere) 1 January 2000"), "compositor: Studio Alpha"),
      ("p1", "Alice", "m2", "Movie Two", Seq("3 March 2003"), "td: Studio Beta"),
      ("p1", "Alice", "m3", "Movie Three", Seq("5 May 2005"), "compositor: Studio Alpha"),
      // duplicate (person, company, movie) row → J8 dedup keeps one
      ("p1", "Alice", "m3", "Movie Three", Seq("5 May 2005"), "lead compositor: Studio Alpha"),
      ("p2", "Bob", "m4", "Movie Four", Seq("7 July 2001"), "modeler: Unknown Shop"),
      ("p3", "Carol", "m5", "Movie Five", Seq("9 September 2002"), "rigger: Bad Data Co")
    ).toDF("personId", "personName", "movieId", "movieTitle", "releaseDates", "notes")

    val companyMap = Seq(
      ("studio alpha", "Studio Alpha", "c1"),
      ("studio beta", "Studio Beta", "c2"),
      ("bad data co", "zzz_baddata:bad data co", "c3")
    ).toDF("search", "name", "id")
    val roleMap = Seq(("compositor", "Compositor"), ("td", "TD")).toDF("search", "name")
    val locations = Seq(
      ("Studio Alpha", "wellington", "-41.3,174.8"),
      ("Studio Beta", "london", "51.5,-0.1")
    ).toDF("company", "location", "geoLoc")
    val regions = Seq(("wellington", "oceania"), ("london", "europe")).toDF("location", "globalRegion")

    Normalize.credits(raw, companyMap, roleMap, locations, regions, companyTag = "alpha")
  }

  test("normalize: map hits scored 100, misses unmapped, sentinels dropped, dupes collapsed") {
    val rows = credits.select("personId", "movieId", "matchedCompanyName", "matchRatio",
        "isMapped", "trueRole", "location", "globalRegion")
      .orderBy("personId", "movieId").collect()
    // p3's company maps to zzz_baddata → dropped; p1 m3 dupe collapsed
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("p1", "m1"), ("p1", "m2"), ("p1", "m3"), ("p2", "m4")))
    val m1 = rows(0)
    assert(m1.getString(2) === "Studio Alpha")
    assert(m1.getInt(3) === 100)       // exact lowercase match
    assert(m1.getBoolean(4))
    assert(m1.getString(5) === "Compositor")
    assert(m1.getString(6) === "wellington")
    assert(m1.getString(7) === "oceania")
    val bob = rows(3)
    assert(!bob.getBoolean(4))         // unmapped company falls through
    assert(bob.getString(5) === "")    // role not in roleMap → ""
  }

  test("first-wins dedup keeps the first (releaseStr, movieId) row (J8)") {
    val m3 = credits.filter(col("movieId") === "m3").collect()
    assert(m3.length === 1)
    assert(m3.head.getAs[String]("role") === "compositor") // not "lead compositor"
  }

  test("serving filter excludes unmapped/ungeocoded people (P2)") {
    val docs = DwwPipeline.allPeopleDocs(credits).collect()
    assert(docs.map(_.getString(0)).sorted.toSeq === Seq("p1"))
    assert(docs.head.getSeq[Any](2).length === 3)
  }

  test("jump rels: consecutive-company dedup + epoch-ms dates (dwwApi.js:109-117)") {
    val rels = DwwPipeline.jumpRels(credits)
      .select("personId", "movieId", "matchedCompanyName", "movieReleaseYear")
      .orderBy("movieReleaseYear").collect()
    assert(rels.map(_.getString(2)).toSeq === Seq("Studio Alpha", "Studio Beta", "Studio Alpha"))
    assert(rels.head.getLong(3) === 946684800000L) // 2000-01-01 UTC
  }

  test("dummy synthesis inserts in-transit records at arrival - tripDays (dwwApi.js:281-293)") {
    val out = DwwPipeline.jumpsWithDummies(credits).orderBy("time_ms").collect()
    assert(out.length === 5) // 3 real + 2 dummies
    val dummies = out.filter(_.getBoolean(3))
    assert(dummies.length === 2)
    // dummy carries PREVIOUS company; Wellington→London ~18,885 km → 188 days
    assert(dummies.head.getString(1) === "Studio Alpha")
    val arrival2003 = java.time.Instant.parse("2003-03-03T00:00:00Z").toEpochMilli
    assert(dummies.head.getLong(2) === arrival2003 - 188L * 86400000L)
  }

  test("directional + grouped + CSV contract (dwwApi.js:256-293, :145)") {
    val in = DwwPipeline.directionalJumps(credits, "matchedCompanyName", "studio beta", "in")
      .select("movieId").collect().map(_.getString(0))
    assert(in === Array("m1")) // origin of the move INTO beta

    val grouped = DwwPipeline.groupedJumps(credits, "matchedCompanyName", "studio beta", "in").collect()
    assert(grouped.length === 1)
    assert(grouped.head.getAs[Long]("total") === 1L)

    val csv = DwwPipeline.jumpsCsv(credits, "matchedCompanyName", "studio beta", "in")
    assert(csv.columns.toSeq === Seq("person", "role", "date", "company", "location", "region"))
    val row = csv.head
    assert(row.getString(0) === "Alice")
    assert(row.getString(3) === "Studio Alpha")
    assert(row.getString(4) === "wellington")
    assert(row.getString(5) === "oceania")
  }
}
