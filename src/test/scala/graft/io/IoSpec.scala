package graft.io

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths => JPaths}
import scala.jdk.CollectionConverters._

class IoSpec extends SparkSpecBase {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-io").toString

  test("S5: all-people CSV projection keeps the 9-column contract and strips commas") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("p1", "Alice", "lead, compositor", "m1", "weta, digital", 95, "1999-01-01", "c1", "Weta Digital")
    ).toDF("personId", "personName", "personRole", "imdbMovieId", "searchedCompany",
           "searchedMatchRatio", "movieReleaseYear", "matchedCompanyId", "matchedCompanyName")
    val out = Sinks.allPeopleCsvProjection(df)
    assert(out.columns.toSeq === Sinks.allPeopleCols)
    val row = out.head
    assert(row.getString(2) === "lead compositor")  // comma stripped (dwwApi.js:33)
    assert(row.getString(4) === "weta digital")

    val dir = tmpDir() + "/people"
    Sinks.writeCsv(out, dir, Sinks.allPeopleCols)
    val files = Files.list(JPaths.get(dir)).iterator().asScala.filter(_.toString.endsWith(".csv")).toSeq
    val lines = files.flatMap(f => Files.readAllLines(f).asScala)
    assert(lines.head === Sinks.allPeopleCols.mkString(","))
    assert(lines(1) === "p1,Alice,lead compositor,m1,weta digital,95,1999-01-01,c1,Weta Digital")
  }

  test("S3: partitioned parquet sink lays out label-index directories") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1), ("b", 2)).toDF("label", "v")
    val dir = tmpDir() + "/nodes"
    Sinks.writePartitioned(df, dir, Seq("label"))
    val parts = Files.list(JPaths.get(dir)).iterator().asScala.map(_.getFileName.toString).toSet
    assert(parts.contains("label=a") && parts.contains("label=b"))
    assert(spark.read.parquet(dir).count() === 2)
  }

  test("S11: dim upsert preserves a versioned backup snapshot (dwwRoutes.js:131-172)") {
    val s = spark; import s.implicits._
    val base = tmpDir()
    val v1 = Seq(("weta", "Weta Digital")).toDF("search", "name")
    Sinks.upsertWithBackup(spark, v1, base, "companyMap", 1L)
    val v2 = Seq(("weta", "Weta FX")).toDF("search", "name")
    Sinks.upsertWithBackup(spark, v2, base, "companyMap", 2L)
    assert(spark.read.parquet(s"$base/companyMap").head.getString(1) === "Weta FX")
    assert(spark.read.parquet(s"$base/backups/companyMap_2").head.getString(1) === "Weta Digital")
  }

  test("S2: incremental load is a left-anti join on id") {
    val s = spark; import s.implicits._
    val incoming = Seq(1, 2, 3, 4).toDF("id")
    val staged = Seq(2, 4).toDF("id")
    val out = Sources.incrementalLoad(incoming, staged, "id").collect().map(_.getInt(0)).sorted
    assert(out === Array(1, 3))
  }

  test("S9: map-file source validates maptype (GetWeta.py:811-831)") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    Seq(("companymap", "weta")).toDF("maptype", "search")
      .write.mode("overwrite").json(s"$dir/map.json")
    assert(Sources.mapFile(spark, s"$dir/map.json", "companymap").count() === 1)
    intercept[IllegalArgumentException] {
      Sources.mapFile(spark, s"$dir/map.json", "rolemap")
    }
  }

  test("S8/S12: header CSV and JSON document sources round-trip") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    Seq(("weta digital", -41.3, 174.8), ("framestore", 51.5, -0.1))
      .toDF("company", "lat", "lon")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/geo")
    val csv = Sources.csv(spark, s"$dir/geo")
    assert(csv.columns.toSeq === Seq("company", "lat", "lon"))
    assert(csv.count() === 2)
    assert(csv.schema("lat").dataType === org.apache.spark.sql.types.DoubleType)

    Seq(("p1", "Alice")).toDF("id", "name").write.mode("overwrite").json(s"$dir/docs")
    val json = Sources.json(spark, s"$dir/docs")
    assert(json.select("id", "name").head.getString(1) === "Alice")
  }

  test("S10: flattener projects nested fields to scalar columns") {
    val s = spark; import s.implicits._
    val nested = Seq((1, ("x", 2.0))).toDF("id", "payload")
    val flat = Sources.flatten(nested, Seq("id", "payload._1", "payload._2"))
    assert(flat.columns.toSeq === Seq("id", "payload__1", "payload__2"))
  }
}
