package graft.functions

import graft.SparkSpecBase
import graft.analytics.Paths
import graft.functions.{Scalars => Sc}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the fused KML track kernel byte-for-byte to the Column
  * composition it replaced (two interpreted higher-order transforms of
  * when/coord tags) — on the REAL w6d pair rows, both jitter modes, and
  * on synthetic anti-meridian pairs that exercise every lonDiff branch. */
class KmlExprSpec extends SparkSpecBase {

  private val maxCount = 50
  private val rise = 1.0
  private val vo = 0.0
  private val fmt = "%.5f"

  /** The pre-kernel Column chain, verbatim. */
  private def columnKml(k: Paths.Keys): Column = {
    val height = pmod(col("path_id"), lit(5000L)).cast("double") / 100.0 + 50.0
    val diflat = col("to_lat") - col(k.lat)
    val diflon = Sc.lonDiff(col(k.lon), col("to_lon"))
    val seqArr = sequence(lit(0), lit(maxCount))
    def whenTag(i: Column) = concat(lit("<when>"),
      date_format(timestamp_millis(
        Sc.interpMillis(col(k.timeMs), col("to_time_ms"), i, maxCount)), "yyyy-MM-dd"),
      lit("</when>"))
    def coordTag(i: Column) = {
      val lat = col(k.lat) + diflat * i / maxCount
      val lon = col(k.lon) + diflon * i / maxCount
      val countShift = i - lit(maxCount / 2.0)
      val alt = (-pow(countShift * rise, 2) + pow(lit(maxCount / 2.0 * rise), 2)) *
        height + verticalOffset
      concat(lit("<gx:coord>"), format_string(fmt, lon), lit(" "),
        format_string(fmt, lat), lit(" "), format_string(fmt, alt), lit("</gx:coord>"))
    }
    concat(lit("<Placemark><gx:Track><altitudeMode>absolute</altitudeMode>"),
      array_join(transform(seqArr, whenTag(_)), "\n"),
      array_join(transform(seqArr, coordTag(_)), "\n"),
      lit("</gx:Track></Placemark>"))
  }
  private def verticalOffset = vo

  private def kernelKml(k: Paths.Keys): Column =
    KmlTrack(col(k.lat).cast("double"), col(k.lon).cast("double"),
      col("to_lat").cast("double"), col("to_lon").cast("double"),
      col(k.timeMs).cast("long"), col("to_time_ms").cast("long"),
      col("path_id"), maxCount, rise, vo, fmt)

  private def compareOn(pairs: org.apache.spark.sql.DataFrame, k: Paths.Keys): Unit = {
    val rows = pairs
      .select(col("path_id"), kernelKml(k).as("a"), columnKml(k).as("b"))
      .collect()
    assert(rows.nonEmpty, "test frame produced no pair rows")
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(2), s"path_id=${r.get(0)}")
    }
  }

  private def w6dPairs(portable: Boolean) = {
    val d = "/root/testdata/sf0.001"
    val base = graft.model.Tables.table(spark, d, "orders")
      .withColumn("time_ms", unix_millis(col("o_orderdate").cast("timestamp")))
      .withColumn("lat", ((col("o_custkey") % 120) - 60).cast("double"))
      .withColumn("lon", (((col("o_custkey") * 13) % 360) - 180).cast("double"))
    val k = Paths.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus",
      "lat", "lon", "time_ms")
    (Paths.pairs(base, k, portableJitter = portable), k)
  }

  test("kernel equals the Column chain on the real w6d pair rows (portable jitter)") {
    val (p, k) = w6dPairs(portable = true)
    compareOn(p, k)
  }

  test("kernel equals the Column chain with xxhash64 path ids (negative pmod branch)") {
    val (p, k) = w6dPairs(portable = false)
    compareOn(p, k)
  }

  test("kernel equals the Column chain across every lonDiff wraparound branch") {
    val s = spark; import s.implicits._
    val lons = Seq(-179.5, -120.0, -1.0, 0.0, 1.0, 120.0, 179.5, 180.0, -180.0)
    val rows = for {
      (a, i) <- lons.zipWithIndex
      (b, j) <- lons.zipWithIndex
    } yield (s"p$i$j", a, b, 10.0 * i - 40, -5.0 * j + 20,
      1000000000000L + i * 86400000L, 1000000000000L + (i + j + 1) * 97200000L,
      i * 7919L + j)
    val df = rows.toDF("pid", "lon", "to_lon", "lat", "to_lat", "time_ms", "to_time_ms", "path_id")
      .withColumn("to_company", lit("x")) // schema parity only
    val k = Paths.Keys("pid", Seq("pid"), "c", "lat", "lon", "time_ms")
    compareOn(df, k)
  }
}
