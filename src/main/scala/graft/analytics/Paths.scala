package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** W6 — movement-path expansion (pathCreator.js:101-133).
  *
  * For each consecutive pair of rels at DIFFERENT studios, the reference
  * emits a 51-point track: linear lat interpolation, anti-meridian-aware lon
  * interpolation (pathCreator.js:178-199), a parabolic altitude bulge
  * `(-(countShift*rise)^2 + (maxCount/2*rise)^2) * height + verticalOffset`
  * with `height = random()*50+50` (pathCreator.js:115), and per-point
  * linearly interpolated timestamps (pathCreator.js:148-160).
  *
  * Spark-first: lead() over the person window → filter(from =!= to) →
  * explode(sequence(0, maxCount)) + pure Column math. The reference's
  * `Math.random()` height is replaced by a DETERMINISTIC per-path jitter
  * (xxhash64 of the pair keys scaled into [50,100)) so results are
  * reproducible and oracle-checkable — same distribution, stable plans.
  */
object Paths {

  final case class Keys(person: String, order: Seq[String], company: String,
                        lat: String, lon: String, timeMs: String)

  /** `portableJitter` swaps the xxhash64 path id for an md5-derived 60-bit
    * value computable bit-for-bit by any engine — the whole expansion
    * (parabola, wraparound, time interpolation AND jitter) then
    * hash-matches a SQL oracle (w6b). The default stays on xxhash64 (one
    * hash, no string building) for the fast path. */
  /** Pair detection + deterministic path ids — the pre-expansion stage
    * (pathCreator.js:101-113): lead() over the person window, keep only
    * consecutive rels at different studios, stamp each survivor with its
    * path id. Shared by `expand` and by index builders (roleIndex) that
    * need path identities but not the 51-point tracks — indexing from here
    * instead of the expanded frame shuffles 51x less data. */
  def pairs(df: DataFrame, k: Keys,
            portableJitter: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col(k.person)).orderBy(k.order.map(col): _*)
    val paired = df
      .withColumn("to_company", lead(col(k.company), 1).over(w))
      .withColumn("to_lat", lead(col(k.lat), 1).over(w))
      .withColumn("to_lon", lead(col(k.lon), 1).over(w))
      .withColumn("to_time_ms", lead(col(k.timeMs), 1).over(w))
      .filter(col("to_company").isNotNull && col("to_company") =!= col(k.company))

    // Deterministic stand-in for Math.random()*50+50 (pathCreator.js:115).
    val pathId =
      if (portableJitter)
        graft.functions.Md5Prefix(concat_ws("|", col(k.person), col(k.company),
          col("to_company"), col(k.timeMs)), 15)
      else
        xxhash64(col(k.person), col(k.company), col("to_company"), col(k.timeMs))
    paired.withColumn("path_id", pathId)
  }

  def expand(df: DataFrame, k: Keys, maxCount: Int = 50,
             rise: Double = 1.0, verticalOffset: Double = 0.0,
             portableJitter: Boolean = false,
             carry: Seq[String] = Nil): DataFrame = {
    val paired = pairs(df, k, portableJitter)
    val height = pmod(col("path_id"), lit(5000L)).cast("double") / 100.0 + 50.0

    val diflat = col("to_lat") - col(k.lat)
    val diflon = Scalars.lonDiff(col(k.lon), col("to_lon"))

    paired
      .withColumn("seq", explode(sequence(lit(0), lit(maxCount))))
      .withColumn("lat", col(k.lat) + diflat * col("seq") / maxCount)
      .withColumn("lon", col(k.lon) + diflon * col("seq") / maxCount)
      .withColumn("alt", {
        val countShift = col("seq") - lit(maxCount / 2.0)
        (-pow(countShift * rise, 2) + pow(lit(maxCount / 2.0 * rise), 2)) * height + verticalOffset
      })
      .withColumn("when_ms", Scalars.interpMillis(col(k.timeMs), col("to_time_ms"), col("seq"), maxCount))
      .select(col(k.person).as("person_id") +: col("path_id") +:
              col(k.company).as("from_company") +: col("to_company") +:
              col("seq") +: col("lat") +: col("lon") +: col("alt") +:
              col("when_ms") +: carry.map(col): _*)
  }

  /** Role → path-id index (pathCreator.js:38-48): the visualizer's
    * per-role path selector, `{role → [path ids]}`. Any frame carrying the
    * from-rel's role column plus `path_id` works; feed it `pairs(...)` (one
    * row per path) rather than `expand(...)` (51 rows per path) — the index
    * never needs the track points. */
  def roleIndex(paths: DataFrame, role: String): DataFrame =
    paths.select(col(role), col("path_id")).distinct()
      .groupBy(col(role))
      .agg(sort_array(collect_set(col("path_id"))).as("path_ids"))
      // n_paths IS the collected set's size — computing it as a second
      // countDistinct aggregate forced an Expand (2× the aggregate
      // input) for a number the set already carries (r16)
      .withColumn("n_paths", size(col("path_ids")).cast("long"))

  /** KML gx:Track rendering fused over the PAIR rows (pathCreator.js:
    * 108-131): every Placemark derives from exactly one from→to pair, so
    * the whole track — 51 interpolated points, formatted and tag-wrapped —
    * is a pure column expression over `pairs(...)`. Zero shuffle, zero
    * sort: the explode → groupBy → collect_list → array_sort round trip of
    * [[toKml]] moves every formatted point string through an exchange
    * (51× the pair volume) only to reassemble an order this form never
    * breaks. Coordinates are rendered at a fixed decimal width (`fmt`) —
    * the cross-engine-stable rendering (no shortest-repr divergence). */
  def kmlTracks(df: DataFrame, k: Keys, maxCount: Int = 50,
                rise: Double = 1.0, verticalOffset: Double = 0.0,
                portableJitter: Boolean = false,
                fmt: String = "%.5f"): DataFrame = {
    // Explicit fan-out to cluster width: each pair row explodes ~50x in
    // BYTES (102 formatted tags) and ~200x in CPU (interpreted transform
    // lambdas), but AQE sizes partitions by the small INPUT and coalesces
    // the pair window to a handful of tasks — the render would run nearly
    // serial. Cheap shuffle of the narrow pair rows, not of the tags.
    val paired = pairs(df, k, portableJitter)
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("path_id"))
    // Fused native renderer (functions/KmlExpr.scala): the previous form
    // built the track with two higher-order transform()s whose lambdas
    // are interpreted per element (HOFs are CodegenFallback) — 102
    // interpreted format/concat/date evaluations per pair row. The kernel
    // renders the identical bytes (KmlExprSpec pins kernel ≡ the Column
    // chain on real pair rows; the w6d oracle hash re-pins vs DuckDB) in
    // one pass per row: w6d_kml 4.5 → 1.9 s same-session A/B at sf0.1
    // (OPTIMIZATION_r15.md).
    paired.select(
      col(k.person).as("person_id"), col("path_id"),
      col(k.company).as("from_company"), col("to_company"),
      graft.functions.KmlTrack(
        col(k.lat).cast("double"), col(k.lon).cast("double"),
        col("to_lat").cast("double"), col("to_lon").cast("double"),
        col(k.timeMs).cast("long"), col("to_time_ms").cast("long"),
        col("path_id"), maxCount, rise, verticalOffset, fmt).as("kml"))
  }

  /** KML gx:Track rendering over an ALREADY-expanded frame (same output
    * shape as [[kmlTracks]], which is the no-shuffle form to prefer when
    * rendering straight from pair rows). One Placemark per path, points
    * concatenated in seq order. */
  def toKml(expanded: DataFrame): DataFrame = {
    val whenStr = date_format(timestamp_millis(col("when_ms")), "yyyy-MM-dd")
    expanded
      .withColumn("when_tag", concat(lit("<when>"), whenStr, lit("</when>")))
      .withColumn("coord_tag",
        concat(lit("<gx:coord>"), col("lon"), lit(" "), col("lat"), lit(" "), col("alt"), lit("</gx:coord>")))
      .groupBy(col("person_id"), col("path_id"), col("from_company"), col("to_company"))
      .agg(
        concat(lit("<Placemark><gx:Track><altitudeMode>absolute</altitudeMode>"),
          concat_ws("\n", array_sort(collect_list(struct(col("seq"), col("when_tag")))).getField("when_tag")),
          concat_ws("\n", array_sort(collect_list(struct(col("seq"), col("coord_tag")))).getField("coord_tag")),
          lit("</gx:Track></Placemark>")).as("kml"))
  }
}
