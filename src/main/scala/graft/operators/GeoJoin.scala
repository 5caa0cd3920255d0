package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial proximity join — the scale path for the
  * reference's geo tier (SURVEY F5: locUtils.js haversine over studio
  * coordinates; dwwApi.js computes pairwise travel times between
  * locations). A naive "all points within R km of each other" is an n²
  * cross join; the standard fix is the uniform-grid bucket join: hash
  * every point to a lat/lon cell at least R km wide, replicate each LEFT
  * point to its 3×3 cell neighborhood, equi-join on the cell key, then
  * verify the exact haversine distance. Any true pair shares a probed
  * cell (cell edge ≥ R in both axes inside the supported latitude band),
  * so recall is exact; candidate volume is Σ cell² instead of n² — the
  * same banded-candidate shape as the MinHash tier, lifted to geometry.
  *
  * The right side keeps its single home cell, so a (p1, p2) pair meets
  * on exactly ONE cell key and no post-join distinct is needed.
  */
object GeoJoin {

  /** All unordered point pairs within `radiusKm`, with their distance.
    * Supported latitude band |lat| ≤ 60° (the lon cell width is sized for
    * cos 60°; widen `lonCellDeg` for polar data). Columns out:
    * (id1, id2, km).
    *
    * Longitude cells live on a RING: lon is normalized to [-180, 180) and
    * the cell index is taken modulo the ring size, with the 3×3 probe
    * wrapping via pmod — a pair straddling the ±180° anti-meridian (e.g.
    * 179.9° and −179.95°) lands in adjacent ring cells and is found like
    * any other (haversine itself is 360°-periodic in Δlon, so the verify
    * step needs no special casing). Flat `floor(lon/cellDeg)` bucketing
    * would silently drop exactly those pairs. The ring cell count is
    * FLOOR(360/cellDeg) so all cells are equal width ≥ cellDeg — a
    * ceil-sized ring leaves a narrower final cell, and two points closer
    * than cellDeg could then sit TWO ring indices apart across it,
    * breaking the 3×3 recall guarantee. */
  def withinDistance(points: DataFrame, id: String, lat: String, lon: String,
                     radiusKm: Double): DataFrame = {
    // cell edges ≥ radius: 1° lat = 111.32 km; 1° lon = 111.32·cos(lat) km,
    // ≥ 55.66 km up to |lat| = 60°
    val latCellDeg = radiusKm / 111.0
    val lonCellDeg = radiusKm / (111.0 * 0.5)
    // equal-width ring cells, each ≥ lonCellDeg (floor, never ceil — see
    // scaladoc); ringSize ≥ 3 keeps the 3×3 probe duplicate-free (dx = −1
    // and +1 must reach DIFFERENT cells, or a pair meets twice)
    val ringSize = math.floor(360.0 / lonCellDeg).toLong
    require(ringSize >= 3,
      s"radiusKm=$radiusKm needs lon cells >90° (ring of $ringSize); " +
        "a grid join degenerates there — use the direct n² form")
    val ringCellDeg = 360.0 / ringSize
    val lonNorm = (col(lon) + 540.0) % 360.0 - 180.0 // [-180, 180)
    val cellLat = floor(col(lat) / latCellDeg).cast("long")
    // least-clamp: ringCellDeg = 360/ringSize can round DOWN a few ulps,
    // so a lon a hair under +180 can compute floor(...) == ringSize — an
    // out-of-ring home cell no pmod'd probe could reach (its pairs would
    // silently vanish). The true cell of such a point is the LAST one.
    val cellLon = least(floor((lonNorm + 180.0) / ringCellDeg).cast("long"),
      lit(ringSize - 1))
    val cells = points.select(col(id), col(lat), col(lon),
      cellLat.as("cy"), cellLon.as("cx"))
    // left side probes its 3×3 neighborhood (lon wrapping around the
    // ring); right side stays home
    val probes = cells.select(col(id), col(lat), col(lon),
        explode(expr("sequence(-1, 1)")).as("dy"), col("cy"), col("cx"))
      .select(col(id), col(lat), col(lon), (col("cy") + col("dy")).as("cy"),
        explode(expr("sequence(-1, 1)")).as("dx"), col("cx"))
      .select(col(id), col(lat), col(lon), col("cy"),
        pmod(col("cx") + col("dx"), lit(ringSize)).as("cx"))
    val a = probes.select(col(id).as("id1"), col(lat).as("lat1"),
      col(lon).as("lon1"), col("cy"), col("cx"))
    val b = cells.select(col(id).as("id2"), col(lat).as("lat2"),
      col(lon).as("lon2"), col("cy"), col("cx"))
    a.join(b, Seq("cy", "cx"))
      .filter(col("id1") < col("id2"))
      .withColumn("km", graft.functions.Scalars.haversineKm(
        col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .filter(col("km") <= radiusKm)
      .select(col("id1"), col("id2"), round(col("km"), 4).as("km"))
  }
}
