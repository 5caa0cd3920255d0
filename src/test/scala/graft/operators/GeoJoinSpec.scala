package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GeoJoinSpec extends SparkSpecBase {

  test("grid bucket join equals the brute-force distance join") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(i =>
      (i, 40.0 + rnd.nextDouble() * 3, -74.0 + rnd.nextDouble() * 3))
      .toDF("id", "lat", "lon")
    val fast = GeoJoin.withinDistance(pts, "id", "lat", "lon", 25.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val a = pts.select(col("id").as("id1"), col("lat").as("lat1"), col("lon").as("lon1"))
    val brute = a.crossJoin(
        pts.select(col("id").as("id2"), col("lat").as("lat2"), col("lon").as("lon2")))
      .filter(col("id1") < col("id2"))
      .filter(graft.functions.Scalars.haversineKm(
        col("lat1"), col("lon1"), col("lat2"), col("lon2")) <= 25.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(fast === brute)
    assert(brute.nonEmpty) // the comparison must actually exercise pairs
  }

  test("cross-cell neighbors are found; no duplicate pairs emitted") {
    val s = spark; import s.implicits._
    // two points ~0.1° apart straddling a cell boundary at 25/111 ≈ 0.225°
    val pts = Seq((1L, 40.224, -70.0), (2L, 40.226, -70.0), (3L, 55.0, -70.0))
      .toDF("id", "lat", "lon")
    val r = GeoJoin.withinDistance(pts, "id", "lat", "lon", 25.0)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((1L, 2L))) // exactly once, far point excluded
  }

  test("anti-meridian pairs are found via the ring-wrapped lon cells") {
    val s = spark; import s.implicits._
    // (1, 2) straddle ±180° (~9.5 km apart at lat 40 — Δlon_wrapped
    // 0.15°); 3 is a same-side neighbor of 1; 4 is far. Flat
    // floor(lon/cellDeg) bucketing puts 1 and 2 in distant cells and
    // silently drops the pair — the ring must find it exactly once.
    val pts = Seq(
      (1L, 40.0, 179.93), (2L, 40.0, -179.96), (3L, 40.0, 179.80),
      (4L, 40.0, 178.0)
    ).toDF("id", "lat", "lon")
    val r = GeoJoin.withinDistance(pts, "id", "lat", "lon", 25.0)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(r.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)), r.mkString(", "))
    // brute-force agreement on a cloud seeded AROUND the seam
    val rnd = new scala.util.Random(7)
    val cloud = (10L to 160L).map(i =>
      (i, 40.0 + rnd.nextDouble() * 2,
        ((179.5 + rnd.nextDouble()) + 540.0) % 360.0 - 180.0))
      .toDF("id", "lat", "lon")
    val fast = GeoJoin.withinDistance(cloud, "id", "lat", "lon", 25.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val a = cloud.select(col("id").as("id1"), col("lat").as("lat1"), col("lon").as("lon1"))
    val brute = a.crossJoin(
        cloud.select(col("id").as("id2"), col("lat").as("lat2"), col("lon").as("lon2")))
      .filter(col("id1") < col("id2"))
      .filter(graft.functions.Scalars.haversineKm(
        col("lat1"), col("lon1"), col("lat2"), col("lon2")) <= 25.0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(fast === brute)
    // the seam is actually exercised: some surviving pair straddles ±180°
    val coords = cloud.collect().map(r0 => r0.getLong(0) -> r0.getDouble(2)).toMap
    assert(brute.exists { case (i, j) => coords(i) * coords(j) < 0 })
  }

  test("kNN-within-radius (pairTopKPerDoc over the grid join) equals window ranking") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(23)
    val pts = (1L to 200L).map(i =>
      (i, 40.0 + rnd.nextDouble() * 2, -74.0 + rnd.nextDouble() * 2))
      .toDF("id", "lat", "lon")
    val pairs = GeoJoin.withinDistance(pts, "id", "lat", "lon", 30.0)
    val got = graft.llm.Dedup.pairTopKPerDoc(pairs, "id1", "id2", ord = col("km"), k = 3)
      .select("doc", "n_candidates", "rank", "partner", "ord")
      .as[(Long, Long, Int, Long, Double)].collect().toSet
    // reference: symmetrize + rank by (km, partner) with a plain window —
    // the single-sort form the bounded heap must reproduce exactly
    val sym = pairs.select(col("id1").as("doc"), col("id2").as("partner"), col("km"))
      .union(pairs.select(col("id2").as("doc"), col("id1").as("partner"), col("km")))
    val exp = sym
      .withColumn("n_candidates", count(lit(1)).over(Window.partitionBy("doc")))
      .withColumn("rank",
        row_number().over(Window.partitionBy("doc").orderBy(col("km"), col("partner"))))
      .filter(col("rank") <= 3)
      .select(col("doc"), col("n_candidates"), col("rank").cast("int"),
        col("partner"), col("km"))
      .as[(Long, Long, Int, Long, Double)].collect().toSet
    assert(exp.nonEmpty)
    assert(got === exp)
  }
}
