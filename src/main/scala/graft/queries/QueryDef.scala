package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: the Spark implementation + (when SQL-expressible)
  * an equivalent DuckDB oracle. Column names MUST match between the two —
  * the driver sorts columns by name and hashes values. Every query orders by
  * a deterministic unique key so output order can't flake the hash.
  *
  * `oracleFn` is the DATA-DEPENDENT oracle variant: SQL whose text embeds
  * literals derived from a deterministic model fit at the given scale
  * directory (e.g. emb2 pins the sign-canonicalized PCA eigenvectors so
  * DuckDB can replay the projection arithmetic — the eigensolver itself
  * is not SQL-expressible, but it IS a deterministic pure function of the
  * data, so the pinned literals are reproducible). Verify evaluates these
  * against its sfDir and merges them into oracle_sql.json alongside the
  * static oracles. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleFn: Option[(SparkSession, String) => String] = None)

object QueryDef {
  /** Pseudo-coordinates used by the geo operators: the testdata has no
    * lat/lon columns, so both the Spark side and the DuckDB oracle derive
    * deterministic integer coordinates from keys with IDENTICAL arithmetic. */
  def latFromKeySql(k: String): String = s"(($k) % 120) - 60"
  def lonFromKeySql(k: String): String = s"((($k) * 7) % 360) - 180"

  /** Longitude wraparound difference SQL mirroring Scalars.lonDiff exactly
    * (pathCreator.js:178-199). */
  def lonDiffSql(l1: String, l2: String): String = {
    val fw = s"(CASE WHEN ($l1) > 0 THEN ($l1) - 180 ELSE ($l1) + 180 END)"
    s"""(CASE
       |  WHEN (($l2) >= least(($l1), $fw) AND ($l2) <= greatest(($l1), $fw))
       |    OR (($l1) >= 0 AND ($l2) >= 0 AND ($l1) <= 180 AND ($l2) <= 180)
       |    OR (($l1) <= 0 AND ($l2) <= 0 AND ($l1) >= -180 AND ($l2) >= -180)
       |  THEN ($l2) - ($l1)
       |  ELSE (CASE WHEN ($l1) >= 0 THEN 1 ELSE -1 END)
       |       * (abs(180 - greatest(($l1), ($l2))) + abs(-180 - least(($l1), ($l2))))
       |END)""".stripMargin
  }

  /** Haversine SQL mirroring Scalars.haversineKm exactly (locUtils.js:2-16):
    * a = sin(dLat/2)^2 + cos(lat1)cos(lat2)sin(dLon/2)^2; km = 6371*2*atan2(√a,√(1-a)). */
  def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val a = s"pow(sin(radians(($lat2) - ($lat1)) / 2), 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians(($lon2) - ($lon1)) / 2), 2)"
    s"6371 * 2 * atan2(sqrt($a), sqrt(1 - ($a)))"
  }
}
