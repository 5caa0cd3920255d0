package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-side operators (SURVEY.md §2.1: S2, S8, S9, S10, S12).
  *
  * The reference's per-entity pickle cache (GetWeta.py:253-337) becomes a
  * Parquet staging layer with incremental anti-join loads; its JSON map files
  * (GetWeta.py:811-831, dwwApi.js:51-58) become schema-validated JSON reads.
  */
object Sources {

  /** S2 — incremental load: rows of `incoming` whose `id` is NOT yet staged.
    * The anti-join only shuffles ids; at scale, staged ids are a compact
    * column read (Parquet column pruning keeps this to one column). */
  def incrementalLoad(incoming: DataFrame, staged: DataFrame, id: String): DataFrame =
    incoming.join(staged.select(col(id)), Seq(id), "left_anti")

  /** S8 — header CSV source. */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S9 — JSON map-file source with maptype validation (GetWeta.py:811-831):
    * the reference rejects a map file whose `maptype` field differs from the
    * expected kind. Fails fast at read time, like the reference. */
  def mapFile(spark: SparkSession, path: String, expectedMaptype: String): DataFrame = {
    val df = spark.read.option("multiLine", "true").json(path)
    // column presence FIRST (a file without the field must hit the require,
    // not an AnalysisException), and a null-safe comparison so a NULL
    // maptype row is rejected too.
    require(df.columns.contains("maptype"),
      s"map file $path has no maptype field (expected maptype=$expectedMaptype)")
    val bad = df.filter(!(col("maptype") <=> lit(expectedMaptype))).limit(1).count()
    require(bad == 0, s"map file $path is not of maptype=$expectedMaptype")
    df
  }

  /** S9b — the reference map-file JSON shape has DYNAMIC keys
    * (`{"maptype": "...", "maps": {"<raw search>": {"name":..,"id":..}}}`,
    * companyMap.json). Spark infers `maps` as one wide struct; re-parse it
    * as a real map and explode to (search, name, id) dim rows. */
  def mapFileEntries(spark: SparkSession, path: String, expectedMaptype: String): DataFrame = {
    val df = mapFile(spark, path, expectedMaptype)
    df.select(from_json(to_json(col("maps")),
        org.apache.spark.sql.types.DataType.fromDDL("map<string, struct<name:string, id:string>>")
          .asInstanceOf[org.apache.spark.sql.types.MapType]).as("m"))
      .select(explode(col("m")).as(Seq("search", "v")))
      .select(col("search"), col("v.name").as("name"), col("v.id").as("id"))
  }

  /** S10 — JSON→CSV flattening projection (utils/jsonToCsv.py:16-33):
    * select scalar fields out of nested rows; caller writes with Sinks.csv. */
  def flatten(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => col(c).as(c.replace(".", "_"))): _*)

  /** S12 — plain JSON document source (receiveData.js:3-15). */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
}
