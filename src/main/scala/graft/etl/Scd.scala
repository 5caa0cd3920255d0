package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder.
  *
  * The reference versions its curation dims by snapshotting the whole map
  * file with a timestamp on every edit (`dwwRoutes.js:131-172`,
  * `map_backups/<name>_<epoch>.json` — 23 snapshots in the repo). SCD2 is
  * the warehouse-native form of that history: one row per (key, value)
  * EPISODE with a validity interval, built from the change events.
  *
  * The build is the W2 consecutive-dedup pattern (dwwApi.js:100-107)
  * followed by a lead(): both windows share one hash partition by key and
  * one local sort — a single shuffle at any scale, no self-join against
  * the snapshot history. */
object Scd {

  /** Collapse a change-event stream into SCD2 intervals.
    * `orderCols` must make the per-key order total (the same determinism
    * contract as the jump engine); `valid_to` is NULL on the current row. */
  def scd2(events: DataFrame, key: String, value: String,
           orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols.map(col): _*)
    // the previous VALUE rides inside a struct so "no previous row"
    // (struct NULL) is distinguishable from "previous value was NULL",
    // and the comparison is null-safe (<=>): a NULL episode (deletion)
    // is kept as its own interval and consecutive NULLs collapse, where
    // a bare lag(value) =!= value silently dropped the NULL episode and
    // re-opened after it
    val changes = events
      .withColumn("__prev", lag(struct(col(value).as("v")), 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev.v") <=> col(value)))
    val wc = Window.partitionBy(key).orderBy(orderCols.map(col): _*)
    changes
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(wc))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev")
  }
}
