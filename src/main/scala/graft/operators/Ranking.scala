package graft.operators

import graft.Ckpt._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL ranking without the single-reducer window.
  *
  * `row_number() OVER (ORDER BY ...)` with no partition key moves the
  * whole table through one task — the classic scale cliff (Spark even
  * logs "No Partition Defined ... serious performance degradation").
  * The scalable shape is two-level: range-partition on the sort key (the
  * same machinery a global SORT uses — parallel), rank locally inside
  * each range partition, then shift each partition by the total count of
  * all partitions before it. The per-partition counts are one row each;
  * they collapse into a single broadcast row and the offset is a literal
  * array fold — so the whole operator is one range exchange plus a
  * map-side join, identical in result to the global window at any scale.
  * (Same two-level idiom as TextAnalysis.packByTokenBudget /
  * corpusShuffle, generalized to an arbitrary sort order.)
  *
  * Sort columns must form a total order (include a unique tiebreak key)
  * or ranks within a tie are partition-layout-dependent.
  */
object Ranking {

  /** Appends `out` = 1-based global row number in the order of
    * `sortCols`. */
  def globalRowNumber(df: DataFrame, out: String, sortCols: Column*): DataFrame =
    rankedWithTotal(df, out, sortCols: _*).drop("__total")

  /** [[globalRowNumber]] plus a `__total` row-count column derived from
    * the same per-partition counts fold — so callers needing N (NTILE)
    * don't pay a second full pass over the ranked plan just to count. */
  private def rankedWithTotal(df: DataFrame, out: String,
                              sortCols: Column*): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // range partitioning keeps partition p's keys entirely below p+1's,
    // so pid order IS key order; local ranks + prefix offsets = global
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    // The ranked frame feeds TWO branches (offset counts + output), and
    // spark_partition_id over a sampled range exchange is only stable
    // within one execution — two independent evaluations can land on
    // different boundaries, leaving offsets that don't match the local
    // ranks (observed: ranks beyond N). Exact global ranking is
    // inherently two-pass; the eager checkpoint IS the pass-1
    // materialization (the staged-table write of the classic
    // count-then-offset implementation), pinning both data and pids.
    val local = ranged.withColumn("__lrn", row_number().over(w)).ckpt()
    val counts = local.groupBy(col("__pid")).agg(max(col("__lrn")).as("__n"))
      .agg(collect_list(struct(col("__pid"), col("__n"))).as("__counts"))
    local.crossJoin(broadcast(counts))
      .withColumn("__offset",
        aggregate(filter(col("__counts"), c => c("__pid") < col("__pid")),
          lit(0L), (acc, c) => acc + c("__n")))
      .withColumn(out, col("__offset") + col("__lrn"))
      .withColumn("__total",
        aggregate(col("__counts"), lit(0L), (acc, c) => acc + c("__n")))
      .drop("__pid", "__lrn", "__counts", "__offset")
  }

  /** Appends `out` = NTILE(buckets), bit-identical to the SQL NTILE
    * definition: with N rows and k buckets, the first N mod k buckets
    * hold ⌈N/k⌉ rows and the rest ⌊N/k⌋ — computed directly from the
    * global rank, so it inherits [[globalRowNumber]]'s no-single-reducer
    * plan (the naive `ntile() OVER (ORDER BY ...)` funnels the table
    * through one task exactly like the global row_number). */
  def globalNtile(df: DataFrame, out: String, buckets: Int,
                  sortCols: Column*): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    // N rides along as __total from the rank pass's own counts fold — a
    // separate count() here would re-execute the whole ranked plan
    val ranked = rankedWithTotal(df, "__rank", sortCols: _*)
    val q = floor(col("__total") / buckets).cast("long") // small-bucket size
    val m = col("__total") % buckets                     // # of large buckets
    val cut = m * (q + 1) // ranks up to here fall in the large buckets
    ranked
      .withColumn(out,
        (when(col("__rank") <= cut, floor((col("__rank") - 1) / (q + 1)))
          .otherwise(m + floor((col("__rank") - cut - 1) / q)) + 1).cast("int"))
      .drop("__rank", "__total")
  }
}
