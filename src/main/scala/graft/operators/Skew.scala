package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling for the 100 TB tier.
  *
  * AQE's skew-join splitting handles most runtime skew; these helpers cover
  * the cases planners can't fix: a hot GROUP BY key whose partial aggregate
  * still funnels into one reducer, and a shuffle join against a hot key
  * that can't broadcast.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-style aggregates for a key
    * distribution with hot keys. Phase 1 aggregates on (key, salt) —
    * spreading each hot key over `saltBuckets` reducers — phase 2 merges
    * the per-salt partials. Only algebraic aggregates (sum/count/min/max)
    * can be salted this way; the caller provides both phases.
    *
    * saltedAgg(df, Seq("k"), 16)(
    *   phase1 = _.agg(count(lit(1)).as("c")),
    *   phase2 = _.agg(sum("c").as("c")))
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      phase1: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      phase2: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = phase1(salted.groupBy((keys.map(col) :+ col("__salt")): _*))
    phase2(partial.groupBy(keys.map(col): _*))
  }

  /** Salted shuffle join for a skewed fact ⋈ dim when the dim is too big to
    * broadcast: the fact side gets a random salt in [0, buckets), the dim
    * side is replicated `buckets` times, and the join key becomes
    * (key, salt) — each hot key spreads over `buckets` reducers at the cost
    * of a buckets× dim replication (dim ≪ fact by assumption). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val explodedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
