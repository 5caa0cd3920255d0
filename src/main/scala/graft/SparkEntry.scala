package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.analytics.Jumps
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * additions) is registered here; SQL-expressible ones carry a DuckDB oracle
  * with IDENTICAL column names and a deterministic ORDER BY on both sides.
  */
object SparkEntry {

  val all: Seq[QueryDef] =
    RelationalQueries.defs ++ WindowQueries.defs ++ ScalarQueries.defs ++
      LlmQueries.defs ++ PipelineQueries.defs ++ GraphQueries.defs ++
      AnalyticsQueries.defs

  /** Flagship: the §3.2 jumps acceptance slice — quality filter → person
    * window dedup → grouped jump totals with a broadcast region echo. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val K = Jumps.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus")
    val jumps = Jumps.jumpsOnly(orders.filter(col("o_totalprice") > 0), K)
    jumps
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderstatus"))
      .agg(count(lit(1)).as("jumps"), countDistinct(col("o_custkey")).as("people"))
      .orderBy("n_name", "o_orderstatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Data-dependent oracles (see [[graft.queries.QueryDef.oracleFn]]):
    * SQL text built against a specific scale directory, e.g. with pinned
    * model literals from a deterministic fit. Merged into
    * oracle_sql.json by Verify; `only` restricts evaluation to the
    * queries actually run (targeted local iteration skips the fits). */
  def dynamicOracleSql(spark: SparkSession, sfDir: String,
                       only: Set[String] = Set.empty): Map[String, String] =
    all.filter(q => only.isEmpty || only.contains(q.name))
      .flatMap(q => q.oracleFn.map(f => q.name -> f(spark, sfDir))).toMap
}
