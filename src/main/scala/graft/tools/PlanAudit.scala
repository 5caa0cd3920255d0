package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints physical-plan summaries for headline queries: exchange counts,
  * join strategies, scan pushdown — the things that decide whether a plan
  * survives a 100x scale-up. Run: runMain graft.tools.PlanAudit [sfDir]. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("p1_quality_filter", "j1_company_dim_join", "j3_snowflake_join",
      "w1_jump_segments", "a8_density_build", "w6_path_interp", "a1_search_frequency",
      "dd1_exact_dedup", "sim1_cosine_scores", "st1_daily_counts")
    for (name <- interesting) {
      val plan = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toSeq
      def count(p: String) = lines.count(_.contains(p))
      println(s"== $name")
      println(s"   exchanges=${count("Exchange")} broadcastJoins=${count("BroadcastHashJoin")}" +
        s" smjJoins=${count("SortMergeJoin")} wscg=${count("WholeStageCodegen")}")
      lines.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(4).foreach(l => println("   " + l.trim.take(160)))
    }
    spark.stop()
  }
}
