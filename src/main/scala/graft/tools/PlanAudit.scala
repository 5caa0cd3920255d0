package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit over the whole registry: executes each query at the given
  * scale factor (so AQE finalizes) and reports the shapes that decide
  * whether a plan survives a 100x scale-up — exchange count, join
  * strategies, whole-stage-codegen spans, scan pushdown. With `--md` it
  * emits the PLANS.md artifact.
  *
  * Run: runMain graft.tools.PlanAudit [sfDir] [--md]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.filterNot(_.startsWith("--")).headOption.getOrElse("/root/testdata/sf0.001")
    val md = args.contains("--md")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (md) {
      println("# PLANS - physical-plan audit (finalized AQE plans, " + sfDir + ")")
      println()
      println("Exchanges = shuffles (broadcast exchanges excluded); BHJ/SMJ = join strategies;")
      println("WSCG = whole-stage-codegen spans; pushdown = parquet PushedFilters non-empty.")
      println()
      println("| query | exchanges | BHJ | SMJ | BNLJ | WSCG | pushdown |")
      println("|---|---|---|---|---|---|---|")
    }
    for (q <- graft.SparkEntry.all) {
      try {
        val df = q.fn(spark, sfDir)
        df.collect() // finalize adaptive plan
        // AQE's toString prints Current + Initial plans; audit the final one
        val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
        val lines = plan.linesIterator.toSeq
        def count(p: String) = lines.count(_.contains(p))
        val wscg = lines.count(_.matches(""".*\*\(\d+\).*"""))
        val shuffles = count("Exchange") - count("BroadcastExchange")
        val pushed = lines.exists(l => l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
        if (md)
          println(s"| ${q.name} | $shuffles | ${count("BroadcastHashJoin")} | " +
            s"${count("SortMergeJoin")} | ${count("BroadcastNestedLoopJoin")} | " +
            s"$wscg | ${if (pushed) "yes" else "-"} |")
        else
          println(f"${q.name}%-28s shuffles=$shuffles bhj=${count("BroadcastHashJoin")} " +
            f"smj=${count("SortMergeJoin")} wscg=$wscg pushdown=$pushed")
      } catch {
        case e: Throwable => println(s"| ${q.name} | audit failed: ${e.getMessage.take(60)} |")
      }
    }
    spark.stop()
  }
}
