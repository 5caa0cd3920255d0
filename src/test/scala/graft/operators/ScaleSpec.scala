package graft.operators

import graft.SparkSpecBase
import graft.io.Sinks
import org.apache.spark.sql.functions._

/** Scale-machinery specs: salted aggregation/join equivalence and the
  * no-exchange co-bucketed join. */
class ScaleSpec extends SparkSpecBase {

  test("saltedAgg equals plain aggregation on a hot-key distribution") {
    val s = spark; import s.implicits._
    val df = (Seq.fill(500)("hot") ++ Seq("a", "b", "c")).toDF("k")
      .repartition(4)
    val plain = df.groupBy("k").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedAgg(df, Seq("k"), 8)(
      _.agg(count(lit(1)).as("c")),
      _.agg(sum("c").as("c")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin equals plain join and replicates the dim") {
    val s = spark; import s.implicits._
    val fact = (Seq.fill(300)(("hot", 1)) ++ Seq(("a", 2), ("b", 3))).toDF("k", "v")
      .repartition(4)
    val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("miss", "M")).toDF("k", "name")
    val plain = fact.join(dim, "k").groupBy("k", "name").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", 8).groupBy("k", "name").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("approx_count_distinct sketch stays within 5% of exact") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
           countDistinct(col("l_partkey")).as("e"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("partition-pruned scan reads only the filtered partition directory") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Seq(("F", 1), ("O", 2), ("P", 3), ("F", 4)).toDF("status", "v")
      .write.partitionBy("status").mode("overwrite").parquet(s"$dir/t")
    val q = s.read.parquet(s"$dir/t").filter(col("status") === "F")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("status"),
      s"expected partition filter in plan:\n$plan")
    assert(q.count() === 2L)
    // files actually touched: only the status=F directory
    val touched = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(touched.forall(_.contains("status=F")), touched.mkString(", "))
  }

  test("co-bucketed tables join without an Exchange") {
    val s = spark; import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "va")
      val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("id", "vb")
      Sinks.writeBucketed(a, "graft_bucketed_a", Seq("id"), 8, Seq("id"))
      Sinks.writeBucketed(b, "graft_bucketed_b", Seq("id"), 8, Seq("id"))
      val joined = s.table("graft_bucketed_a").join(s.table("graft_bucketed_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() === 1000L)
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      s.sql("DROP TABLE IF EXISTS graft_bucketed_b")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    }
  }
}
