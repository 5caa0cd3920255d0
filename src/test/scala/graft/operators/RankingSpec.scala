package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpecBase {

  test("globalRowNumber equals the single-window row_number on shuffled data") {
    val s = spark; import s.implicits._
    // keys deliberately collide so the custkey tiebreak is load-bearing
    val df = (1L to 1500L).map(i => (i, (i * 7919) % 97)).toDF("id", "key")
      .repartition(13)
    val got = Ranking.globalRowNumber(df, "rank", col("key"), col("id"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = df.withColumn("rank",
        row_number().over(Window.orderBy(col("key"), col("id"))).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("globalNtile equals SQL NTILE including uneven remainders") {
    val s = spark; import s.implicits._
    for ((n, k) <- Seq((10, 4), (7, 4), (1500, 5), (11, 3), (3, 5))) {
      val df = (1L to n.toLong).map(i => (i, (i * 31) % 17)).toDF("id", "key")
      val got = Ranking.globalNtile(df, "b", k, col("key"), col("id"))
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expect = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("key"), col("id"))))
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === expect, s"n=$n k=$k")
    }
  }
}
