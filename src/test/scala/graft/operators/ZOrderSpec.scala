package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpecBase {

  test("zkey2 interleaves bits exactly (reference interleave on samples)") {
    val s = spark; import s.implicits._
    def refZ(a: Int, b: Int): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | ((a >> i) & 1).toLong << (2 * i) | ((b >> i) & 1).toLong << (2 * i + 1)
      }
    val cases = Seq((0, 0), (1, 0), (0, 1), (0xFFFF, 0xFFFF), (12345, 54321),
      (0xAAAA, 0x5555), (70000, 3)) // 70000 wraps to its low 16 bits
    val got = cases.toDF("a", "b")
      .select(ZOrder.zkey2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val expect = cases.map { case (a, b) => refZ(a & 0xFFFF, b & 0xFFFF) }
    assert(got.toSeq === expect)
  }

  test("cluster: partition z-ranges are disjoint and internally sorted") {
    val s = spark; import s.implicits._
    val df = (1L to 4000L).map(i => (i, (i * 37) % 911, (i * 101) % 577))
      .toDF("id", "a", "b").repartition(17)
    val parts = ZOrder.cluster(df, col("a"), col("b"), numFiles = 8)
      .select(spark_partition_id().as("p"), ZOrder.zkey2(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // within-partition sorted
    parts.groupBy(_._1).values.foreach { rows =>
      val zs = rows.map(_._2)
      assert(zs.zip(zs.tail).forall { case (x, y) => x <= y })
    }
    // across partitions: ranges don't interleave (each file is one tile)
    val ranges = parts.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => (rows.map(_._2).min, rows.map(_._2).max) }
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }
}
