package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins SetSizes to size(array_intersect) / size(array_union) on both
  * element types, including duplicate elements, null elements, empty
  * arrays, and null arrays. */
class SetSizesSpec extends SparkSpecBase {

  test("SetSizes equals builtin intersect/union sizes on long arrays") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map { i =>
      def arr() = Seq.fill(rnd.nextInt(12))(rnd.nextInt(8).toLong)
      (i, if (i % 29 == 0) null else arr(), if (i % 31 == 0) null else arr())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), SetSizes(col("a"), col("b")).as("s"))
      .select(col("id"), col("s.inter"), col("s.union")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else (r.getInt(1), r.getInt(2)))).toMap
    val want = df.select(col("id"),
        size(array_intersect(col("a"), col("b"))).as("i"),
        size(array_union(col("a"), col("b"))).as("u")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else (r.getInt(1), r.getInt(2)))).toMap
    assert(got === want)
  }

  test("SetSizes equals builtin intersect/union sizes on string arrays with dups and nulls") {
    val s = spark; import s.implicits._
    val words = Vector("a", "bb", "ccc", "bb", null, "dd")
    val rnd = new scala.util.Random(17)
    val rows = (1 to 300).map { i =>
      def arr() = Seq.fill(rnd.nextInt(10))(words(rnd.nextInt(words.size)))
      (i, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), SetSizes(col("a"), col("b")).as("s"))
      .select(col("id"), col("s.inter"), col("s.union")).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2))).toMap
    val want = df.select(col("id"),
        size(array_intersect(col("a"), col("b"))).as("i"),
        size(array_union(col("a"), col("b"))).as("u")).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got === want)
  }
}
