package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Bit-parity pins: the native dot/sq-dist/fold kernels must equal the
  * zip_with/aggregate algebra they replaced EXACTLY (===, not a
  * tolerance) — the hash-green oracles replay that algebra as canonical
  * SQL folds, so any reordering or fused-multiply difference would
  * surface as an oracle mismatch. Inputs include denormal-ish magnitudes
  * and sign mixes so accumulation-order differences cannot hide. */
class DotExprSpec extends SparkSpecBase {

  private def algebraDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def algebraSq(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => (p - q) * (p - q)),
      lit(0.0), (acc, v) => acc + v)

  test("DotProduct ≡ zip_with fold, bit-for-bit, float and double") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val n = 1 + rnd.nextInt(80)
      (i.toLong,
        Seq.fill(n)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat),
        Seq.fill(n)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat))
    }.toDF("id", "a", "b")
    val out = rows.select(
        DotProduct(col("a"), col("b")).as("k"),
        algebraDot(col("a"), col("b")).as("alg"),
        DotProduct(col("a").cast("array<double>"), col("b").cast("array<double>")).as("kd"),
        algebraDot(col("a").cast("array<double>"), col("b").cast("array<double>")).as("algd"),
        DotProduct(col("a"), col("b").cast("array<double>")).as("kfd"),
        algebraDot(col("a"), col("b").cast("array<double>")).as("algfd"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(3)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(5)))
    }
  }

  test("DotProduct int variants ≡ the cast-then-multiply fold (ADC inner loop)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      val n = 1 + rnd.nextInt(64)
      (i.toLong,
        Seq.fill(n)(rnd.nextInt(256)),                                    // int codes
        Seq.fill(n)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(5) - 2)),// double weights
        Seq.fill(n)(rnd.nextGaussian().toFloat))                           // float side
    }.toDF("id", "c", "w", "f")
    val out = rows.select(
        DotProduct(col("c"), col("w")).as("id_k"),
        algebraDot(col("c"), col("w")).as("id_alg"),
        DotProduct(col("w"), col("c")).as("di_k"),     // commutativity path
        DotProduct(col("c"), col("f")).as("if_k"),
        algebraDot(col("c"), col("f")).as("if_alg"),
        DotProduct(col("c"), col("c")).as("ii_k"),
        algebraDot(col("c"), col("c")).as("ii_alg"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(0)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(4)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(5)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(6)))
    }
  }

  test("SqDist / FoldSum ≡ their folds; null contracts match the algebra") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      val n = 1 + rnd.nextInt(64)
      (i.toLong, Seq.fill(n)(rnd.nextGaussian() * 100), Seq.fill(n)(rnd.nextGaussian() * 100))
    }.toDF("id", "a", "b")
    val out = rows.select(
        SqDist(col("a"), col("b")).as("k"),
        algebraSq(col("a"), col("b")).as("alg"),
        FoldSum(array_sort(col("a"))).as("fk"),
        aggregate(array_sort(col("a")), lit(0.0), (acc, v) => acc + v).as("falg"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
             java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
    // AgreeCount ≡ the when-equal fold, including the padded/mismatch
    // slots that fold to 0 (never null)
    val sig = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(40)
      (Seq.fill(n)(rnd.nextInt(4).toLong), Seq.fill(n)(rnd.nextInt(4).toLong))
    }.toDF("x", "y")
    sig.select(AgreeCount(col("x"), col("y")).as("k"),
        aggregate(zip_with(col("x"), col("y"), (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).as("alg"))
      .collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
    val mism = Seq((Seq(1L, 2L, 3L), Seq(1L, 9L))).toDF("x", "y")
      .select(AgreeCount(col("x"), col("y")),
        aggregate(zip_with(col("x"), col("y"), (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v)).head()
    assert(mism.getInt(0) === 1 && mism.getInt(1) === 1)

    // length mismatch and null element → NULL, exactly like the algebra;
    // empty arrays → the fold's 0.0 init
    val edge = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),
      (Some(Seq(1.0, 2.0)), None),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))
    ).toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("d"),
        SqDist(col("a"), col("b")).as("q")).collect()
    assert(edge(0).isNullAt(0) && edge(0).isNullAt(1))
    assert(edge(1).isNullAt(0) && edge(1).isNullAt(1))
    assert(edge(2).getDouble(0) === 0.0 && edge(2).getDouble(1) === 0.0)
  }
}
