package graft.functions

import graft.SparkSpecBase
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Pins the fused native kernels to the Column compositions they replace:
  * same values, no allocation-heavy intermediate arrays. */
class MinHashExprSpec extends SparkSpecBase {

  private lazy val docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // case-dup of 1
      (3L, "ab"),                                          // shorter than k
      (4L, ""),                                            // empty
      (5L, "aaaaaaaaaa")                                   // one distinct shingle
    ).toDF("id", "text")
  }

  test("ShingleHashes equals the array_distinct(transform(xxhash64)) composition") {
    val k = 5
    val fused = docs.select(col("id"),
      array_sort(ShingleHashes(lower(col("text")), k)).as("sh"))
    val composed = docs.select(col("id"),
      array_sort(array_distinct(transform(
        Dedup.shingles(col("text"), k), s => xxhash64(s)))).as("sh"))
    val f = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f === c)
    assert(f(5L).size === 1, "repeated shingles dedup to one hash")
    assert(f(3L).size === 1, "short text yields its single window")
  }

  test("MinHashText signature: dedup-insensitive, case-normalized, stable") {
    val sig = docs.select(col("id"), MinHashText(lower(col("text")), 5, 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig.values.forall(_.size === 16))
    assert(sig(1L) === sig(2L), "lowercased dup must share the signature")
    assert(sig(1L) !== sig(3L))
    // estimated Jaccard of identical docs is 1.0 by construction
    assert(sig(1L).zip(sig(2L)).count { case (a, b) => a == b } === 16)
  }

  test("MinHashText agrees with the array-input MinHashSignature family head") {
    // the h=0 member of both families is plain xxhash64(shingle, seed 42)
    // minima, so the fused text form must match the array form there
    val viaArray = docs.select(col("id"),
      element_at(MinHashSignature(Dedup.shingles(col("text"), 5), 16), 1).as("m0"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaText = docs.select(col("id"),
      element_at(MinHashText(lower(col("text")), 5, 16), 1).as("m0"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaArray === viaText)
  }

  test("PortableMinHashFromHashes equals the per-seed array_min(transform) algebra") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 40L).map { id =>
      val n = rnd.nextInt(50) // 0..49 elements — includes the empty array
      (id, Seq.fill(n)(rnd.nextLong(1L << 28)))
    }
    val df = rows.toDF("id", "h")
    val numHashes = 32
    val composed = df.select(col("id"), array((0 until numHashes).map { i =>
      val (a, b) = MinHashKernel.portableCoef(i)
      array_min(transform(col("h"), x => (x * a + b) % MinHashKernel.PORTABLE_P))
    }: _*).as("sig"))
    val fused = df.select(col("id"),
      PortableMinHashFromHashes(col("h"), numHashes).as("sig"))
    val c = composed.collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val f = fused.collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(f === c)
    // the empty-array rows must yield all-null entries, like array_min
    val empties = rows.filter(_._2.isEmpty).map(_._1)
    assert(empties.forall(id => f(id).forall(_ == null)))
    assert(rows.exists(_._2.nonEmpty))
  }

  test("PortableMinHash equals the md5-hex Column algebra, unicode included") {
    val s = spark; import s.implicits._
    val k = 5
    val cases = docs.select(col("id"), col("text"))
      .union(Seq(
        (6L, "naïve café — résumé ☃ über"),   // multi-byte codepoints
        (7L, "ÅÄÖ ÅÄÖ åäö mixed CASE"),
        (8L, "a"), (9L, "exactly5")
      ).toDF("id", "text"))
    // the Column algebra PortableMinHash replaces (the DuckDB-portable
    // definition): per-shingle md5 hex prefix → conv → k-universal minima
    val hs = transform(Dedup.shingles(col("text"), k),
      sh => conv(substring(md5(sh), 1, 7), 16, 10).cast("long"))
    val composedCols = (0 until 8).map { i =>
      val a = (2L * i + 3) * 12582917L % 268435399L
      val b = (i + 1) * 15485863L % 268435399L
      array_min(transform(hs, h => (h * a + b) % 268435399L)).as(s"m$i")
    }
    val composed = cases.select((col("id") +: composedCols): _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    val fused = cases.select(col("id"), PortableMinHash(col("text"), k, 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    assert(fused === composed)
  }

  test("PortableShingleHashes equals the distinct md5-hex window algebra") {
    val s = spark; import s.implicits._
    val k = 5
    val cases = docs.select(col("id"), col("text"))
      .union(Seq(
        (6L, "naïve café — résumé ☃ über"), // multi-byte codepoints
        (7L, "aaaaaaaa"),                   // duplicate windows collapse
        (8L, "a"), (9L, "exactly5")         // shorter-than-k clamps
      ).toDF("id", "text"))
    val composed = cases.select(col("id"),
        sort_array(array_distinct(transform(Dedup.shingles(col("text"), k),
          sh => conv(substring(md5(sh), 1, 7), 16, 10).cast("long")))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    val fused = cases.select(col("id"), PortableShingleHashes(col("text"), k).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    assert(fused === composed)
  }

  test("PortableSimHash equals the md5-hex vote-aggregate algebra") {
    val s = spark; import s.implicits._
    val cases = docs.select(col("id"), col("text"))
      .union(Seq(
        (6L, "naïve café — résumé ☃ über"),
        (7L, "double  space   runs keep empty tokens"),
        (8L, "one")
      ).toDF("id", "text"))
    // the Column algebra PortableSimHash replaces
    val tokens = cases
      .select(col("id"), explode(split(lower(col("text")), " ")).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val summed = tokens.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val fpCol = (0 until 60).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val composed = summed.select(col("id"), fpCol.as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = cases.select(col("id"), PortableSimHash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused === composed)
  }
}
