package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpecBase {

  private val w = 16
  private val maskBits = 5

  private def chunksOf(texts: Seq[String]): Seq[Seq[(Int, Int, Long)]] = {
    val s = spark; import s.implicits._
    texts.toDF("text")
      .select(CdcChunks(col("text"), w, maskBits).as("c"))
      .collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq).toSeq
  }

  test("chunks partition the text exactly: contiguous, full-cover, len >= 1") {
    val texts = Seq(
      "a" * 5,                       // shorter than the window
      "the quick brown fox jumps over the lazy dog " * 20,
      scala.util.Random.javaRandomToRandom(new java.util.Random(7))
        .alphanumeric.take(500).mkString,
      "x")
    chunksOf(texts).zip(texts).foreach { case (cs, t) =>
      assert(cs.nonEmpty)
      assert(cs.head._1 == 1)
      cs.sliding(2).foreach {
        case Seq((s1, l1, _), (s2, _, _)) => assert(s2 == s1 + l1)
        case _ =>
      }
      assert(cs.map(_._2).sum == t.length)
      assert(cs.forall(_._2 >= 1))
    }
  }

  test("empty text yields no chunks; null stays null") {
    val s = spark; import s.implicits._
    val r = Seq(Some(""), None).toDF("text")
      .select(CdcChunks(col("text"), w, maskBits).as("c")).collect()
    assert(r(0).getSeq[Any](0).isEmpty)
    assert(r(1).isNullAt(0))
  }

  test("boundaries re-synchronize after a prefix edit (the CDC property)") {
    val body = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
      .alphanumeric.take(800).mkString
    val Seq(c1, c2) = chunksOf(Seq("PREFIX-INSERTED-" + body, body))
    // after the edit region, both docs must share a long common chunk tail
    val h1 = c1.map(_._3).toSet
    val shared = c2.map(_._3).count(h1.contains)
    assert(shared >= c2.size / 2,
      s"expected most of ${c2.size} chunks shared, got $shared")
  }

  test("identical texts produce identical chunk hash sequences") {
    val t = "shared content " * 30
    val Seq(a, b) = chunksOf(Seq(t, t))
    assert(a == b)
  }

  test("cdcIncremental: re-fetched doc scores full reuse, novel doc zero") {
    val s = spark; import s.implicits._
    val body = "the quick brown fox jumps over the lazy dog " * 20
    val docs = Seq(
      (1L, body, false),                            // corpus
      (2L, "completely different content here " * 20, false),
      (10L, body, true),                            // exact re-fetch
      (11L, "brand new never seen text " * 20, true)
    ).toDF("doc_id", "text", "nu")
    val r = graft.llm.Dedup.cdcIncremental(docs, "doc_id", "text", col("nu"))
      .collect().map(x => x.getLong(0) -> x.getDouble(5)).toMap
    assert(r(10L) === 1.0) // every chunk already in the corpus store
    assert(r(11L) === 0.0) // nothing reusable
    assert(r.size === 2)   // corpus docs are not scored
  }

  test("boundary rule matches the md5-28 window algebra (SQL replay)") {
    val s = spark; import s.implicits._
    val text = "the quick brown fox jumps over the lazy dog " * 10
    // replay the boundary predicate in SQL over every window position
    Seq(text).toDF("t").createOrReplaceTempView("cdc_t")
    val expected = spark.sql(
      s"""SELECT filter(sequence($w, length(t)),
         |  i -> conv(substring(md5(substring(t, i - ${w - 1}, $w)), 1, 7), 16, 10) % ${1L << maskBits} = 0) AS b
         |FROM cdc_t""".stripMargin)
      .collect()(0).getSeq[Int](0)
    val got = chunksOf(Seq(text)).head
    // kernel boundary positions = chunk ends except the forced final one
    val ends = got.map(c => c._1 + c._2 - 1)
    val hashEnds = ends.filter(_ != text.length) ++
      (if (expected.contains(text.length)) Seq(text.length) else Nil)
    assert(hashEnds.sorted == expected.sorted)
  }
}
