package graft.llm

import graft.SparkSpecBase

class BpeSpec extends SparkSpecBase {

  /** Hand-checkable corpus: words aa (freq 2), ab (freq 1).
    * Pairs: (a,a)=2, (a,b)=1 → merge 1 = (a,a). Then only (a,b)=1
    * remains → merge 2 = (a,b). Then no pairs — training exhausts. */
  private lazy val tiny = {
    val s = spark; import s.implicits._
    Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
  }

  test("learnMerges picks weighted pairs in order and stops when exhausted") {
    val m = Bpe.learnMerges(tiny, "text", nMerges = 5)
    assert(m.map(x => (x.rank, x.a, x.b, x.merged, x.cnt)) ===
      Seq((1, "a", "a", "aa", 2L), (2, "a", "b", "ab", 1L)))
  }

  test("greedy fold is left-to-right non-overlapping and remerges the product") {
    val s = spark; import s.implicits._
    // aaa: (a,a) merges positions 1-2 only → [aa, a]; a second (a,a)
    // round can't touch [aa, a]. aaaa → [aa, aa].
    val docs = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, "text", nMerges = 2)
    assert(m.head.merged === "aa")
    // round 2 sees [aa,a] and [aa,aa]: pairs (aa,a)=1, (aa,aa)=1 →
    // lexicographic tiebreak picks (aa,a) → "aaa"
    assert(m(1) === Bpe.Merge(2, "aa", "a", "aaa", 1L))
  }

  test("encode compresses: n_words <= n_tokens <= word chars; joins every doc") {
    val docs = {
      val s = spark; import s.implicits._
      Seq((1L, "low lower lowest"), (2L, "low low newest"), (3L, "widest")).toDF("doc_id", "text")
    }
    val merges = Bpe.learnMerges(docs, "text", nMerges = 6)
    assert(merges.nonEmpty && merges.size <= 6)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    assert(enc.map(_.getLong(0)) === Array(1L, 2L, 3L))
    val byId = enc.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(1L)._1 === 3L && byId(2L)._1 === 3L && byId(3L)._1 === 1L)
    // tokens bounded below by words (>=1 token/word) and above by chars
    assert(byId(1L)._2 >= 3L && byId(1L)._2 <= 16L)
    assert(byId(3L)._2 >= 1L && byId(3L)._2 <= 6L)
    // with enough merges the top word collapses toward one token:
    // "low" (freq 3) must be a single token after 6 merges
    val vocabToks = Bpe.encode(
      { val s = spark; import s.implicits._; Seq((9L, "low")).toDF("doc_id", "text") },
      "doc_id", "text", merges).collect().head.getLong(2)
    assert(vocabToks === 1L)
  }

  test("vocabulary: token counts conserve total corpus tokens") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 5)
    val v = Bpe.vocabulary(docs, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // after (a,a) and (a,b): words are [aa] x2 and [ab] -> vocab {aa: 2, ab: 1}
    assert(v === Map("aa" -> 2L, "ab" -> 1L))
    // untrained vocabulary is the raw character counts
    val raw = Bpe.vocabulary(docs, "text", Nil)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(raw === Map("a" -> 5L, "b" -> 1L))
  }

  test("merge counts are weighted by word frequency, not document count") {
    val s = spark; import s.implicits._
    // "xy" appears 5 times in one doc, "zz" once each in two docs:
    // (x,y)=5 beats (z,z)=2
    val docs = Seq((1L, "xy xy xy xy xy"), (2L, "zz"), (3L, "zz")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, "text", nMerges = 1)
    assert(m.head === Bpe.Merge(1, "x", "y", "xy", 5L))
  }
  test("learnMergesLocal is bit-identical to the distributed per-rank loop") {
    // the real testdata corpus (31-word vocab -> early exhaustion is part
    // of the contract): EVERY merge must agree, including the stop point
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = Bpe.learnMerges(docs, "text", nMerges = 12)
    val local = Bpe.learnMergesLocal(docs, "text", nMerges = 12)
    assert(local === dist)
    // overlap + tie corpus: the fold/tie-break edge cases
    val s = spark; import s.implicits._
    val tricky = Seq((1L, "aaa aaaa ab ba"), (2L, "abab baba aa")).toDF("doc_id", "text")
    assert(Bpe.learnMergesLocal(tricky, "text", 20) ===
      Bpe.learnMerges(tricky, "text", 20))
  }

  test("learnMergesLocal: early exhaustion and vocab/encode compatibility") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val m = Bpe.learnMergesLocal(docs, "text", nMerges = 1000)
    assert(m.map(x => (x.rank, x.a, x.b, x.merged, x.cnt)) ===
      Seq((1, "a", "a", "aa", 2L), (2, "a", "b", "ab", 1L)))
    // the local merges drive encode/vocabulary exactly like distributed ones
    val enc = Bpe.encode(docs, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc(1L) === ((2L, 2L))) // "aa","ab" both single tokens
    assert(enc(2L) === ((1L, 1L)))
  }

  test("encodeFrozen kernel is bit-identical to the expression-fold encode") {
    def pin(docs: org.apache.spark.sql.DataFrame, k: Int): Unit = {
      val m = Bpe.learnMergesLocal(docs, "text", nMerges = k)
      val expr = Bpe.encode(docs, "doc_id", "text", m).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val kern = Bpe.encodeFrozen(docs, "doc_id", "text", m).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(kern === expr)
      assert(expr.nonEmpty)
    }
    // the real corpus at the expression path's home size (k = 8)...
    pin(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), 8)
    // ...and the overlap/tie corpus where greedy-fold order matters
    val s = spark; import s.implicits._
    pin(Seq((1L, "aaa aaaa ab ba"), (2L, "abab baba aa")).toDF("doc_id", "text"), 20)
  }
}
