package graft.llm

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpecBase {

  private lazy val docs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, "spark shuffles data across the cluster"),
      (1L, "spark spark spark tuning guide"),
      (2L, "the cat sat on the mat"),
      (3L, "hash joins beat sort merge joins here"),
      (4L, "one")
    ).toDF("doc_id", "text")
  }

  test("vocabulary: tf counts occurrences, df counts docs, minDf prunes") {
    val v = Relevance.vocabulary(docs, "doc_id", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("spark") === (4L, 2L))   // 1 in doc0 + 3 in doc1; 2 docs
    assert(v("the") === (3L, 2L))     // 1 in doc0 + 2 in doc2
    assert(v("joins") === (2L, 1L))   // twice in one doc
    val pruned = Relevance.vocabulary(docs, "doc_id", "text", minDf = 2)
      .collect().map(_.getString(0)).toSet
    assert(pruned === Set("spark", "the"))
  }

  test("bm25: zero without query terms, rises with tf, saturates below linear") {
    val scored = Relevance.bm25(docs, "doc_id", "text", Seq("spark")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(2L) === 0.0 && scored(3L) === 0.0 && scored(4L) === 0.0)
    assert(scored(0L) > 0.0)
    // tf=3 beats tf=1 but sublinearly (the k1 saturation)
    assert(scored(1L) > scored(0L))
    assert(scored(1L) < 3 * scored(0L))
  }

  test("bm25: rarer term contributes more than a common one at equal tf") {
    val s = spark; import s.implicits._
    val corpus = (0L to 9L).map { i =>
      (i, if (i == 0) "rare common filler words here" else "common filler words again here")
    }.toDF("doc_id", "text")
    val both = Relevance.bm25(corpus, "doc_id", "text", Seq("rare", "common"))
      .filter(col("doc_id") === 0L).head.getDouble(2)
    val commonOnly = Relevance.bm25(corpus, "doc_id", "text", Seq("common"))
      .filter(col("doc_id") === 0L).head.getDouble(2)
    // doc 0 holds both terms once; the rare term's idf dominates
    assert(both - commonOnly > commonOnly)
  }

  test("bigram NLL: in-domain text scores lower than unseen text; train excluded") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (10L, "the model reads the data and the model writes the data"),
      (20L, "the model reads the data again and again"),
      (1L, "the model reads the data"),             // all bigrams seen in training
      (2L, "zebra quantum volcano whispers jazz"),  // no bigram seen
      (3L, "word")                                  // under two tokens → no output
    ).toDF("doc_id", "text")
    val out = Relevance.bigramNll(
        corpus.filter(col("doc_id") < 10), corpus.filter(col("doc_id") >= 10),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet === Set(1L, 2L)) // train docs and the 1-token doc absent
    assert(out(1L) < out(2L))
    assert(out(2L) > 0.0)
  }

  test("temperature mixing: alpha=1 keeps everything; alpha=0 equalizes to n_min") {
    val s = spark; import s.implicits._
    val corpus = (0L until 300L).map { i =>
      (i, if (i < 200) "big" else if (i < 280) "mid" else "small")
    }.toDF("doc_id", "source")
    val all = TextAnalysis.temperatureMixture(corpus, "doc_id", "source", alpha = 1.0)
    assert(all.count() === 300)
    assert(all.agg(min("accept_rate")).head.getDouble(0) === 1.0)

    val eq = TextAnalysis.temperatureMixture(corpus, "doc_id", "source", alpha = 0.0)
    val rates = eq.select("source", "accept_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") === 1.0)
    assert(math.abs(rates("big") - 0.1) < 1e-6)     // 20/200
    assert(math.abs(rates("mid") - 0.25) < 1e-6)    // 20/80
    // smallest source survives intact; determinism: same run twice, same rows
    assert(eq.filter(col("source") === "small").count() === 20)
    val ids1 = eq.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = TextAnalysis.temperatureMixture(corpus, "doc_id", "source", alpha = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1 === ids2)
  }

  test("tfidf keywords: corpus-wide terms score zero, doc-specific terms rank first") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (0L, "common common alpha beta"),
      (1L, "common gamma gamma gamma"),
      (2L, "common delta epsilon zeta")
    ).toDF("doc_id", "text")
    val rows = Relevance.tfidfKeywords(corpus, "doc_id", "text", topK = 2).collect()
    val kw = rows.map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val score = rows.map(r => r.getString(2) -> r.getDouble(3)).toMap
    // 'common' appears in every doc → idf = ln(1) = 0: it can only fill a
    // rank when the doc has fewer positive-score terms than topK
    assert(score("common") === 0.0)
    assert(kw((1L, 1)) === "gamma")              // tf 3 × idf ln(3)
    assert(kw((1L, 2)) === "common")             // only 2 distinct terms in doc 1
    assert(kw((0L, 1)) === "alpha")              // tie tf=1: term asc breaks
    assert(kw((0L, 2)) === "beta")
  }

  test("cooccurrence PMI: planted always-adjacent pair scores high and positive") {
    val s = spark; import s.implicits._
    val corpus = (0L until 20L).map { i =>
      (i, s"left right filler$i noise${i % 3} left right")
    }.toDF("doc_id", "text")
    val pmi = Relevance.cooccurrencePmi(corpus, "text", maxDist = 2, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // "left right" co-occurs every time both appear → strongly positive
    assert(pmi(("left", "right")) > 0.0)
    // "right left" (distance 2 wrap through filler) occurs too but less often
    pmi.get(("right", "left")).foreach(v => assert(v < pmi(("left", "right"))))
  }

  test("incremental near-dup: planted batch dup flagged with its corpus twin, " +
       "fresh content unflagged") {
    val s = spark; import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the cat watches"
    val corpus = Seq(
      (10L, base),
      (11L, "totally different corpus content about distributed query engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),                                                  // exact dup of 10
      (2L, base.replace("lazy", "sleepy")),                        // near dup of 10
      (3L, "fresh unseen material mentioning volcanoes and jazz music only")
    ).toDF("doc_id", "text")
    val flagged = Dedup.incrementalNeardup(batch, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged(1L) === 10L)
    assert(flagged.get(2L).forall(_ === 10L)) // near dup may or may not band-collide
    assert(!flagged.contains(3L))
  }

  test("semantic dedup: dropped docs have a genuine >=threshold lower-id neighbor; " +
       "recall vs exact pairs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val threshold = 0.4
    val survivors = Dedup.semanticDedup(emb, "vec_id", "embedding", threshold, nCells = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val n = emb.count()
    assert(survivors.size < n) // the corpus has planted near-dups above 0.4

    // exact pair set (i < j, cosine >= threshold) via brute force
    val a = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val exact = a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("sim", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("sim") >= threshold)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty)

    // precision: every dropped id has SOME exact >=threshold neighbor
    val dropped = (0L until n).filterNot(survivors.contains)
    val inPair = exact.flatMap(p => Seq(p._1, p._2)).toSet
    dropped.foreach(d => assert(inPair.contains(d), s"dropped $d has no exact neighbor"))

    // recall: most exact pairs land in one cell and get caught
    val caught = exact.count(p => !survivors.contains(p._2) || !survivors.contains(p._1))
    assert(caught.toDouble / exact.length >= 0.5,
      s"recall ${caught.toDouble / exact.length} below 0.5")
  }
}
