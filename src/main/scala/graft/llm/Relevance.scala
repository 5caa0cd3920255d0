package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus relevance / statistical-LM operators for a training-data
  * pipeline: vocabulary building, BM25 keyword relevance, and an n-gram
  * language-model quality score (the declarative form of CCNet-style
  * perplexity filtering — Wenzek et al. 2020 gate web text on the
  * perplexity of a KenLM n-gram model; here the model is a bigram table
  * with additive smoothing, trained and applied as two Spark jobs).
  *
  * Everything is hash-aggregation + equi-join shaped: at 100 TB the only
  * shuffles are (a) token/gram count aggregations with map-side partial
  * combine and (b) the doc-gram ⋈ model equi-join, which broadcasts when
  * the model is small and hash-partitions on the gram otherwise. No
  * all-pairs stage, no global sort, no driver-side state.
  */
object Relevance {

  private def toks(text: Column): Column = split(lower(text), "\\s+")

  /** Vocabulary build: per-term corpus frequency + document frequency.
    * One explode, one hash aggregation (map-side combine keeps the shuffle
    * at distinct-term granularity, not token granularity). `minDf` prunes
    * the hapax tail — at web scale the term table is dominated by typos
    * and noise that no downstream consumer wants. */
  def vocabulary(df: DataFrame, id: String, text: String, minDf: Int = 1): DataFrame =
    df.select(col(id).as("__id"), explode(toks(col(text))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("__id")).as("df"))
      .filter(col("df") >= minDf)

  /** BM25 relevance of every document against a bag of query terms
    * (Robertson/Okapi): idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)), summed over terms in a fixed
    * order. Per-term tf comes from counting the token array in place (no
    * explode — the query bag is tiny), and the corpus stats (N, avgdl,
    * per-term df) are ONE aggregate row broadcast back, so the whole
    * scorer is a single scan at any corpus size.
    *
    * Output floats are rounded to 4dp; every sub-expression is written so
    * an independent engine evaluating the same tree (see `bm25OracleSql`)
    * reproduces the doubles bit-for-bit up to libm ulps, which the
    * rounding absorbs. */
  /** Zipf power-law fit over the token frequency distribution: OLS slope
    * of ln(freq) ~ ln(rank) for the top-N terms. Natural corpora sit near
    * slope −1; a corpus that drifts far off is boilerplate-heavy (too
    * flat) or template-dominated (too steep) — a one-row corpus-health
    * gauge next to cur5's stats.
    *
    * Scale shape: the count aggregate map-side combines; the top-N cutoff
    * is TakeOrderedAndProject (k rows per partition to the merge), and the
    * rank window runs over N ≤ a few hundred rows AFTER the cutoff — the
    * partition-less window is bounded by the constant N, never by corpus
    * size. The regression itself is one aggregate row. */
  def zipfFit(df: DataFrame, text: String, topN: Int = 200): DataFrame = {
    val ranked = df.select(explode(toks(col(text))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("term")).limit(topN)
      .withColumn("rank", row_number().over(
        // Spark 4 folds the constant partition key away, so the
        // no-partition WindowExec warning still fires — deliberately
        // accepted: the window runs AFTER .limit(topN), so its input is
        // ≤ topN rows (pinned in RelevanceSpec), never corpus-sized
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1)).orderBy(desc("cnt"), asc("term"))))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    ranked.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_terms"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("slope"),
        round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("n"), 4)
          .as("intercept"))
  }

  /** DuckDB twin of [[zipfFit]] — identical rank tiebreak, ln() folds, and
    * OLS algebra; 4dp rounding absorbs summation order. */
  def zipfOracleSql(table: String, text: String, topN: Int = 200): String =
    s"""WITH counts AS (
       |  SELECT term, count(*) AS cnt
       |  FROM (SELECT unnest(string_split_regex(lower($text), '\\s+')) AS term
       |        FROM $table)
       |  GROUP BY term ORDER BY cnt DESC, term LIMIT $topN),
       |ranked AS (
       |  SELECT ln((row_number() OVER (ORDER BY cnt DESC, term))::DOUBLE) AS x,
       |         ln(cnt::DOUBLE) AS y
       |  FROM counts),
       |s AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
       |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM ranked)
       |SELECT n AS n_terms,
       |       round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS slope,
       |       round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 4) AS intercept
       |FROM s""".stripMargin

  /** DSIR-style importance score (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document
    * log-likelihood ratio between a TARGET distribution (docs matching
    * `isTarget`) and the RAW corpus distribution, under additively-smoothed
    * unigram models. Documents scoring > 0 look more like the target than
    * like the average of the corpus — the standard gate for steering a web
    * crawl toward a curated domain.
    *
    * Scale shape: two vocabulary-sized count aggregates (map-side
    * combined) build the log-ratio table, which is broadcast; each doc
    * then needs one (doc, term, count) aggregate and one broadcast join —
    * counts aggregate BEFORE the float fold (the ts8/ts11 pattern), so
    * only (doc, term) rows shuffle and 4dp rounding holds cross-engine. */
  def importanceScore(df: DataFrame, id: String, text: String,
                      isTarget: Column): DataFrame = {
    val toksOf = df.select(col(id).as("__id"), isTarget.as("__t"),
      explode(toks(col(text))).as("term"))
    val rawCounts = toksOf.groupBy("term").agg(count(lit(1)).as("cr"))
    val targetCounts = toksOf.filter(col("__t")).groupBy("term")
      .agg(count(lit(1)).as("ct"))
    // smoothing constants: V = corpus vocabulary, n = token totals
    val stats = rawCounts.agg(sum("cr").as("nr"), count(lit(1)).as("v"))
      .crossJoin(toksOf.filter(col("__t")).agg(count(lit(1)).as("nt")))
    val ratio = rawCounts
      .join(targetCounts, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .select(col("term"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("nt") + col("v"))) -
          log((col("cr") + 1).cast("double") / (col("nr") + col("v")))).as("lr"))
    toksOf.groupBy(col("__id"), col("term")).agg(count(lit(1)).as("c"))
      .join(broadcast(ratio), "term")
      .groupBy(col("__id"))
      .agg(sum("c").as("n_tokens"), round(sum(col("c") * col("lr")), 4).as("score"))
      .select(col("__id").as(id), col("n_tokens"), col("score"),
        (col("score") > 0).as("accept"))
  }

  /** DuckDB twin of [[importanceScore]] — identical smoothing, ln folds
    * over pre-aggregated counts, 4dp round. */
  def importanceOracleSql(table: String, id: String, text: String,
                          targetPredicate: String): String =
    s"""WITH tk AS MATERIALIZED (
       |  SELECT $id AS id, ($targetPredicate) AS t,
       |         unnest(string_split_regex(lower($text), '\\s+')) AS term
       |  FROM $table),
       |raw AS MATERIALIZED (SELECT term, count(*) AS cr FROM tk GROUP BY 1),
       |tgt AS (SELECT term, count(*) AS ct FROM tk WHERE t GROUP BY 1),
       |st AS (SELECT (SELECT sum(cr) FROM raw) AS nr, (SELECT count(*) FROM raw) AS v,
       |              (SELECT count(*) FROM tk WHERE t) AS nt),
       |ratio AS (
       |  SELECT r.term,
       |         ln((COALESCE(g.ct, 0) + 1)::DOUBLE / (st.nt + st.v)) -
       |         ln((r.cr + 1)::DOUBLE / (st.nr + st.v)) AS lr
       |  FROM raw r LEFT JOIN tgt g USING (term) CROSS JOIN st),
       |dc AS (SELECT id, term, count(*) AS c FROM tk GROUP BY 1, 2)
       |SELECT dc.id AS $id, sum(dc.c)::BIGINT AS n_tokens,
       |       round(sum(dc.c * ratio.lr), 4) AS score,
       |       round(sum(dc.c * ratio.lr), 4) > 0 AS accept
       |FROM dc JOIN ratio USING (term)
       |GROUP BY dc.id ORDER BY $id""".stripMargin

  def bm25(df: DataFrame, id: String, text: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tk = toks(col(text))
    val withTf = terms.zipWithIndex.foldLeft(
      df.withColumn("dl", size(tk))) { case (acc, (t, i)) =>
      acc.withColumn(s"__tf_$i", size(filter(tk, x => x === lit(t))))
    }
    val dfCols = avg(col("dl")).as("__avgdl") +: terms.indices.map(i =>
      sum(when(col(s"__tf_$i") > 0, 1).otherwise(0)).cast("double").as(s"__df_$i"))
    val stats = withTf.agg(count(lit(1)).cast("double").as("__n"), dfCols: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val contribs: Seq[Column] = terms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val idf = log(lit(1.0) + (col("__n") - col(s"__df_$i") + 0.5) / (col(s"__df_$i") + 0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("dl").cast("double") / col("__avgdl")))
    }
    // fixed left-to-right fold so the float sum order is deterministic
    val score = contribs.reduceLeft(_ + _)
    scored.select(col(id), col("dl"), round(score, 4).as("bm25"))
  }

  /** DuckDB twin of `bm25` — the same expression tree over the same
    * doubles (k1/b/k1+1 injected via Double.toString, which round-trips). */
  def bm25OracleSql(table: String, id: String, text: String, terms: Seq[String],
                    k1: Double = 1.2, b: Double = 0.75): String = {
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(tk, x -> x = '$t')) AS tf_$i"
    }.mkString(",\n         ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_$i").mkString(", ")
    val k1p1 = (k1 + 1.0).toString
    val contribs = terms.indices.map { i =>
      s"""ln(1.0 + (s.n - s.df_$i + 0.5) / (s.df_$i + 0.5))
         | * (d.tf_$i::DOUBLE * $k1p1)
         | / (d.tf_$i::DOUBLE + $k1 * (1.0 - $b + $b * d.dl::DOUBLE / s.avgdl))"""
        .stripMargin.replace("\n", "")
    }
    val score = contribs.reduceLeft((a, c) => s"($a) + ($c)")
    s"""WITH tok AS (
       |  SELECT $id, string_split_regex(lower($text), '\\s+') AS tk FROM $table),
       |d AS (
       |  SELECT $id, len(tk)::INT AS dl,
       |         $tfs
       |  FROM tok),
       |s AS (
       |  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl, $dfs FROM d)
       |SELECT d.$id, d.dl, round($score, 4) AS bm25
       |FROM d CROSS JOIN s
       |ORDER BY d.$id""".stripMargin
  }

  /** TF-IDF keyword extraction: the top-k terms per document by
    * tf·ln(N/df). Term counts and doc frequencies are two hash
    * aggregations off one explode; N is a single broadcast row; ranking is
    * a per-doc window (documents are small, so the partitions are bounded
    * by doc length — no skew path needed). Scores are ROUNDED to 6dp
    * BEFORE ranking: tf/df are integers so both engines compute identical
    * doubles up to libm ulps, and ranking on the rounded value with a term
    * tiebreak keeps the order engine-independent. */
  def tfidfKeywords(df: DataFrame, id: String, text: String, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(id), explode(toks(col(text))).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfs = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    val scored = terms.join(dfs, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf").cast("double") * log(col("__n") / col("df")), 6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(id)).orderBy(desc("tfidf"), asc("term"))))
      .filter(col("rank") <= topK)
      .select(col(id), col("rank"), col("term"), col("tfidf"))
  }

  /** Co-occurrence PMI (the word2vec/GloVe statistic): for token pairs
    * within a forward window of `maxDist`, ln(p(a,b) / (p(a)·p(b))) with
    * p from corpus counts. Pairs come from offset generators (tok[i],
    * tok[i+d]) — LINEAR in tokens × maxDist, never a positions self-join
    * (which is quadratic per doc). Three hash aggregations + one equi-join
    * of pair counts to the broadcast unigram table; `minCount` bounds the
    * output to statistically meaningful pairs. PMI is a log of exact
    * integer ratios → identical doubles on any engine at 6dp. */
  def cooccurrencePmi(df: DataFrame, text: String,
                      maxDist: Int = 2, minCount: Int = 5): DataFrame = {
    val tk = toks(col(text))
    val pairs = (1 to maxDist).map { d =>
      df.withColumn("__tk", tk)
        .withColumn("__i",
          explode(when(size(col("__tk")) > d,
            sequence(lit(1), size(col("__tk")) - d)).otherwise(array())))
        .select(element_at(col("__tk"), col("__i")).as("w1"),
          element_at(col("__tk"), col("__i") + d).as("w2"))
    }.reduce(_ union _)
    val pc = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uni = df.select(explode(tk).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val totals = pairs.agg(count(lit(1)).cast("double").as("__t"))
      .crossJoin(uni.agg(sum(col("cw")).cast("double").as("__u")))
    pc.join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"),
        round(log((col("c12").cast("double") / col("__t")) /
          ((col("c1").cast("double") / col("__u")) *
           (col("c2").cast("double") / col("__u")))), 6).as("pmi"))
  }

  /** DuckDB twin of `cooccurrencePmi`. */
  def cooccurrencePmiOracleSql(table: String, text: String,
                               maxDist: Int = 2, minCount: Int = 5): String = {
    val offsets = (1 to maxDist).map { d =>
      s"""SELECT tk[pos] AS w1, tk[pos + $d] AS w2
         |  FROM (SELECT tk, unnest(generate_series(1, len(tk) - $d)) AS pos
         |        FROM tok WHERE len(tk) > $d)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH tok AS (
       |  SELECT string_split_regex(lower($text), '\\s+') AS tk FROM $table),
       |pairs AS (
       |$offsets),
       |pc AS (
       |  SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2
       |  HAVING count(*) >= $minCount),
       |uni AS (
       |  SELECT w, count(*) AS cw
       |  FROM (SELECT unnest(tk) AS w FROM tok) u GROUP BY w),
       |tot AS (
       |  SELECT (SELECT count(*)::DOUBLE FROM pairs) AS t,
       |         (SELECT sum(cw)::DOUBLE FROM uni) AS u)
       |SELECT pc.w1, pc.w2, pc.c12,
       |       round(ln((pc.c12::DOUBLE / tot.t) /
       |                ((a.cw::DOUBLE / tot.u) * (b.cw::DOUBLE / tot.u))), 6) AS pmi
       |FROM pc
       |JOIN uni a ON pc.w1 = a.w
       |JOIN uni b ON pc.w2 = b.w
       |CROSS JOIN tot
       |ORDER BY w1, w2""".stripMargin
  }

  /** Bigram LM counts from a training slice: c(w1,w2), c(w1), and the
    * vocabulary size V — the model a perplexity gate scores against. */
  def bigramModel(train: DataFrame, text: String): (DataFrame, DataFrame) = {
    val pairs = bigrams(train, text)
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val uni = train.select(explode(toks(col(text))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    (big, uni)
  }

  /** (docRow, w1, w2) pairs — empty for docs under two tokens (guarded:
    * Spark's sequence(1, 0) would count DOWN, not produce empty). */
  private def bigrams(df: DataFrame, text: String): DataFrame = {
    val tk = toks(col(text))
    df.withColumn("__tk", tk)
      .withColumn("__i",
        explode(when(size(col("__tk")) >= 2,
          sequence(lit(1), size(col("__tk")) - 1)).otherwise(array())))
      .withColumn("w1", element_at(col("__tk"), col("__i")))
      .withColumn("w2", element_at(col("__tk"), col("__i") + 1))
      .drop("__tk", "__i")
  }

  /** Per-document negative mean log-likelihood (nats/bigram) under an
    * additively-smoothed bigram LM trained on `train` — low = fluent
    * in-domain text, high = noise; the CCNet gate keeps the low tail.
    *
    * logp(w1,w2) = ln((c(w1,w2)+α) / (c(w1)+α·V)). Per-(doc, bigram)
    * counts aggregate FIRST (integers), then the float fold is
    * Σ c·logp / Σ c — the ts8 shape whose 4dp rounding absorbs summation
    * ulps. The model join is an equi-join on (w1, w2) with the unigram
    * side on w1; both broadcast when the model fits, shuffle-join
    * otherwise — never a cross product. Docs with no bigram are dropped
    * (no evidence to score). */
  def bigramNll(score: DataFrame, train: DataFrame, id: String, text: String,
                alpha: Double = 0.5): DataFrame = {
    val (big, uni) = bigramModel(train, text)
    val v = uni.agg(count(lit(1)).cast("double").as("__v"))
    val docGrams = bigrams(score, text)
      .groupBy(col(id), col("w1"), col("w2")).agg(count(lit(1)).as("ci"))
    val logp = docGrams
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("__logp",
        log((coalesce(col("c2"), lit(0L)).cast("double") + alpha) /
            (coalesce(col("c1"), lit(0L)).cast("double") + lit(alpha) * col("__v"))))
    logp.groupBy(col(id))
      .agg(sum(col("ci")).as("n_bigrams"),
        round(-sum(col("ci").cast("double") * col("__logp")) / sum(col("ci")), 4)
          .as("nll"))
  }

  /** DuckDB twin of `bigramNll` with the train/score split expressed as a
    * predicate on the id column. */
  def bigramNllOracleSql(table: String, id: String, text: String,
                         trainPred: String, alpha: Double = 0.5): String =
    s"""WITH tok AS (
       |  SELECT $id, string_split_regex(lower($text), '\\s+') AS tk FROM $table),
       |pairs AS (
       |  SELECT $id, tk[pos] AS w1, tk[pos + 1] AS w2
       |  FROM (SELECT $id, tk,
       |          unnest(generate_series(1, len(tk) - 1)) AS pos
       |        FROM tok WHERE len(tk) >= 2)),
       |big AS (
       |  SELECT w1, w2, count(*) AS c2 FROM pairs WHERE $trainPred GROUP BY w1, w2),
       |uni AS (
       |  SELECT w1, count(*) AS c1
       |  FROM (SELECT $id, unnest(tk) AS w1 FROM tok) u WHERE $trainPred GROUP BY w1),
       |v AS (SELECT count(*)::DOUBLE AS v FROM uni),
       |dg AS (
       |  SELECT $id, w1, w2, count(*) AS ci FROM pairs
       |  WHERE NOT ($trainPred) GROUP BY $id, w1, w2),
       |lp AS (
       |  SELECT dg.$id, dg.ci,
       |         ln((coalesce(big.c2, 0)::DOUBLE + $alpha) /
       |            (coalesce(uni.c1, 0)::DOUBLE + $alpha * v.v)) AS logp
       |  FROM dg
       |  LEFT JOIN big ON dg.w1 = big.w1 AND dg.w2 = big.w2
       |  LEFT JOIN uni ON dg.w1 = uni.w1
       |  CROSS JOIN v)
       |SELECT $id, sum(ci)::BIGINT AS n_bigrams,
       |       round(-sum(ci::DOUBLE * logp) / sum(ci), 4) AS nll
       |FROM lp GROUP BY $id ORDER BY $id""".stripMargin
}
