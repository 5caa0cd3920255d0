package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.analytics.EventAnalytics
import graft.llm.Pca

/** Product-analytics operators over the event stream (funnel, retention,
  * EWMA, semi-structured extraction), corpus heavy hitters, and embedding
  * second-moment statistics + PCA. All single-scan / single-shuffle
  * designs — see the scaladoc on analytics/EventAnalytics.scala and
  * llm/Pca.scala.
  */
object AnalyticsQueries {

  /** One d²-row covariance frame serves emb1, emb4 AND the PCA fit —
    * memoized per (session, dataDir) so the corpus outer-product scan
    * runs once; each query stays standalone-correct (a memo hit only
    * changes where the frame comes from, never its rows). */
  private def covMemo(s: org.apache.spark.sql.SparkSession, d: String) =
    QueryMemo.frame(s, d, "emb_covariance")(
      Pca.covariance(Tables.embeddings(s, d), "embedding"))

  /** One PCA model (covariance scan + driver Jacobi) serves emb2 and emb3
    * — memoized per (session, dataDir); deterministic, so a memo hit
    * cannot change either query's output. Rides the shared covariance
    * memo (the fit rounds entries to 7dp, so the model is identical with
    * or without the memo). */
  private def pcaModel(s: org.apache.spark.sql.SparkSession, d: String): Pca.Model =
    QueryMemo.value(s, d, "pca_model")(
      Pca.fit(Tables.embeddings(s, d), "embedding", Some(covMemo(s, d))))

  val defs: Seq[QueryDef] = Seq(

    // ---- ev1: JSON property extraction (get_json_object inside codegen,
    // parse + aggregate in one stage) ----
    QueryDef("ev1_json_props",
      (s, d) => EventAnalytics.propsStats(Tables.events(s, d))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |       sum(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
             |       min(json_extract(props, '$.k')::INT) AS min_k,
             |       max(json_extract(props, '$.k')::INT) AS max_k,
             |       round(avg(json_extract(props, '$.k')::INT), 4) AS avg_k,
             |       count(DISTINCT json_extract(props, '$.k')::INT) AS distinct_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- ev2: ordered funnel (view → click-after-view →
    // purchase-after-click); three stacked window mins over ONE user
    // partition = one shuffle ----
    QueryDef("ev2_funnel",
      (s, d) => EventAnalytics.funnel(Tables.events(s, d)),
      Some("""WITH s1 AS (
             |  SELECT user_id, ts, event_type,
             |         min(CASE WHEN event_type = 'view' THEN ts END)
             |           OVER (PARTITION BY user_id) AS tv
             |  FROM events),
             |s2 AS (
             |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
             |              OVER (PARTITION BY user_id) AS tc
             |  FROM s1),
             |s3 AS (
             |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
             |              OVER (PARTITION BY user_id) AS tp
             |  FROM s2),
             |u AS (SELECT user_id, max(tv) AS tv, max(tc) AS tc, max(tp) AS tp
             |      FROM s3 GROUP BY 1)
             |SELECT count(*) AS users, count(tv) AS users_view,
             |       count(tc) AS users_click, count(tp) AS users_purchase
             |FROM u""".stripMargin)),

    // ---- ev7: engagement concentration — Gini of per-user event counts
    // + the top-10% users' event share (the power-user curve's headline
    // numbers); rank via the two-level global row number, never a
    // single-reducer window ----
    QueryDef("ev7_engagement_gini",
      (s, d) => EventAnalytics.engagementConcentration(Tables.events(s, d)),
      Some("""WITH cnts AS (SELECT user_id, count(*)::BIGINT AS cnt
             |              FROM events GROUP BY 1),
             |ranked AS (SELECT cnt,
             |             row_number() OVER (ORDER BY cnt, user_id) AS i
             |           FROM cnts),
             |st AS (SELECT count(*)::BIGINT AS n, sum(cnt)::BIGINT AS tot,
             |              sum(i::DOUBLE * cnt) AS iw
             |       FROM ranked)
             |SELECT st.n AS n_users, st.tot AS total_events,
             |       round(2.0 * st.iw / (st.n::DOUBLE * st.tot) - (st.n + 1.0) / st.n, 6) AS gini,
             |       round((SELECT COALESCE(sum(cnt), 0) FROM ranked, st
             |              WHERE i > st.n - ceil(st.n / 10.0))::DOUBLE / st.tot, 6) AS top10_share
             |FROM st""".stripMargin)),

    // ---- ev9: behavioral paths — the most common 3-step event-type
    // sequences across user journeys (the product-analytics "path
    // analysis" view); two lag()s over ONE user partition = one shuffle,
    // then a trigram count; tiebreak fully ordered so the top-20 head is
    // deterministic ----
    QueryDef("ev9_event_trigrams",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("e1", lag(col("event_type"), 2).over(w))
          .withColumn("e2", lag(col("event_type"), 1).over(w))
          .filter(col("e1").isNotNull)
          .groupBy(col("e1"), col("e2"), col("event_type").as("e3"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("e1"), asc("e2"), asc("e3"))
          .limit(20)
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |         lag(event_type, 2) OVER w AS e1,
             |         lag(event_type, 1) OVER w AS e2
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT e1, e2, event_type AS e3, count(*) AS cnt
             |FROM seq WHERE e1 IS NOT NULL
             |GROUP BY 1, 2, 3
             |ORDER BY cnt DESC, e1, e2, e3 LIMIT 20""".stripMargin)),

    // ---- ev3: cohort retention (first-activity day → day-offset distinct
    // users); cohort via window min, no self-join ----
    QueryDef("ev3_retention",
      (s, d) => EventAnalytics.retention(Tables.events(s, d))
        .orderBy("cohort", "offset_days"),
      Some("""WITH e AS (
             |  SELECT user_id, ts::DATE AS d,
             |         min(ts::DATE) OVER (PARTITION BY user_id) AS cohort
             |  FROM events)
             |SELECT cohort, datediff('day', cohort, d) AS offset_days,
             |       count(DISTINCT user_id) AS users
             |FROM e GROUP BY 1, 2 ORDER BY cohort, offset_days""".stripMargin)),

    // ---- ev4: EWMA-smoothed daily counts per type (α = 0.2) via the
    // scaled-cumsum closed form — one cumulative window, no recursion ----
    QueryDef("ev4_ewma",
      (s, d) => EventAnalytics.dailyEwma(Tables.events(s, d), alpha = 0.2)
        .orderBy("event_type", "day"),
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*)::DOUBLE AS x
             |  FROM events GROUP BY 1, 2),
             |idx AS (
             |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS t
             |  FROM daily),
             |scaled AS (
             |  SELECT *, x * pow(1.25, t) AS u FROM idx),
             |cums AS (
             |  SELECT *, sum(u) OVER w AS cu, first_value(u) OVER w AS u0
             |  FROM scaled
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day
             |               ROWS UNBOUNDED PRECEDING))
             |SELECT event_type, day, x::BIGINT AS cnt,
             |       round(pow(0.8, t) * (0.2 * (cu - u0) + u0), 4) AS ewma
             |FROM cums ORDER BY event_type, day""".stripMargin)),

    // ---- ts14: corpus heavy hitters — global top-25 tokens. Spark plans
    // TakeOrderedAndProject: per-partition partial top-k after the
    // map-side-combined count, only k rows per partition reach the driver
    // merge — the right heavy-hitter plan at any corpus size ----
    QueryDef("ts14_heavy_hitters",
      (s, d) => Tables.documents(s, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("term"))
        .limit(25),
      Some("""SELECT term, count(*) AS cnt
             |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS term
             |      FROM documents)
             |GROUP BY term ORDER BY cnt DESC, term LIMIT 25""".stripMargin)),

    // ---- ev5: daily-volume anomaly detection (z-score vs the trailing
    // 7-day baseline, current day excluded from its own baseline) ----
    QueryDef("ev5_anomaly",
      (s, d) => EventAnalytics.dailyAnomalies(Tables.events(s, d))
        .orderBy("event_type", "day"),
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*)::DOUBLE AS x
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT *, avg(x) OVER w AS mu, stddev_samp(x) OVER w AS sd
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day
             |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, day, x::BIGINT AS cnt, round(mu, 4) AS mu,
             |       CASE WHEN sd > 0 THEN round((x - mu) / sd, 4) END AS z,
             |       COALESCE(sd > 0 AND abs((x - mu) / sd) > 2.0, false) AS anomaly
             |FROM stats ORDER BY event_type, day""".stripMargin)),

    // ---- st8: the anomaly flagger in its streaming form — the SAME
    // stateful fold (flatMapGroupsWithState over a bounded per-type ring)
    // run on the batch daily counts and oracle-checked against the ev5
    // window SQL; AnomalySpec proves stream≡batch across micro-batches ----
    QueryDef("st8_streaming_anomaly",
      (s, d) => graft.streaming.AnomalyStream.flag(s,
          graft.streaming.AnomalyStream.dailyCounts(Tables.events(s, d)))
        .toDF()
        .orderBy("event_type", "day"),
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*)::DOUBLE AS x
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT *, avg(x) OVER w AS mu, stddev_samp(x) OVER w AS sd
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day
             |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, day, x::BIGINT AS cnt, round(mu, 4) AS mu,
             |       CASE WHEN sd > 0 THEN round((x - mu) / sd, 4) END AS z,
             |       COALESCE(sd > 0 AND abs((x - mu) / sd) > 2.0, false) AS anomaly
             |FROM stats ORDER BY event_type, day""".stripMargin)),

    // ---- st9: streaming EWMA — the textbook recursion as one double of
    // state per type; the batch run of the stateful code path is
    // oracle-checked against ev4's CLOSED-FORM window SQL, proving
    // recursion ≡ scaled-cumsum across engines at 4dp ----
    QueryDef("st9_streaming_ewma",
      (s, d) => graft.streaming.AnomalyStream.ewma(s,
          graft.streaming.AnomalyStream.dailyCounts(Tables.events(s, d)), alpha = 0.2)
        .toDF()
        .orderBy("event_type", "day"),
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*)::DOUBLE AS x
             |  FROM events GROUP BY 1, 2),
             |idx AS (
             |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS t
             |  FROM daily),
             |scaled AS (
             |  SELECT *, x * pow(1.25, t) AS u FROM idx),
             |cums AS (
             |  SELECT *, sum(u) OVER w AS cu, first_value(u) OVER w AS u0
             |  FROM scaled
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day
             |               ROWS UNBOUNDED PRECEDING))
             |SELECT event_type, day, x::BIGINT AS cnt,
             |       round(pow(0.8, t) * (0.2 * (cu - u0) + u0), 4) AS ewma
             |FROM cums ORDER BY event_type, day""".stripMargin)),

    // ---- dd12: semantic decontamination — dd7's benchmark screen on
    // embeddings: cosine vs a broadcast benchmark set, max per doc. The
    // benchmark slice is FIXED-size (vec_id < 2000 caps it at sf0.1's 80
    // vectors — a benchmark suite is constant reference data, it does
    // not grow with the training corpus): inactive at every driver SF,
    // and it pins the growth sweep to the engine's real cost, linear
    // corpus × constant benchmark (VERDICT r14 item 4). ----
    QueryDef("dd12_semantic_decontamination",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val isBench = col("vec_id") % 25 === 0 && col("vec_id") < 2000
        graft.llm.Dedup.semanticContamination(
            emb.filter(!isBench), "vec_id", "embedding",
            emb.filter(isBench), "embedding", threshold = 0.5)
          .orderBy("vec_id")
      },
      Some("""WITH bench AS (SELECT embedding AS bvec FROM embeddings
             |               WHERE vec_id % 25 = 0 AND vec_id < 2000),
             |corpus AS (SELECT vec_id, embedding FROM embeddings
             |           WHERE NOT (vec_id % 25 = 0 AND vec_id < 2000)),
             |m AS (
             |  SELECT c.vec_id,
             |         max(list_cosine_similarity(c.embedding::DOUBLE[], b.bvec::DOUBLE[])) AS ms
             |  FROM corpus c CROSS JOIN bench b GROUP BY 1)
             |SELECT vec_id, round(ms, 4) AS max_benchmark_sim, ms >= 0.5 AS contaminated
             |FROM m ORDER BY vec_id""".stripMargin)),

    // ---- scd2: dimension change history as validity intervals — the
    // warehouse form of the reference's timestamped map_backups
    // (dwwRoutes.js:131-172). W2 consecutive-dedup + lead(), ONE shuffle ----
    QueryDef("scd2_dim_history",
      (s, d) => graft.etl.Scd.scd2(
          Tables.orders(s, d).select(
            col("o_custkey"), col("o_orderstatus"),
            col("o_orderdate"), col("o_orderkey")),
          key = "o_custkey", value = "o_orderstatus",
          orderCols = Seq("o_orderdate", "o_orderkey"))
        .select(col("o_custkey"), col("o_orderstatus"),
          col("valid_from").cast("date").as("valid_from"),
          col("valid_to").cast("date").as("valid_to"), col("is_current"))
        .orderBy("o_custkey", "valid_from", "o_orderstatus"),
      Some("""WITH changes AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             |         lag(o_orderstatus) OVER w AS prev
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |episodes AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
             |  FROM changes WHERE prev IS NULL OR prev <> o_orderstatus)
             |SELECT o_custkey, o_orderstatus,
             |       o_orderdate::DATE AS valid_from,
             |       (lead(o_orderdate) OVER w2)::DATE AS valid_to,
             |       lead(o_orderdate) OVER w2 IS NULL AS is_current
             |FROM episodes
             |WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, valid_from, o_orderstatus""".stripMargin)),

    // ---- cur11: weighted sampling without replacement (Efraimidis–
    // Spirakis A-ES keys on md5 uniforms — deterministic, parallel,
    // TakeOrderedAndProject cutoff); longer docs proportionally more
    // likely, exact without-replacement semantics ----
    QueryDef("cur11_weighted_sample",
      (s, d) => graft.llm.TextAnalysis.weightedSample(
          Tables.documents(s, d), "doc_id", col("n_chars"), k = 100)
        .select("doc_id", "n_chars").orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars FROM (
             |  SELECT doc_id, n_chars,
             |         -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
             |             / 4294967296.0) / n_chars::DOUBLE AS k
             |  FROM documents ORDER BY k, doc_id LIMIT 100)
             |ORDER BY doc_id""".stripMargin)),

    // ---- ev6: exact sliding distinct users (trailing-7d DAU) — the
    // fan-out rewrite that makes sliding DISTINCT a plain hash agg ----
    QueryDef("ev6_sliding_dau",
      (s, d) => EventAnalytics.slidingDistinctUsers(Tables.events(s, d), window = 7)
        .orderBy("day"),
      Some("""WITH a AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
             |f AS (SELECT user_id, d + o::INTEGER AS day
             |      FROM a CROSS JOIN (SELECT unnest(range(0, 7)) AS o))
             |SELECT day, count(DISTINCT user_id) AS users
             |FROM f WHERE day <= (SELECT max(d) FROM a)
             |GROUP BY day ORDER BY day""".stripMargin)),

    // ---- ev8: first/last-touch conversion attribution — one window
    // pass with IGNORE NULLS over a strictly-before frame, never a
    // purchases⋈touches self-join ----
    QueryDef("ev8_attribution",
      (s, d) => EventAnalytics.attribution(Tables.events(s, d))
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, ts,
             |  last_value(CASE WHEN event_type IN ('view','click')
             |                  THEN event_type END IGNORE NULLS) OVER w AS last_touch_type,
             |  last_value(CASE WHEN event_type IN ('view','click')
             |                  THEN ts END IGNORE NULLS) OVER w AS last_touch_ts,
             |  first_value(CASE WHEN event_type IN ('view','click')
             |                   THEN event_type END IGNORE NULLS) OVER w AS first_touch_type,
             |  first_value(CASE WHEN event_type IN ('view','click')
             |                   THEN ts END IGNORE NULLS) OVER w AS first_touch_ts
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |QUALIFY event_type = 'purchase'
             |ORDER BY event_id""".stripMargin)),

    // ---- ts15: Zipf power-law fit (OLS slope of ln freq ~ ln rank over
    // the top-N terms) — a one-row corpus-health gauge ----
    QueryDef("ts15_zipf",
      (s, d) => graft.llm.Relevance.zipfFit(Tables.documents(s, d), "text", topN = 200),
      Some(graft.llm.Relevance.zipfOracleSql("documents", "text", topN = 200))),

    // ---- ts14b: heavy hitters via the DataSketches frequent-items
    // aggregate (approx_top_k). Capacity (64) ≥ corpus vocabulary (31
    // distinct tokens), and the sketch is EXACT whenever its map never
    // evicts — so the oracle is the plain exact count. The small-capacity
    // error-bound behavior is pinned in AnalyticsSpec ----
    QueryDef("ts14b_topk_sketch",
      (s, d) => {
        val sketched = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), "\\s+")).as("term"))
          .agg(expr("approx_top_k(term, 40, 64)").as("tk"))
          .select(explode(col("tk")).as("s"))
        val fields = sketched.select(col("s.*")).columns
        sketched.select(col(s"s.${fields(0)}").as("term"),
            col(s"s.${fields(1)}").cast("long").as("cnt"))
          .orderBy(desc("cnt"), asc("term"))
      },
      Some("""SELECT term, count(*) AS cnt
             |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS term
             |      FROM documents)
             |GROUP BY term ORDER BY cnt DESC, term""".stripMargin)),

    // ---- st7: funnel tracking in its streaming form — the registry runs
    // the batch twin (FunnelStream.stagesBatch); FunnelStreamSpec proves
    // the mapGroupsWithState fold emits identical stages across in-order
    // micro-batches ----
    QueryDef("st7_streaming_funnel",
      (s, d) => graft.streaming.FunnelStream.stagesBatch(Tables.events(s, d))
        .orderBy("user_id"),
      Some("""WITH s1 AS (
             |  SELECT user_id, ts, event_type,
             |         min(CASE WHEN event_type = 'view' THEN ts END)
             |           OVER (PARTITION BY user_id) AS tv
             |  FROM events),
             |s2 AS (
             |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
             |              OVER (PARTITION BY user_id) AS tc
             |  FROM s1),
             |s3 AS (
             |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
             |              OVER (PARTITION BY user_id) AS tp
             |  FROM s2)
             |SELECT user_id,
             |       CASE WHEN max(tp) IS NOT NULL THEN 3
             |            WHEN max(tc) IS NOT NULL THEN 2
             |            WHEN max(tv) IS NOT NULL THEN 1 ELSE 0 END AS stage
             |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- ds1: DSIR importance resampling score (Xie et al. 2023) —
    // per-doc log-likelihood ratio of smoothed unigram models, target =
    // English docs vs the raw corpus; counts aggregate before the float
    // fold so the 4dp round holds cross-engine ----
    QueryDef("ds1_importance_score",
      (s, d) => graft.llm.Relevance.importanceScore(
          Tables.documents(s, d), "doc_id", "text", col("lang") === "en")
        .orderBy("doc_id"),
      Some(graft.llm.Relevance.importanceOracleSql(
        "documents", "doc_id", "text", "lang = 'en'"))),

    // ---- cls1: classifier DISTILLATION of the quality gate — hashed
    // bag-of-words + distributed logistic regression trained to imitate
    // the composed quality heuristic on the doc_id%5=0 slice, applied to
    // the rest (the DCLM/fastText pattern: replace an expensive gate
    // chain with one linear scan). Model-dependent floats → rows-only;
    // ClassifierSpec pins holdout accuracy (~0.86) and the planted
    // two-vocabulary separation ----
    QueryDef("cls1_quality_classifier",
      (s, d) => {
        val docs = graft.llm.TextAnalysis.qualityFeatures(Tables.documents(s, d), "text")
        val fitted = graft.llm.Classifier.train(
          docs.filter(col("doc_id") % 5 === 0), "text", col("quality_score") >= 0.95)
        graft.llm.Classifier.score(fitted, docs.filter(col("doc_id") % 5 =!= 0), "text")
          .select(col("doc_id"), round(col("prob"), 3).as("prob"), col("pred"))
          .orderBy("doc_id")
      },
      None),

    // ---- cls1b: the PORTABLE distillation twin — same train/apply split
    // and label rule as cls1, but fixed-round full-batch GD over
    // md5-bucketed features with the rational fast sigmoid, every sum a
    // canonical-order fold → weights, probs and preds replay bit-for-bit
    // in DuckDB (the sim5b pattern applied to classifier FITTING). cls1
    // keeps the MLlib production path + ClassifierSpec accuracy pins ----
    QueryDef("cls1b_classifier_portable",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val q = graft.llm.TextAnalysis.qualityFeatures(docs, "text")
        val w = graft.llm.Classifier.trainPortable(
          q.filter(col("doc_id") % 5 === 0), "doc_id", "text",
          col("quality_score") >= 0.95)
        graft.llm.Classifier.scorePortable(
            docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", w)
          .orderBy("doc_id")
      },
      Some(graft.llm.Classifier.portableOracleSql(
        "documents", "doc_id", "text",
        labelSql =
          """round(greatest(0.0, least(1.0,
            |    1.0 - abs(length(regexp_replace(text, '[ \t\n\r\f]', '', 'g'))
            |              / (len(regexp_extract_all(text, '[^ \t\n\r\f]+')) * 1.0) - 5.0) / 10.0
            |        - (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) / (length(text) * 1.0)
            |        - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) / (length(text) * 1.0))), 6) >= 0.95""".stripMargin,
        trainWhere = "doc_id % 5 = 0", scoreWhere = "doc_id % 5 <> 0"))),

    // ---- emb3: SemDeDup in PCA space — dimension-reduce (16 of 64 dims)
    // before the k-means cells + within-cell cosine verify, the standard
    // cost cut for semantic dedup at scale. Hash-green via TWO pinned-
    // determinism layers: the PCA projection rides the emb2 pattern
    // (deterministic Jacobi model → literals in a data-dependent oracle,
    // 5dp-floor-rounded on both engines so the quantizer's INPUT vectors
    // are bit-identical), then the portable md5-Lloyd quantizer + cosine
    // verify replay exactly like dd10's (sim5b pattern). PcaSpec keeps
    // the agreement pin with full-space SemDeDup on planted duplicates ----
    QueryDef("emb3_pca_semdedup",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = pcaModel(s, d)
        val proj = Pca.project(emb, "vec_id", "embedding", model, k = 16)
          .select(col("vec_id"),
            transform(col("pc"), x => floor(x * 100000 + 0.5) / 100000.0).as("pc"))
        graft.llm.Dedup.semanticDedupPortable(proj, "vec_id", "pc",
            threshold = 0.9, nCells = 16, rounds = 4)
          .select(col("vec_id")).orderBy("vec_id")
      },
      None,
      oracleFn = Some((s, d) => {
        val model = pcaModel(s, d)
        def dl(x: Double) = s"CAST('$x' AS DOUBLE)"
        val dim = model.means.length
        val centered = (0 until dim)
          .map(i => s"(embedding[${i + 1}]::DOUBLE - ${dl(model.means(i))}) AS x$i")
          .mkString(",\n       ")
        // 16 projected coordinates as one DOUBLE[] literal list; each an
        // explicit left-associative + chain ≡ Spark's aggregate fold,
        // floor-rounded at 5dp exactly like the Spark side
        val pcs = (0 until 16).map { k =>
          val dot = (0 until dim)
            .map(i => s"x$i * ${dl(model.components(k)(i))}").mkString(" + ")
          s"floor(($dot) * 100000 + 0.5) / 100000.0"
        }.mkString(",\n         ")
        val fromSql =
          s"SELECT vec_id::BIGINT AS pid,\n       [$pcs] AS pv\n" +
            s"FROM (SELECT vec_id,\n       $centered\n  FROM embeddings)"
        graft.llm.Dedup.semanticDedupPortableOracleSql(fromSql, "vec_id",
          threshold = 0.9, nCells = 16, rounds = 4, dim = 16)
      })),

    // ---- emb5: embedding-norm hygiene per label — L2-norm distribution
    // (count / mean / min / max + near-zero detector). Norm collapse or
    // blow-up per class is the standard first symptom of a broken
    // embedding export; one scan, one dim-sized aggregate. The fold is
    // cast to double BEFORE squaring so DuckDB's ::DOUBLE[] list algebra
    // replays it exactly (the sim1 parity pattern), and the 4dp rounding
    // is the engine-identical floor(x·10⁴+0.5)/10⁴ fold (the ts19/dd18
    // pattern) — Spark's round() is BigDecimal-HALF_UP, DuckDB's rounds
    // the double; a norm on a half boundary flips the hash. ----
    QueryDef("emb5_norm_stats",
      (s, d) => {
        val sq = aggregate(
          transform(col("embedding").cast("array<double>"), x => x * x),
          lit(0.0), (acc, v) => acc + v)
        def r4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          floor(c * 10000 + 0.5) / 10000.0
        Tables.embeddings(s, d)
          .select(col("label"), sqrt(sq).as("nrm"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            r4(avg("nrm")).as("avg_norm"),
            r4(min("nrm")).as("min_norm"),
            r4(max("nrm")).as("max_norm"),
            sum(when(col("nrm") < 1e-6, 1L).otherwise(0L)).as("near_zero"))
          .orderBy("label")
      },
      Some("""WITH n AS (
             |  SELECT label,
             |         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
             |  FROM embeddings)
             |SELECT label, count(*) AS n,
             |       floor(avg(nrm) * 10000 + 0.5) / 10000.0 AS avg_norm,
             |       floor(min(nrm) * 10000 + 0.5) / 10000.0 AS min_norm,
             |       floor(max(nrm) * 10000 + 0.5) / 10000.0 AS max_norm,
             |       sum(CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END)::BIGINT AS near_zero
             |FROM n GROUP BY label ORDER BY label""".stripMargin)),

    // ---- emb6: INT8 scalar quantization (Faiss-SQ8 shape) — per-dim
    // min/max model (2·d doubles of driver state, the Lloyd/PCA
    // precedent) re-broadcast as literals; codes are exact integers and
    // the affine formula replays in SQL, so the whole operator —
    // including the reconstruction-error band — is hash-checked.
    // Emitted LONG form (vec_id, dim_idx, code) like emb2: the harness's
    // comparator sorts/hashes scalar cells and an array column is
    // unhashable on the pandas side (the r10 red row). scalarQuantize's
    // wide frame stays the internal API for sim7. ----
    QueryDef("emb6_scalar_quant",
      (s, d) => graft.llm.Similarity.scalarQuantize(
          Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"), col("q_sum"), col("recon_max_err"),
          posexplode(col("codes")).as(Seq("dim_idx", "code")))
        .select(col("vec_id"), col("dim_idx"), col("code"),
          col("q_sum"), col("recon_max_err"))
        .orderBy("vec_id", "dim_idx"),
      Some("""WITH dims AS (
             |  SELECT i.i AS i, min(e.embedding[i.i]::DOUBLE) AS mn,
             |         max(e.embedding[i.i]::DOUBLE) AS mx
             |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i
             |  GROUP BY i.i),
             |model AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
             |          FROM dims),
             |coded AS (
             |  SELECT e.vec_id,
             |    [CASE WHEN m.mxs[i] > m.mns[i]
             |          THEN greatest(0.0, least(255.0,
             |               floor((e.embedding[i]::DOUBLE - m.mns[i])
             |                     / (m.mxs[i] - m.mns[i]) * 255 + 0.5)))
             |          ELSE 0.0 END::INT
             |     FOR i IN generate_series(1, 64)] AS codes,
             |    e.embedding AS emb
             |  FROM embeddings e, model m),
             |wide AS (
             |  SELECT vec_id, codes, list_sum(codes)::BIGINT AS q_sum,
             |    floor(list_max([abs(emb[i]::DOUBLE - (m.mns[i] + codes[i]::DOUBLE / 255.0
             |                        * (m.mxs[i] - m.mns[i])))
             |                    FOR i IN generate_series(1, 64)]) * 1000000 + 0.5)
             |      / 1000000.0 AS recon_max_err
             |  FROM coded, model m)
             |SELECT vec_id, (i.i - 1)::INT AS dim_idx, codes[i.i]::INT AS code,
             |       q_sum, recon_max_err
             |FROM wide, (SELECT unnest(generate_series(1, 64)) AS i) i
             |ORDER BY vec_id, dim_idx""".stripMargin)),

    // ---- emb1: embedding covariance — all d² second moments in one scan
    // (flattened outer product + partial/final hash agg; only d² sums per
    // partition cross the wire); the scan is shared with emb4 and the
    // PCA fit via the covariance memo ----
    QueryDef("emb1_covariance",
      (s, d) => covMemo(s, d)
        .select(col("i"), col("j"), round(col("cov"), 7).as("cov"))
        .orderBy("i", "j"),
      Some(Pca.covarianceOracleSql("embeddings", "embedding", digits = 7))),

    // ---- emb4: correlation matrix — emb1's covariance normalized by the
    // diagonal (scale-invariant drift/redundancy monitoring); rides the
    // same memoized d²-row covariance as emb1, so the corpus scan runs
    // ONCE for the pair ----
    QueryDef("emb4_correlation",
      (s, d) => Pca.correlationFromCov(covMemo(s, d))
        .select(col("i"), col("j"), round(col("corr"), 6).as("corr"))
        .orderBy("i", "j"),
      Some(Pca.correlationOracleSql("embeddings", "embedding", digits = 6))),

    // ---- emb2: PCA projection onto the top-8 components. The model fit
    // (collect d×d 7dp-rounded covariance → driver Jacobi, sign-
    // canonicalized eigenvectors) is a DETERMINISTIC pure function of the
    // data (partition-independence pinned in PcaSpec), so the fitted
    // means + eigenvectors are pinned as literals into a DATA-DEPENDENT
    // oracle (oracleFn) and DuckDB replays the projection arithmetic
    // bit-for-bit: same centered values, same left-to-right dot fold,
    // same floor(x·10⁵+0.5)/10⁵ rounding on both engines. The
    // eigensolver itself stays driver-side (not SQL-expressible); what
    // the oracle certifies is the distributed projection over it.
    // Emitted LONG form (vec_id, component_idx, value): the harness's
    // comparator sorts/hashes scalar cells, and an array<double> column
    // is unhashable on the pandas side ----
    QueryDef("emb2_pca_project",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = pcaModel(s, d)
        Pca.project(emb, "vec_id", "embedding", model, k = 8)
          .select(col("vec_id"), posexplode(col("pc")).as(Seq("component_idx", "value")))
          .select(col("vec_id"), col("component_idx"),
            (floor(col("value") * 100000 + 0.5) / 100000.0).as("value"))
          .orderBy("vec_id", "component_idx")
      },
      None,
      oracleFn = Some((s, d) => {
        val model = pcaModel(s, d) // memoized — free after emb2/emb3 ran
        // every literal rides CAST('<repr>' AS DOUBLE): a string→double
        // parse is IEEE-exact on DuckDB's side, immune to the
        // decimal-literal parsing class (the ts19 lesson)
        def dl(x: Double) = s"CAST('$x' AS DOUBLE)"
        val dim = model.means.length
        val centered = (0 until dim)
          .map(i => s"(embedding[${i + 1}]::DOUBLE - ${dl(model.means(i))}) AS x$i")
          .mkString(",\n       ")
        val comps = (0 until 8).map { k =>
          // explicit left-associative + chain ≡ Spark's aggregate fold
          val dot = (0 until dim)
            .map(i => s"x$i * ${dl(model.components(k)(i))}").mkString(" + ")
          s"SELECT vec_id, $k AS component_idx,\n" +
            s"       floor(($dot) * 100000 + 0.5) / 100000.0 AS value\nFROM c"
        }.mkString("\nUNION ALL\n")
        s"WITH c AS MATERIALIZED (\n  SELECT vec_id,\n       $centered\n" +
          s"  FROM embeddings)\n$comps\nORDER BY vec_id, component_idx"
      }))
  )
}
