package graft.queries

import graft.Ckpt._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.etl.Normalize
import graft.analytics.DwwPipeline

/** The §3.1 + §3.2 pipelines end-to-end over testdata, reference-shaped:
  * testdata rows are dressed into the raw-credits schema (notes text,
  * release-date lists, dims), then run through Normalize and the jumps
  * endpoint. Rows-only (the fuzzy-score and regex chains are not
  * SQL-expressible); exact semantics are covered by DwwPipelineSpec.
  */
object PipelineQueries {

  /** Dress orders+customer into raw credits: customer ≙ person, orderstatus
    * ≙ studio (via a tiny synthetic company map), order date ≙ release. */
  private def rawCredits(s: SparkSession, d: String): DataFrame =
    Tables.table(s, d, "orders")
      .join(Tables.table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_custkey").cast("string").as("personId"),
        col("c_name").as("personName"),
        col("o_orderkey").cast("string").as("movieId"),
        concat(lit("order_"), col("o_orderkey")).as("movieTitle"),
        array(date_format(col("o_orderdate"), "d MMMM yyyy")).as("releaseDates"),
        concat(lit("artist: studio "), col("o_orderstatus")).as("notes"))

  private def dims(s: SparkSession) = {
    import s.implicits._
    val companyMap = Seq(
      ("studio o", "Studio O", "c1"), ("studio f", "Studio F", "c2"),
      ("studio p", "Studio P", "c3")).toDF("search", "name", "id")
    val roleMap = Seq(("artist", "Artist")).toDF("search", "name")
    val locations = Seq(
      ("Studio O", "wellington", "-41.3,174.8"),
      ("Studio F", "london", "51.5,-0.1"),
      ("Studio P", "los angeles", "34.0,-118.2")).toDF("company", "location", "geoLoc")
    val regions = Seq(("wellington", "oceania"), ("london", "europe"),
      ("los angeles", "americas")).toDF("location", "globalRegion")
    (companyMap, roleMap, locations, regions)
  }

  /** The normalized credits fact feeds FIVE e2e queries (normalize, jumps
    * endpoint, both envelopes, grouped CSV) — memoized so the fuzzy-match
    * ETL chain runs once per (session, dataDir). */
  private def credits(s: SparkSession, d: String): DataFrame =
    QueryMemo.frame(s, d, "e2e_credits") {
      val (cm, rm, lo, re) = dims(s)
      Normalize.credits(rawCredits(s, d), cm, rm, lo, re)
    }

  /** The per-person jumps docs feed BOTH envelope queries (the
    * canonical-JSON render and the flattened hash-checked form) —
    * memoized like the credits fact they derive from, so the
    * credits→dedup→dummy-synthesis→doc-grouping chain runs once per
    * (session, dataDir). Each query then assembles its own 1-row
    * envelope over the docs: memoizing the ASSEMBLED envelope was tried
    * first and measured 1.8× SLOWER for the render query —
    * localCheckpoint of the single giant document row is a serial
    * materialization of every nested struct, where the per-person docs
    * checkpoint in parallel (OPTIMIZATION_r15.md #8). The credits memo
    * is resolved BEFORE the docs build starts (QueryMemo.frame must
    * never be entered reentrantly — see detStages' note). */
  private def envelope(s: SparkSession, d: String): DataFrame = {
    val cr = credits(s, d)
    val docs = QueryMemo.frame(s, d, "e2e_jumps_docs")(DwwPipeline.jumpsDocs(cr))
    import s.implicits._
    val (_, _, lo, re) = dims(s)
    val regions = lo.join(re, "location")
      .select(col("location"), col("geoLoc"), col("globalRegion"))
    val globalRegions = Seq(
      ("oceania", "-25.0,140.0"), ("europe", "50.0,9.0"),
      ("americas", "39.8,-98.5")).toDF("region", "coords")
    graft.analytics.Envelope.unfiltered(
      docs,
      DwwPipeline.servingCredits(cr)
        .select(col("matchedCompanyName").as("company"), col("geoLoc")),
      regions, globalRegions)
  }

  val defs: Seq[QueryDef] = Seq(
    // For this dressed input every stage's output is statically known
    // (exact map hits → ratio 100, role 'artist' → 'Artist', status-keyed
    // geo), so the whole ETL is oracle-checkable end-to-end.
    QueryDef("e2e_normalize",
      (s, d) => credits(s, d)
        .select("personId", "movieId", "matchedCompanyName", "matchRatio",
                "trueRole", "location", "globalRegion", "releaseStr")
        .orderBy("personId", "movieId"),
      Some("""SELECT o_custkey::VARCHAR AS personId, o_orderkey::VARCHAR AS movieId,
             |       'Studio ' || o_orderstatus AS matchedCompanyName,
             |       100::INT AS matchRatio, 'Artist' AS trueRole,
             |       CASE o_orderstatus WHEN 'O' THEN 'wellington' WHEN 'F' THEN 'london'
             |            ELSE 'los angeles' END AS location,
             |       CASE o_orderstatus WHEN 'O' THEN 'oceania' WHEN 'F' THEN 'europe'
             |            ELSE 'americas' END AS globalRegion,
             |       strftime(o_orderdate, '%Y-%m-%d') AS releaseStr
             |FROM orders ORDER BY personId, movieId""".stripMargin)),

    // Oracle: a STATIC FIXTURE from an independent Python re-implementation
    // of the reference's jumps pipeline (tools/make_fixtures.py — dedup,
    // dummy synthesis, locUtils trip math), sliced per-SF by order count.
    QueryDef("e2e_jumps_endpoint",
      (s, d) => DwwPipeline.jumpsWithDummies(credits(s, d))
        .orderBy("personId", "time_ms", "dummy", "company"),
      Some("""SELECT personId, company, time_ms, dummy
             |FROM read_parquet('/root/repo/fixtures/e2e_jumps_endpoint.parquet')
             |WHERE sf_key = (SELECT count(*) FROM orders)
             |ORDER BY personId, time_ms, dummy, company""".stripMargin)),

    // ---- the serving JSON envelope (dwwApi.js:201-223): one document
    // wrapping the jumps docs with the company-location echo and geo dims,
    // rendered as the CANONICAL sorted-key JSON string
    // (Envelope.canonicalJson) and hash-checked character-for-character
    // against the independent Python fixture (make_fixtures.py builds the
    // same document from its own jumps reimplementation and
    // json.dumps(sort_keys=True)). Structural equality additionally in
    // IoSpec. ----
    QueryDef("e2e_jumps_envelope",
      (s, d) => graft.analytics.Envelope.canonicalJson(envelope(s, d)),
      Some("""SELECT envelope_json
             |FROM read_parquet('/root/repo/fixtures/e2e_envelope_json.parquet')
             |WHERE sf_key = (SELECT count(*) FROM orders)""".stripMargin)),

    // ---- the envelope, hash-checked: the SAME jumpsEnvelope document
    // exploded back into scalar (section, k, v1..v4) rows so the harness
    // can sort/hash it. The jumps section (doc grouping + rel payloads +
    // dummy interleave) is pinned against the independent Python fixture
    // (+ personName via the customer dim); the three dim-echo maps
    // (dwwApi.js:218-223) against their literal values. Together with the
    // rows-only JSON form above, the last e2e shape is oracle-covered. ----
    QueryDef("e2e_envelope_flat",
      (s, d) => {
        // one 1-row envelope, four section explosions: each section
        // prunes to its own dim-sized aggregate over the memoized docs
        // (the heavy jumps collect runs once, for the jumps section)
        val env = envelope(s, d)
        val nullS = lit(null).cast("string")
        val jumps = env.select(explode(col("jumps")).as("doc"))
          .select(col("doc.id").as("k"), col("doc.name").as("v1"),
            explode(col("doc.rels")).as("rel"))
          .select(lit("jumps").as("section"), col("k"), col("v1"),
            col("rel.matchedCompanyName").as("v2"),
            col("rel.movieReleaseYear").cast("string").as("v3"),
            col("rel.dummy").cast("string").as("v4"))
        val locs = env.select(explode(col("locations")).as(Seq("k", "g")))
          .select(lit("locations").as("section"), col("k"), col("g").as("v1"),
            nullS.as("v2"), nullS.as("v3"), nullS.as("v4"))
        val regs = env.select(explode(col("regions")).as(Seq("k", "p")))
          .select(lit("regions").as("section"), col("k"),
            col("p.geoLoc").as("v1"), col("p.globalRegion").as("v2"),
            nullS.as("v3"), nullS.as("v4"))
        val glob = env.select(explode(col("globalRegions")).as(Seq("k", "c")))
          .select(lit("globalRegions").as("section"), col("k"), col("c").as("v1"),
            nullS.as("v2"), nullS.as("v3"), nullS.as("v4"))
        jumps.union(locs).union(regs).union(glob)
          .orderBy("section", "k", "v3", "v4", "v1", "v2")
      },
      Some("""SELECT 'jumps' AS section, f.personId AS k, c.c_name AS v1,
             |       f.company AS v2, f.time_ms::VARCHAR AS v3, f.dummy::VARCHAR AS v4
             |FROM read_parquet('/root/repo/fixtures/e2e_jumps_endpoint.parquet') f
             |JOIN customer c ON f.personId = c.c_custkey::VARCHAR
             |WHERE f.sf_key = (SELECT count(*) FROM orders)
             |UNION ALL
             |SELECT 'locations', t.k, t.v1, NULL, NULL, NULL FROM (VALUES
             |  ('Studio O', '-41.3,174.8'), ('Studio F', '51.5,-0.1'),
             |  ('Studio P', '34.0,-118.2')) t(k, v1)
             |UNION ALL
             |SELECT 'regions', t.k, t.v1, t.v2, NULL, NULL FROM (VALUES
             |  ('wellington', '-41.3,174.8', 'oceania'), ('london', '51.5,-0.1', 'europe'),
             |  ('los angeles', '34.0,-118.2', 'americas')) t(k, v1, v2)
             |UNION ALL
             |SELECT 'globalRegions', t.k, t.v1, NULL, NULL, NULL FROM (VALUES
             |  ('oceania', '-25.0,140.0'), ('europe', '50.0,9.0'),
             |  ('americas', '39.8,-98.5')) t(k, v1)
             |ORDER BY section, k, v3, v4, v1, v2""".stripMargin)),

    QueryDef("e2e_jumps_grouped_csv",
      (s, d) => DwwPipeline.jumpsCsv(credits(s, d), "matchedCompanyName", "studio f", "in")
        .orderBy("person", "date", "company"),
      Some("""SELECT person, role, date, company, location, region
             |FROM read_parquet('/root/repo/fixtures/e2e_jumps_grouped_csv.parquet')
             |WHERE sf_key = (SELECT count(*) FROM orders)
             |ORDER BY person, date, company""".stripMargin)),

    // ---- F3 batch repair (FixUnpaddedDates, GetWeta.py:675-704): dates
    // deliberately re-rendered unpadded, then repaired; the oracle is the
    // properly padded rendering. ----
    QueryDef("f3b_repair_dates",
      (s, d) => {
        val unpadded = Tables.table(s, d, "orders").select(col("o_orderkey"),
          concat_ws("-", year(col("o_orderdate")), month(col("o_orderdate")),
            dayofmonth(col("o_orderdate"))).as("fixed"))
        graft.etl.Repair.fixUnpaddedDates(unpadded, "fixed").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS fixed
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- A4 as a job: company-map seeding from high-confidence facts
    // (GetWeta.py:493-512). On the dressed credits every match scores 100
    // and each search has one canonical target, so the oracle is the
    // grouped count. ----
    QueryDef("a4b_map_seeding",
      (s, d) => graft.etl.MapBuilder.seedCompanyMap(
          credits(s, d), "companySearch", "matchedCompanyName", "matchedCompanyId", "matchRatio")
        .orderBy("companySearch"),
      Some("""SELECT 'studio ' || lower(o_orderstatus) AS companySearch,
             |       'Studio ' || o_orderstatus AS matchedCompanyName,
             |       CASE o_orderstatus WHEN 'O' THEN 'c1' WHEN 'F' THEN 'c2' ELSE 'c3' END
             |         AS matchedCompanyId,
             |       100::INT AS matchRatio, count(*) AS cnt
             |FROM orders GROUP BY o_orderstatus ORDER BY companySearch""".stripMargin)),

    // ---- composed curation pass: quality gate + lang gate + exact dedup +
    // near-dup removal (rows-only: langid argmax + LSH; semantics in
    // LlmSpec) ----
    QueryDef("cur1_curation",
      (s, d) => graft.llm.Curation.curated(
          Tables.table(s, d, "documents"), "doc_id", "text",
          graft.llm.Curation.Config(minQuality = 0.3, keepLangs = Seq("en"),
            nearDupThreshold = 0.85))
        .select("doc_id", "lang_pred", "quality_score")
        .orderBy("doc_id"),
      None),

    // ---- cur9: the fully deterministic curation pass — gates → exact
    // dedup → decontamination → per-source cap → split → shuffle, every
    // stage md5-derived, so the COMPOSITION itself is hash-checked against
    // one DuckDB query (cur1's LSH tail keeps it rows-only; this is the
    // engine-portable twin of the whole pipeline) ----
    QueryDef("cur9_curation_deterministic",
      (s, d) => graft.llm.Curation.finishDeterministic(
          detStages(s, d).clean, "doc_id", "source")
        .select("doc_id", "source", "cap_rank", "split", "shuffle_pos")
        .orderBy("doc_id"),
      Some {
        s"""$deterministicChainSql
           |SELECT doc_id, source, cap_rank::INT AS cap_rank,
           |       CASE WHEN f < 0.1 THEN 'test' WHEN f < 0.2 THEN 'val' ELSE 'train' END AS split,
           |       row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS shuffle_pos
           |FROM (SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           |                / 4294967296.0 AS f FROM capped)
           |ORDER BY doc_id""".stripMargin
      }),

    // ---- cur12: the attrition funnel over the same deterministic pass —
    // survivor counts after each gate, the observability row every corpus
    // build publishes next to its output. Shares cur9's oracle chain ----
    QueryDef("cur12_attrition",
      (s, d) => graft.llm.Curation.attrition(detStages(s, d), "doc_id", "source")
        .orderBy("stage_ord"),
      Some {
        s"""$deterministicChainSql
           |SELECT * FROM (
           |  SELECT 1 AS stage_ord, 'raw' AS stage, count(*)::BIGINT AS docs FROM train
           |  UNION ALL SELECT 2, 'quality_lang_gate', count(*)::BIGINT FROM gated
           |  UNION ALL SELECT 3, 'exact_dedup', count(*)::BIGINT FROM exact
           |  UNION ALL SELECT 4, 'decontaminated', count(*)::BIGINT FROM clean
           |  UNION ALL SELECT 5, 'source_cap', count(*)::BIGINT FROM capped)
           |ORDER BY stage_ord""".stripMargin
      })
  )

  /** cur9/cur12 share one build of the deterministic pass's stages — the
    * gated scan, exact-dedup survivors, and decontaminated set are each
    * memoized checkpoint-backed frames, so whichever query runs first
    * pays for the regex scoring + gram joins and the other reads blocks.
    * The memo calls are strictly SEQUENTIAL (each resolved before the
    * next build starts): a frame build must never invoke QueryMemo
    * reentrantly — computeIfAbsent inside computeIfAbsent on one map is
    * undefined behavior. */
  private def detStages(s: SparkSession, d: String): graft.llm.Curation.DetStages = {
    val docs = Tables.table(s, d, "documents")
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val gated = QueryMemo.frame(s, d, "cur_det_gated") {
      graft.llm.Curation.gatedScan(train, "doc_id", "text", graft.llm.Curation.Config())
    }
    val exact = QueryMemo.frame(s, d, "cur_det_exact") {
      graft.llm.Curation.exactFromGated(gated, "doc_id")
    }
    val clean = QueryMemo.frame(s, d, "cur_det_clean") {
      graft.llm.Dedup.decontaminate(exact, "doc_id", "text",
        docs.filter(col("doc_id") % 17 === 0), "text", n = 8, hashGrams = false)
    }
    graft.llm.Curation.DetStages(train, gated, exact, clean)
  }

  /** The cur9/cur12 oracle chain: the deterministic curation pass through
    * the per-source cap, every stage a pure md5 function of (id, text).
    * CTEs referenced more than once are MATERIALIZED so the attrition
    * counts don't re-execute the gram joins per reference. */
  private lazy val deterministicChainSql: String = {
    val langs = graft.llm.TextAnalysis.stopwords.toSeq.sortBy(_._1)
    val scoreCols = langs.map { case (l, ws) =>
      s"len(list_intersect(tk, [${ws.map(w => s"'$w'").mkString(", ")}])) AS s_$l"
    }.mkString(",\n  ")
    val names = langs.map { case (l, _) => s"s_$l" }
    val pick = langs.map { case (l, _) => s"WHEN s_$l = b THEN '$l'" }.mkString(" ")
    s"""WITH train AS MATERIALIZED (
       |  SELECT doc_id, source, text FROM documents WHERE doc_id % 17 <> 0),
       |toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM train),
       |sc AS (SELECT doc_id, $scoreCols FROM toks),
       |best AS (SELECT doc_id, ${names.mkString(", ")},
       |                greatest(${names.mkString(", ")}) AS b FROM sc),
       |lang AS (SELECT doc_id,
       |  CASE WHEN b > 0 AND (${names.map(n => s"($n = b)::INT").mkString(" + ")}) = 1
       |       THEN CASE $pick END ELSE 'unknown' END AS lang_pred FROM best),
       |quality AS (SELECT doc_id, round(greatest(0.0, least(1.0,
       |    1.0 - abs(length(regexp_replace(text, '[ \\t\\n\\r\\f]', '', 'g')) /
       |              (len(regexp_extract_all(text, '[^ \\t\\n\\r\\f]+')) * 1.0) - 5.0) / 10.0
       |        - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / (length(text) * 1.0)
       |        - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) / (length(text) * 1.0)
       |  )), 6) AS q FROM train),
       |gated AS MATERIALIZED (SELECT t.doc_id, t.source, t.text,
       |                 md5(regexp_replace(lower(t.text), '\\s+', ' ', 'g')) AS fp
       |          FROM train t JOIN lang USING (doc_id) JOIN quality USING (doc_id)
       |          WHERE lang_pred = 'en' AND q >= 0.3),
       |keep AS (SELECT fp, min(doc_id) AS doc_id FROM gated GROUP BY fp),
       |exact AS MATERIALIZED (
       |  SELECT g.* FROM gated g JOIN keep k ON g.fp = k.fp AND g.doc_id = k.doc_id),
       |bg AS (SELECT DISTINCT unnest([array_to_string(t[i:i+7], ' ')
       |          FOR i IN generate_series(1, greatest(len(t) - 7, 1))]) AS gram
       |       FROM (SELECT string_split_regex(lower(text), '\\s+') AS t
       |             FROM documents WHERE doc_id % 17 = 0)),
       |eg AS (SELECT doc_id, unnest([array_to_string(t[i:i+7], ' ')
       |          FOR i IN generate_series(1, greatest(len(t) - 7, 1))]) AS gram
       |       FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM exact)),
       |dirty AS (SELECT DISTINCT doc_id FROM eg JOIN bg USING (gram)),
       |clean AS MATERIALIZED (
       |  SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
       |capped AS MATERIALIZED (SELECT doc_id, source, cap_rank FROM (
       |    SELECT doc_id, source,
       |           row_number() OVER (PARTITION BY source
       |             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cap_rank
       |    FROM clean) WHERE cap_rank <= 15)""".stripMargin
  }
}
