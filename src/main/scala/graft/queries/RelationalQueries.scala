package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.analytics.Catalog
import graft.io.{Sinks, Sources}

/** SURVEY.md §2.2 filters (P1-P8), §2.3 joins (J1-J9), §2.4 catalog aggs
  * (A1-A7, A10), §2.6 sorts (O1-O4), §2.1 source ops (S2, S5) — each over
  * the driver testdata with a DuckDB oracle.
  *
  * Scale notes: all dim joins (nation/region/supplier) are explicit
  * `broadcast()`; aggregates are partial+final hash aggs; filters and
  * projections sit directly on the parquet scan so pushdown/pruning apply.
  */
object RelationalQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Scratch dirs for the sink→source roundtrip queries. Each execution
    * creates a fresh dir by design (queries stay standalone), so every
    * dir is registered here and recursively deleted by a single JVM
    * shutdown hook — repeated bench runs no longer leak temp disk. */
  private val scratchDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(); ()
      }
      scratchDirs.forEach(p => rm(p.toFile))
    }))
  }
  private def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- P1: quality predicate (matchRatio > 80 ≙ quantity threshold) ----
    QueryDef("p1_quality_filter",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- P2: compound mapped+geocoded predicate (dwwApi.js:65) ----
    QueryDef("p2_mapped_geocoded",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_discount") > 0.05 && col("l_tax") > 0.02)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
             |WHERE l_returnflag = 'R' AND l_discount > 0.05 AND l_tax > 0.02
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- P3: curation threshold (matchRatio > 90, GetWeta.py:497) ----
    QueryDef("p3_curation_filter",
      (s, d) => t(s, d, "orders")
        .filter(col("o_totalprice") > 90000)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > 90000 ORDER BY o_orderkey""".stripMargin)),

    // ---- P4: sentinel discard (zzz_baddata, GetWeta.py:161-164) ----
    QueryDef("p4_sentinel_discard",
      (s, d) => t(s, d, "part")
        .filter(!col("p_name").startsWith("zzz_baddata") && !col("p_name").contains("red"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_name NOT LIKE 'zzz_baddata%' AND p_name NOT LIKE '%red%'
             |ORDER BY p_partkey""".stripMargin)),

    // ---- P5: min-count HAVING (dwwFront.js:85-87) ----
    QueryDef("p5_having_min_count",
      (s, d) => Catalog.havingMinCount(t(s, d, "orders"), Seq("o_custkey"), 12L)
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, count(*) AS cnt FROM orders
             |GROUP BY o_custkey HAVING count(*) >= 12 ORDER BY o_custkey""".stripMargin)),

    // ---- P6: column projection ----
    QueryDef("p6_projection",
      (s, d) => t(s, d, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey""")),

    // ---- P7: non-empty filter (functions.js:249) ----
    QueryDef("p7_nonempty_filter",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderpriority").isNotNull && col("o_orderpriority") =!= "")
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority FROM orders
             |WHERE o_orderpriority IS NOT NULL AND o_orderpriority <> ''
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- P8: tag containment (GetWeta.py:104-108) ----
    QueryDef("p8_tag_containment",
      (s, d) => t(s, d, "part")
        .filter(col("p_type").contains("AR"))
        .select("p_partkey", "p_type")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_type FROM part
             |WHERE p_type LIKE '%AR%' ORDER BY p_partkey""".stripMargin)),

    // ---- J1: dim broadcast join chain (GetWeta.py:157-175) ----
    QueryDef("j1_company_dim_join",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("cnt"))
        .orderBy("n_name"),
      Some("""SELECT n_name, count(*) AS cnt FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ---- J2: left join + coalesce default (SetTrueRoles, GetWeta.py:518-545) ----
    QueryDef("j2_rolemap_join",
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey"), coalesce(col("n_name"), lit("")).as("true_role"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, coalesce(n_name, '') AS true_role FROM customer
             |LEFT JOIN nation ON c_nationkey = n_nationkey ORDER BY c_custkey""".stripMargin)),

    // ---- J3: 2-level snowflake (SetLocations, GetWeta.py:547-584) ----
    QueryDef("j3_snowflake_join",
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("n_name").as("nation"), col("r_name").as("region"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, n_name AS nation, r_name AS region FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey ORDER BY c_custkey""".stripMargin)),

    // ---- J4: distinct-then-broadcast memoized enrichment (GetWeta.py:177-196) ----
    QueryDef("j4_memoized_search",
      (s, d) => {
        val part = t(s, d, "part")
        // resolve each distinct search string once, then broadcast back — the
        // reference's in-process memo dict as a dataflow.
        val resolved = part.select(col("p_type")).distinct()
          .withColumn("resolved", length(col("p_type")))
        part.join(broadcast(resolved), Seq("p_type"))
          .groupBy("p_type", "resolved").agg(count(lit(1)).as("cnt"))
          .orderBy("p_type")
      },
      Some("""SELECT p_type, length(p_type)::INT AS resolved, count(*) AS cnt
             |FROM part GROUP BY 1, 2 ORDER BY p_type""".stripMargin)),

    // ---- J5: hub coordinate lookup (functions.js:124-127) ----
    QueryDef("j5_hub_lookup",
      (s, d) => t(s, d, "nation")
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("n_name", "r_name")
        .orderBy("n_name"),
      Some("""SELECT n_name, r_name FROM nation
             |JOIN region ON n_regionkey = r_regionkey ORDER BY n_name""".stripMargin)),

    // ---- J6: region echo at sink (dwwApi.js:163) ----
    QueryDef("j6_region_echo",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("o_orderkey"), col("r_name").as("region"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, r_name AS region FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey ORDER BY o_orderkey""".stripMargin)),

    // ---- J7: semi-join membership probe (GetWeta.py:436-440) ----
    QueryDef("j7_semi_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""".stripMargin)),

    // ---- J8: dedup probe, deterministic first-wins (GetWeta.py:239-245) ----
    QueryDef("j8_dedup_probe",
      (s, d) => Catalog.firstWins(
          t(s, d, "lineitem").withColumn("__key", concat_ws("|", col("l_partkey"), col("l_suppkey"))),
          "__key", Seq(col("l_orderkey"), col("l_linenumber")))
        .select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
        .orderBy("l_partkey", "l_suppkey"),
      Some("""SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber FROM (
             |  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
             |         row_number() OVER (PARTITION BY l_partkey, l_suppkey
             |                            ORDER BY l_orderkey, l_linenumber) AS rn
             |  FROM lineitem) WHERE rn = 1 ORDER BY l_partkey, l_suppkey""".stripMargin)),

    // ---- J9: case-insensitive equi-join (GetWeta.py:442-446) ----
    QueryDef("j9_case_insensitive_join",
      (s, d) => {
        val cust = t(s, d, "customer")
        val segs = cust.select(upper(col("c_mktsegment")).as("seg")).distinct()
        cust.join(broadcast(segs), lower(col("c_mktsegment")) === lower(col("seg")))
          .select("c_custkey", "seg")
          .orderBy("c_custkey", "seg")
      },
      Some("""SELECT c_custkey, seg FROM customer
             |JOIN (SELECT DISTINCT upper(c_mktsegment) AS seg FROM customer) s
             |  ON lower(c_mktsegment) = lower(seg)
             |ORDER BY c_custkey, seg""".stripMargin)),

    // ---- A1: search-term frequency (dwwApi.js:321-342) ----
    QueryDef("a1_search_frequency",
      (s, d) => Catalog.frequency(t(s, d, "part"), "p_brand"),
      Some("""SELECT p_brand AS search, count(*) AS cnt FROM part
             |GROUP BY p_brand ORDER BY cnt DESC, search""".stripMargin)),

    // ---- A2: role frequency (dwwApi.js:368-391) ----
    QueryDef("a2_role_frequency",
      (s, d) => Catalog.frequency(t(s, d, "orders"), "o_orderpriority"),
      Some("""SELECT o_orderpriority AS search, count(*) AS cnt FROM orders
             |GROUP BY o_orderpriority ORDER BY cnt DESC, search""".stripMargin)),

    // ---- A3: grouped mapping counts (dwwApi.js:394-423) ----
    QueryDef("a3_mapping_counts",
      (s, d) => Catalog.mappingCounts(t(s, d, "lineitem"), Seq("l_returnflag", "l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
             |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- A4: first-wins seeding via row_number (GetWeta.py:493-512) ----
    QueryDef("a4_first_wins",
      (s, d) => Catalog.firstWins(t(s, d, "customer"), "c_nationkey", Seq(col("c_custkey")))
        .select("c_nationkey", "c_custkey", "c_name")
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, c_custkey, c_name FROM (
             |  SELECT c_nationkey, c_custkey, c_name,
             |         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
             |  FROM customer) WHERE rn = 1 ORDER BY c_nationkey""".stripMargin)),

    // ---- A5: reverse-map totals (dwwFront.js:54-75) ----
    QueryDef("a5_reverse_map_totals",
      (s, d) => Catalog.reverseMapTotals(t(s, d, "nation"), "n_regionkey", "n_name", "n_nationkey")
        .orderBy("n_regionkey"),
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS searches,
             |       sum(n_nationkey)::BIGINT AS total
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // ---- A6: blacklist term tally (dwwFront.js:159-169) ----
    QueryDef("a6_blacklist_tally",
      (s, d) => Catalog.termTally(t(s, d, "part"), "p_name", Seq("blue", "green", "ivory", "red"))
        .orderBy("term"),
      Some("""SELECT term, count(p_name) AS cnt
             |FROM (VALUES ('blue'), ('green'), ('ivory'), ('red')) t(term)
             |LEFT JOIN part ON contains(lower(p_name), lower(term))
             |GROUP BY term ORDER BY term""".stripMargin)),

    // ---- A7: duplicate-row total merge (dwwFront.js:83-102) ----
    QueryDef("a7_merge_totals",
      (s, d) => {
        val sub = t(s, d, "lineitem").groupBy("l_partkey", "l_suppkey").agg(count(lit(1)).as("cnt"))
        Catalog.mergeTotals(sub, col("l_partkey"), "cnt").orderBy("key")
      },
      Some("""SELECT l_partkey AS key, sum(cnt)::BIGINT AS total FROM (
             |  SELECT l_partkey, l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1, 2)
             |GROUP BY l_partkey ORDER BY key""".stripMargin)),

    // ---- O1: global person/date sort (dwwApi.js:67) ----
    QueryDef("o1_global_sort",
      (s, d) => t(s, d, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM orders
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // ---- O2: count-desc sort (dwwApi.js:325) ----
    QueryDef("o2_count_sort",
      (s, d) => Catalog.frequency(t(s, d, "part"), "p_type"),
      Some("""SELECT p_type AS search, count(*) AS cnt FROM part
             |GROUP BY p_type ORDER BY cnt DESC, search""".stripMargin)),

    // ---- O3: presentation sort, typed columns (dwwFront.js:422-428) ----
    QueryDef("o3_presentation_sort",
      (s, d) => t(s, d, "nation")
        .select("n_name", "n_regionkey", "n_nationkey")
        .orderBy(desc("n_regionkey"), asc("n_name")),
      Some("""SELECT n_name, n_regionkey, n_nationkey FROM nation
             |ORDER BY n_regionkey DESC, n_name""".stripMargin)),

    // ---- O4: depth limit (GetWeta.py:81-86) ----
    QueryDef("o4_depth_limit",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ---- §2.7 set ops (implicit in the reference — distinct-union of
    // person lists, duplicate suppression; exposed as first-class ops) ----
    QueryDef("so1_union",
      (s, d) => t(s, d, "orders").filter(col("o_orderstatus") === "F").select("o_orderkey")
        .union(t(s, d, "orders").filter(col("o_totalprice") > 100000).select("o_orderkey"))
        .distinct()
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
             |UNION
             |SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
             |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("so2_intersect",
      (s, d) => t(s, d, "orders").filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(t(s, d, "orders").filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY o_custkey""".stripMargin)),

    QueryDef("so3_except",
      (s, d) => t(s, d, "customer").select("c_custkey")
        .except(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY c_custkey""".stripMargin)),

    // ---- rollup: multi-level totals in one pass (beyond-reference
    // analytics completeness) ----
    QueryDef("so4_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ---- cube: all grouping-set combinations in one pass ----
    QueryDef("so5_cube",
      (s, d) => t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // ---- explicit grouping sets: the general form rollup/cube specialize;
    // one pass, Expand + single hash aggregate (no N-scan union) ----
    QueryDef("so8_grouping_sets",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_gs")
        // sum in exact decimal: a double fold over 10^5-row groups carries
        // order-dependent ulps past 2dp rounding; decimal is associative
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
                |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                |FROM orders_gs
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                |                        (o_orderstatus, o_orderpriority))
                |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""
          .stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
             |                        (o_orderstatus, o_orderpriority))
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // ---- pivot: long → wide on a bounded key set (the density cube's
    // presentation shape). Explicit pivot values keep the plan one pass
    // (no distinct-scan to discover columns); oracle via conditional
    // aggregation ----
    QueryDef("so7_pivot",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |       sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS "F",
             |       sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS "O",
             |       sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS "P"
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- approximate distinct-count sketch (HLL; rows-only — sketch
    // implementations differ by engine; 5% accuracy asserted in ScaleSpec) ----
    QueryDef("so6_approx_distinct",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
             countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag"),
      None),

    // ---- mergeable HLL sketches (DataSketches): per-group sketches whose
    // UNION equals the direct whole-table sketch — the re-aggregatable
    // rollup pattern (at 100 TB you persist per-partition sketches and
    // re-aggregate to any grouping without rescanning). Union ≡ direct is
    // register-wise max, proven exactly in ScaleSpec; rows-only (sketch
    // estimates are engine-specific). ----
    QueryDef("so6b_hll_merge",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val per = li.groupBy(col("l_returnflag"))
          .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        val perRows = per.select(col("l_returnflag"),
          hll_sketch_estimate(col("sk")).as("approx_parts"))
        val merged = per.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_parts"))
          .select(lit("__all__").as("l_returnflag"), col("approx_parts"))
        perRows.union(merged).orderBy("l_returnflag")
      },
      None),

    // ---- S2: incremental anti-join load (GetWeta.py:253-337) ----
    QueryDef("s2_incremental_load",
      (s, d) => {
        val orders = t(s, d, "orders")
        val staged = orders.filter(col("o_orderkey") % 10 === 0)
        Sources.incrementalLoad(orders, staged, "o_orderkey")
          .select("o_orderkey").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 0)
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- S13: ORC sink/source roundtrip — the columnar-format breadth of
    // the staging tier (S3/S11 cover parquet, S5/S8 CSV, S7/S9 JSON; ORC
    // ships in Spark and needs no extra dependency). The aggregate runs on
    // the read-back copy, so a value or type lost in the ORC writer/reader
    // pair would break the hash against the parquet-side oracle. ----
    QueryDef("s13_orc_roundtrip",
      (s, d) => {
        val tmp = scratchDir("graft-orc")
        t(s, d, "documents").write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
               sum(col("n_chars")).as("total_chars"),
               min(col("doc_id")).as("first_doc"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
             |       min(doc_id) AS first_doc
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- S14: JSONL sink/source roundtrip — the gzip line-JSON corpus
    // interchange format. The aggregate runs on the read-back copy, so a
    // value lost or re-typed across the writer/reader pair breaks the
    // hash against the parquet-side oracle. ----
    QueryDef("s14_jsonl_roundtrip",
      (s, d) => {
        val tmp = scratchDir("graft-jsonl")
        Sinks.writeJsonl(t(s, d, "documents"), tmp)
        s.read.json(tmp)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
               sum(col("n_chars")).as("total_chars"),
               min(col("doc_id")).as("first_doc"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
             |       min(doc_id) AS first_doc
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- S15: Z-order (Morton) clustering key — the multi-dimensional
    // data-skipping layout (Delta/Iceberg ZORDER BY) from plain bit
    // arithmetic: customer bits interleave with order-day bits, so files
    // range-sorted by zkey carry tight min/max bounds on BOTH columns.
    // The key arithmetic is engine-portable; the oracle replays the
    // magic-mask spread bit for bit. ----
    QueryDef("s15_zorder_key",
      (s, d) => {
        val day = datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
        t(s, d, "orders")
          .select(col("o_orderkey"),
            graft.operators.ZOrder.zkey2(col("o_custkey"), day).as("zkey"))
          .orderBy("zkey", "o_orderkey")
      },
      Some("""WITH s AS (SELECT o_orderkey, o_custkey & 65535 AS a,
             |    (o_orderdate::DATE - DATE '1970-01-01') & 65535 AS b FROM orders),
             |c1 AS (SELECT o_orderkey, (a | (a << 8)) & 16711935 AS a,
             |       (b | (b << 8)) & 16711935 AS b FROM s),
             |c2 AS (SELECT o_orderkey, (a | (a << 4)) & 252645135 AS a,
             |       (b | (b << 4)) & 252645135 AS b FROM c1),
             |c3 AS (SELECT o_orderkey, (a | (a << 2)) & 858993459 AS a,
             |       (b | (b << 2)) & 858993459 AS b FROM c2),
             |c4 AS (SELECT o_orderkey, (a | (a << 1)) & 1431655765 AS a,
             |       (b | (b << 1)) & 1431655765 AS b FROM c3)
             |SELECT o_orderkey, (a | (b << 1)) AS zkey FROM c4
             |ORDER BY zkey, o_orderkey""".stripMargin)),

    // ---- J10: Bloom-pruned semi-join — the petabyte-fact pattern: the
    // fact side is pre-filtered map-side by a Bloom filter of the key set
    // (fits in memory at key counts where the dim itself doesn't), so only
    // might-match rows reach the exchange; the exact semi-join removes the
    // false positives, so the composition is exact and fully
    // oracle-checkable. ----
    QueryDef("j10_bloom_prune",
      (s, d) => {
        val rich = t(s, d, "customer").filter(col("c_acctbal") > 7500)
        graft.operators.Bloom.semiJoin(
            t(s, d, "orders"), rich, "o_custkey", "c_custkey",
            expected = 100000L, fpp = 0.03)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
             |       round(sum(o_totalprice), 2) AS total_price
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM customer c
             |              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 7500)
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---- S3 roundtrip: partitioned sink → pruned read-back. The filter
    // hits the partition directory (PartitionFilters, proven in ScaleSpec);
    // values that crossed the dir-encoding boundary must still hash-match
    // the parquet-side oracle. ----
    // ---- S16: schema evolution — an old-schema batch (2 cols) and a
    // new-schema batch (3 cols) land in the same table path; mergeSchema
    // reconciles at read time, old rows NULL-fill the added column. The
    // lakehouse ingest reality: producers upgrade schemas mid-table ----
    QueryDef("s16_schema_evolution",
      (s, d) => {
        val tmp = scratchDir("graft-schema-evo")
        val o = t(s, d, "orders")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$tmp/batch=1")
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .write.mode("overwrite").parquet(s"$tmp/batch=2")
        s.read.option("mergeSchema", "true").parquet(tmp)
          .groupBy(coalesce(col("o_orderstatus"), lit("pre_upgrade")).as("status"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy("status")
      },
      Some("""SELECT coalesce(CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END,
             |                'pre_upgrade') AS status,
             |       count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY 1 ORDER BY status""".stripMargin)),

    // ---- S17: corrupt-record capture — real feeds carry malformed rows;
    // PERMISSIVE json parsing keeps them in _corrupt_record instead of
    // failing the batch (FAILFAST) or silently dropping them (DROPMALFORMED).
    // Corruption is planted deterministically so the oracle replays it ----
    QueryDef("s17_corrupt_records",
      (s, d) => {
        import s.implicits._
        val tmp = scratchDir("graft-corrupt")
        t(s, d, "orders").filter(col("o_orderkey") % 10 === 0)
          .select(when(col("o_orderkey") % 30 === 0,
              concat(lit("{broken "), col("o_orderkey").cast("string")))
            .otherwise(to_json(struct(col("o_orderkey").as("k"),
              col("o_totalprice").as("p")))).as("value"))
          .write.mode("overwrite").text(tmp)
        val schema = "k LONG, p DOUBLE, _corrupt_record STRING"
        s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(tmp)
          .agg(count(col("k")).as("n_good"),
            count(col("_corrupt_record")).as("n_bad"),
            round(sum(col("p")), 2).as("good_total"))
      },
      Some("""SELECT count(CASE WHEN o_orderkey % 30 <> 0 THEN 1 END) AS n_good,
             |       count(CASE WHEN o_orderkey % 30 = 0 THEN 1 END) AS n_bad,
             |       round(sum(CASE WHEN o_orderkey % 30 <> 0 THEN o_totalprice END), 2)
             |         AS good_total
             |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin)),

    // ---- s18: OPTIMIZE-style small-file compaction (Sinks.compact) —
    // the maintenance pass incremental ingest needs at scale. A 64-way
    // fragmented copy of orders is re-packed toward 256 MB files (the
    // tiny test table lands in exactly ONE), and the compacted snapshot
    // must carry identical data: the oracle replays the aggregate from
    // the source table, and the file counts ride the output as
    // literal-checkable columns (coalesce = narrow merge, zero shuffle,
    // so 64 → 1 is deterministic). ----
    QueryDef("s18_compaction",
      (s, d) => {
        import s.implicits._
        val src = scratchDir("graft-compact-src")
        val dst = scratchDir("graft-compact-dst")
        t(s, d, "orders").repartition(64)
          .write.mode("overwrite").parquet(s"$src/t")
        val target = 256L * 1024 * 1024
        val (nb, na, bytes) = Sinks.compact(s, s"$src/t", s"$dst/t",
          targetBytes = target)
        // the file-count contract is asserted HERE, scale-independently
        // (the oracle sees only data aggregates): coalesce can only MERGE,
        // so outputs land in [1, ceil(bytes/target)] — the exact-equality
        // check lives in SinksSpec under a pinned maxPartitionBytes
        // (coalesce cannot RAISE the partition count, so a reader config
        // that packs the 64 source files into fewer splits than `want`
        // must not crash a correct compaction here)
        val want = math.max(1, math.ceil(bytes.toDouble / target).toInt)
        require(bytes > 0 && na >= 1 && na <= want && nb <= 64 && na <= nb,
          s"compaction contract: $nb files / $bytes bytes -> $na (want <= $want)")
        s.read.parquet(s"$dst/t")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("o_custkey")).as("n_cust"),
            (floor(sum(col("o_totalprice")) * 100 + 0.5) / 100.0).as("total_price"))
      },
      Some("""SELECT count(*) AS n_rows,
             |       count(DISTINCT o_custkey) AS n_cust,
             |       floor(sum(o_totalprice) * 100 + 0.5) / 100.0 AS total_price
             |FROM orders""".stripMargin)),

    QueryDef("s3b_partitioned_roundtrip",
      (s, d) => {
        val tmp = scratchDir("graft-part-rt")
        Sinks.writePartitioned(t(s, d, "customer"), tmp, Seq("c_mktsegment"))
        s.read.parquet(tmp).filter(col("c_mktsegment") === "BUILDING")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("total_bal"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS n_cust,
             |       round(sum(c_acctbal), 2) AS total_bal
             |FROM customer WHERE c_mktsegment = 'BUILDING'
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ---- S8 roundtrip: CSV sink → header/inferSchema source. CSV
    // stringifies every value, so the aggregate on the read-back copy
    // catches quoting/typing loss in either direction. ----
    QueryDef("s8b_csv_roundtrip",
      (s, d) => {
        val tmp = scratchDir("graft-csv-rt")
        Sinks.writeCsv(t(s, d, "nation"), tmp,
          Seq("n_nationkey", "n_name", "n_regionkey"))
        Sources.csv(s, tmp)
          .groupBy(col("n_regionkey").cast("long").as("n_regionkey"))
          .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_name"))
          .orderBy("n_regionkey")
      },
      Some("""SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // ---- S9 roundtrip: JSON map-file source with maptype assert
    // (GetWeta.py:811-831, dwwApi.js:51-58). A companyMap-shaped file —
    // {"maptype":…, "maps":{<raw search>:{name,id}}} with DYNAMIC keys —
    // is assembled from the nation dim, written, then read back through
    // mapFileEntries (maptype validated, wide struct re-parsed as a real
    // map, exploded to dim rows). Map files are dim-sized by definition
    // (the reference writes them with writeFileSync), so the single-row
    // JSON assembly crossing to the driver for the file write is fine. ----
    QueryDef("s9_mapfile_roundtrip",
      (s, d) => {
        val tmp = scratchDir("graft-mapfile")
        val doc = t(s, d, "nation")
          .select(col("n_name").as("k"),
            struct(col("n_name").as("name"),
              col("n_nationkey").cast("string").as("id")).as("v"))
          .agg(map_from_entries(sort_array(collect_list(struct(col("k"), col("v"))))).as("maps"))
          .select(to_json(struct(lit("company").as("maptype"), col("maps"))).as("j"))
          .head().getString(0)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, "companyMap.json"), doc.getBytes("UTF-8"))
        Sources.mapFileEntries(s, s"$tmp/companyMap.json", "company")
          .orderBy("search")
      },
      Some("""SELECT n_name AS search, n_name AS name, n_nationkey::VARCHAR AS id
             |FROM nation ORDER BY search""".stripMargin)),

    // ---- S11 roundtrip: dim upsert with versioned snapshot
    // (dwwRoutes.js:131-172). v1 is written live, then v2 upserts over it
    // — the old snapshot must land intact under backups/<name>_<version>
    // while the live table serves v2. Both copies are read back and
    // tagged, so a missed backup, a stale live table, or a corrupted copy
    // all break the hash. ----
    QueryDef("s11_upsert_backup",
      (s, d) => {
        val tmp = scratchDir("graft-upsert")
        val v1 = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
        Sinks.upsertWithBackup(s, v1, tmp, "nation_dim", 1L)
        val v2 = v1.withColumn("n_name", upper(col("n_name")))
        val backupPath = Sinks.upsertWithBackup(s, v2, tmp, "nation_dim", 2L)
        val live = s.read.parquet(s"$tmp/nation_dim")
        val backup = s.read.parquet(backupPath)
        backup.select(lit("backup").as("snapshot"), col("n_nationkey"), col("n_name"))
          .union(live.select(lit("live").as("snapshot"), col("n_nationkey"), col("n_name")))
          .orderBy("snapshot", "n_nationkey")
      },
      Some("""SELECT 'backup' AS snapshot, n_nationkey, n_name FROM nation
             |UNION ALL
             |SELECT 'live' AS snapshot, n_nationkey, upper(n_name) AS n_name FROM nation
             |ORDER BY snapshot, n_nationkey""".stripMargin)),

    // ---- S12 roundtrip: plain JSON document source (receiveData.js:3-15)
    // — one JSON array document per file, the viz layer's POST body shape,
    // read back through the multiLine source. ----
    QueryDef("s12_viz_json_roundtrip",
      (s, d) => {
        val tmp = scratchDir("graft-vizjson")
        val doc = t(s, d, "region")
          .select(struct(col("r_regionkey"), col("r_name")).as("r"))
          .agg(to_json(sort_array(collect_list(col("r")))).as("j"))
          .head().getString(0)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, "viz.json"), doc.getBytes("UTF-8"))
        Sources.json(s, s"$tmp/viz.json")
          .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
          .orderBy("r_regionkey")
      },
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // ---- stats1: ANALYZE-style column profile — rows/nulls/NDV/min/max
    // for four lineitem columns, unpivoted via stack. The four NDVs run
    // as SEPARATE single-distinct aggregates crossJoined back (each a
    // one-column pruned scan with partial distinct-agg): four distincts
    // in ONE aggregate plan through a 4× Expand of every fact row — the
    // multi-distinct rewrite quadruples the scan's row volume before the
    // hash agg, measured 6.9× slower than the four pruned scans at sf0.1 (6.25 s vs 0.91 s).
    // Renderings are type-explicit so both engines emit identical
    // strings; l_quantity is integer-valued so %.2f can't face a rounding
    // boundary ----
    QueryDef("stats1_column_profile",
      (s, d) => {
        val li = t(s, d, "lineitem")
        def ndv(c: String, alias: String) =
          broadcast(li.agg(countDistinct(col(c)).as(alias)))
        li.agg(
            count(lit(1)).as("n"),
            count(col("l_orderkey")).as("c1"),
            min(col("l_orderkey")).cast("string").as("mn1"),
            max(col("l_orderkey")).cast("string").as("mx1"),
            count(col("l_quantity")).as("c2"),
            format_string("%.2f", min(col("l_quantity"))).as("mn2"),
            format_string("%.2f", max(col("l_quantity"))).as("mx2"),
            count(col("l_shipdate")).as("c3"),
            date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("mn3"),
            date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("mx3"),
            count(col("l_returnflag")).as("c4"),
            min(col("l_returnflag")).as("mn4"),
            max(col("l_returnflag")).as("mx4"))
          .crossJoin(ndv("l_orderkey", "d1"))
          .crossJoin(ndv("l_quantity", "d2"))
          .crossJoin(ndv("l_shipdate", "d3"))
          .crossJoin(ndv("l_returnflag", "d4"))
          .selectExpr(
            """stack(4,
               |  'l_orderkey',  n, n - c1, d1, mn1, mx1,
               |  'l_quantity',  n, n - c2, d2, mn2, mx2,
               |  'l_shipdate',  n, n - c3, d3, mn3, mx3,
               |  'l_returnflag', n, n - c4, d4, mn4, mx4)
               |AS (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
               |""".stripMargin)
          .orderBy("column_name")
      },
      Some {
        def row(c: String, mn: String, mx: String) =
          s"""SELECT '$c' AS column_name, count(*)::BIGINT AS n_rows,
             |  (count(*) - count($c))::BIGINT AS n_nulls,
             |  count(DISTINCT $c)::BIGINT AS n_distinct,
             |  $mn AS min_value, $mx AS max_value FROM lineitem""".stripMargin
        Seq(
          row("l_orderkey", "CAST(min(l_orderkey) AS VARCHAR)",
            "CAST(max(l_orderkey) AS VARCHAR)"),
          row("l_quantity", "printf('%.2f', min(l_quantity))",
            "printf('%.2f', max(l_quantity))"),
          row("l_shipdate", "strftime(min(l_shipdate), '%Y-%m-%d')",
            "strftime(max(l_shipdate), '%Y-%m-%d')"),
          row("l_returnflag", "min(l_returnflag)", "max(l_returnflag)"))
          .mkString("SELECT * FROM (\n", "\nUNION ALL ", ")\nORDER BY column_name")
      }),

    // ---- stats2: equi-width histogram (20 bins) of l_extendedprice —
    // global min/max as a broadcast 1-row stats relation, bin arithmetic
    // identical double expressions on both engines ----
    QueryDef("stats2_histogram",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val bounds = li.agg(min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx"))
        li.crossJoin(broadcast(bounds))
          .select(least(
              floor((col("l_extendedprice") - col("mn")) /
                ((col("mx") - col("mn")) / 20.0)),
              lit(19L)).cast("int").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("cnt"))
          .orderBy("bin")
      },
      Some("""WITH s AS (SELECT min(l_extendedprice) AS mn,
             |                  max(l_extendedprice) AS mx FROM lineitem)
             |SELECT least(floor((l_extendedprice - mn) / ((mx - mn) / 20.0)),
             |             19.0)::INT AS bin,
             |       count(*)::BIGINT AS cnt
             |FROM lineitem, s GROUP BY 1 ORDER BY bin""".stripMargin)),

    // ---- S5: CSV sink projection with comma strip (dwwApi.js:33-35) ----
    QueryDef("s5_csv_projection",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          regexp_replace(col("p_name"), ",", "").as("name_clean"),
          regexp_replace(col("p_type"), ",", "").as("type_clean"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, replace(p_name, ',', '') AS name_clean,
             |       replace(p_type, ',', '') AS type_clean
             |FROM part ORDER BY p_partkey""".stripMargin))
  )
}
