package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.functions.Scalars

/** SURVEY.md §2.8 scalar library (F1-F16) exercised end-to-end over testdata.
  * F1/F2/F4 carry difflib/regex-chain semantics no SQL engine reproduces —
  * they get rows-only entries here and exact unit tests in ScalarsSpec;
  * everything else is oracle-checked.
  */
object ScalarQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- F1: credit-notes parser on constructed benign input: the full
    // regex chain reduces to split/trim for this input, so the oracle is
    // trivially computable; hostile inputs are unit-tested. ----
    QueryDef("f1_parse_notes",
      (s, d) => {
        Scalars.register(s)
        t(s, d, "documents")
          .withColumn("note", concat(col("lang"), lit(" artist: "), col("source")))
          .withColumn("parsed", Scalars.parseNotes(col("note"), lit("")))
          .select(col("doc_id"), col("parsed.role").as("role"), col("parsed.company").as("company"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang || ' artist' AS role, source AS company
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- F4: difflib fuzz ratio (rows-only; exact vectors in ScalarsSpec) ----
    QueryDef("f4_fuzz_ratio",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          Scalars.fuzzRatio(col("p_name"), col("p_type")).as("ratio"))
        .orderBy("p_partkey"),
      None),

    // ---- F2: earliest-date normalizer. First entry unparseable, second is
    // "(tag) 3 March YYYY" → the oracle can state the expected normalized
    // output directly; hostile-input vectors live in ScalarsSpec. ----
    QueryDef("f2_parse_earliest",
      (s, d) => t(s, d, "documents")
        .withColumn("dates", array(
          lit("bad date"),
          concat(lit("(tag) 3 March "), (lit(1990) + pmod(col("doc_id"), lit(30))).cast("string"))))
        .select(col("doc_id"), Scalars.parseEarliestDate(col("dates")).as("release"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, (1990 + doc_id % 30) || '-03-03' AS release
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- F3: zero-pad (GetWeta.py:362-365) ----
    QueryDef("f3_zero_pad",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          Scalars.zeroPad2(pmod(col("o_orderkey"), lit(100))).as("padded"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0') AS padded
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- F5 + F6: haversine + trip days over pseudo-coords ----
    QueryDef("f5_f6_haversine_trip",
      (s, d) => {
        val c = t(s, d, "customer")
          .withColumn("lat1", ((col("c_custkey") % 120) - 60).cast("double"))
          .withColumn("lon1", (((col("c_custkey") * 7) % 360) - 180).cast("double"))
          .withColumn("lat2", ((col("c_nationkey") * 5) - 60).cast("double"))
          .withColumn("lon2", ((col("c_nationkey") * 14) - 175).cast("double"))
        val km = Scalars.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2"))
        c.select(col("c_custkey"), round(km, 4).as("km"),
            Scalars.tripLengthDays(km).as("trip_days"))
          .orderBy("c_custkey")
      },
      Some {
        val hav = QueryDef.haversineSql("lat1", "lon1", "lat2", "lon2")
        s"""SELECT c_custkey, round($hav, 4) AS km,
           |       greatest(1::BIGINT, floor(($hav) / 100)::BIGINT) AS trip_days
           |FROM (
           |  SELECT c_custkey,
           |         ((c_custkey % 120) - 60)::DOUBLE AS lat1,
           |         (((c_custkey * 7) % 360) - 180)::DOUBLE AS lon1,
           |         ((c_nationkey * 5) - 60)::DOUBLE AS lat2,
           |         ((c_nationkey * 14) - 175)::DOUBLE AS lon2
           |  FROM customer)
           |ORDER BY c_custkey""".stripMargin
      }),

    // ---- F7: day arithmetic (dwwApi.js:227-229) ----
    QueryDef("f7_datediff",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("delay_days"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |       date_diff('day', o_orderdate::DATE, l_shipdate::DATE)::INT AS delay_days
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- F8: date parse/format roundtrip (timeControl.js:261-277) ----
    QueryDef("f8_date_format",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_ms"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS ds,
             |       epoch_ms(o_orderdate) AS epoch_ms
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- F10: longitude wraparound difference (pathCreator.js:178-199) ----
    QueryDef("f10_lon_wrap",
      (s, d) => {
        val o = t(s, d, "orders")
          .withColumn("lon1", (((col("o_orderkey") * 7) % 360) - 180).cast("double"))
          .withColumn("lon2", (((col("o_custkey") * 13) % 360) - 180).cast("double"))
        o.select(col("o_orderkey"), col("lon1"), col("lon2"),
            Scalars.lonDiff(col("lon1"), col("lon2")).as("lon_diff"))
          .orderBy("o_orderkey")
      },
      Some {
        val ld = QueryDef.lonDiffSql("lon1", "lon2")
        s"""SELECT o_orderkey, lon1, lon2, $ld AS lon_diff FROM (
           |  SELECT o_orderkey,
           |         (((o_orderkey * 7) % 360) - 180)::DOUBLE AS lon1,
           |         (((o_custkey * 13) % 360) - 180)::DOUBLE AS lon2
           |  FROM orders)
           |ORDER BY o_orderkey""".stripMargin
      }),

    // ---- F11: blacklist token scrub (dwwFront.js:155-176) ----
    QueryDef("f11_blacklist_scrub",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          Scalars.scrubTokens(col("p_name"), Seq("green", "blue", "red")).as("scrubbed"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |       replace(replace(replace(lower(p_name), 'green', ''), 'blue', ''), 'red', '') AS scrubbed
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- F12: comma-string geo parse (locUtils.js:25-30) ----
    QueryDef("f12_geo_parse",
      (s, d) => {
        val c = t(s, d, "customer")
          .withColumn("packed", concat(
            ((col("c_custkey") % 120) - 60).cast("string"), lit(","),
            (((col("c_custkey") * 7) % 360) - 180).cast("string")))
        c.select(col("c_custkey"),
            Scalars.parseGeo(col("packed")).getField("lat").as("lat"),
            Scalars.parseGeo(col("packed")).getField("lon").as("lon"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |       CAST(split_part(packed, ',', 1) AS DOUBLE) AS lat,
             |       CAST(split_part(packed, ',', 2) AS DOUBLE) AS lon
             |FROM (SELECT c_custkey,
             |             concat((c_custkey % 120) - 60, ',', ((c_custkey * 7) % 360) - 180) AS packed
             |      FROM customer)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- F13: initcap (dwwFront.js:16-20) ----
    QueryDef("f13_initcap",
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey"), initcap(lower(col("c_mktsegment"))).as("pretty"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |       upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS pretty
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // ---- F14: log-base-3 scaling (uiElements.js:423-426) ----
    QueryDef("f14_log3_scale",
      (s, d) => t(s, d, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
        .select(col("o_custkey"), round(Scalars.logBase3(col("cnt")), 6).as("scaled"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, round(ln(cnt) / ln(3), 6) AS scaled
             |FROM (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey)
             |ORDER BY o_custkey""".stripMargin)),

    // ---- F15: company-suffix strip (GetWeta.py:381) ----
    QueryDef("f15_suffix_strip",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          Scalars.stripCompanySuffix(concat(lower(col("p_name")), lit(" ltd."))).as("stripped"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |       regexp_replace(lower(p_name) || ' ltd.', '(?:\sltd|\sinc)\.|(?:\sltd|\sinc)', '', 'g') AS stripped
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- F16: sentinel tagging (dwwFront.js:365-369) ----
    QueryDef("f16_sentinel_tag",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"), Scalars.sentinelRole(col("p_brand")).as("tagged"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, 'zzz_role:' || p_brand AS tagged
             |FROM part ORDER BY p_partkey""".stripMargin))
  )
}
