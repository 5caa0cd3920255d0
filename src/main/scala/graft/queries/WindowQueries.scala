package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.analytics.{Density, Jumps, Paths}

/** SURVEY.md §2.5 window/sequence operators (W1-W7), §2.4 density (A8-A9),
  * grouped jumps (A11), nested docs (W3/A10/S10) — the heart of the engine.
  *
  * Mapping onto testdata: person ≙ o_custkey, company ≙ o_orderstatus,
  * role ≙ o_orderpriority, release ≙ (o_orderdate, o_orderkey). Every
  * operator is a lag/lead or generator over
  * Window.partitionBy(custkey).orderBy(date, key) — hash partition + local
  * sort, no global sort, no driver loop; the exact shape that scales.
  */
object WindowQueries {

  private def orders(s: SparkSession, d: String) = Tables.table(s, d, "orders")

  private val K = Jumps.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus")

  /** Shared DuckDB CTE: consecutive-company dedup (W2) over orders. */
  private val jumpsCte =
    """WITH led AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus, o_orderpriority,
      |         lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pc
      |  FROM orders),
      |j AS (SELECT * FROM led WHERE pc IS NULL OR o_orderstatus <> pc)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- W1: jump detection + run-length tallies (GetWeta.py:587-673) ----
    QueryDef("w1_jump_segments",
      (s, d) => Jumps.segments(orders(s, d), K)
        .orderBy("o_custkey", "seg_id"),
      Some("""WITH flagged AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             |         CASE WHEN lag(o_orderstatus) OVER w IS NULL
             |                OR o_orderstatus <> lag(o_orderstatus) OVER w
             |              THEN 1 ELSE 0 END AS chg
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |seg AS (
             |  SELECT o_custkey, o_orderstatus,
             |         sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |                        ROWS UNBOUNDED PRECEDING)::BIGINT AS seg_id
             |  FROM flagged)
             |SELECT o_custkey, seg_id, o_orderstatus, count(*) AS stay_count
             |FROM seg GROUP BY 1, 2, 3 ORDER BY o_custkey, seg_id""".stripMargin)),

    // ---- W2: consecutive-company dedup (dwwApi.js:100-107) ----
    QueryDef("w2_jumps_only",
      (s, d) => Jumps.jumpsOnly(orders(s, d), K)
        .select("o_custkey", "o_orderkey", "o_orderstatus")
        .orderBy("o_custkey", "o_orderkey"),
      Some(s"""$jumpsCte
              |SELECT o_custkey, o_orderkey, o_orderstatus FROM j
              |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- W3 + S10: nested document assembly then flatten back ----
    // (dwwApi.js:80-142 / utils/jsonToCsv.py) — exercises collect_list(struct)
    // + explode; the flat oracle is the roundtrip identity.
    QueryDef("w3_doc_roundtrip",
      (s, d) => {
        val docs = Jumps.assembleDocs(
          orders(s, d).withColumn("o_name", concat(lit("cust_"), col("o_custkey"))),
          "o_custkey", "o_name",
          Seq(col("o_orderdate"), col("o_orderkey"), col("o_orderstatus")))
        docs.select(col("o_custkey"), explode(col("rels")).as("rel"))
          .select(col("o_custkey"), col("rel.o_orderkey").as("o_orderkey"),
                  col("rel.o_orderstatus").as("o_orderstatus"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderstatus FROM orders
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- W4: dummy in-transit synthesis (dwwApi.js:281-293) ----
    QueryDef("w4_dummy_synthesis",
      (s, d) => {
        val base = orders(s, d)
          .withColumn("time_ms", unix_millis(col("o_orderdate").cast("timestamp")))
          .withColumn("lat", ((col("o_custkey") % 120) - 60).cast("double"))
          .withColumn("lon", (((col("o_custkey") * 7) % 360) - 180).cast("double"))
        Jumps.withDummies(base, K, "time_ms", "lat", "lon")
          .withColumnRenamed("company", "o_orderstatus")
          .orderBy("o_custkey", "time_ms", "dummy", "o_orderstatus")
      },
      Some {
        val lat = QueryDef.latFromKeySql("o_custkey")
        val lon = QueryDef.lonFromKeySql("o_custkey")
        val hav = QueryDef.haversineSql("lat", "lon", "nlat", "nlon")
        s"""WITH base AS (
           |  SELECT o_custkey, o_orderstatus, epoch_ms(o_orderdate) AS tms,
           |         ($lat)::DOUBLE AS lat, ($lon)::DOUBLE AS lon, o_orderdate, o_orderkey
           |  FROM orders),
           |led AS (
           |  SELECT *, lead(tms) OVER w AS nt, lead(lat) OVER w AS nlat, lead(lon) OVER w AS nlon
           |  FROM base WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
           |recs AS (
           |  SELECT o_custkey, o_orderstatus, tms AS time_ms, false AS dummy FROM led
           |  UNION ALL
           |  SELECT o_custkey, o_orderstatus,
           |         nt - 86400000 * greatest(1::BIGINT, floor(($hav) / 100)::BIGINT) AS time_ms,
           |         true AS dummy
           |  FROM led WHERE nt IS NOT NULL)
           |SELECT o_custkey, o_orderstatus, time_ms, dummy FROM recs
           |ORDER BY o_custkey, time_ms, dummy, o_orderstatus""".stripMargin
      }),

    // ---- W5: directional jump filter, dir=in (dwwApi.js:256-280) ----
    QueryDef("w5_directional_in",
      (s, d) => Jumps.directional(Jumps.jumpsOnly(orders(s, d), K), K, "o_orderstatus", "F", "in")
        .select("o_custkey", "o_orderkey", "o_orderstatus")
        .orderBy("o_custkey", "o_orderkey"),
      Some(s"""$jumpsCte,
              |nx AS (
              |  SELECT *, lead(lower(o_orderstatus)) OVER (PARTITION BY o_custkey
              |            ORDER BY o_orderdate, o_orderkey) AS nk
              |  FROM j)
              |SELECT o_custkey, o_orderkey, o_orderstatus FROM nx WHERE nk = 'f'
              |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- W5: directional jump filter, dir=out ----
    QueryDef("w5_directional_out",
      (s, d) => Jumps.directional(Jumps.jumpsOnly(orders(s, d), K), K, "o_orderstatus", "O", "out")
        .select("o_custkey", "o_orderkey", "o_orderstatus")
        .orderBy("o_custkey", "o_orderkey"),
      Some(s"""$jumpsCte,
              |pv AS (
              |  SELECT *, lag(lower(o_orderstatus)) OVER (PARTITION BY o_custkey
              |            ORDER BY o_orderdate, o_orderkey) AS pk
              |  FROM j)
              |SELECT o_custkey, o_orderkey, o_orderstatus FROM pv WHERE pk = 'o'
              |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- W7: earliest first-match extraction (GetWeta.py:348-368) ----
    QueryDef("w7_first_match",
      (s, d) => Jumps.firstMatch(orders(s, d), K, col("o_orderstatus") === "F")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |         row_number() OVER (PARTITION BY o_custkey
             |                            ORDER BY o_orderdate, o_orderkey) AS rn
             |  FROM orders WHERE o_orderstatus = 'F') WHERE rn = 1
             |ORDER BY o_custkey""".stripMargin)),

    // ---- A8: gap-filled density cube (densityCalc.js:60-90) ----
    QueryDef("a8_density_build",
      (s, d) => Density.build(
          orders(s, d).withColumn("yr", year(col("o_orderdate"))),
          Density.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus", "o_orderpriority", "yr"))
        .orderBy("company", "year", "role"),
      Some("""WITH base AS (
             |  SELECT o_custkey, o_orderstatus, o_orderpriority,
             |         year(o_orderdate)::INT AS yr, o_orderdate, o_orderkey
             |  FROM orders),
             |led AS (
             |  SELECT *, lead(yr) OVER w AS ny, lead(o_orderstatus) OVER w AS nc
             |  FROM base WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |kept AS (
             |  SELECT * FROM led
             |  WHERE NOT (ny IS NOT NULL AND yr = ny AND o_orderstatus = nc)),
             |filled AS (
             |  SELECT o_orderstatus, o_orderpriority,
             |         unnest(generate_series(yr,
             |           CASE WHEN ny IS NULL THEN yr ELSE greatest(yr, ny - 1) END))::INT AS year
             |  FROM kept)
             |SELECT o_orderstatus AS company, year, o_orderpriority AS role, count(*) AS cnt
             |FROM filled GROUP BY 1, 2, 3 ORDER BY company, year, role""".stripMargin)),

    // ---- A9: density totals minus unmapped bucket (densityCalc.js:101-121) ----
    QueryDef("a9_density_totals",
      (s, d) => Density.totals(
          Density.build(
            orders(s, d).withColumn("yr", year(col("o_orderdate"))),
            Density.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus", "o_orderpriority", "yr")),
          unmappedRole = "1-URGENT")
        .orderBy("company", "year"),
      Some("""WITH base AS (
             |  SELECT o_custkey, o_orderstatus, o_orderpriority,
             |         year(o_orderdate)::INT AS yr, o_orderdate, o_orderkey
             |  FROM orders),
             |led AS (
             |  SELECT *, lead(yr) OVER w AS ny, lead(o_orderstatus) OVER w AS nc
             |  FROM base WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |kept AS (
             |  SELECT * FROM led
             |  WHERE NOT (ny IS NOT NULL AND yr = ny AND o_orderstatus = nc)),
             |filled AS (
             |  SELECT o_orderstatus, o_orderpriority,
             |         unnest(generate_series(yr,
             |           CASE WHEN ny IS NULL THEN yr ELSE greatest(yr, ny - 1) END))::INT AS year
             |  FROM kept)
             |SELECT o_orderstatus AS company, year,
             |       sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS total
             |FROM filled GROUP BY 1, 2 ORDER BY company, year""".stripMargin)),

    // ---- A10: distinct over nested rels (functions.js:116-140) ----
    QueryDef("a10_distinct_nested",
      (s, d) => {
        val docs = Jumps.assembleDocs(
          orders(s, d).withColumn("o_name", concat(lit("cust_"), col("o_custkey"))),
          "o_custkey", "o_name",
          Seq(col("o_orderdate"), col("o_orderkey"), col("o_orderstatus")))
        graft.analytics.Catalog.distinctNested(docs, "rels", "o_orderstatus")
          .withColumnRenamed("o_orderstatus", "company")
          .orderBy("company")
      },
      Some("""SELECT DISTINCT o_orderstatus AS company FROM orders ORDER BY company""")),

    // ---- A11: grouped jumps with totals (dwwApi.js:176-189) ----
    QueryDef("a11_grouped_jumps",
      (s, d) => Jumps.jumpsOnly(orders(s, d), K)
        .groupBy(col("o_orderstatus").as("company"))
        .agg(count(lit(1)).as("total"), countDistinct(col("o_custkey")).as("n_people"))
        .orderBy("company"),
      Some(s"""$jumpsCte
              |SELECT o_orderstatus AS company, count(*) AS total,
              |       count(DISTINCT o_custkey) AS n_people
              |FROM j GROUP BY 1 ORDER BY company""".stripMargin)),

    // ---- W6: path expansion — interpolation core (pathCreator.js:101-133) ----
    QueryDef("w6_path_interp",
      (s, d) => {
        val base = orders(s, d)
          .withColumn("time_ms", unix_millis(col("o_orderdate").cast("timestamp")))
          .withColumn("lat", ((col("o_orderkey") % 120) - 60).cast("double"))
          .withColumn("lon", (((col("o_orderkey") * 13) % 360) - 180).cast("double"))
        val K2 = Paths.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus",
          "lat", "lon", "time_ms")
        Paths.expand(base, K2)
          .select(col("person_id").as("o_custkey"), col("seq"),
            round(col("lat"), 6).as("plat"), round(col("lon"), 6).as("plon"),
            col("when_ms"))
          .orderBy("o_custkey", "when_ms", "seq", "plat", "plon")
      },
      Some {
        val lat = QueryDef.latFromKeySql("o_orderkey")
        val lon = s"(((o_orderkey * 13) % 360) - 180)"
        val ld = QueryDef.lonDiffSql("lon", "nlon")
        s"""WITH base AS (
           |  SELECT o_custkey, o_orderstatus AS company, epoch_ms(o_orderdate) AS tms,
           |         ($lat)::DOUBLE AS lat, ($lon)::DOUBLE AS lon, o_orderdate, o_orderkey
           |  FROM orders),
           |led AS (
           |  SELECT *, lead(company) OVER w AS nc, lead(lat) OVER w AS nlat,
           |         lead(lon) OVER w AS nlon, lead(tms) OVER w AS nt
           |  FROM base WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
           |pairs AS (SELECT * FROM led WHERE nc IS NOT NULL AND nc <> company),
           |pts AS (
           |  SELECT o_custkey, lat, lon, nlat, nlon, tms, nt,
           |         unnest(generate_series(0, 50))::INT AS seq
           |  FROM pairs)
           |SELECT o_custkey, seq,
           |       round(lat + (nlat - lat) * seq / 50, 6) AS plat,
           |       round(lon + $ld * seq / 50, 6) AS plon,
           |       tms + floor(((nt - tms) * seq) / 50.0)::BIGINT AS when_ms
           |FROM pts ORDER BY o_custkey, when_ms, seq, plat, plon""".stripMargin
      }),

    // ---- ranking family: rank / dense_rank / ntile (beyond-reference
    // window completeness; the reference only needed lag/lead) ----
    QueryDef("wf1_ranking",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"), asc("o_orderkey"))
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       rank() OVER w AS rnk,
             |       dense_rank() OVER w AS drnk,
             |       ntile(4) OVER w AS quartile
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- exact interpolated percentiles per group ----
    QueryDef("wf2_percentiles",
      (s, d) => orders(s, d)
        .groupBy(col("o_orderstatus").as("company"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
        .orderBy("company"),
      Some("""SELECT o_orderstatus AS company,
             |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |       round(quantile_cont(o_totalprice, 0.95), 4) AS p95
             |FROM orders GROUP BY o_orderstatus ORDER BY company""".stripMargin)),

    // ---- per-group winsorization: clamp a numeric feature to its
    // group's [p05, p95] — the standard outlier-capping pass before
    // numeric features feed training. Percentile dim broadcast back; the
    // clamp is codegen'd least/greatest, one scan after the stats pass ----
    QueryDef("wf5_winsorize",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val pcts = li.groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, 0.05)").as("p05"),
               expr("percentile(l_extendedprice, 0.95)").as("p95"))
        li.join(broadcast(pcts), "l_returnflag")
          .select(col("l_returnflag"),
            least(greatest(col("l_extendedprice"), col("p05")), col("p95")).as("w"),
            col("p05"), col("p95"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(first(col("p05")), 4).as("p05"),
            round(first(col("p95")), 4).as("p95"),
            round(sum(col("w")), 2).as("winsorized_sum"))
          .orderBy("l_returnflag")
      },
      Some("""WITH pcts AS (
             |  SELECT l_returnflag,
             |         quantile_cont(l_extendedprice, 0.05) AS p05,
             |         quantile_cont(l_extendedprice, 0.95) AS p95
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l.l_returnflag, count(*) AS n,
             |       round(any_value(p.p05), 4) AS p05,
             |       round(any_value(p.p95), 4) AS p95,
             |       round(sum(least(greatest(l.l_extendedprice, p.p05), p.p95)), 2)
             |         AS winsorized_sum
             |FROM lineitem l JOIN pcts p USING (l_returnflag)
             |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin)),

    // ---- distribution + frame window functions: percent_rank/cume_dist
    // and a bounded rows-frame moving aggregate (the remaining analytic
    // surface beyond wf1's ranking family). Frame sums evaluate
    // sequentially within the frame, so the float fold is deterministic. ----
    QueryDef("wf3_frames",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey")).orderBy(asc("o_orderdate"), asc("o_orderkey"))
        val wf = w.rowsBetween(-2, 0)
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            round(percent_rank().over(w), 6).as("prnk"),
            round(cume_dist().over(w), 6).as("cdist"),
            round(avg(col("o_totalprice")).over(wf), 4).as("ma3"),
            round(max(col("o_totalprice")).over(wf), 2).as("mx3"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       round(percent_rank() OVER w, 6) AS prnk,
             |       round(cume_dist() OVER w, 6) AS cdist,
             |       round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3,
             |       round(max(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mx3
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- wf4: RFM customer segmentation. The interesting part is the
    // plan: the quintiles come from Ranking.globalNtile (range exchange +
    // local rank + broadcast prefix offsets), NOT `ntile() OVER (ORDER
    // BY ...)` — the naive form funnels the whole customer table through
    // ONE task; this one is exchange-parallel at any scale and
    // bit-identical to SQL NTILE (the oracle IS the naive form).
    // Monetary ranks on exact cents so float summation order can never
    // flip a rank. ----
    QueryDef("wf4_rfm",
      (s, d) => {
        val rfm = orders(s, d).groupBy(col("o_custkey")).agg(
          max(to_date(col("o_orderdate"))).as("last_order"),
          count(lit(1)).as("frequency"),
          round(sum(col("o_totalprice")) * 100).cast("long").as("monetary_cents"))
        val scored = Seq[(String, Seq[org.apache.spark.sql.Column])](
          ("r_score", Seq(col("last_order"), col("o_custkey"))),
          ("f_score", Seq(col("frequency"), col("o_custkey"))),
          ("m_score", Seq(col("monetary_cents"), col("o_custkey"))))
          .foldLeft(rfm) { case (df, (name, keys)) =>
            graft.operators.Ranking.globalNtile(df, name, 5, keys: _*)
          }
        scored.select(col("o_custkey"), col("last_order"), col("frequency"),
            round(col("monetary_cents") / 100.0, 2).as("monetary"),
            col("r_score"), col("f_score"), col("m_score"))
          .orderBy("o_custkey")
      },
      Some("""WITH rfm AS (
             |  SELECT o_custkey, max(o_orderdate::DATE) AS last_order,
             |         count(*) AS frequency,
             |         round(sum(o_totalprice) * 100)::BIGINT AS monetary_cents
             |  FROM orders GROUP BY 1)
             |SELECT o_custkey, last_order, frequency,
             |       round(monetary_cents / 100.0, 2) AS monetary,
             |       ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
             |       ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             |       ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS m_score
             |FROM rfm ORDER BY o_custkey""".stripMargin)),

    // ---- wf2b: the 100 TB percentile path. Exact `percentile` buffers
    // every value per group (a 3-group corpus funnels the whole column into
    // 3 aggregation buffers); approx_percentile keeps a bounded GK sketch
    // per partition and merges sketches — O(accuracy) state regardless of
    // group size, at ≤ n/accuracy rank error. Rows-only: Spark's GK and
    // DuckDB's t-digest disagree in the last digits by design; the rank
    // error bound vs the exact percentile is asserted in WindowSpec. ----
    QueryDef("wf2b_percentiles_sketch",
      (s, d) => orders(s, d)
        .groupBy(col("o_orderstatus").as("company"))
        .agg(
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50"),
          expr("approx_percentile(o_totalprice, 0.95, 10000)").as("p95"))
        .orderBy("company"),
      None),

    // ---- W6 full: parabolic altitude + deterministic jitter (rows-only:
    // xxhash64 jitter is not expressible in the oracle; the md5-jitter
    // twin w6b below proves the identical algebra hash-green) ----
    QueryDef("w6_paths_full",
      (s, d) => {
        val base = orders(s, d)
          .withColumn("time_ms", unix_millis(col("o_orderdate").cast("timestamp")))
          .withColumn("lat", ((col("o_custkey") % 120) - 60).cast("double"))
          .withColumn("lon", (((col("o_custkey") * 13) % 360) - 180).cast("double"))
        val K2 = Paths.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus",
          "lat", "lon", "time_ms")
        Paths.expand(base, K2).orderBy("person_id", "path_id", "seq")
      },
      None),

    // ---- W6 full, portable-jitter twin: the ENTIRE path expansion —
    // parabola, anti-meridian wraparound, time interpolation and the
    // [50,100) height jitter — hash-matched against DuckDB ----
    QueryDef("w6b_paths_portable",
      (s, d) => {
        val base = orders(s, d)
          .withColumn("time_ms", unix_millis(col("o_orderdate").cast("timestamp")))
          .withColumn("lat", ((col("o_custkey") % 120) - 60).cast("double"))
          .withColumn("lon", (((col("o_custkey") * 13) % 360) - 180).cast("double"))
        val K2 = Paths.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus",
          "lat", "lon", "time_ms")
        Paths.expand(base, K2, portableJitter = true)
          .orderBy("person_id", "path_id", "seq")
      },
      Some {
        val lonD = QueryDef.lonDiffSql("lon0", "lon1")
        s"""WITH base AS (
           |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
           |         epoch_ms(o_orderdate) AS tms,
           |         ((o_custkey % 120) - 60)::DOUBLE AS lat0,
           |         (((o_custkey * 13) % 360) - 180)::DOUBLE AS lon0
           |  FROM orders),
           |led AS (
           |  SELECT *, lead(o_orderstatus) OVER w AS to_company,
           |         lead(lat0) OVER w AS lat1, lead(lon0) OVER w AS lon1,
           |         lead(tms) OVER w AS tms1
           |  FROM base
           |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
           |paths AS (
           |  SELECT *, ('0x' || substr(md5(o_custkey || '|' || o_orderstatus || '|' ||
           |                                to_company || '|' || tms), 1, 15))::BIGINT AS path_id
           |  FROM led WHERE to_company IS NOT NULL AND to_company <> o_orderstatus),
           |pts AS (SELECT *, unnest(generate_series(0, 50)) AS seq FROM paths)
           |SELECT o_custkey AS person_id, path_id, o_orderstatus AS from_company,
           |       to_company, seq::INT AS seq,
           |       lat0 + (lat1 - lat0) * seq / 50 AS lat,
           |       lon0 + ($lonD) * seq / 50 AS lon,
           |       (-pow((seq - 25.0) * 1.0, 2) + pow(25.0, 2)) *
           |         ((path_id % 5000) / 100.0 + 50.0) AS alt,
           |       tms + floor(((tms1 - tms) * seq) / 50.0)::BIGINT AS when_ms
           |FROM pts ORDER BY person_id, path_id, seq""".stripMargin
      }),

    // ---- W6 role index: {role → [path ids]} (pathCreator.js:38-48), the
    // visualizer's per-role path selector — oracle-green via the portable
    // jitter path ids ----
    QueryDef("w6c_role_index",
      (s, d) => {
        val base = orders(s, d)
          .withColumn("time_ms", unix_millis(col("o_orderdate").cast("timestamp")))
          .withColumn("lat", ((col("o_custkey") % 120) - 60).cast("double"))
          .withColumn("lon", (((col("o_custkey") * 13) % 360) - 180).cast("double"))
        val K2 = Paths.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus",
          "lat", "lon", "time_ms")
        // path_ids is emitted comma-joined rather than as an array: the
        // correctness harness canonicalizes rows via pandas sort/hash, which
        // cannot hash list cells. The array form stays on Paths.roleIndex.
        Paths.roleIndex(
          Paths.pairs(base, K2, portableJitter = true),
          "o_orderpriority")
          .select(col("o_orderpriority"),
            concat_ws(",", col("path_ids").cast("array<string>")).as("path_ids"),
            col("n_paths"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH base AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey, o_orderpriority,
             |         epoch_ms(o_orderdate) AS tms
             |  FROM orders),
             |led AS (
             |  SELECT *, lead(o_orderstatus) OVER w AS to_company
             |  FROM base
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |paths AS (
             |  SELECT DISTINCT o_orderpriority,
             |         ('0x' || substr(md5(o_custkey || '|' || o_orderstatus || '|' ||
             |                             to_company || '|' || tms), 1, 15))::BIGINT AS path_id
             |  FROM led WHERE to_company IS NOT NULL AND to_company <> o_orderstatus)
             |SELECT o_orderpriority,
             |       string_agg(path_id, ',' ORDER BY path_id) AS path_ids,
             |       count(*) AS n_paths
             |FROM paths GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- W6 KML sink (pathCreator.js:108-131): one gx:Track Placemark
    // per path, <when>/<gx:coord> tags concatenated in seq order — the one
    // byte-visible viz artifact, hash-checked end-to-end. Coordinates are
    // fixed to 5dp via %.5f on BOTH engines: the doubles are bit-identical
    // (w6b proves the algebra), and no IEEE double can land exactly on a
    // .xxxxx5 boundary (5/10^6 is not dyadic), so Java's and C's %f
    // rounding agree on every value. ----
    QueryDef("w6d_kml",
      (s, d) => {
        val base = orders(s, d)
          .withColumn("time_ms", unix_millis(col("o_orderdate").cast("timestamp")))
          .withColumn("lat", ((col("o_custkey") % 120) - 60).cast("double"))
          .withColumn("lon", (((col("o_custkey") * 13) % 360) - 180).cast("double"))
        val K2 = Paths.Keys("o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderstatus",
          "lat", "lon", "time_ms")
        // no orderBy: it would range-shuffle the full multi-hundred-MB KML
        // string volume for an ordering the comparator re-derives anyway
        // (rows are sorted by all columns on both sides at check time)
        Paths.kmlTracks(base, K2, portableJitter = true)
          .withColumn("person_id", col("person_id").cast("string"))
      },
      Some {
        val lonD = QueryDef.lonDiffSql("lon0", "lon1")
        s"""WITH base AS (
           |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
           |         epoch_ms(o_orderdate) AS tms,
           |         ((o_custkey % 120) - 60)::DOUBLE AS lat0,
           |         (((o_custkey * 13) % 360) - 180)::DOUBLE AS lon0
           |  FROM orders),
           |led AS (
           |  SELECT *, lead(o_orderstatus) OVER w AS to_company,
           |         lead(lat0) OVER w AS lat1, lead(lon0) OVER w AS lon1,
           |         lead(tms) OVER w AS tms1
           |  FROM base
           |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
           |paths AS (
           |  SELECT *, ('0x' || substr(md5(o_custkey || '|' || o_orderstatus || '|' ||
           |                                to_company || '|' || tms), 1, 15))::BIGINT AS path_id
           |  FROM led WHERE to_company IS NOT NULL AND to_company <> o_orderstatus),
           |pts AS (SELECT *, unnest(generate_series(0, 50)) AS seq FROM paths),
           |tagged AS (
           |  SELECT o_custkey::VARCHAR AS person_id, path_id,
           |         o_orderstatus AS from_company, to_company, seq,
           |         '<when>' || strftime(epoch_ms(tms + floor(((tms1 - tms) * seq) / 50.0)::BIGINT),
           |                              '%Y-%m-%d') || '</when>' AS when_tag,
           |         '<gx:coord>' || printf('%.5f', lon0 + ($lonD) * seq / 50) || ' ' ||
           |           printf('%.5f', lat0 + (lat1 - lat0) * seq / 50) || ' ' ||
           |           printf('%.5f', (-pow((seq - 25.0) * 1.0, 2) + pow(25.0, 2)) *
           |                          ((path_id % 5000) / 100.0 + 50.0)) || '</gx:coord>' AS coord_tag
           |  FROM pts)
           |SELECT person_id, path_id, from_company, to_company,
           |       '<Placemark><gx:Track><altitudeMode>absolute</altitudeMode>' ||
           |       string_agg(when_tag, chr(10) ORDER BY seq) ||
           |       string_agg(coord_tag, chr(10) ORDER BY seq) ||
           |       '</gx:Track></Placemark>' AS kml
           |FROM tagged GROUP BY person_id, path_id, from_company, to_company
           |ORDER BY person_id, path_id""".stripMargin
      })
  )
}
