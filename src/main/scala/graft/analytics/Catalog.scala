package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Catalog/list aggregations (SURVEY.md §2.4: A1–A7, A10; P5).
  *
  * Everything here is a plain hash aggregate — Catalyst plans
  * partial+final HashAggregateExec with map-side combine, so these scale
  * to arbitrary input without extra work. Order-sensitive "first wins"
  * semantics from the reference's Python dicts are made explicit with
  * row_number() over a deterministic ordering (SURVEY §7.3.5) — never an
  * unordered first().
  */
object Catalog {

  /** A1/A2 — value frequency with the reference's ordering
    * (dwwApi.js:321-342 / :368-391): count DESC, then value ASC. */
  def frequency(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(col(valueCol).as("search"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("search"))

  /** A3 — grouped mapping counts (dwwApi.js:394-423). */
  def mappingCounts(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(keys.map(col): _*)

  /** A4 — first-wins seeding (GetWeta.py:493-512): among candidate rows per
    * key, keep the first by `ord` — explicit row_number, Python-dict
    * insert-order semantics made deterministic. */
  def firstWins(df: DataFrame, key: String, ord: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(Window.partitionBy(col(key)).orderBy(ord: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** A5 — reverse-map totals (dwwFront.js:54-75): group by canonical name,
    * collect the raw searches, sum their counts. The collected list is
    * sorted for determinism. */
  def reverseMapTotals(df: DataFrame, name: String, search: String, cnt: String): DataFrame =
    df.groupBy(col(name))
      .agg(array_join(array_sort(collect_set(col(search))), ",").as("searches"),
           sum(col(cnt)).as("total"))

  /** A6 — blacklist term tally (dwwFront.js:159-169): for each term, how many
    * values contain it. The term list is tiny → broadcast nested loop join,
    * which is exactly right: |terms| × |rows| comparisons, fully parallel.
    * Matching is case-insensitive on BOTH sides. Counting uses an INNER
    * BNLJ (the tiny term side broadcast), then the aggregated per-term
    * counts — |terms| rows — left-join back onto the term list with
    * coalesce(0) so a term with zero matches still reports 0 (the
    * reference tally emits an entry per term — a consumer indexing by
    * term must not hit missing keys). A right-outer BNLJ here would force
    * Spark to build/broadcast the LEFT (corpus) side — the inverse plan,
    * OOM at scale. */
  def termTally(df: DataFrame, valueCol: String, terms: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val termDf = terms.toDF("term")
    val counts = df.join(broadcast(termDf),
        lower(col(valueCol)).contains(lower(col("term"))))
      .groupBy(col("term"))
      .agg(count(col(valueCol)).as("cnt"))
    termDf.join(counts, Seq("term"), "left")
      .select(col("term"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** A7 — duplicate-row total merge (dwwFront.js:83-102): re-group by a
    * (possibly scrubbed) key and sum previously computed counts. */
  def mergeTotals(df: DataFrame, key: Column, cnt: String): DataFrame =
    df.groupBy(key.as("key")).agg(sum(col(cnt)).as("total"))

  /** A10 — distinct over nested rels (functions.js:116-140): explode the
    * nested docs and return the distinct KEY values (the reference's
    * first-seen payload is dropped by its consumers — only the key set is
    * served — so only the key set is computed here). */
  def distinctNested(docs: DataFrame, relsCol: String, key: String): DataFrame =
    docs.select(explode(col(relsCol)).as("rel"))
      .select(col(s"rel.$key").as(key))
      .distinct()

  /** P5 — min-count HAVING filter (dwwFront.js:85-87). */
  def havingMinCount(df: DataFrame, keys: Seq[String], minCount: Long): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
}
