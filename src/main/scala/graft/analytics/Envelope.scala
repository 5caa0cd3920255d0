package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The serving JSON envelope (dwwApi.js:201-223) — the wrapper the clients
  * of server.js:243-253 parse around the jumps documents.
  *
  * Unfiltered: `{jumps: [people], locations: {company → geoLoc},
  * regions: {location → {geoLoc, globalRegion}}, globalRegions:
  * {region → coords}}` — the dim echo lets the visualizer resolve
  * coordinates without a second request. Filtered: `{direction, jumps}`
  * where jumps is a list (grouping=none) or a keyed map of
  * `{people, total}` buckets (grouping=keys, dwwApi.js:176-189).
  *
  * Each envelope is ONE document — the payload of a single serving request,
  * exactly what the reference materializes in memory per call. All arrays
  * and map entries are sort_array'd so assembly is deterministic under any
  * partitioning; the collect_list aggregations are the terminal gather of
  * an already person-grouped (bounded) result, not a data-scale operation.
  */
object Envelope {

  /** Unfiltered envelope. `docs` = (id, name, rels) people documents;
    * `companyLocations` = (company, geoLoc) pairs observed in the served
    * rels (dwwApi.js:122 collects exactly the companies that appear);
    * `regions` = (location, geoLoc, globalRegion); `globalRegions` =
    * (region, coords). */
  def unfiltered(docs: DataFrame, companyLocations: DataFrame,
                 regions: DataFrame, globalRegions: DataFrame): DataFrame = {
    val jumps = docs
      .agg(sort_array(collect_list(struct(col("id"), col("name"), col("rels"))))
        .as("jumps"))
    // each map key is reduced to ONE payload (min = deterministic
    // first-wins) BEFORE map_from_entries: a dim carrying two payloads
    // for one key would otherwise kill the job under Spark's default
    // mapKeyDedupPolicy=EXCEPTION, where the reference's JS dicts
    // silently last-win
    val locs = companyLocations
      .groupBy(col("company")).agg(min(col("geoLoc")).as("geoLoc"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("company"), col("geoLoc"))))).as("locations"))
    val regs = regions
      .groupBy(col("location"))
      .agg(min(struct(col("geoLoc"), col("globalRegion"))).as("payload"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("location"), col("payload"))))).as("regions"))
    val glob = globalRegions
      .groupBy(col("region")).agg(min(col("coords")).as("coords"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("region"), col("coords"))))).as("globalRegions"))
    jumps.crossJoin(locs).crossJoin(regs).crossJoin(glob)
  }

  /** Filtered envelope, grouping=none: flat jump list (dwwApi.js:157-175).
    * `jumps` must carry the serving payload columns (person, role, date,
    * company, location, region). */
  def directionalFlat(jumps: DataFrame, dir: String): DataFrame =
    jumps
      .agg(sort_array(collect_list(struct(
        col("person"), col("role"), col("date"),
        col("company"), col("location"), col("region")))).as("jumps"))
      .select(lit(dir).as("direction"), col("jumps"))

  /** Filtered envelope, grouping=keys: `{direction, jumps: {key →
    * {people, total}}}` over Jumps.grouped output (key, people, total). */
  def directionalKeyed(grouped: DataFrame, key: String, dir: String): DataFrame =
    grouped
      .agg(map_from_entries(sort_array(collect_list(struct(
        col(key), struct(col("people"), col("total")))))).as("jumps"))
      .select(lit(dir).as("direction"), col("jumps"))
}
