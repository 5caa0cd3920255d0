package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Canonical JSON rendering of the [[unfiltered]] envelope — ONE string
    * column (`envelope_json`), fully deterministic and engine-portable:
    * keys emitted in sorted order ("dummy" < "imdbMovieId" < … inside
    * rels; "globalRegions" < "jumps" < "locations" < "regions" at the
    * top), compact separators, json.dumps' full escape repertoire
    * (backslash, quote, short escapes, \u00XX control chars), every
    * field null-tolerant (rendered as JSON null). `to_json` is NOT
    * canonical (field order follows struct layout and map internals), so
    * an independent oracle building the same document with
    * `json.dumps(sort_keys=True, separators=(",",":"))` can hash-match
    * this renderer character-for-character (dwwApi.js:201-223 shape).
    * Map entries are re-sorted defensively; the jumps array is already
    * sort_array'd by (id, name, rels). */
  // Full JSON string escaping, exactly json.dumps' default repertoire:
  // backslash, quote, the five short escapes, and \u00XX for every
  // remaining control char < 0x20 — raw control chars would make the
  // output invalid JSON and break the character-for-character oracle.
  private def esc(c: Column): Column = {
    val base = regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    val shorts = Seq('\b' -> "\\\\b", '\f' -> "\\\\f", '\n' -> "\\\\n",
      '\r' -> "\\\\r", '\t' -> "\\\\t")
    val withShorts = shorts.foldLeft(base) { case (col0, (ch, rep)) =>
      regexp_replace(col0, java.util.regex.Pattern.quote(ch.toString), rep)
    }
    // Control chars are vanishingly rare in real text, but their
    // replace chains are NOT free: unguarded, the full chain made the
    // envelope render 5× slower. Two cheap rlike scans gate the
    // branches — a clean string (the overwhelming case) pays only the
    // two backslash/quote replaces it always needed.
    val rare = (0 until 32).filterNot(i => "\b\f\n\r\t".contains(i.toChar))
      .foldLeft(withShorts) { case (col0, i) =>
        regexp_replace(col0, f"\\x$i%02x", f"\\\\u$i%04x")
      }
    when(c.rlike("[\\x00-\\x07\\x0b\\x0e-\\x1f]"), rare)
      .when(c.rlike("[\\x08-\\x0d]"), withShorts)
      .otherwise(base)
  }
  private def str(c: Column): Column = concat(lit("\""), esc(c), lit("\""))
  // every field is null-tolerant (rendered as JSON null, matching
  // json.dumps) — a bare concat would NULL the whole rel string and
  // array_join would then drop the rel SILENTLY
  private def strOrNull(c: Column): Column =
    when(c.isNull, lit("null")).otherwise(str(c))
  private def rawOrNull(c: Column): Column = coalesce(c.cast("string"), lit("null"))
  private def relJson(r: Column): Column = concat(
    lit("{\"dummy\":"), rawOrNull(r.getField("dummy")),
    lit(",\"imdbMovieId\":"), strOrNull(r.getField("imdbMovieId")),
    lit(",\"location\":"), strOrNull(r.getField("location")),
    lit(",\"matchedCompanyName\":"), strOrNull(r.getField("matchedCompanyName")),
    lit(",\"movieReleaseYear\":"), rawOrNull(r.getField("movieReleaseYear")),
    lit(",\"personMappedRole\":"), strOrNull(r.getField("personMappedRole")),
    lit(",\"region\":"), strOrNull(r.getField("region")),
    lit(",\"seq\":"), rawOrNull(r.getField("seq")), lit("}"))
  private def docJson(d: Column): Column = concat(
    lit("{\"id\":"), strOrNull(d.getField("id")),
    lit(",\"name\":"), strOrNull(d.getField("name")),
    lit(",\"rels\":["),
    array_join(transform(d.getField("rels"), relJson(_)), ","), lit("]}"))

  /** The pre-r16 Column-chain render of the jumps section — kept as the
    * readable reference implementation of [[graft.functions.JumpsJson]];
    * IoSpec pins the kernel byte-identical to it on the real envelope
    * (hostile strings included). */
  private[graft] def jumpsJsonReference(env: DataFrame): DataFrame =
    env.select(
      array_join(transform(col("jumps"), docJson(_)), ",").as("jumps_json"))

  def canonicalJson(env: DataFrame): DataFrame = {
    def strMapJson(m: Column): Column = concat(lit("{"),
      array_join(transform(array_sort(map_entries(m)), e =>
        concat(str(e.getField("key")), lit(":"), strOrNull(e.getField("value")))), ","),
      lit("}"))
    val regionsJson = concat(lit("{"),
      array_join(transform(array_sort(map_entries(col("regions"))), e =>
        concat(str(e.getField("key")),
          lit(":{\"geoLoc\":"), strOrNull(e.getField("value").getField("geoLoc")),
          lit(",\"globalRegion\":"), strOrNull(e.getField("value").getField("globalRegion")),
          lit("}"))), ","),
      lit("}"))
    // the jumps section renders through the fused kernel
    // (functions/JsonExpr.scala): the transform(docJson) form was two
    // nested interpreted HOF lambdas whose per-field escape re-ran the
    // regexp chain above for EVERY rel string, all inside the envelope's
    // single serial row. Byte-identity is pinned by IoSpec's hostile-
    // string fixtures (which route through this method), by the
    // character-for-character envelope oracle, and by the
    // kernel ≡ [[jumpsJsonReference]] pin. The tiny dim-echo maps keep
    // the Column render (3-4 entries each — not worth a kernel).
    env.select(concat(
      lit("{\"globalRegions\":"), strMapJson(col("globalRegions")),
      lit(",\"jumps\":["),
      graft.functions.JumpsJson(col("jumps")), lit("]"),
      lit(",\"locations\":"), strMapJson(col("locations")),
      lit(",\"regions\":"), regionsJson,
      lit("}")).as("envelope_json"))
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
