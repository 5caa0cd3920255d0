package graft.streaming

import graft.Ckpt._

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Dedup

/** Streaming near-duplicate flagging — the LLM-curation analog of
  * JumpStream: documents arrive as a stream and a doc is flagged the
  * moment it collides with an ALREADY-SEEN doc in any MinHash LSH band
  * bucket with a signature-estimate Jaccard above the threshold.
  *
  * State layout is the scale-relevant part: state is keyed by
  * (band, bucket) — NOT by doc — so each state entry holds only the
  * signatures of one bucket's occupants (constant-ish under the LSH
  * design: bucket occupancy is what banding bounds). A doc is routed to
  * its `bands` buckets, each bucket compares it against its local
  * occupants (estimate over the full signature), and the flag carries the
  * minimum earlier colliding doc id. No cross-bucket state, no global
  * structure: the stream shuffles (band, bucket, doc, sig) tuples exactly
  * like the batch LSH shuffles its candidate table.
  *
  * Uses the PORTABLE signature family (one md5-derived 28-bit hash per
  * shingle + k-universal transforms, Dedup.portableCoef) so the batch
  * twin `flaggedBatch` is bit-exact oracle-checkable in DuckDB; the
  * equivalence stream ≡ batch is pinned in StreamDedupSpec. Arrival order
  * inside a micro-batch is normalized by sorting each bucket's group on
  * doc id, so feeding micro-batches in id order reproduces the batch
  * semantics ("earlier" = smaller id) exactly.
  */
object StreamDedup {

  final case class BandedDoc(band: Int, k1: Long, k2: Long, doc: Long, sig: Seq[Long])
  final case class DocSig(doc: Long, sig: Seq[Long])
  final case class DupFlag(doc: Long, dupOf: Long, band: Int)

  /** Portable MinHash signature as ONE pure Column (array<long> of
    * numHashes minima) — no aggregation, so it composes with streaming
    * stateful operators. Same values as Dedup.minhashPortable's m0..m*
    * columns (min is insensitive to the shingle dedup). */
  def portableSigArray(text: Column, k: Int = 5, numHashes: Int = 8): Column =
    // fused native kernel — bit-identical to the md5-hex Column algebra
    // (property-pinned in MinHashExprSpec), no per-shingle allocation
    graft.functions.PortableMinHash(text, k, numHashes)

  private def estimate(a: Seq[Long], b: Seq[Long]): Double =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.size

  /** Route each doc to its band buckets: 4 bands of 2 signature
    * components (the portable banding of Dedup.minhashCandidatesPortable). */
  private def banded(docs: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val withSig = docs.select(col(id).cast("long").as("doc"),
      portableSigArray(col(text), k).as("sig"))
    withSig.select(col("doc"), col("sig"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            element_at(col("sig"), 2 * b + 1).as("k1"),
            element_at(col("sig"), 2 * b + 2).as("k2"))
        }: _*)).as("bb"))
      .select(col("bb.band"), col("bb.k1"), col("bb.k2"), col("doc"), col("sig"))
  }

  /** Streaming flagger: append-mode flatMapGroupsWithState keyed by
    * (band, bucket). Emits one DupFlag per (bucket, flagged doc) naming
    * the minimum earlier occupant above the estimate threshold; the
    * cross-bucket minimum is a downstream distinct/min (done batch-side
    * or at read time — an append-mode stream cannot re-aggregate).
    *
    * CARDINALITY CONTRACT (relaxed since the r13 out-of-order fix):
    * flags are EVENTS, not a keyed table. Under out-of-order arrival the
    * same doc can be flagged more than once with DIFFERENT `dupOf`
    * values across arrivals (e.g. doc 9 gets (9,3), then (9,1) when a
    * smaller near-dup arrives later), so the stream is no longer
    * at-most-one-flag-per-doc-per-band. Consumers must dedupe BY DOC at
    * read time (`groupBy(doc).agg(min(dupOf))` or a distinct-on-doc);
    * keying on (doc, dupOf) or counting raw flags over-counts.
    *
    * REPRESENTATIVE CHURN vs the batch twin: both the stream gate and
    * [[flaggedBatch]] keep exactly ONE survivor per near-dup cluster,
    * but WHICH member survives differs under arrival permutation — the
    * stream keeps the first-arriving probe (flags later arrivals against
    * it), batch keeps the minimum id. Diffing stream vs batch survivor
    * SETS therefore shows id-level churn inside clusters even though
    * both sides satisfy the one-per-cluster invariant; compare cluster
    * membership (or flag counts per cluster), not survivor ids.
    *
    * State budget: keys are (band, k1, k2) — 4 buckets per doc, each
    * occupant 8 longs + a long id (~72 B). Bucket-key cardinality grows
    * with distinct signatures FOREVER under the default
    * `stateTtlMs = None` (an always-on gate must remember old corpus to
    * flag re-fetches against it). For bounded-retention deployments pass
    * `stateTtlMs = Some(ms)` (StreamContainment's contract): buckets
    * untouched for `ms` of processing time are evicted, trading flags
    * against corpus older than the TTL for a state store bounded by
    * arrival rate × TTL window. */
  def flagStream(spark: SparkSession, docs: DataFrame, id: String = "doc_id",
                 text: String = "text", k: Int = 5,
                 threshold: Double = 0.5,
                 stateTtlMs: Option[Long] = None): Dataset[DupFlag] = {
    import spark.implicits._
    val timeout = if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    banded(docs, id, text, k).as[BandedDoc]
      .groupByKey(d => (d.band, d.k1, d.k2))
      .flatMapGroupsWithState[List[DocSig], DupFlag](
        OutputMode.Append(), timeout) {
        case ((band, _, _), ds, state: GroupState[List[DocSig]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[DupFlag]
            ds.toSeq.sortBy(_.doc).foreach { d =>
              val hits = seen.iterator
                .filter(e => e.doc != d.doc && estimate(e.sig, d.sig) >= threshold)
                .map(_.doc).toSeq
              val (earlier, later) = hits.partition(_ < d.doc)
              if (earlier.nonEmpty) out += DupFlag(d.doc, earlier.min, band)
              // out-of-order arrival (the StreamContainment r13 fix applied
              // here too): an occupant with a LARGER id arrived first — the
              // pair is emitted keyed on that larger doc (batch orientation
              // dupOf < doc), never dropped. Under id-ordered feeding no
              // larger-id occupant exists, so the id-ordered bit-equality
              // contract is untouched.
              later.foreach(p => out += DupFlag(p, d.doc, band))
              seen = DocSig(d.doc, d.sig) :: seen
            }
            state.update(seen)
            stateTtlMs.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Batch twin: (doc, dup_of) where dup_of is the minimum smaller doc
    * sharing ANY band bucket with estimate >= threshold — exactly the
    * distinct-min over flagStream's per-bucket flags, and expressible in
    * SQL over the portable signature (see `flaggedBatchOracleSql`). */
  def flaggedBatch(docs: DataFrame, id: String = "doc_id", text: String = "text",
                   k: Int = 5, threshold: Double = 0.5): DataFrame = {
    // checkpointed: both sides of the self-join otherwise recompute the
    // md5-per-shingle signature build
    val b = banded(docs, id, text, k).ckpt()
    val a = b.as("a"); val c = b.as("b")
    a.join(c,
        col("a.band") === col("b.band") && col("a.k1") === col("b.k1") &&
        col("a.k2") === col("b.k2") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"),
        (graft.functions.AgreeCount(col("a.sig"), col("b.sig")).cast("double") / 8.0).as("est"))
      .where(col("est") >= threshold)
      .groupBy(col("id2").as("doc"))
      .agg(min(col("id1")).as("dup_of"))
  }

  /** DuckDB SQL computing the identical batch twin. */
  def flaggedBatchOracleSql(table: String, id: String, text: String,
                            k: Int = 5, threshold: Double = 0.5): String = {
    val mins = Dedup.minhashPortableOracleSql(table, id, text, k, 8)
    val est = (0 until 8).map(i => s"(a.m$i = b.m$i)::INT").mkString(" + ")
    val bandJoins = Seq(("m0", "m1"), ("m2", "m3"), ("m4", "m5"), ("m6", "m7")).map {
      case (x, y) =>
        s"""SELECT a.$id AS id1, b.$id AS id2, ($est) / 8.0 AS est
           |FROM mins a JOIN mins b
           |  ON a.$x = b.$x AND a.$y = b.$y AND a.$id < b.$id""".stripMargin
    }.mkString("\nUNION\n")
    s"""WITH mins AS ($mins),
       |cand AS (
       |$bandJoins)
       |SELECT id2 AS doc, min(id1) AS dup_of
       |FROM cand WHERE est >= $threshold
       |GROUP BY id2 ORDER BY doc""".stripMargin
  }
}
