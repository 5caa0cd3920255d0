package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the space-saving algorithm (Metwally et al.
  * 2005) as keyed stream state: the ts14b sketch made continuous.
  *
  * State layout follows the tier's rule (state keyed by BUCKET, not by
  * item): terms hash-route to `buckets` groups, each group maintains one
  * space-saving counter table of at most `capacity` entries — total state
  * O(buckets × capacity) regardless of stream length or vocabulary. On
  * overflow the minimum counter is evicted and inherited (the classic
  * over-estimate bound: err(t) ≤ min counter at t's admission); with
  * capacity ≥ the bucket's vocabulary the counters are EXACT, which is
  * what makes the batch execution of this exact same code path
  * oracle-checkable against plain word counts (the ts14b trick, lifted to
  * the stateful-streaming engine).
  *
  * Every micro-batch each touched bucket re-emits its full counter table
  * stamped with a monotone `ver` (rows processed so far), so the live
  * top-k at any moment = max-`ver` rows per bucket → global (cnt desc,
  * term) head. Stream ≡ batch is pinned in TopKStreamSpec.
  *
  * Memory honesty: the O(buckets × capacity) bound is the persistent
  * STATE; each trigger additionally buffers (and sorts, for the
  * deterministic fold order) its micro-batch's share of one bucket — in
  * streaming that working set is bounded by the trigger size, while the
  * batch execution buffers a bucket's full token stream on one task
  * (fine at verify scale; a 100 TB batch run would pre-aggregate per
  * (bucket, term) upstream or stream the corpus through triggers).
  */
object TopKStream {

  final case class TermRow(bucket: Int, doc: Long, pos: Int, term: String)
  final case class SSState(counts: Map[String, Long], processed: Long)
  final case class BucketCount(bucket: Int, term: String, cnt: Long, ver: Long)

  /** Tokenize docs into bucket-routed term rows; (doc, pos) fixes the
    * within-group processing order so eviction behavior is deterministic
    * under any partitioning. Tokenization mirrors ts14's (\s+ split),
    * empties dropped on both engines. */
  def termRows(docs: DataFrame, id: String, text: String,
               buckets: Int = 16): DataFrame =
    docs.select(col(id).cast("long").as("doc"),
        posexplode(split(lower(col(text)), "\\s+")).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
      .select(pmod(xxhash64(col("term")), lit(buckets)).cast("int").as("bucket"),
        col("doc"), col("pos"), col("term"))

  /** The space-saving fold, runnable as a STREAM (flatMapGroupsWithState
    * over micro-batches) or as a BATCH (same operator, one group pass) —
    * one code path, two execution modes. */
  def counts(spark: SparkSession, docs: DataFrame, id: String = "doc_id",
             text: String = "text", buckets: Int = 16,
             capacity: Int = 4096): Dataset[BucketCount] = {
    import spark.implicits._
    termRows(docs, id, text, buckets).as[TermRow]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[SSState, BucketCount](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (bucket, rows, state: GroupState[SSState]) =>
          var st = state.getOption.getOrElse(SSState(Map.empty, 0L))
          rows.toSeq.sortBy(r => (r.doc, r.pos)).foreach { r =>
            val m = st.counts
            val next =
              if (m.contains(r.term)) m.updated(r.term, m(r.term) + 1)
              else if (m.size < capacity) m.updated(r.term, 1L)
              else {
                // evict the minimum counter (ties by term for
                // determinism) and inherit its count + 1
                val (evict, minCnt) = m.minBy { case (t, c) => (c, t) }
                (m - evict).updated(r.term, minCnt + 1)
              }
            st = SSState(next, st.processed + 1)
          }
          state.update(st)
          st.counts.iterator
            .map { case (t, c) => BucketCount(bucket, t, c, st.processed) }
      }
  }
}
