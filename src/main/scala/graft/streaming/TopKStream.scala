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
  /** `evictions` counts every overflow eviction the bucket has ever
    * performed — the EXACTNESS precondition made checkable: zero means
    * capacity never overflowed, so every counter is an exact count and an
    * oracle equality over the output is meaningful; nonzero means the
    * counters are space-saving over-estimates (still within the classic
    * error bound) and an exact-match failure is the sketch, not a bug. */
  final case class SSState(counts: Map[String, Long], processed: Long,
                           evictions: Long)
  final case class BucketCount(bucket: Int, term: String, cnt: Long, ver: Long,
                               evictions: Long)

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
          val prev = state.getOption.getOrElse(SSState(Map.empty, 0L, 0L))
          // Working set per invocation: a hash map for O(1) count lookup
          // plus a TreeSet ordered by (count, term) as the min-structure
          // — O(log capacity) per eviction (the stream-summary role)
          // instead of an O(capacity) minBy scan per overflow insert,
          // which at high-churn buckets made eviction the CPU bottleneck.
          // (count, term) ordering ≡ the old minBy key, so eviction
          // choice — and thus every count — is bit-identical.
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          val heap = new java.util.TreeSet[(Long, String)](
            implicitly[Ordering[(Long, String)]])
          prev.counts.foreach { case (t, c) => m.update(t, c); heap.add((c, t)) }
          var processed = prev.processed
          var evictions = prev.evictions
          rows.toSeq.sortBy(r => (r.doc, r.pos)).foreach { r =>
            m.get(r.term) match {
              case Some(c) =>
                heap.remove((c, r.term))
                m.update(r.term, c + 1); heap.add((c + 1, r.term))
              case None if m.size < capacity =>
                m.update(r.term, 1L); heap.add((1L, r.term))
              case None =>
                // evict the minimum counter (ties by term for
                // determinism) and inherit its count + 1
                val min = heap.pollFirst(); val (minCnt, evict) = min
                m.remove(evict)
                m.update(r.term, minCnt + 1); heap.add((minCnt + 1, r.term))
                evictions += 1
            }
            processed += 1
          }
          val st = SSState(m.toMap, processed, evictions)
          state.update(st)
          st.counts.iterator
            .map { case (t, c) => BucketCount(bucket, t, c, st.processed, evictions) }
      }
  }
}
