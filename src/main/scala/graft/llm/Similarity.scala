package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** One scored candidate for the top-k aggregate. */
case class Scored(sim: Double, id: Long)

/** Bounded top-k typed aggregate (SURVEY §2.10 — the one UDAF the engine
  * needs, for the beyond-reference ANN tier). The buffer never exceeds k
  * elements, so partial aggregation keeps per-partition state O(k·queries)
  * and the shuffle carries only k rows per (query, partition). */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def keep(xs: Seq[Scored]): Seq[Scored] =
    xs.sortBy(s => (-s.sim, s.id)).take(k)
  override def zero: Seq[Scored] = Vector.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = keep(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = keep(x ++ y)
  override def finish(r: Seq[Scored]): Seq[Scored] = r
  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - `bruteForceTopK` — exact cosine top-k. The query set is broadcast; the
  *    corpus streams through a single codegen'd projection + per-query top-k
  *    window. Right answer for small query sets; O(|Q|·n) but embarrassingly
  *    parallel and shuffle-free until the final per-query k-row reduction.
  *  - `lshTopK` — random-hyperplane (sign) LSH: corpus is bucketed once by a
  *    b-bit signature; each query probes only its own bucket (plus optional
  *    multi-probe neighbors), then reranks exactly within the bucket. This is
  *    the 100 TB path: candidate generation is an equi-join on the signature,
  *    so cost scales with bucket sizes, never n².
  *
  * Dot products use `zip_with` + `aggregate` — pure Catalyst expressions,
  * deterministic left-to-right accumulation in double precision.
  */
object Similarity {

  /** Cosine similarity of two array<float/double> columns as a Column. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
                lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (p, q) => p.cast("double") * q.cast("double")),
              lit(0.0), (acc, v) => acc + v)

  /** Exact cosine top-k for each query row. `queries` must be small
    * (broadcast). Output: (query_id, id, sim, rank). Requires a numeric id
    * (cast upstream if needed).
    *
    * The ranking is a custom top-k Aggregator, not a global window: Spark
    * plans it as a partial+final ObjectHashAggregate, so each partition
    * keeps at most k candidates per query in its combine map and ONLY those
    * survivors shuffle. A window row_number would shuffle the whole
    * |corpus| × |queries| score table. */
  def bruteForceTopK(corpus: DataFrame, id: String, vec: String,
                     queries: DataFrame, qid: String, qvec: String,
                     k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k))
    corpus.crossJoin(broadcast(queries))
      .select(col(qid).as("query_id"), col(id).cast("long").as("id"),
              cosine(col(vec), col(qvec)).as("sim"))
      .groupBy("query_id")
      .agg(topk(col("sim"), col("id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("id"), col("col.sim").as("sim"),
              (col("pos") + 1).cast("int").as("rank"))
  }

  /** Deterministic random hyperplanes: nPlanes × dim doubles seeded by
    * `seed` — generated on the driver (tiny), broadcast as literals. */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH signature: bit i = (v · plane_i) >= 0. Returns a long. */
  def signature(vec: Column, nPlanes: Int, dim: Int, seed: Long): Column = {
    val ps = planes(nPlanes, dim, seed)
    (0 until nPlanes).map { i =>
      val plane = array(ps(i).map(lit): _*)
      when(dotProduct(vec, plane) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Bucketed ANN with OR-amplification: `nTables` independent sign-LSH
    * tables (AND within a table's `nPlanes` bits, OR across tables), plus
    * 1-bit-flip multi-probe per table; candidates are reranked exactly.
    * Output: (query_id, id, sim, rank) — approximate top-k.
    *
    * Scale shape: the corpus is hashed once per table (a projection, one
    * scan), candidate generation is an equi-join on (table, bucket), and
    * only candidate pairs ever pay the full cosine — never n². Tune
    * nTables up for recall, nPlanes up for precision/bucket size. */
  def lshTopK(corpus: DataFrame, id: String, vec: String,
              queries: DataFrame, qid: String, qvec: String,
              k: Int, nPlanes: Int = 8, nTables: Int = 6, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    def sig(c: Column, table: Int) = signature(c, nPlanes, dim, seed + 7919L * table)
    val bucketed = corpus.select(col(id), col(vec),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("tbl"), sig(col(vec), t).as("bucket"))): _*)).as("tb"))
      .select(col(id), col(vec), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    // per table: own bucket + every 1-bit flip (multi-probe)
    val probes = queries.select(col(qid), col(qvec),
      explode(array((for (t <- 0 until nTables; p <- -1 until nPlanes) yield {
        val base = sig(col(qvec), t)
        val b = if (p < 0) base else base.bitwiseXOR(shiftleft(lit(1L), p))
        struct(lit(t).as("tbl"), b.as("bucket"))
      }): _*)).as("tb"))
      .select(col(qid), col(qvec), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val cands = bucketed.join(broadcast(probes), Seq("tbl", "bucket"))
      .select(col(qid).as("query_id"), col(id).as("id"),
              cosine(col(vec), col(qvec)).as("sim"))
      .dropDuplicates("query_id", "id")
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs via shared LSH buckets — the
    * embedding analog of Dedup.minhashCandidates; no all-pairs join.
    * Multi-table OR-construction: a pair is a candidate if it collides in
    * ANY of `nTables` independent sign-LSH tables; exact cosine then
    * filters. Recall at angle θ is 1-(1-(1-θ/π)^nPlanes)^nTables. */
  def cosineNearDupPairs(corpus: DataFrame, id: String, vec: String,
                         threshold: Double, nPlanes: Int = 6, nTables: Int = 8,
                         dim: Int = 64, seed: Long = 42L): DataFrame = {
    val bucketed = corpus.select(col(id).as("doc"), col(vec).as("v"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("tbl"),
          signature(col(vec), nPlanes, dim, seed + 7919L * t).as("bucket"))): _*)).as("tb"))
      .select(col("doc"), col("v"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
              col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"),
              cosine(col("a.v"), col("b.v")).as("sim"))
      .dropDuplicates("id1", "id2")
      .filter(col("sim") >= threshold)
  }
}
