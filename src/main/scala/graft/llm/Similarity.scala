package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * (broadcast). Output: (query_id, id, sim, rank). */
  def bruteForceTopK(corpus: DataFrame, id: String, vec: String,
                     queries: DataFrame, qid: String, qvec: String,
                     k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qid).as("query_id"), col(id).as("id"),
              cosine(col(vec), col(qvec)).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
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

  /** Bucketed ANN: probe the query's signature bucket and every 1-bit-flip
    * neighbor bucket (multi-probe), rerank exactly within candidates.
    * Output: (query_id, id, sim, rank) — approximate top-k. */
  def lshTopK(corpus: DataFrame, id: String, vec: String,
              queries: DataFrame, qid: String, qvec: String,
              k: Int, nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val bucketed = corpus.select(col(id), col(vec),
      signature(col(vec), nPlanes, dim, seed).as("bucket"))
    val qsig = queries.select(col(qid), col(qvec),
      signature(col(qvec), nPlanes, dim, seed).as("qsig"))
    // multi-probe: own bucket + each single-bit flip
    val probes = qsig.select(col(qid), col(qvec),
      explode(array(col("qsig") +: (0 until nPlanes).map(i =>
        col("qsig").bitwiseXOR(shiftleft(lit(1L), i))): _*)).as("bucket"))
    val cands = bucketed.join(broadcast(probes), "bucket")
      .select(col(qid).as("query_id"), col(id).as("id"),
              cosine(col(vec), col(qvec)).as("sim"))
      .dropDuplicates("query_id", "id")
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs via shared LSH bucket — the
    * embedding analog of Dedup.minhashCandidates; no all-pairs join. */
  def cosineNearDupPairs(corpus: DataFrame, id: String, vec: String,
                         threshold: Double, nPlanes: Int = 8, dim: Int = 64,
                         seed: Long = 42L): DataFrame = {
    val bucketed = corpus.select(col(id).as("doc"), col(vec).as("v"),
      signature(col(vec), nPlanes, dim, seed).as("bucket"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"),
              cosine(col("a.v"), col("b.v")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
