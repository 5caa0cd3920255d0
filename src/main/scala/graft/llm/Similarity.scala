package graft.llm

import graft.Ckpt._

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
  // fast path: keep() leaves the buffer sorted (-sim, id), so its last
  // element is the current worst — a full buffer rejects a loser in O(1)
  // instead of re-sorting k+1 elements for every corpus row
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size >= k && {
      val w = b.last
      a.sim < w.sim || (a.sim == w.sim && a.id > w.id)
    }) b
    else keep(b :+ a)
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
  * Dot products use a native codegen kernel ([[graft.functions.DotKernel]])
  * with the deterministic left-to-right double accumulation the original
  * `zip_with` + `aggregate` algebra performed — bit-identical results,
  * none of the per-element lambda interpretation.
  */
object Similarity {

  /** Cosine similarity of two array<float/double> columns as a Column. */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (sqrt(dotProduct(a, a)) * sqrt(dotProduct(b, b)))

  /** Native codegen kernel with the IDENTICAL cast-then-multiply L2R
    * accumulation of the old zip_with/aggregate algebra (bit-for-bit —
    * see [[graft.functions.DotKernel]]); the lambdas it replaces were
    * CodegenFallback and dominated every pair-verify loop. */
  def dotProduct(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

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
    // the query side is renamed BEFORE the crossJoin so a query table
    // sharing the corpus's column names (the natural same-schema call)
    // doesn't hit an ambiguous-reference failure
    val q = broadcast(queries.select(col(qid).as("__qid"), col(qvec).as("__qvec")))
    corpus.crossJoin(q)
      .select(col("__qid").as("query_id"), col(id).cast("long").as("id"),
              cosine(col(vec), col("__qvec")).as("sim"))
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

  /** Array of nTables sign-LSH bucket ids for `vec`, as ONE expression.
    * All nTables·nPlanes hyperplane dots come from one flat literal plane
    * matrix, LET-BOUND via a single-element transform so they evaluate
    * exactly once per row — a temp column is not enough, CollapseProject
    * would inline the dots into the per-table fold and re-evaluate all of
    * them per table (measured 10x regression). The per-table fold is
    * three small lambdas, so codegen stays constant-size at any table
    * count. Bit layout: plane j of a table sits at bit (nPlanes-1-j). */
  private def tableBuckets(vec: Column, nTables: Int, nPlanes: Int, dim: Int,
                           seed: Long): Column = {
    val ps = planes(nTables * nPlanes, dim, seed)
    val planesLit = array(ps.map(p => array(p.map(lit): _*)): _*)
    val dots = transform(planesLit, p => dotProduct(vec, p))
    element_at(
      transform(array(dots), ds =>
        transform(sequence(lit(0), lit(nTables - 1)), t =>
          aggregate(slice(ds, t * nPlanes + 1, lit(nPlanes)), lit(0L),
            (acc, d) => acc * 2 + when(d >= 0, 1L).otherwise(0L)))), 1)
  }

  /** Bucketed ANN with OR-amplification: `nTables` independent sign-LSH
    * tables (AND within a table's `nPlanes` bits, OR across tables), plus
    * 1-bit-flip multi-probe per table; candidates are reranked exactly.
    * Output: (query_id, id, sim, rank) — approximate top-k.
    *
    * Scale shape: the corpus is hashed once per table (a projection, one
    * scan), candidate generation is an equi-join on (table, bucket), and
    * only candidate pairs ever pay the full cosine — never n². Tune
    * nTables up for recall, nPlanes up for precision/bucket size.
    *
    * Shuffle audit: probes broadcast, so the bucketed corpus (including
    * the nTables-replicated vector rows) never crosses the network — the
    * replication is map-side memory bandwidth only. The first exchange
    * carries (query_id, id, sim) triples into the dedup, cosines already
    * computed map-side; a pair colliding in t tables pays t cheap 64-dim
    * cosines rather than shipping vectors to a dedup-then-fetch join
    * (which would either re-shuffle the corpus by id or broadcast the
    * candidate set, both strictly worse below very large nTables). */
  def lshTopK(corpus: DataFrame, id: String, vec: String,
              queries: DataFrame, qid: String, qvec: String,
              k: Int, nPlanes: Int = 8, nTables: Int = 6, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    val bucketed = corpus
      .select(col(id), col(vec),
        posexplode(tableBuckets(col(vec), nTables, nPlanes, dim, seed)))
      .select(col(id), col(vec), col("pos").as("tbl"), col("col").as("bucket"))
    // per table: own bucket + every 1-bit flip (multi-probe); the flips
    // derive from the FOLDED bucket values via a let-bound transform —
    // nothing is re-hashed per probe
    val flipBit = array((0 until nPlanes).map(p => lit(1L << (nPlanes - 1 - p))): _*)
    val probeStructs = transform(array(tableBuckets(col(qvec), nTables, nPlanes, dim, seed)),
      tb => flatten(transform(sequence(lit(0), lit(nTables - 1)), t => {
        val base = element_at(tb, t + 1)
        concat(
          array(struct(t.as("tbl"), base.as("bucket"))),
          transform(sequence(lit(0), lit(nPlanes - 1)), p =>
            struct(t.as("tbl"),
              base.bitwiseXOR(element_at(flipBit, p + 1)).as("bucket"))))
      })))
    val probes = queries.select(col(qid), col(qvec),
        explode(element_at(probeStructs, 1)).as("tb"))
      .select(col(qid), col(qvec), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val cands = bucketed.join(broadcast(probes), Seq("tbl", "bucket"))
      .select(col(qid).as("query_id"), col(id).as("id"),
              cosine(col(vec), col(qvec)).as("sim"))
      .dropDuplicates("query_id", "id")
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** DuckDB SQL computing cosineNearDupPairs(threshold, nPlanes, nTables)
    * bit-for-bit, sim rounded 4dp. The SAME plane constants are inlined
    * into both engines (Double.toString round-trips exactly), a bucket is
    * an order-free sum of disjoint sign bits, and every dot product folds
    * left-to-right over doubles in both engines (DuckDB list_dot_product ≡
    * the zip_with/aggregate chain), so even the float sign decisions and
    * the threshold filter agree bit-for-bit — the ANN bucketing machinery
    * itself becomes oracle-checkable (sim4b). */
  def cosineNearDupPortableOracleSql(table: String, id: String, vec: String,
                                     threshold: Double, nPlanes: Int,
                                     nTables: Int, dim: Int,
                                     seed: Long = 42L): String = {
    val ps = planes(nTables * nPlanes, dim, seed)
    def planeLit(p: Array[Double]): String =
      p.map(java.lang.Double.toString).mkString("[", ", ", "]")
    val tableSelects = (0 until nTables).map { t =>
      val bits = (0 until nPlanes).map { j =>
        val weight = 1L << (nPlanes - 1 - j)
        s"(CASE WHEN list_dot_product(v, ${planeLit(ps(t * nPlanes + j))}) >= 0 THEN ${weight} ELSE 0 END)"
      }.mkString("\n       + ")
      s"SELECT $id, $t AS tbl,\n       $bits AS bucket\n  FROM emb"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH emb AS (SELECT $id, $vec::DOUBLE[] AS v FROM $table),
       |b AS (
       |  $tableSelects),
       |pairs AS (
       |  SELECT DISTINCT a.$id AS id1, b2.$id AS id2
       |  FROM b a JOIN b b2
       |    ON a.tbl = b2.tbl AND a.bucket = b2.bucket AND a.$id < b2.$id),
       |vecs AS (SELECT $id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb)
       |SELECT id1, id2, round(sim, 4) AS sim FROM (
       |  SELECT id1, id2, list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS sim
       |  FROM pairs JOIN vecs x ON x.$id = id1 JOIN vecs y ON y.$id = id2)
       |WHERE sim >= $threshold ORDER BY id1, id2""".stripMargin
  }

  /** DuckDB SQL computing lshTopK bit-for-bit for queries that are corpus
    * members (their buckets then come straight from the corpus bucket
    * CTE). Same portability contract as cosineNearDupPortableOracleSql:
    * shared plane literals, order-free sign-bit sums, left-to-right double
    * folds — bucketing, 1-bit-flip multi-probe, OR-across-tables candidate
    * union and the exact rerank all agree bit-for-bit, so sim3 itself is
    * oracle-green. */
  def lshTopKPortableOracleSql(table: String, id: String, vec: String,
                               qFilter: String, k: Int,
                               nPlanes: Int = 8, nTables: Int = 6,
                               dim: Int = 64, seed: Long = 42L): String = {
    val ps = planes(nTables * nPlanes, dim, seed)
    def planeLit(p: Array[Double]): String =
      p.map(java.lang.Double.toString).mkString("[", ", ", "]")
    val planeRows = (for (t <- 0 until nTables; j <- 0 until nPlanes)
      yield s"($t, $j, ${planeLit(ps(t * nPlanes + j))})").mkString(",\n    ")
    val topBit = 1L << (nPlanes - 1)
    val flips = (0 until nPlanes).map(f => s"($f)").mkString(", ")
    s"""WITH emb AS (SELECT $id, $vec::DOUBLE[] AS v FROM $table),
       |pl(tbl, j, p) AS (VALUES
       |    $planeRows),
       |cb AS (
       |  SELECT e.$id, pl.tbl,
       |         sum(CASE WHEN list_dot_product(e.v, pl.p) >= 0
       |                  THEN $topBit >> pl.j ELSE 0 END)::BIGINT AS bucket
       |  FROM emb e CROSS JOIN pl GROUP BY e.$id, pl.tbl),
       |qb AS (SELECT $id AS qid, tbl, bucket FROM cb WHERE $qFilter),
       |probes AS (
       |  SELECT qid, tbl, bucket FROM qb
       |  UNION ALL
       |  SELECT qid, tbl, xor(bucket, $topBit >> f) FROM qb
       |  CROSS JOIN (VALUES $flips) ff(f)),
       |cands AS (
       |  SELECT DISTINCT p.qid, c.$id AS cid
       |  FROM probes p JOIN cb c ON p.tbl = c.tbl AND p.bucket = c.bucket),
       |scored AS (
       |  SELECT c.qid AS query_id, c.cid AS id,
       |         list_dot_product(vi.v, vq.v) / (sqrt(list_dot_product(vi.v, vi.v)) *
       |                                         sqrt(list_dot_product(vq.v, vq.v))) AS sim
       |  FROM cands c JOIN emb vq ON vq.$id = c.qid JOIN emb vi ON vi.$id = c.cid)
       |SELECT query_id, id, round(sim, 4) AS sim, rank FROM (
       |  SELECT query_id, id, sim,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, id) AS rank
       |  FROM scored)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Picks (nPlanes, nTables) for `cosineNearDupPairs` so candidate volume
    * stays LINEAR in corpus size and recall at the threshold angle hits a
    * target:
    *  - nPlanes = ceil(log2(n / targetBucketSize)): bucket count grows with
    *    the corpus so expected bucket occupancy stays constant — Σ bucket²
    *    per table ≈ n·targetBucketSize instead of n²/2^b at a fixed b;
    *  - nTables from the sign-LSH S-curve: per-plane collision probability
    *    at cosine s is p = 1 − acos(s)/π, a table collides with p^nPlanes,
    *    and OR-across-tables recall is 1−(1−p^b)^T, solved for T at the
    *    recall target and capped (wide angles — low thresholds — are a poor
    *    fit for sign-LSH and would otherwise demand hundreds of tables;
    *    past the cap, recall degrades gracefully rather than cost exploding).
    */
  private[llm] def nearDupParams(n: Long, threshold: Double,
                                 targetBucketSize: Int, recallTarget: Double,
                                 maxTables: Int): (Int, Int) = {
    val b = math.max(4, math.ceil(
      math.log(math.max(n.toDouble / targetBucketSize, 2.0)) / math.log(2.0)).toInt)
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
    val pTable = math.pow(p, b.toDouble)
    val t =
      if (pTable >= 1.0 - 1e-12) 1
      else math.ceil(math.log(1.0 - recallTarget) / math.log(1.0 - pTable)).toInt
    (b, math.max(1, math.min(maxTables, t)))
  }

  /** Embedding-cosine near-duplicate pairs via shared LSH buckets — the
    * embedding analog of Dedup.minhashCandidates; no all-pairs join.
    * Multi-table OR-construction: a pair is a candidate if it collides in
    * ANY of `nTables` independent sign-LSH tables; exact cosine then
    * filters. Recall at cosine s is 1-(1-(1-acos(s)/π)^nPlanes)^nTables.
    *
    * Pass nPlanes/nTables = 0 (the default) to size both from the corpus:
    * bucket count grows with n (constant expected bucket size → linear
    * candidate volume) and table count comes from the threshold's S-curve
    * (see `nearDupParams`). The corpus count is one cheap aggregate, paid
    * once at index-build time.
    *
    * Scale shape: the bucket table carries only (doc, tbl, bucket) — the
    * vectors are NOT duplicated nTables× through the explode/shuffle — and
    * the exact cosine is paid once per DISTINCT candidate pair, after the
    * bucket-join dedup. All nTables·nPlanes hyperplane dot products come
    * from ONE flat literal plane matrix via transform/aggregate lambdas, so
    * the codegen'd expression tree stays small at any table count. */
  def cosineNearDupPairs(corpus: DataFrame, id: String, vec: String,
                         threshold: Double, nPlanes: Int = 0, nTables: Int = 0,
                         dim: Int = 64, seed: Long = 42L,
                         targetBucketSize: Int = 8, recallTarget: Double = 0.9,
                         maxTables: Int = 16): DataFrame = {
    val (b, t) =
      if (nPlanes > 0 && nTables > 0) (nPlanes, nTables)
      else {
        val auto = nearDupParams(corpus.count(), threshold,
          targetBucketSize, recallTarget, maxTables)
        (if (nPlanes > 0) nPlanes else auto._1, if (nTables > 0) nTables else auto._2)
      }
    // per row: all t·b plane dots at once, then per-table sign bits folded
    // into a bucket id — three small lambdas, independent of t and b.
    val sigs = corpus
      .select(col(id).as("doc"), posexplode(tableBuckets(col(vec), t, b, dim, seed)))
      .select(col("doc"), col("pos").as("tbl"), col("col").as("bucket"))
      // materialized once: the t·b-plane signature lambda chain is
      // interpreted (higher-order), and the self-join below references it
      // on BOTH sides — without this the whole projection runs twice (and
      // rides a generator, the tok3 re-evaluation class). (doc, tbl,
      // bucket) triples are corpus×t SMALL rows — the same volume the
      // join shuffle moves anyway.
      .ckpt()
    val a = sigs.as("a"); val bb = sigs.as("b")
    val pairs = a.join(bb,
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"))
      .distinct()
    // norms once per doc (not per pair): the pair verify then pays a single
    // dot product instead of three.
    val vecs = corpus.select(col(id).as("doc"), col(vec).as("v"),
      sqrt(dotProduct(col(vec), col(vec))).as("nrm"))
    pairs
      .join(vecs.select(col("doc").as("id1"), col("v").as("v1"), col("nrm").as("n1")), "id1")
      .join(vecs.select(col("doc").as("id2"), col("v").as("v2"), col("nrm").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        (dotProduct(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** INT8 scalar quantization of an embedding column — the standard 4×
    * storage cut for a corpus-scale vector store (Faiss SQ8 / vector-DB
    * default): per-DIMENSION affine codes
    * `q_i = floor((x_i − min_i) / (max_i − min_i) · 255 + 0.5)`,
    * constant dimensions code to 0.
    *
    * Scale shape: the (min, max) model is one posexplode + per-dimension
    * min/max aggregate (partial aggregation reduces each task to 2·d
    * values before the shuffle) collected as 2·d doubles of driver model
    * state — the Lloyd/PCA precedent — and re-broadcast as literals, so
    * encoding is one scan with zero joins. Codes are exact integers and
    * the whole formula replays in SQL, so the operator is
    * oracle-checkable end-to-end; the per-vector `recon_max_err` column
    * reports the quantization band (≤ span/510 + float noise per
    * dimension, pinned in LlmSpec).
    *
    * Output: (id, codes array<int>, q_sum, recon_max_err 6dp). */
  /** Per-dimension (min, max) of an embedding column — the SQ8 model:
    * one posexplode + min/max aggregate (partial agg reduces each task to
    * 2·d values before the shuffle), collected as 2·d doubles of driver
    * model state (the Lloyd/PCA precedent). */
  def sqFit(emb: DataFrame, vec: String): (Array[Double], Array[Double]) = {
    val stats = emb.select(posexplode(col(vec)).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy("i").collect()
    (stats.map(_.getDouble(1)), stats.map(_.getDouble(2)))
  }

  private def dimAt(i: Column, a: Column): Column = element_at(a, (i + 1).cast("int"))

  /** The affine int8 code array of `vecCol` under a fitted model —
    * `floor((x−mn)/(mx−mn)·255 + 0.5)`, constant dims → 0. */
  def sqCodes(vecCol: Column, mns: Array[Double], mxs: Array[Double]): Column = {
    val mnLit = array(mns.map(lit): _*)
    val mxLit = array(mxs.map(lit): _*)
    transform(sequence(lit(0), lit(mns.length - 1)), i => {
      val x = dimAt(i, vecCol).cast("double")
      val (mn, mx) = (dimAt(i, mnLit), dimAt(i, mxLit))
      when(mx > mn,
        greatest(lit(0.0), least(lit(255.0),
          floor((x - mn) / (mx - mn) * 255 + 0.5))))
        .otherwise(0.0).cast("int")
    })
  }

  /** Dequantized double array of a code column under the model —
    * `mn + q/255·(mx−mn)`, the exact values any engine reconstructs. */
  def sqDequant(codesCol: Column, mns: Array[Double], mxs: Array[Double]): Column = {
    val mnLit = array(mns.map(lit): _*)
    val mxLit = array(mxs.map(lit): _*)
    transform(sequence(lit(0), lit(mns.length - 1)), i =>
      dimAt(i, mnLit) + dimAt(i, codesCol).cast("double") / 255.0 *
        (dimAt(i, mxLit) - dimAt(i, mnLit)))
  }

  def scalarQuantize(emb: DataFrame, id: String, vec: String): DataFrame = {
    val (mns, mxs) = sqFit(emb, vec)
    val d = mns.length
    val mnLit = array(mns.map(lit): _*)
    val mxLit = array(mxs.map(lit): _*)
    def dim(i: Column, a: Column): Column = dimAt(i, a)
    val codes = sqCodes(col(vec), mns, mxs)
    // two projections: the code array materializes in the first and the
    // sum/error derive from the COLUMN in the second — a multi-consumer
    // non-cheap producer is never collapsed (SPARK-36718), so the
    // quantizer chain runs once per row, not once per output column
    val err = array_max(transform(sequence(lit(0), lit(d - 1)), i => {
      val x = dim(i, col("__v")).cast("double")
      val (mn, mx) = (dim(i, mnLit), dim(i, mxLit))
      abs(x - (mn + dim(i, col("codes")).cast("double") / 255.0 * (mx - mn)))
    }))
    emb.select(col(id), col(vec).as("__v"), codes.as("codes"))
      .select(col(id), col("codes"),
        aggregate(col("codes"), lit(0L), (acc, v) => acc + v).as("q_sum"),
        (floor(err * 1000000 + 0.5) / 1000000.0).as("recon_max_err"))
  }

  /** Approximate top-k over the INT8-quantized store + exact rerank —
    * the search path that makes [[scalarQuantize]] a serving format, not
    * just a storage report (Faiss SQ8 flat): the scan reads the 4×-smaller
    * code table and scores ADC-style — the affine dequantization folds
    * into a per-query constant plus an int-codes × per-query-weights dot
    * (the native dotID kernel), so no per-row dequantized array ever
    * materializes in the scoring loop; only the top-`rerank` candidates
    * per query touch the original float vectors for the exact rerank.
    *
    * Scale shape: fit (one stats pass) + encode (one scan) + a
    * broadcast-query scan over codes with a bounded [[TopKAgg]] (partial
    * top-k per partition — only `rerank` rows per query per partition
    * shuffle), then an id-join back to the full vectors for `rerank`
    * rows per query. At 100 TB the codes table is the resident index and
    * the float vectors stay in cold storage, touched `rerank·|Q|` rows
    * per batch. Every value replays in SQL (integer codes, literal
    * model, canonical-order folds — the oracle replays the REGROUPED
    * ADC algebra), so the whole path is oracle-checkable with
    * corpus-member queries. */
  def sqTopK(corpus: DataFrame, id: String, vec: String,
             queries: DataFrame, qid: String, qvec: String,
             kTop: Int, rerank: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (mns, mxs) = sqFit(corpus, vec)
    val d = mns.length
    // ADC scoring straight off the INT codes (Faiss-style asymmetric
    // distance): dot(dequant(c), q) regroups as
    //   Σ mn_i·q_i            — a per-QUERY constant (cq), plus
    //   Σ c_i·(q_i·s_i)       — the codes against a per-query weight
    // with s_i = (mx_i−mn_i)/255, so the scan never materializes a
    // per-row dequantized array and the pair loop is one int×double
    // kernel dot. The row norm is per-ROW constant, computed once in the
    // encode pass from the dequantized values (the storage contract:
    // what any engine reconstructs). Every fold is left-to-right over
    // the same IEEE ops, so the oracle replays the REGROUPED algebra
    // bit-for-bit.
    val mnLit = array(mns.map(lit): _*)
    val sLit = array(mns.indices.map(i => lit((mxs(i) - mns(i)) / 255.0)): _*)
    // codes materialize in their own projection; each downstream select
    // reads the COLUMN twice (a multi-consumer non-cheap producer never
    // collapses), so the quantizer and dequant chains run once per row
    val codesT = corpus
      .select(col(id).cast("long").as("pid"), sqCodes(col(vec), mns, mxs).as("codes"))
      .select(col("pid"), col("codes"), sqDequant(col("codes"), mns, mxs).as("dqv"))
      .select(col("pid"), col("codes"),
        sqrt(dotProduct(col("dqv"), col("dqv"))).as("nrm"))
    val qB = broadcast(queries
      .select(col(qid).cast("long").as("query_id"), col(qvec).as("qv"))
      .withColumn("qnrm", sqrt(dotProduct(col("qv"), col("qv"))))
      .withColumn("cq", dotProduct(col("qv"), mnLit))
      .withColumn("wv", transform(sequence(lit(0), lit(d - 1)),
        i => dimAt(i, col("qv")).cast("double") * dimAt(i, sLit))))
    val scored = codesT.crossJoin(qB)
      .select(col("query_id"), col("pid"),
        ((col("cq") + dotProduct(col("codes"), col("wv")))
          / (col("nrm") * col("qnrm"))).as("s"))
    val topkAgg = udaf(new TopKAgg(rerank))
    val cands = scored.groupBy("query_id")
      .agg(topkAgg(col("s"), col("pid")).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("c"))
      .select(col("query_id"), col("c.id").as("pid"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("pid"))
    cands
      .join(corpus.select(col(id).cast("long").as("pid"), col(vec).as("pv")), "pid")
      .join(qB.select(col("query_id"), col("qv")), "query_id")
      .withColumn("sim", cosine(col("pv"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col("query_id"), col("pid").as("id"), col("rank"), col("sim"))
  }
}
