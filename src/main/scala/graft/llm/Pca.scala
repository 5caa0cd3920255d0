package graft.llm

import graft.Ckpt._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed second-moment statistics + PCA for embedding columns.
  *
  * Covariance is the workhorse statistic behind embedding whitening, OPQ
  * rotation for product quantization (llm/Pq.scala), and drift monitoring.
  * The d×d matrix is tiny (a MODEL, like IVF's centroids); the data pass
  * is the expensive part and must stay distributed:
  *
  *   - [[covariance]] emits all d² second moments from ONE scan: each
  *     task folds its rows' outer products into one flat d²-double
  *     buffer (GramSumAgg, partial+final ObjectHashAggregate). Only d²
  *     running sums cross the wire per partition — at 1000 executors
  *     and d=64 that is a 4096-double tree-aggregate, the same shape
  *     regardless of corpus size.
  *   - [[fit]] collects the d×d matrix (model fit, not data movement) and
  *     eigendecomposes it on the driver with cyclic Jacobi — O(d³) on a
  *     64×64 symmetric matrix is microseconds; no cluster framework needed.
  *   - [[project]] broadcasts the k eigenvectors as literal arrays and
  *     projects with zip_with/aggregate folds — one scan, no shuffle, the
  *     same plan shape as Similarity's dot products.
  */
object Pca {

  /** Typed partial aggregate for the d² second-moment sums: each task
    * folds its rows' outer products into ONE flat d²-double buffer
    * (upper triangle only — x_i·x_j and x_j·x_i are the same IEEE
    * product in the same row order, so the mirror at finish is exact),
    * merge is an elementwise add, and only d² running sums cross the
    * wire per partition. Replaces the posexplode of d² product ROWS per
    * input row (134 M generate+hash-probe row operations at sf0.1)
    * with d(d+1)/2 flat array adds per row; summation ORDER changes,
    * which the covariance contract already absorbs (the oracle rounds
    * to 7dp on both sides — see covarianceOracleSql's note). */
  private[llm] class GramSumAgg(d: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = new Array[Double](d * d)
    override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
      val a = v.toArray
      var i = 0
      while (i < d) {
        val xi = a(i)
        val row = i * d
        var j = i
        while (j < d) {
          b(row + j) += xi * a(j)
          j += 1
        }
        i += 1
      }
      b
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val k = i * d + j
          x(k) += y(k)
          j += 1
        }
        i += 1
      }
      x
    }
    override def finish(b: Array[Double]): Seq[Double] = {
      var i = 1
      while (i < d) {
        var j = 0
        while (j < i) {
          b(i * d + j) = b(j * d + i)
          j += 1
        }
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Mean per dimension: (i, mean). One explode + hash agg (d keys). */
  def dimMeans(emb: DataFrame, vec: String): DataFrame = {
    val n = emb.agg(count(lit(1)).cast("double").as("n"))
    emb.select(posexplode(transform(col(vec), _.cast("double"))).as(Seq("i", "x")))
      .groupBy("i").agg(sum("x").as("s"))
      .crossJoin(broadcast(n))
      .select(col("i"), (col("s") / col("n")).as("mean"))
  }

  /** Covariance entries (i, j, cov) for all d² pairs, cov = E[xy] − E[x]E[y].
    * The second moments come from the GramSumAgg one-buffer partial
    * aggregate (the pre-r15 posexplode-of-products form paid one
    * generate + hash-probe row per PRODUCT); the (i, j) index is
    * recovered from the flat position via the dimension.
    *
    * The (i, j) recovery is only valid when EVERY vector has the same
    * length: a ragged corpus would silently scatter a short row's products
    * to wrong cells, and null vectors would inflate n while contributing
    * nothing to the sums. Both are hard errors here — one cheap
    * aggregate-only pre-scan (count/min-size/max-size/null-count) guards
    * the expansion and doubles as the source of the literal n and d. */
  def covariance(emb: DataFrame, vec: String): DataFrame = {
    val v = transform(col(vec), _.cast("double"))
    val stats = emb.agg(
      count(lit(1)).as("n"),
      min(size(col(vec))).as("dmin"),
      max(size(col(vec))).as("dmax"),
      count(when(col(vec).isNull, 1)).as("nulls"),
      // null ELEMENTS are a hard error too (ADVICE r15): the Seq[Double]
      // buffer encoder of GramSumAgg would otherwise throw an opaque
      // "null value in non-nullable field" mid-aggregate, where the old
      // posexplode form silently skipped the null products
      count(when(exists(col(vec), _.isNull), 1)).as("null_elems")).head()
    val n = stats.getLong(0)
    require(stats.getLong(3) == 0,
      s"covariance: ${stats.getLong(3)} null '$vec' vectors — filter them before the outer-product expansion")
    require(stats.getLong(4) == 0,
      s"covariance: ${stats.getLong(4)} '$vec' vectors contain null ELEMENTS — clean them before the Gram fold")
    require(n > 0, s"covariance: empty input")
    val d = stats.getInt(2)
    require(stats.getInt(1) == d,
      s"covariance: ragged '$vec' lengths (${stats.getInt(1)}..$d) would scatter products to wrong (i,j) cells")
    // one-buffer partial aggregate (see GramSumAgg): the d² sums arrive
    // as ONE array row, exploded back to (idx, sp) for the join below
    val gram = udaf(new GramSumAgg(d),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    val sums = emb.agg(gram(v).as("g"))
      .select(posexplode(col("g")).as(Seq("idx", "sp")))
    val means = dimMeans(emb, vec)
    sums
      .select((col("idx") / d).cast("int").as("i"),
        (col("idx") % d).cast("int").as("j"),
        col("sp"))
      .join(broadcast(means).withColumnRenamed("i", "mi").withColumnRenamed("mean", "mean_i"),
        col("i") === col("mi"))
      .join(broadcast(means).withColumnRenamed("i", "mj").withColumnRenamed("mean", "mean_j"),
        col("j") === col("mj"))
      .select(col("i"), col("j"),
        (col("sp") / n.toDouble - col("mean_i") * col("mean_j")).as("cov"))
  }

  /** DuckDB twin of [[covariance]] (+7dp rounding on both sides): the
    * positions table replaces posexplode, double widening before the
    * multiply matches Spark's cast, and only summation order differs —
    * absorbed by the round. */
  def covarianceOracleSql(table: String, vec: String, digits: Int = 7): String =
    s"""WITH e AS MATERIALIZED (SELECT $vec AS v FROM $table),
       |nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM e),
       |pos AS MATERIALIZED (
       |  SELECT unnest(range(0, (SELECT max(len(v)) FROM e))) AS p),
       |sums AS MATERIALIZED (
       |  SELECT pi.p AS i, sum(e.v[pi.p + 1]::DOUBLE) AS s
       |  FROM e CROSS JOIN pos pi GROUP BY 1),
       |prods AS (
       |  SELECT pi.p AS i, pj.p AS j,
       |         sum(e.v[pi.p + 1]::DOUBLE * e.v[pj.p + 1]::DOUBLE) AS sp
       |  FROM e CROSS JOIN pos pi CROSS JOIN pos pj GROUP BY 1, 2)
       |SELECT pr.i, pr.j,
       |       round(pr.sp/(SELECT n FROM nn)
       |             - (si.s/(SELECT n FROM nn))*(sj.s/(SELECT n FROM nn)),
       |             $digits) AS cov
       |FROM prods pr JOIN sums si ON pr.i = si.i JOIN sums sj ON pr.j = sj.i
       |ORDER BY pr.i, pr.j""".stripMargin

  /** Correlation matrix: corr(i,j) = cov(i,j) / (σᵢ·σⱼ) — the
    * scale-invariant view of [[covariance]] (dimension-drift monitoring,
    * redundant-dimension detection before PCA). The covariance pass is
    * checkpointed once (d² rows — model-sized), so the diagonal self-join
    * does NOT rerun the corpus scan; both diagonal joins broadcast. */
  def correlation(emb: DataFrame, vec: String): DataFrame =
    correlationFromCov(covariance(emb, vec).ckpt())

  /** Diagonal normalization over an already-built covariance frame (d²
    * rows — model-sized). Callers that share the covariance across
    * queries (emb1/emb4/the PCA fit ride one memoized checkpoint) hand
    * it in here so the corpus scan behind it runs ONCE per session; the
    * frame is referenced three times below (diag + two joins), so it
    * must be materialized (checkpointed/memoized), not a lazy plan. */
  def correlationFromCov(cov: DataFrame): DataFrame = {
    val diag = cov.filter(col("i") === col("j"))
      .select(col("i").as("k"), sqrt(col("cov")).as("sd"))
    cov
      .join(broadcast(diag).select(col("k").as("i"), col("sd").as("sd_i")), "i")
      .join(broadcast(diag).select(col("k").as("j"), col("sd").as("sd_j")), "j")
      .select(col("i"), col("j"), (col("cov") / (col("sd_i") * col("sd_j"))).as("corr"))
  }

  /** DuckDB twin of [[correlation]]: the covariance CTE chain extended by
    * the same diagonal normalization; `digits`dp rounding on both sides
    * absorbs summation order. */
  def correlationOracleSql(table: String, vec: String, digits: Int = 6): String =
    s"""WITH e AS MATERIALIZED (SELECT $vec AS v FROM $table),
       |nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM e),
       |pos AS MATERIALIZED (
       |  SELECT unnest(range(0, (SELECT max(len(v)) FROM e))) AS p),
       |sums AS MATERIALIZED (
       |  SELECT pi.p AS i, sum(e.v[pi.p + 1]::DOUBLE) AS s
       |  FROM e CROSS JOIN pos pi GROUP BY 1),
       |prods AS MATERIALIZED (
       |  SELECT pi.p AS i, pj.p AS j,
       |         sum(e.v[pi.p + 1]::DOUBLE * e.v[pj.p + 1]::DOUBLE) AS sp
       |  FROM e CROSS JOIN pos pi CROSS JOIN pos pj GROUP BY 1, 2),
       |cov AS MATERIALIZED (
       |  SELECT pr.i, pr.j,
       |         pr.sp/(SELECT n FROM nn)
       |         - (si.s/(SELECT n FROM nn))*(sj.s/(SELECT n FROM nn)) AS cov
       |  FROM prods pr JOIN sums si ON pr.i = si.i JOIN sums sj ON pr.j = sj.i),
       |diag AS (SELECT i AS k, sqrt(cov) AS sd FROM cov WHERE i = j)
       |SELECT c.i, c.j, round(c.cov / (di.sd * dj.sd), $digits) AS corr
       |FROM cov c JOIN diag di ON c.i = di.k JOIN diag dj ON c.j = dj.k
       |ORDER BY c.i, c.j""".stripMargin

  /** A fitted PCA model: per-dimension means, eigenvalues (descending) and
    * the matching eigenvectors (rows of `components`). */
  final case class Model(means: Array[Double], eigenvalues: Array[Double],
                         components: Array[Array[Double]])

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Rotations
    * zero each off-diagonal pair until convergence; deterministic sweep
    * order → deterministic result. Driver-side by design: the input is
    * the d×d model matrix, never data-sized. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
                                 maxSweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            // sign(0) must be +1: equal diagonal entries take a 45° rotation
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    // sign convention: largest-|coordinate| entry positive → deterministic
    val vectors = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val lead = col.maxBy(math.abs)
      if (lead < 0) col.map(-_) else col
    }.toArray
    (values, vectors)
  }

  /** Fit PCA on an embedding column. The covariance entries are collected
    * ROUNDED (7dp — far above cross-run summation noise), so the fitted
    * model is a deterministic function of the data across runs and
    * partitionings. Pass `covFrame` to reuse a covariance already
    * materialized elsewhere (the emb1/emb4 memo) — the rounding below
    * makes the model identical either way. */
  def fit(emb: DataFrame, vec: String,
          covFrame: Option[DataFrame] = None): Model = {
    val means = dimMeans(emb, vec).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    val d = means.length
    val cov = Array.ofDim[Double](d, d)
    covFrame.getOrElse(covariance(emb, vec)).collect().foreach { r =>
      cov(r.getInt(0))(r.getInt(1)) =
        BigDecimal(r.getDouble(2)).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // enforce exact symmetry before Jacobi (rounding can differ on (i,j)/(j,i))
    for (i <- 0 until d; j <- i + 1 until d) {
      val m = (cov(i)(j) + cov(j)(i)) / 2
      cov(i)(j) = m; cov(j)(i) = m
    }
    val (values, vectors) = jacobiEigen(cov)
    Model(means, values, vectors)
  }

  /** Project onto the top-k components: one scan, eigenvectors broadcast
    * as literals, centered dot products in the native kernel (identical
    * left-to-right accumulation to the aggregate folds it replaces).
    * The centered array is LET-BOUND through a one-element transform so
    * it evaluates once per row — as a plain sub-expression each of the k
    * component dots re-ran the cast+subtract chain (the langId trap).
    * Output (id, pc array). */
  def project(emb: DataFrame, id: String, vec: String, model: Model, k: Int): DataFrame = {
    val meanLit = array(model.means.map(lit): _*)
    val pc = element_at(transform(
      array(zip_with(transform(col(vec), _.cast("double")), meanLit, (x, m) => x - m)),
      centered => array((0 until k).map { c =>
        graft.functions.DotProduct(centered, array(model.components(c).map(lit): _*))
      }: _*)), 1)
    emb.select(col(id), pc.as("pc"))
  }
}
