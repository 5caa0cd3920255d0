package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) approximate nearest neighbor — the memory
  * side of the 100 TB ANN story (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011). IVF (Ivf.scala) bounds how much
  * of the corpus a query SCANS; PQ bounds how many BYTES each scanned
  * vector costs: the 64-float embedding (256 B) compresses to `m` small
  * codes (m bytes at k<=256), and query-time scoring is `m` table lookups
  * instead of `dim` multiplies (ADC — asymmetric distance computation).
  *
  * Spark-first composition: per-subspace MLlib KMeans trains the
  * codebooks (index-build time, m small distributed fits); encoding is m
  * model.transform passes producing one array<int> codes column; ADC
  * scoring joins the compact codes table against a BROADCAST per-query
  * lookup table (map of subspace-code -> partial dot), so the scan side
  * never touches the original vectors. Exact rerank of the top `rerank`
  * candidates restores true cosines — the standard two-stage PQ search.
  */
object Pq {

  /** Per-subspace codebooks + the encoded corpus (id, codes array<int>).
    * `codes` is persisted: it is an index, built once and probed many
    * times. Call release() when done. */
  final case class Index(m: Int, k: Int, subDim: Int,
                         codebooks: Array[Array[(Int, Array[Double])]],
                         codes: DataFrame) {
    def release(): Unit = { codes.unpersist(); () }
  }

  /** Train per-subspace quantizers and encode the corpus. `dim` must be
    * divisible by `m`; `k` codes per subspace (k=16 → codes fit in a
    * nibble; 256 would fill a byte, the classic PQ layout). */
  def build(corpus: DataFrame, id: String, vec: String,
            m: Int = 4, k: Int = 16, dim: Int = 64, seed: Long = 42L,
            maxIter: Int = 10): Index = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    var df = corpus.select(col(id).cast("long").as("id"), col(vec).as("__vec"))
    val books = (0 until m).map { s =>
      val slicEd = df.withColumn("__sub",
        array_to_vector(slice(col("__vec"), s * subDim + 1, subDim).cast("array<double>")))
      val model = new KMeans().setK(k).setSeed(seed + s).setMaxIter(maxIter)
        .setFeaturesCol("__sub").setPredictionCol(s"__c$s")
        .fit(slicEd)
      df = model.transform(slicEd).drop("__sub")
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toArray
    }.toArray
    val codes = df
      .select(col("id"), array((0 until m).map(s => col(s"__c$s")): _*).as("codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Index(m, k, subDim, books, codes)
  }

  private def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Approximate top-k by ADC over the codes table, then exact cosine
    * rerank of the top `rerank` candidates against the original vectors.
    *
    * The per-query lookup table (m·k partial dots) is computed as a plain
    * aggregation — queries × codebook (both tiny, codebook broadcast) —
    * and ships as one broadcast map column; the big side of the join
    * touches only (id, codes), never the original vectors. */
  def topK(index: Index, corpus: DataFrame, id: String, vec: String,
           queries: DataFrame, qid: String, qvec: String,
           kTop: Int, rerank: Int = 50): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebook = (for {
      s <- 0 until index.m
      (code, cent) <- index.codebooks(s)
    } yield (s, code, cent.toSeq)).toDF("s", "code", "cent")
    val luts = queries
      .select(col(qid).cast("long").as("query_id"), col(qvec).as("__qv"))
      .crossJoin(broadcast(codebook))
      .withColumn("pd", dotCol(
        slice(col("__qv"), col("s") * index.subDim + 1, lit(index.subDim))
          .cast("array<double>"),
        col("cent")))
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(struct(
        (col("s") * index.k + col("code")).cast("int").as("key"),
        col("pd").as("value")))).as("lut"))
    // ADC scan: broadcast the per-query tables against the compact codes
    val adc = index.codes.crossJoin(broadcast(luts))
      .withColumn("approx",
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(index.m - 1)),
            (code, s) => element_at(col("lut"), (s * index.k + code).cast("int"))),
          lit(0.0), (acc, v) => acc + v))
    val topkAgg = udaf(new TopKAgg(rerank))
    val cands = adc.groupBy("query_id")
      .agg(topkAgg(col("approx"), col("id")).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("c"))
      .select(col("query_id"), col("c.id").as("id"))
    // exact rerank of the shortlist only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("sim"), asc("id"))
    cands
      .join(corpus.select(col(id).cast("long").as("id"), col(vec).as("__cv")), "id")
      .join(broadcast(queries.select(col(qid).cast("long").as("query_id"),
        col(qvec).as("__qv"))), "query_id")
      .select(col("query_id"), col("id"),
        Similarity.cosine(col("__cv"), col("__qv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
  }
}
