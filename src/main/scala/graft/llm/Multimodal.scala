package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side plumbing (schemas, batching, partition-wise execution) is
  * real and tested; the actual media decoding is STUBBED with a deterministic
  * fake (media codecs are not available in this environment — marked
  * `decodeStub`). In production the stub body is the only thing that changes:
  * each stage is a `mapPartitions` over an iterator of rows so a real decoder
  * amortizes per-partition init (model load, codec context) exactly like an
  * Arrow-batched pandas UDF would.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))), nullable = true)))

  /** Wrap a text corpus as a media table: content = utf-8 bytes, metadata
    * derived columns. Stands in for `spark.read.format("binaryFile")`. */
  def asMediaTable(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      encode(col(payload), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col(payload)).cast("long").as("n_bytes"),
        // stub dimensions: deterministic from content size
        pmod(octet_length(col(payload)), lit(1920)).cast("int").as("width"),
        pmod(octet_length(col(payload)), lit(1080)).cast("int").as("height")).as("meta"))

  /** DECODE STUB — deterministic fake feature extraction. A real
    * implementation would decode `content` with an image/audio codec here;
    * everything around it (schema, partitioning, iterator shape) is real. */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    if (content == null) return Array.fill(dim)(0.0f)
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Feature extraction over the media table: partition-wise, one decoder
    * init per partition, constant memory per row. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codec/model init would happen once per partition here
        it.map { case (id, bytes) => (id, decodeStub(bytes, dim)) }
      }
    out.toDF("media_id", "features")
  }

  /** Perceptual fingerprint (aHash shape): decode to a dim-length feature
    * vector (≙ the 8×8 grayscale thumbnail when dim = 64), threshold each
    * cell against the vector mean, pack the bits into one 64-bit
    * fingerprint. With a REAL decoder, visually-similar images land
    * within a small Hamming distance; with the deterministic stub the
    * fingerprint is content-hash-like, so only byte-identical payloads
    * collide — the packing/grouping machinery is what this exercises.
    * All post-decode math is declarative (left-to-right aggregate folds),
    * so the bit decisions replay exactly in the fixture oracle. */
  def perceptualHash(media: DataFrame, dim: Int = 64): DataFrame = {
    require(dim <= 64, "fingerprint packs into one long")
    val f = transform(col("features"), x => x.cast("double"))
    extractFeatures(media, dim)
      .withColumn("__f", f)
      .withColumn("__mean",
        aggregate(col("__f"), lit(0.0), (a, x) => a + x) / dim)
      .withColumn("phash", {
        // MSB-first bit weights as a literal array (shiftleft's bit-count
        // argument is not a Column in the Scala API)
        val weights = array((0 until dim).map(i => lit(1L << (dim - 1 - i))): _*)
        aggregate(
          zip_with(col("__f"), weights,
            (x, w) => when(x > col("__mean"), w).otherwise(lit(0L))),
          lit(0L), (a, b) => a + b)
      })
      .select(col("media_id"), col("phash"))
  }

  /** Fingerprint dedup: exact-collision groups with a min-id survivor —
    * dd1's shape on the media fingerprint (a real decoder would add a
    * Hamming-bucket stage like SimHash's pigeonhole bands). */
  def perceptualDedup(media: DataFrame, dim: Int = 64): DataFrame = {
    val h = perceptualHash(media, dim)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("phash")
    h.withColumn("survivor", col("media_id") === min("media_id").over(w))
  }

  /** Resize stage stub: metadata transform only (a real resize rewrites
    * `content`); keeps schema + lineage intact. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      lit(w).as("width"),
      lit(h).as("height")))

  /** Frame-sampling stub for video-like payloads: emits every `stride`-th
    * chunk of the binary payload as a frame row (media_id, frame_idx,
    * frame_bytes) — the generator shape a real demuxer would have. */
  def sampleFrames(media: DataFrame, chunk: Int = 64, stride: Int = 4): DataFrame = {
    val nChunks = ceil(col("meta.n_bytes") / chunk).cast("int")
    media
      .withColumn("frame_idx", explode(sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(stride))))
      .select(col("media_id"), col("frame_idx"),
        col("content").substr(col("frame_idx") * chunk + 1, lit(chunk)).as("frame_bytes"))
  }
}
