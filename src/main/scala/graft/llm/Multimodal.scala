package graft.llm

import graft.Ckpt._

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * Two tiers:
  *   1. the generic binary-payload tier (`asMediaTable` …) whose decode is a
  *      deterministic STUB (`decodeStub`) — the shape a video/audio codec
  *      (not in the JDK) would slot into;
  *   2. the REAL image tier (`imageTable`/`decodeChecksums`/
  *      `imageBlockFeatures`/`imageResizeNN`/`imageAHash`) built on
  *      `javax.imageio` — actual PNG encode/decode in `mapPartitions`, with
  *      per-partition codec init, verified end-to-end against a codec-free
  *      oracle (the synthetic pixel formula, exact through PNG's lossless
  *      round trip).
  * Each stage is a `mapPartitions` over an iterator of rows so decoder init
  * (model load, codec context) amortizes exactly like an Arrow-batched
  * pandas UDF would.
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

  // -------------------------------------------------------------------------
  // REAL codec tier — javax.imageio (PNG ships in every standard JDK, no
  // native libs). The synthetic-image generator below is a pure integer
  // formula of (pattern, x, y, brightness), so after the REAL
  // ImageIO.write → ImageIO.read round trip (PNG is lossless RGB) every
  // decoded pixel is bit-identical to the formula and all post-decode math
  // (checksums, block-mean features, nearest-neighbor resize, aHash bits)
  // replays exactly in a codec-free DuckDB oracle. That makes the codec
  // path hash-checkable end-to-end, not fixture-pinned.
  // -------------------------------------------------------------------------

  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO

  /** Deterministic synthetic pixel: `id` yields a base pattern (`id % 16`)
    * plus a flat brightness offset (`(id / 16) % 48`). The offset shifts
    * integer luma by EXACTLY the offset (299+587+114 = 1000 divides the
    * shift), so images sharing a pattern are aHash-identical while being
    * byte-distinct — planted near-duplicates for the perceptual dedup.
    * Both components repeat with period 16×48 = 768, so ids 768 apart
    * render byte-IDENTICAL images (harmless to the 16-group dedup result
    * and its oracle; only a "5000 distinct payloads" claim would be
    * wrong). */
  @inline def synthRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val p = (id % 16).toInt
    val o = ((id / 16) % 48).toInt
    val r = (p * 7 + x * 13 + y * 17) % 200 + o
    val g = (p * 11 + x * 3 + y * 29) % 200 + o
    val b = (p * 5 + x * 23 + y * 7) % 200 + o
    (r, g, b)
  }

  /** Render the synthetic image for `id` and encode through the REAL PNG
    * codec (`javax.imageio`). */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = synthRgb(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG payload back to the packed-RGB pixel grid (row-major).
    * Null-safe: null/undecodable content yields null (caller filters). */
  def decodePixels(content: Array[Byte]): Array[Int] = {
    if (content == null) return null
    val img = ImageIO.read(new ByteArrayInputStream(content))
    if (img == null) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = img.getRGB(x, y) & 0xffffff; x += 1 }
      y += 1
    }
    out
  }

  /** Integer luma of a packed-RGB pixel — same floor-division formula the
    * oracle uses: `(299 r + 587 g + 114 b) / 1000`. */
  @inline def luma(rgb: Int): Int =
    (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000

  /** Synthesize the image table: one REAL PNG per input id. ImageIO's disk
    * cache is disabled once per partition (encoder init amortized exactly
    * where a production codec context would live). */
  def imageTable(ids: DataFrame, id: String, w: Int = 32, h: Int = 32): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long")).as[Long]
      .mapPartitions { it =>
        ImageIO.setUseCache(false) // per-partition codec init
        it.map { mid =>
          val png = synthPng(mid, w, h)
          (mid, png, "image/png", png.length.toLong, w, h)
        }
      }
      .toDF("media_id", "content", "mime", "n_bytes", "width", "height")
      .select(col("media_id"), col("content"),
        struct(col("mime"), col("n_bytes"), col("width"), col("height")).as("meta"))
  }

  /** Position-weighted BIGINT checksum of a decoded pixel grid — the
    * per-image fingerprint both engines aggregate: Σ (r + 256 g + 65536 b)
    * · (1 + x + w·y). Exact integer math, no float drift. */
  private def checksum(px: Array[Int], w: Int): Long = {
    var s = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      val v = ((rgb >> 16) & 0xff) + 256L * ((rgb >> 8) & 0xff) + 65536L * (rgb & 0xff)
      s += v * (1 + (i % w) + w.toLong * (i / w))
      i += 1
    }
    s
  }

  /** REAL decode round-trip: decode each PNG and emit the pixel checksum +
    * total luma — proves the codec path (encode → decode → pixels) against
    * the codec-free formula oracle. */
  def decodeChecksums(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.width"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (mid, bytes, w) =>
          val px = decodePixels(bytes)
          if (px == null) None
          else {
            var sl = 0L; var i = 0
            while (i < px.length) { sl += luma(px(i)); i += 1 }
            Some((mid, w, px.length / w, checksum(px, w), sl))
          }
        }
      }
      .toDF("media_id", "width", "height", "pix_checksum", "sum_luma")
  }

  /** REAL feature extraction: decode → integer luma → `block`×`block`
    * block-mean grid, flattened row-major as (media_id, block_id, mean).
    * Block size divides a power of two, so `sum / count` is IEEE-exact and
    * replays in SQL. */
  /** Block-mean lumas of a decoded pixel grid — the ONE kernel
    * [[imageBlockFeatures]] and [[jpegStability]] both compute (shared so
    * the stability gate can never drift from the feature it gates).
    * Non-aligned dimensions CROP to full blocks (pixels past the last
    * block boundary are skipped, never indexed out of bounds); an image
    * smaller than one block yields an empty array — callers skip it. */
  private[llm] def blockMeansOf(px: Array[Int], w: Int, block: Int): Array[Double] = {
    val h = px.length / w
    val (bx, by) = (w / block, h / block)
    val sums = new Array[Long](bx * by)
    var i = 0
    while (i < px.length) {
      val (x, y) = (i % w, i / w)
      if (x < bx * block && y < by * block)
        sums((y / block) * bx + (x / block)) += luma(px(i))
      i += 1
    }
    sums.map(_.toDouble / (block.toLong * block))
  }

  /** MSB-first packed 8×8 aHash of a decoded pixel grid — the ONE kernel
    * behind [[imageAHash]], [[imagePerceptualDedup]], [[imageHammingDedup]]
    * and [[jpegStability]] (any change to the sampling or threshold rule
    * reaches every consumer at once). */
  private[llm] def aHashOf(px: Array[Int], w: Int): (Long, Long) = {
    val sh = px.length / w
    val thumb = new Array[Int](64)
    var i = 0
    while (i < 64) {
      thumb(i) = luma(px(((i / 8) * sh / 8) * w + ((i % 8) * w / 8)))
      i += 1
    }
    val mean = thumb.map(_.toLong).sum.toDouble / 64
    var (hi, lo) = (0L, 0L)
    i = 0
    while (i < 64) {
      if (thumb(i) > mean) {
        if (i < 32) hi += 1L << (31 - i) else lo += 1L << (63 - i)
      }
      i += 1
    }
    (hi, lo)
  }

  def imageBlockFeatures(media: DataFrame, block: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.width"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (mid, bytes, w) =>
          val px = decodePixels(bytes)
          if (px == null) Iterator.empty
          else {
            val means = blockMeansOf(px, w, block)
            means.indices.iterator.map(b => (mid, b, means(b)))
          }
        }
      }
      .toDF("media_id", "block_id", "mean_luma")
  }

  /** REAL resize: decode → nearest-neighbor resample (src = dst·srcW/dstW,
    * floor — the formula the oracle replays) → re-encode through the PNG
    * codec → new meta. Content is genuinely rewritten, unlike [[resize]]. */
  def imageResizeNN(media: DataFrame, dw: Int, dh: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.width"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (mid, bytes, sw) =>
          val px = decodePixels(bytes)
          if (px == null) None
          else {
            val sh = px.length / sw
            val out = new BufferedImage(dw, dh, BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < dh) {
              var x = 0
              while (x < dw) {
                out.setRGB(x, y, px((y * sh / dh) * sw + (x * sw / dw)))
                x += 1
              }
              y += 1
            }
            val bos = new ByteArrayOutputStream()
            ImageIO.write(out, "png", bos)
            val png = bos.toByteArray
            Some((mid, png, "image/png", png.length.toLong, dw, dh))
          }
        }
      }
      .toDF("media_id", "content", "mime", "n_bytes", "width", "height")
      .select(col("media_id"), col("content"),
        struct(col("mime"), col("n_bytes"), col("width"), col("height")).as("meta"))
  }

  /** REAL perceptual aHash: decode → nearest-neighbor 8×8 luma thumbnail →
    * threshold against the (IEEE-exact, /64) thumbnail mean → pack MSB-first
    * into two 32-bit halves (BIGINT-safe on both engines; a single 64-bit
    * pack would need the sign bit). Images sharing a synth pattern differ
    * only by a flat luma offset, so they collide here while their PNG bytes
    * differ — real planted near-duplicates. */
  def imageAHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.width"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (mid, bytes, sw) =>
          val px = decodePixels(bytes)
          if (px == null) None
          else {
            val (hi, lo) = aHashOf(px, sw)
            Some((mid, hi, lo))
          }
        }
      }
      .toDF("media_id", "phash_hi", "phash_lo")
  }

  /** Perceptual dedup over the REAL aHash: exact-collision groups on the
    * (hi, lo) fingerprint, min-id survivor. */
  def imagePerceptualDedup(media: DataFrame): DataFrame = {
    val h = imageAHash(media)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("phash_hi", "phash_lo")
    h.withColumn("survivor", col("media_id") === min("media_id").over(w))
  }

  /** Hamming-TOLERANT perceptual dedup — the index the lossy tier's
    * finding demands (mm11: a quality-0.85 JPEG round trip flips a few
    * borderline aHash bits, so [[imagePerceptualDedup]]'s exact-collision
    * groups are not codec-stable; a tolerance absorbs the wobble).
    * SimHash-style pigeonhole banding over the 64-bit fingerprint: the
    * two 32-bit halves split into 2 chunks each (4 × 16-bit keys), and
    * any pair within Hamming distance <= 3 must agree on at least one
    * chunk — candidate generation is four equi-joins on 16-bit keys,
    * never an all-pairs join, then the exact xor/bit_count verify runs
    * only on bucket collisions. Survivor = no in-tolerance neighbor with
    * a smaller id (the pairwise form; feed the pairs to the dd6
    * components machinery when full transitive clusters are needed).
    * Every step — thumbnail, threshold, packing, banding, xor popcount —
    * replays codec-free in DuckDB on a lossless corpus, so the operator
    * itself is hash-checked (mm12) and the JPEG stability claim is
    * pinned in LlmSpec: tolerant groups over the q=0.85 corpus equal
    * the groups over the originals. */
  def imageHammingDedup(media: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      "4 x 16-bit pigeonhole chunks guarantee recall only for maxDist <= 3")
    val h = imageAHash(media).ckpt() // grouping + output both read it
    // Band over DISTINCT fingerprints, not media rows (the r14 gen-sf1
    // finding: a low-diversity corpus — synthetic patterns, or a real
    // shard full of logo/thumbnail boilerplate — puts thousands of
    // hash-identical images in every chunk bucket, and the row-level
    // self-join paid sum(bucket^2) on copies that tell the banding
    // nothing: 38x runtime on 10x data for a LINEAR output). Identical
    // fingerprints collapse to one representative (the group's min id);
    // the banding join runs on distinct hashes only, so candidate volume
    // is sum(distinct-hash bucket^2) — unchanged on diverse corpora,
    // collapsed on duplicate-heavy ones. The per-member minimum is then
    // reconstructed EXACTLY: min{y in S : y < x} = min(S) when
    // min(S) < x and empty otherwise, so a member's best in-tolerance
    // neighbor is the least of (its own group's min id, if smaller) and
    // (the min over neighboring groups' min ids, if smaller) — same
    // output, same oracle, bit for bit.
    val groups = h.groupBy(col("phash_hi"), col("phash_lo"))
      .agg(min(col("media_id")).as("gmin"))
      .ckpt() // banding reads it twice (self-join), the member join once
    def chunks(c: org.apache.spark.sql.Column, off: Int) = (0 until 2).map { i =>
      struct(lit(off + i).as("chunk"),
        shiftright(c, i * 16).bitwiseAND(lit(0xFFFFL)).as("ckey"))
    }
    val banded = groups.select(col("gmin"), col("phash_hi"), col("phash_lo"),
        explode(array(chunks(col("phash_hi"), 0) ++ chunks(col("phash_lo"), 2): _*)).as("cc"))
      .select(col("gmin"), col("phash_hi"), col("phash_lo"),
        col("cc.chunk").as("chunk"), col("cc.ckey").as("ckey"))
    val a = banded.as("a"); val b = banded.as("b")
    // unordered distinct-hash pairs (lexicographic struct order breaks the
    // symmetry); dist >= 1 by construction since the hashes differ
    val nbr = a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        struct(col("a.phash_hi"), col("a.phash_lo")) <
          struct(col("b.phash_hi"), col("b.phash_lo")))
      .select(col("a.gmin").as("g1"), col("b.gmin").as("g2"),
        (bit_count(col("a.phash_hi").bitwiseXOR(col("b.phash_hi"))) +
         bit_count(col("a.phash_lo").bitwiseXOR(col("b.phash_lo")))).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
    // per hash group: the least neighbor-group representative (both
    // orientations — the member-level `< x` test happens below)
    val nbMin = nbr.select(col("g1").as("g"), col("g2").as("m"))
      .union(nbr.select(col("g2").as("g"), col("g1").as("m")))
      .groupBy("g").agg(min(col("m")).as("nb_min"))
    // survivors carry -1, not NULL: a nullable BIGINT round-trips through
    // pandas as float NaN on the oracle side, where NaN != NaN breaks
    // value comparison. least() skips NULL operands, so each when()
    // contributes only when its candidate qualifies.
    val minNeighbor = least(
      when(col("media_id") > col("gmin"), col("gmin")),
      when(col("nb_min") < col("media_id"), col("nb_min")))
    h.join(groups, Seq("phash_hi", "phash_lo"))
      .join(nbMin, col("gmin") === col("g"), "left")
      .select(col("media_id"), col("phash_hi"), col("phash_lo"),
        coalesce(minNeighbor, lit(-1L)).as("min_neighbor"),
        minNeighbor.isNull.as("survivor"))
  }

  // -------------------------------------------------------------------------
  // LOSSY tier — the JDK's real JPEG codec at a FIXED quality. Unlike the
  // PNG/PCM families there is no codec-free oracle (JPEG output is
  // implementation-defined), so the contract is a TOLERANCE BAND instead
  // of a hash: decoded block features may drift by a bounded number of
  // luma levels, and the perceptual-dedup partition must survive the
  // re-encode. This is the codec real corpora actually arrive in; the
  // lossless tiers prove the plumbing bit-for-bit, this tier proves the
  // pipeline's behavior is stable under the lossy one.
  // -------------------------------------------------------------------------

  /** Encode a pixel grid through the REAL JPEG writer at an explicit
    * quality (MODE_EXPLICIT — never the writer's default, which could
    * drift across JDKs). One writer per image: creation is trivial next
    * to the DCT work at these sizes, and disposal stays exception-safe
    * inside a lazy partition iterator. */
  private def encodeJpeg(px: Array[Int], w: Int, quality: Float): Array[Byte] = {
    val h = px.length / w
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < px.length) { img.setRGB(i % w, i / w, px(i)); i += 1 }
    // every acquisition sits inside the try/finally that releases it — a
    // throw anywhere (including createImageOutputStream itself) inside a
    // long-running partition iterator must not accumulate writers/streams
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(quality)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally ios.close()
      bos.toByteArray
    } finally writer.dispose()
  }

  /** REAL lossy re-encode: decode whatever `media` holds → JPEG at the
    * given quality → new content + meta (mime flips to image/jpeg). The
    * downstream decode path ([[decodePixels]], features, aHash) is
    * format-agnostic, so the whole image family runs unchanged on the
    * lossy corpus. */
  def jpegRecode(media: DataFrame, quality: Float = 0.85f): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.width"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (mid, bytes, w) =>
          val px = decodePixels(bytes)
          if (px == null) None
          else {
            val jpg = encodeJpeg(px, w, quality)
            Some((mid, jpg, "image/jpeg", jpg.length.toLong, w, px.length / w))
          }
        }
      }
      .toDF("media_id", "content", "mime", "n_bytes", "width", "height")
      .select(col("media_id"), col("content"),
        struct(col("mime"), col("n_bytes"), col("width"), col("height")).as("meta"))
  }

  /** Tolerance-banded lossy-codec stability report (mm11): per image, ONE
    * mapPartitions pass decodes the original, re-encodes it through the
    * real JPEG codec, decodes THAT, and computes both representations'
    * 8×8 block-mean lumas and aHashes — no second corpus scan, no join
    * for the per-image deltas. The only shuffle is the tiny per-hash
    * group-representative window needed to compare the dedup PARTITIONS:
    * `group_stable` for every image ⟺ the aHash partition is identical
    * before and after the lossy round trip (reps equal pointwise iff the
    * equivalence classes coincide). */
  def jpegStability(media: DataFrame, quality: Float = 0.85f,
                    block: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val per = media.select(col("media_id"), col("content"), col("meta.width"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (mid, bytes, w) =>
          val px0 = decodePixels(bytes)
          // images smaller than one block have no block features to band
          if (px0 == null || px0.length / w < block || w < block) None
          else {
            val px1 = decodePixels(encodeJpeg(px0, w, quality))
            val (m0, m1) = (blockMeansOf(px0, w, block), blockMeansOf(px1, w, block))
            val deltas = m0.indices.map(i => math.abs(m1(i) - m0(i)))
            val ((hi0, lo0), (hi1, lo1)) = (aHashOf(px0, w), aHashOf(px1, w))
            // fingerprint wobble: how many of the 64 aHash bits flipped —
            // the quantity a Hamming-tolerant near-dup index absorbs and
            // an exact-collision one does not
            val hamming = java.lang.Long.bitCount(hi0 ^ hi1) +
              java.lang.Long.bitCount(lo0 ^ lo1)
            Some((mid, deltas.max, deltas.sum / deltas.length,
              hamming, hi0, lo0, hi1, lo1))
          }
        }
      }
      .toDF("media_id", "max_block_delta", "mean_block_delta", "hamming_bits",
        "phash_hi0", "phash_lo0", "phash_hi1", "phash_lo1")
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy("phash_hi0", "phash_lo0")
    val w1 = org.apache.spark.sql.expressions.Window.partitionBy("phash_hi1", "phash_lo1")
    per
      .withColumn("rep_orig", min("media_id").over(w0))
      .withColumn("rep_jpeg", min("media_id").over(w1))
      .select(col("media_id"),
        round(col("max_block_delta"), 4).as("max_block_delta"),
        round(col("mean_block_delta"), 4).as("mean_block_delta"),
        col("hamming_bits"),
        col("rep_orig"), col("rep_jpeg"),
        (col("rep_orig") === col("rep_jpeg")).as("group_stable"))
  }

  // -------------------------------------------------------------------------
  // REAL audio tier — javax.sound.sampled (WAV/PCM ships in the JDK).
  // Same proof shape as the PNG tier: a pure integer sample formula,
  // encoded through the REAL WAV writer and decoded back with the real
  // parser; 16-bit PCM is lossless, so every decoded sample equals the
  // formula and the frame features (energy, zero crossings) replay in a
  // codec-free oracle.
  // -------------------------------------------------------------------------

  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

  val sampleRate = 8000f

  /** Deterministic synthetic 16-bit sample: a pseudo-noise sawtooth of
    * (clip id, sample index) — pure integer math, replayable in SQL. */
  @inline def synthSample(id: Long, i: Int): Int =
    (((id % 64) * 131 + i.toLong * (7 + id % 16)) % 4096 - 2048).toInt

  /** Render `n` samples for clip `id` and encode through the REAL WAV
    * writer (RIFF header + 16-bit little-endian PCM mono). */
  def synthWav(id: Long, n: Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = synthSample(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload back to its 16-bit samples via the REAL parser
    * (header walk + format negotiation — not a fixed-offset slice). */
  def decodeSamples(content: Array[Byte]): Array[Int] = {
    if (content == null) return null
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected decoded format: $fmt")
    val bytes = ais.readAllBytes()
    val out = new Array[Int](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff))
      i += 1
    }
    out
  }

  /** Synthesize the audio table: one REAL WAV clip of `n` samples per
    * input id. */
  def audioTable(ids: DataFrame, id: String, n: Int = 1024): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(id).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { mid =>
          val wav = synthWav(mid, n)
          (mid, wav, "audio/wav", wav.length.toLong, n)
        }
      }
      .toDF("media_id", "content", "mime", "n_bytes", "n_samples")
      .select(col("media_id"), col("content"),
        struct(col("mime"), col("n_bytes"), col("n_samples")).as("meta"))
  }

  /** REAL decode → framed features: per `frame`-sample window the energy
    * (Σ s², exact BIGINT), the zero-crossing count (sign flips, exact),
    * and the peak amplitude — the classic cheap audio descriptor row. */
  def audioFrameFeatures(audio: DataFrame, frame: Int = 256): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, bytes) =>
          val s = decodeSamples(bytes)
          if (s == null) Iterator.empty
          else (0 until s.length / frame).iterator.map { fi =>
            var (energy, zc, peak) = (0L, 0L, 0)
            var i = fi * frame
            while (i < (fi + 1) * frame) {
              val v = s(i)
              energy += v.toLong * v
              if (i > fi * frame && (v < 0) != (s(i - 1) < 0)) zc += 1
              if (math.abs(v) > peak) peak = math.abs(v)
              i += 1
            }
            (mid, fi, energy, zc, peak)
          }
        }
      }
      .toDF("media_id", "frame_idx", "energy", "zero_crossings", "peak")
  }
}
