package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink-side operators (SURVEY.md §2.1: S3, S5, S6, S7, S11).
  *
  * Fixed column orders and the comma-strip come from the reference's CSV
  * writers (dwwApi.js:14-46 all-people; dwwApi.js:145 jumps header).
  */
object Sinks {

  /** S5 — the 9-column all-people CSV projection (dwwApi.js:16-18), with the
    * reference's comma strip on role and company (dwwApi.js:33-35). Column
    * order is part of the contract. */
  val allPeopleCols: Seq[String] = Seq(
    "personId", "personName", "personRole", "imdbMovieId", "searchedCompany",
    "searchedMatchRatio", "movieReleaseYear", "matchedCompanyId", "matchedCompanyName")

  def allPeopleCsvProjection(df: DataFrame): DataFrame =
    df.select(
      col("personId"), col("personName"),
      regexp_replace(col("personRole"), ",", "").as("personRole"),
      col("imdbMovieId"),
      regexp_replace(col("searchedCompany"), ",", "").as("searchedCompany"),
      col("searchedMatchRatio"), col("movieReleaseYear"),
      col("matchedCompanyId"), col("matchedCompanyName"))

  /** S6 — the jumps CSV projection (dwwApi.js:145,191-196). */
  val jumpsCols: Seq[String] = Seq("person", "role", "date", "company", "location", "region")

  def writeCsv(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.select(cols.map(col): _*)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** S7 — nested JSON documents sink (dwwApi.js:201-223). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S3 — partitioned table sink (the Neo4j node/edge store + label indexes
    * become partitioned parquet; partition column ≙ label index). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed table sink: pre-shuffles by the join/agg key at write time so
    * every later equi-join or aggregation on `bucketCols` between
    * co-bucketed tables plans WITHOUT an Exchange — the 100 TB answer to
    * the reference's per-label Neo4j indexes (GetWeta.py:43-51). Bucketing
    * requires the table catalog (`saveAsTable`). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Training-shard writer: the terminal sink of the curation pipeline.
    * Packs documents into `budget`-token context shards
    * (TextAnalysis.packByTokenBudget) and writes one directory per
    * pack_id (`pack_id=N/`), each shard's docs sorted by id inside a
    * single file so a training loader streams them in pack order.
    *
    * Scale shape: repartition BY the partition column before
    * partitionBy — without it every task writes every pack directory
    * (tasks × packs small files, the classic dynamic-partition-write
    * explosion); with it each pack is one task's single file. maxRecords
    * guards the degenerate huge-pack case. */
  def writeTrainingShards(packed: DataFrame, id: String, path: String,
                          maxRecordsPerFile: Int = 1000000): Unit =
    packed
      .repartition(col("pack_id"))
      .sortWithinPartitions(col("pack_id"), col(id))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("pack_id")
      .parquet(path)

  /** JSONL corpus sink: one JSON object per line, gzip-compressed — the
    * interchange format training corpora actually ship in. Spark's json
    * writer/reader IS line-delimited JSON, so the roundtrip needs no
    * custom code; gzip trades split-ability for size, which is the right
    * trade for write-once shard files consumed whole by a loader. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** S11 — dim upsert with versioned snapshot (dwwRoutes.js:131-172): the old
    * snapshot is preserved under `backups/<name>_<version>`, then the new
    * table is written. Returns the backup path, like the reference's
    * copyFileSync naming. */
  def upsertWithBackup(spark: SparkSession, newDim: DataFrame, basePath: String,
                       name: String, version: Long): String = {
    val live = s"$basePath/$name"
    val backup = s"$basePath/backups/${name}_$version"
    val livePath = new org.apache.hadoop.fs.Path(live)
    // the FS of basePath, NOT the default FS: with an s3a:// base and an
    // hdfs default, FileSystem.get would check existence on the wrong
    // filesystem and silently skip the backup — the one guarantee here
    val fs = livePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(livePath)) {
      org.apache.hadoop.fs.FileUtil.copy(fs, livePath, fs,
        new org.apache.hadoop.fs.Path(backup), false, spark.sparkContext.hadoopConfiguration)
    }
    newDim.write.mode("overwrite").parquet(live)
    backup
  }

  /** OPTIMIZE-style small-file compaction — the table-maintenance pass a
    * long-lived 100 TB lakehouse needs: streaming/incremental ingest
    * (S2/dd9/dd18) accumulates thousands of small part-files per
    * partition, and every later scan pays task-scheduling + footer
    * overhead per file. Rewrites `inDir`'s parquet fragments into
    * `outDir` as ⌈totalBytes / targetBytes⌉ files via `coalesce` — a
    * NARROW dependency (split merging at read time), deliberately not
    * `repartition`: compaction must never shuffle the data, only re-pack
    * it. Writes to a NEW directory (snapshot semantics — the caller
    * swaps pointers like [[upsertWithBackup]]); an in-place rewrite that
    * dies mid-job would destroy the table.
    *
    * Returns (filesBefore, filesAfter, bytesTotal). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): (Int, Int, Long) = {
    def dataFiles(dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    }
    val before = dataFiles(inDir)
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).coalesce(n)
      .write.mode("overwrite").parquet(outDir)
    (before.size, dataFiles(outDir).size, totalBytes)
  }
}
