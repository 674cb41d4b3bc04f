package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources and sinks (SURVEY.md §3). The reference owns its storage
  * files (series_file_manager.cpp, WAL); the Spark-native equivalent is
  * a lakehouse layout: samples partitioned by event date — time-range
  * queries prune whole directories before any IO — with csv/json
  * interchange for ingest/export.
  */
object Io {

  /** Write the sample stream day-partitioned: the batch form of the
    * reference's time-partitioned index tree. At cluster scale add
    * `.bucketBy(N, "tsid")` via saveAsTable for shuffle-free per-series
    * access; path-based writes here.
    */
  def writePartitionedSamples(spark: SparkSession, dir: String, outPath: String): Unit =
    Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("day")) // one file per partition dir, not one per task
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(outPath)

  /** Read back with a day predicate — Catalyst turns it into partition
    * pruning (PartitionFilters in the scan, untouched dirs unread).
    */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("day") === day)

  /** Small-file compaction — the standing lakehouse maintenance job:
    * streaming ingest (H3's foreachBatch appends) leaves one file per
    * micro-batch per partition; thousands of KB-files per day turn
    * every scan into a metadata storm. Rewrite each day partition into
    * ~`targetBytes` files (computed from the partition's actual bytes),
    * write-aside + directory swap so a crash mid-compact leaves the
    * original intact — the file-level analog of IndexStore.compact.
    */
  def compactPartitioned(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compacting")
    val src = new org.apache.hadoop.fs.Path(path)
    fs.listStatus(src).filter(s => s.isDirectory).foreach { part =>
      val bytes = fs.getContentSummary(part.getPath).getLength
      val nFiles = math.max(1, (bytes / targetBytes).toInt +
        (if (bytes % targetBytes > 0) 1 else 0))
      spark.read.parquet(part.getPath.toString)
        .repartition(nFiles)
        .write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(tmp, part.getPath.getName).toString)
    }
    fs.delete(src, true)
    fs.rename(tmp, src)
  }

  /** CSV export/ingest round-trip support (header + explicit schema on
    * read; schema inference is a full extra pass at scale).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.option("header", "true").schema(schemaDdl).csv(path)

  /** JSON-lines export/ingest. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)

  /** ORC round-trip (second columnar format). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
