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
