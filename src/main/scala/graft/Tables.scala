package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated test data
  * (see TESTDATA.md). At cluster scale these would be catalog tables
  * partitioned by date and bucketed by key; locally they are single
  * parquet files — the operators only depend on the schema.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Content fingerprint of a source file (path + size + mtime), for
    * keying derived on-disk caches — a regenerated dataset at the same
    * path must not hit a stale store.
    */
  def fingerprint(path: String): String = {
    val f = new java.io.File(path)
    Integer.toHexString((path, f.length(), f.lastModified()).hashCode())
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to its microsecond TimestampType; read it as a long of nanos
    * (`ts_ns`). Time-range predicates belong on THIS column — they push
    * into the parquet scan as INT64 stats filters and prune row groups,
    * which a filter on the converted timestamp cannot.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events").withColumnRenamed("ts", "ts_ns")
  }

  /** events with `ts` converted to TimestampType (exact to the µs). */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .drop("ts_ns")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
