package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** Schema-adaptive events reader. The driver has generated `events.ts`
    * as parquet TIMESTAMP(NANOS) in some rounds and as naive
    * timestamp[us] in others; this engine's contract is "read what the
    * driver generates", so both encodings must work:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses to map nanos to its µs
    *    TimestampType, so `nanosAsLong` reads it as a LongType of raw
    *    nanos → renamed `ts_ns`. Range predicates on `ts_ns` push into
    *    the parquet scan as INT64 stats filters.
    *  - timestamp[us] (isAdjustedToUTC=false): with NTZ inference OFF the
    *    column reads as plain TimestampType whose µs values are taken
    *    as-is — exactly DuckDB's `epoch_us` view of the same file, so
    *    oracle parity is preserved without any timezone shift. The NATIVE
    *    `ts` column is kept (range predicates on it push down as µs
    *    stats filters) and `ts_ns` is derived for the downstream API.
    *
    * Callers filter time ranges via [[tsBetween]], which lands the
    * predicate on every time column present so whichever one is native
    * reaches the parquet row-group stats.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumnRenamed("ts", "ts_ns")
      case org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        // only reachable for Spark-written files, whose footer schema
        // metadata overrides the NTZ-inference conf; graft sessions run
        // UTC, so the cast maps wall-clock micros to instants as-is
        df.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case other =>
        sys.error(s"events.ts: unsupported parquet encoding $other — " +
          "expected TIMESTAMP(NANOS) (read as long ns) or timestamp[us]")
    }
  }

  /** The µs-exact TimestampType view of an events-derived frame's time:
    * the native `ts` when the file encodes µs timestamps, else converted
    * from raw nanos. Using the native column where it exists keeps
    * downstream `ts` predicates eligible for parquet pushdown.
    */
  def tsCol(df: DataFrame): Column =
    if (df.columns.contains("ts")) col("ts")
    else timestamp_micros(expr("ts_ns div 1000"))

  /** Inclusive [start, end] time-range filter on the µs-truncated event
    * time. The predicate is applied to EVERY time column the frame
    * carries (`ts_ns` raw nanos and/or `ts` timestamp): one of them is
    * the file-native column, so the range reaches the parquet scan as a
    * row-group stats filter in either encoding; the other is a cheap
    * redundant per-row check.
    */
  def tsBetween(df: DataFrame, startTs: Column, endTs: Column): DataFrame = {
    val byNs =
      if (df.columns.contains("ts_ns"))
        Seq(col("ts_ns") >= unix_micros(startTs) * 1000L &&
          col("ts_ns") < (unix_micros(endTs) + 1L) * 1000L)
      else Seq.empty
    val byTs =
      if (df.columns.contains("ts"))
        Seq(col("ts") >= startTs && col("ts") <= endTs)
      else Seq.empty
    df.filter((byNs ++ byTs).reduce(_ && _))
  }

  /** events with `ts` as TimestampType (exact to the µs). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    if (raw.columns.contains("ts")) raw.drop("ts_ns")
    else raw.withColumn("ts", timestamp_micros(expr("ts_ns div 1000"))).drop("ts_ns")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
