package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver has shipped `events.ts` as parquet TIMESTAMP(NANOS) in
  * some rounds and as naive timestamp[us] in others; round 6 lost 71
  * queries to that drift. This spec pins [[Tables.eventsRaw]] to BOTH
  * encodings with tiny in-test fixtures so the next data-shape change
  * fails here with a pointed message, not as 71 generic analysis errors.
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // three rows, one second apart, µs-aligned (both encodings can carry them)
  private val usValues = Seq(1704067200000000L, 1704067201000000L, 1704067202500000L)

  private def fixtureRows(s: SparkSession) = {
    import s.implicits._
    usValues.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong, s"t$i", i.toDouble, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
  }

  private def writeAndRead(encode: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("events_enc").toString
    encode(fixtureRows(spark))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.eventsRaw(spark, dir)
  }

  test("eventsRaw reads the legacy long-nanos encoding (TIMESTAMP(NANOS) via nanosAsLong)") {
    // nanosAsLong surfaces TIMESTAMP(NANOS) as a LongType of raw nanos;
    // a long `ts` column is that same shape on disk.
    val raw = writeAndRead(df => df.select(col("event_id"),
      (col("us") * 1000L).as("ts"), col("user_id"), col("event_type"), col("value"), col("props")))
    assert(raw.schema("ts_ns").dataType == LongType)
    assert(raw.select("ts_ns").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq == usValues.map(_ * 1000L))
  }

  test("eventsRaw reads a Spark-written TIMESTAMP_NTZ file (footer schema wins over inference)") {
    val raw = writeAndRead(df => df.select(col("event_id"),
      timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props")))
    assert(raw.schema("ts").dataType == TimestampType)
    assert(raw.schema("ts_ns").dataType == LongType)
    assert(raw.select("ts_ns").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq == usValues.map(_ * 1000L))
  }

  test("eventsRaw reads the driver's naive timestamp[us] file as NATIVE TimestampType") {
    // the driver's files carry no Spark footer metadata, so with NTZ
    // inference off the µs column reads as a plain TimestampType whose
    // micros are taken as-is — DuckDB's epoch_us view of the same file
    val raw = Tables.eventsRaw(spark, "/root/testdata/sf0.001")
    assert(raw.schema("ts").dataType == TimestampType)
    assert(raw.schema("ts_ns").dataType == LongType)
    // native column ⇒ range predicates reach the parquet scan as µs
    // stats filters (row-group pruning at scale)
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-12 00:00:00").cast("timestamp")
    val pushed = Tables.tsBetween(raw, lo, hi)
      .queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("GreaterThanOrEqual(ts,"),
      s"expected native ts pushdown in plan:\n$pushed")
    // ts_ns is exactly unix_micros(ts)*1000
    val bad = raw.filter(col("ts_ns") =!= unix_micros(col("ts")) * 1000L).count()
    assert(bad == 0L)
  }

  test("eventsRaw rejects an unknown ts encoding loudly") {
    val e = intercept[RuntimeException] {
      writeAndRead(df => df.select(col("event_id"),
        col("us").cast("string").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")))
    }
    assert(e.getMessage.contains("unsupported parquet encoding"))
  }

  test("tsBetween is equivalent across encodings and lands on the native column") {
    val lo = lit("2024-01-01 00:00:01").cast("timestamp")
    val hi = lit("2024-01-01 00:00:02").cast("timestamp")
    val asNs = writeAndRead(df => df.select(col("event_id"),
      (col("us") * 1000L).as("ts"), col("user_id"), col("event_type"), col("value"), col("props")))
    val asUs = writeAndRead(df => df.select(col("event_id"),
      timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props")))
    // [lo, hi] is inclusive on the µs-truncated time: rows at :01 only
    // (the :02.5 row is beyond hi in both encodings)
    for (raw <- Seq(asNs, asUs)) {
      val got = Tables.tsBetween(raw, lo, hi).select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L))
    }
  }
}
