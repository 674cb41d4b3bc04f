package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-phase (salted) groupBy.
  *
  * With a handful of hot keys (events has 5 event types over ~100k
  * samples — at 100 TB each key's partition would exceed an executor),
  * phase 1 spreads each key over `salt` sub-groups so every task gets
  * ~|key|/salt rows, phase 2 merges the per-salt partials. The result
  * is identical to a direct groupBy (the DuckDB oracle) because sum
  * and count are associative; avg is derived from merged sums.
  */
object Skew {

  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val salt = 8
    val phase1 = Tables.events(spark, dir)
      .withColumn("__salt", pmod(col("event_id"), lit(salt)))
      .groupBy(col("event_type"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("psum"))
    phase1.groupBy(col("event_type"))
      .agg(sum(col("pn")).cast("long").as("n"),
        round(sum(col("psum")), 2).as("sum_v"),
        round(sum(col("psum")) / sum(col("pn")), 4).as("avg_v"))
  }
}
