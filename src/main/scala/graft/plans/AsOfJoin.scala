package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each probe row (keys, pts) find the most recent
  * sample (keys, ts ≤ pts) and carry its value — the set-form of the
  * reference's per-series iterator positioning
  * (/root/reference/include/tagtree/storage.h:15 `seek`).
  *
  * Spark lacks a SQL as-of join; rather than a custom SparkPlan, this
  * composes union + ordered window, which *is* the sort-merge physical
  * strategy a custom exec would implement: one hash shuffle on the key,
  * one sort per partition, single pass — and it stays inside
  * WholeStageCodegen. Probes sort *after* samples at equal timestamps,
  * giving `ts <= pts` semantics.
  */
object AsOfJoin {

  /** @param samples (key columns ++ tsCol ++ valueCol)
    * @param probes  (key columns ++ ptsCol)
    * @return probes with `asof_value` = value of latest sample at-or-
    *         before pts and `asof_ts` = that sample's timestamp (both
    *         null when none) — the timestamp is what a staleness
    *         horizon (PromQL's 5-minute lookback) filters on
    */
  def asofJoin(samples: DataFrame, probes: DataFrame, keys: Seq[String],
      tsCol: String, valueCol: String, ptsCol: String): DataFrame = {
    val s = samples.select(
      keys.map(col) ++ Seq(col(tsCol).as("__t"), col(valueCol).as("__v"),
        lit(0).as("__probe")): _*)
    val p = probes.select(
      keys.map(col) ++ Seq(col(ptsCol).as("__t"),
        lit(null).cast(s.schema("__v").dataType).as("__v"),
        lit(1).as("__probe")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.unionByName(p)
      .withColumn("asof_value", last(col("__v"), ignoreNulls = true).over(w))
      .withColumn("asof_ts",
        last(when(col("__probe") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__probe") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(ptsCol),
        col("asof_value"), col("asof_ts")): _*)
  }
}
