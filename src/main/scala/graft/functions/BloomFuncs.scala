package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column access to Spark's native bloom-filter sketch pair — the same
  * machinery the optimizer injects as runtime group-join filters
  * (InjectRuntimeFilter), exposed for explicit use by the incremental
  * dedup path: `bloomAgg` builds the sketch distributively (partial
  * sketches OR-merge, so one corpus pass yields a KB-scale binary on
  * the driver), `mightContain` probes it per row inside codegen.
  *
  * Registration follows the [[TopKAgg.column]] idempotent fixed-name
  * pattern (the public alternative to Column's private[sql]
  * constructor).
  */
object BloomFuncs {
  /** Distributed bloom build over a LONG column. `items`/`bits` size
    * the sketch (bits/items ≈ 8 → ~2% false positives — harmless
    * here: every probe hit is confirmed exactly downstream).
    */
  def bloomAgg(spark: SparkSession, c: Column, items: Long, bits: Long): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0)
        .toAggregateExpression(),
      "built-in")
    call_function("graft_bloom_agg", c, lit(items), lit(bits))
  }

  /** Probe: bloom binary (foldable) × LONG value → boolean. */
  def mightContain(spark: SparkSession, bloom: Column, v: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_probe",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
    call_function("graft_bloom_probe", bloom, v)
  }
}
