package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run at sf0.001 and produce rows with a
  * non-empty schema (the driver's t1 smoke, widened to all queries).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is a declared rows-only op") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only ops are allowed but must be deliberate; keep the list
    // here. ann_lsh / ann_ivf outputs are quantizer/hyperplane-dependent
    // by nature — each has an exact-oracle sibling gate (ann_lsh_planted,
    // ann_ivf_full) hash-gating the same machinery.
    val rowsOnly =
      Set("ann_lsh", "ann_ivf", "ann_pq", "ann_ivfpq", "dedup_semantic")
    assert(missing == rowsOnly, s"queries missing oracle: $missing")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs at sf0.001 with rows") {
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.schema.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
