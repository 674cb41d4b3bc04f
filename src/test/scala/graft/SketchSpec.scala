package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch accuracy gates — the constant-memory estimators that replace
  * exact operators at 100 TB must stay within tolerance of exact
  * results at test scale.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.01"

  test("HLL approx distinct within 5% of exact") {
    val r = Tables.lineitem(spark, dir)
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx percentile within 2% of exact") {
    val r = Tables.events(spark, dir)
      .agg(expr("percentile(value, 0.9)").as("exact"),
        percentile_approx(col("value"), lit(0.9), lit(5000)).as("approx"))
      .head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"exact=$exact approx=$approx")
  }

  test("count-min sketch: est >= true for every probed token, tight on heads") {
    val r = operators.Relational.cmsEstimate(spark, dir).collect()
    assert(r.length == 20)
    // the one-sided CMS guarantee, and heads should be near-exact at
    // this corpus/width ratio (heavy tokens dominate their buckets)
    assert(r.forall(row => row.getLong(2) >= row.getLong(1)),
      "CMS must never under-count")
    val relErr = r.map(row =>
      (row.getLong(2) - row.getLong(1)).toDouble / row.getLong(1))
    assert(relErr.max < 0.5, s"head estimates too loose: ${relErr.max}")
  }

  test("minhash jaccard estimate tracks exact jaccard") {
    // signature agreement fraction estimates jaccard; verified pairs
    // (j >= 0.8) must show high signature agreement
    val pairs = dedup.Dedup.minhashLsh(spark, "/root/testdata/sf0.001").collect()
    assert(pairs.nonEmpty && pairs.forall(_.getDouble(2) >= 0.8))
  }
}
