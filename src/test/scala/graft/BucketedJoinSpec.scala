package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located join path: two tables bucketed by the join key join
  * WITHOUT a shuffle — the layout a 100 TB deployment uses for
  * sample⋈sample and sample⋈series joins (SURVEY §4).
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without an exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bktbl").toString
    // the JVM shares one SparkSession across suites — scope the
    // broadcast-disable (which forces the shuffle question) to this
    // test and restore it, or PlanSpec's broadcast assertions break
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = Tables.events(spark, dir)
      ev.filter(col("event_type") === "click")
        .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$tmp/clicks_b").saveAsTable("clicks_b")
      ev.filter(col("event_type") === "purchase")
        .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$tmp/purchases_b").saveAsTable("purchases_b")

      val joined = spark.table("clicks_b").groupBy("user_id")
        .agg(count(lit(1)).as("n_clicks"))
        .join(spark.table("purchases_b").groupBy("user_id")
          .agg(count(lit(1)).as("n_purchases")), Seq("user_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      // and the result is right
      val expect = ev.filter(col("event_type") === "click").select("user_id").distinct()
        .intersect(ev.filter(col("event_type") === "purchase").select("user_id").distinct())
        .count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS clicks_b")
      spark.sql("DROP TABLE IF EXISTS purchases_b")
    }
  }
}
