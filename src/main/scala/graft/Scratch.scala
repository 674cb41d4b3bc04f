package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY round-14 measurement scratchpad (deleted before round end). */
object Scratch {
  def t(spark: SparkSession, name: String)(df: => DataFrame): Unit = {
    val d = df
    spark.sparkContext.setJobDescription(name)
    d.write.format("noop").mode("overwrite").save()
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scratch] $name min=${ts.min}%.3f runs=${ts.map(x => f"$x%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val q = promql.NativeHist.eval(spark, dir,
      """histogram_quantile(0.9, sum(rate({typ=~".*"}[1d])))""",
      "2024-01-08 00:00:00")
      .select((floor(col("value") * 1e4 + 0.5) / 1e4).as("q90_all"))
    val c = promql.NativeHist.eval(spark, dir,
      """histogram_count(sum(rate({typ=~".*"}[1d])))""",
      "2024-01-08 00:00:00")
      .select(col("value").as("cps_all"))
    t(spark, "native_agg:q")(q)
    t(spark, "native_agg:c")(c)
    t(spark, "native_agg:cross")(q.crossJoin(c))
    t(spark, "native_agg:full")(SparkEntry.queries("promql_native_agg")(spark, dir))
    spark.stop()
  }
}
