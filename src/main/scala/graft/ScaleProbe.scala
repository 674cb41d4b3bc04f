package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: replicates the sf0.1 events table Nx (shifted ids so
  * series counts scale too) and times representative operators, to
  * observe how wall time grows with data volume on the same plans —
  * evidence that the operator shapes are scan/shuffle-bound, not
  * driver-bound. Run: `sbt "runMain graft.ScaleProbe [factor]"`.
  * This synthesizes load for TIMING only — correctness gates always
  * run on the driver-generated tables untouched.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base = Tables.events(spark, "/root/testdata/sf0.1")
    val big = (0 until factor).map { k =>
      base.withColumn("user_id", col("user_id") + lit(k * 10000L))
        .withColumn("event_id", col("event_id") + lit(k * 10000000L))
    }.reduce(_ unionAll _).cache()
    println(s"rows: ${big.count()} (factor $factor)")

    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.count()
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val idx = new index.TagIndex(big.select(
      col("event_id"), col("ts"), col("value"),
      col("user_id").cast("string").as("usr"), col("event_type").as("typ")),
      Seq("usr", "typ"))
    t("series_catalog")(idx.seriesCatalog)
    t("match_conj")(idx.resolveMatchers(Seq(
      index.LabelMatcher("typ", index.MatchOp.Eql, "purchase"),
      index.LabelMatcher("usr", index.MatchOp.Gte, "10"))))
    t("agg_hourly")(big.groupBy(col("event_type"),
        date_trunc("hour", col("ts"))).agg(sum(col("value"))))
    t("window_seek")(
      {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"))
        big.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      })
    t("distinct_series")(big.select("user_id", "event_type").distinct())
    spark.stop()
  }
}
