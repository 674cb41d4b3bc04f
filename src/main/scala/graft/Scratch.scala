package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY round-14 measurement scratchpad (deleted before the round
  * ends): times intermediate frames of the top bench offenders with the
  * noop sink so per-stage cost is attributable (guide §1.4).
  */
object Scratch {
  def t(spark: SparkSession, name: String)(df: => DataFrame): Unit = {
    val d = df
    spark.sparkContext.setJobDescription(name)
    // warm once, then two timed noop runs
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

    // ---- dedup_editdist decomposition ----
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val twins = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
      .filter(length(col("text")) >= 26)
      .select((col("doc_id") + lit(4000000L)).as("doc_id"),
        concat(substring(col("text"), 1, 4), lit("Z"),
          substring(col("text"), 6, 10), lit("Q"),
          expr("substring(text, 17)")).as("text"))
    val all = docs.unionByName(twins)
    val base = all.filter(length(col("text")) >= 24)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("k"))
    val segs = base.withColumn("i", explode(sequence(lit(0), lit(2))))
      .select(col("doc_id"), col("i"),
        expr("substring(k, 1 + 8*i, 8)").as("s"), col("k"))
    val probes = base.withColumn("i", explode(sequence(lit(0), lit(2))))
      .withColumn("d", explode(sequence(lit(-2), lit(2))))
      .filter(expr("1 + 8*i + d >= 1 AND 8*i + d + 8 <= 24"))
      .select(col("doc_id"), col("i"),
        expr("substring(k, 1 + 8*i + d, 8)").as("s"), col("k"))
    val joined = segs.alias("a").join(probes.alias("b"),
      col("a.i") === col("b.i") && col("a.s") === col("b.s") &&
        col("a.doc_id") =!= col("b.doc_id"))
    println("[scratch] editdist raw candidate rows = " + joined.count())
    val cand = joined.select(
      least(col("a.doc_id"), col("b.doc_id")).as("ia"),
      greatest(col("a.doc_id"), col("b.doc_id")).as("ib"),
      when(col("a.doc_id") < col("b.doc_id"), col("a.k")).otherwise(col("b.k")).as("ka"),
      when(col("a.doc_id") < col("b.doc_id"), col("b.k")).otherwise(col("a.k")).as("kb"))
      .distinct()
    println("[scratch] editdist distinct pairs = " + cand.count())
    t(spark, "editdist:base")(base)
    t(spark, "editdist:join")(joined)
    t(spark, "editdist:cand_distinct")(cand)
    t(spark, "editdist:full")(SparkEntry.queries("dedup_editdist")(spark, dir))

    // ---- dedup_containment decomposition ----
    val sh = graft.Memo.cached(spark, s"dedup.containment_sh:$dir") {
      dedup.Dedup.shingles(docs.unionByName(
        docs.filter(pmod(col("doc_id"), lit(17)) === 0)
          .withColumn("__w", split(col("text"), " "))
          .filter(size(col("__w")) >= 5)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"),
            concat_ws(" ", slice(col("__w"), lit(1),
              floor(size(col("__w")) * lit(0.6)).cast("int"))).as("text"))))
    }
    println("[scratch] containment shingle rows = " + sh.count())
    t(spark, "containment:cand")(dedup.Dedup.containmentCandidates(sh, 0.9))
    t(spark, "containment:full")(SparkEntry.queries("dedup_containment")(spark, dir))

    // ---- native hist schema decomposition ----
    t(spark, "native_schema:full")(SparkEntry.queries("promql_native_schema")(spark, dir))
    t(spark, "native_agg:full")(SparkEntry.queries("promql_native_agg")(spark, dir))
    spark.stop()
  }
}
