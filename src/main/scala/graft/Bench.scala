package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scheduler warmup so the first measured query isn't
    // charged for session startup (no data caching — different table)
    spark.range(1000000).selectExpr("sum(id)").collect()
    // three runs per query, report the min (steady-state: JIT, codegen,
    // file-listing warm — what a long-running cluster service observes)
    // AND the median (robust to this container's ±3x per-query noise,
    // so round-over-round regressions are attributable without QDebug).
    val results = SparkEntry.queries.map { case (name, fn) =>
      var ok = true
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            ok = false
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // -1 sentinel: a throwing query must not masquerade as a fast one
      val (mn, med) =
        if (ok) (times.min, times.sorted.apply(times.size / 2)) else (-1.0, -1.0)
      name -> ((mn, med))
    }
    val failed = results.collect { case (k, (v, _)) if v < 0 => k }.toSeq
    // Locale.ROOT: a default locale with comma decimal separators would
    // render invalid JSON
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, (mn, _)) => "\"" + k + "\":" + fmt(mn) }
      .mkString("{", ",", "}")
    val qsMed = results.map { case (k, (_, md)) => "\"" + k + "\":" + fmt(md) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.collect { case (v, _) if v >= 0 => v }.sum
    val totalMed = results.values.collect { case (_, m) if m >= 0 => m }.sum
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_median":$qsMed,"sf":"$sfDir","runs":3,"agg":"min","total_median":${fmt(totalMed)},"failed":$failedJson}"""
    // The full line is ~4 KB and the driver's stdout tail capture clips
    // it (BENCH_r01/r02 parsed:null). Emit, in order: the full line, the
    // file copy, and LAST a short (<200 byte) self-contained summary
    // line so any tail window ends with one complete parseable object.
    println(json)
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/bench.json"),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"[bench] write /tmp/bench.json failed: $e") }
    spark.stop()
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","runs":3,"agg":"min","total_median":${fmt(totalMed)},"failed":$failedJson}""")
  }
}
