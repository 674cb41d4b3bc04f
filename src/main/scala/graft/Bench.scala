package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scheduler warmup so the first measured query isn't
    // charged for session startup (no data caching — different table)
    spark.range(1000000).selectExpr("sum(id)").collect()
    // two runs per query, report the min: steady-state time (JIT,
    // codegen, file-listing warm), which is what a long-running cluster
    // service observes; noted in the JSON via runs/agg.
    val results = SparkEntry.queries.map { case (name, fn) =>
      var ok = true
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            ok = false
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // -1 sentinel: a throwing query must not masquerade as a fast one
      name -> (if (ok) times.min else -1.0)
    }
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":2,"agg":"min","failed":$failedJson}"""
    // Both channels: the bare line on stdout (build.sbt passes forked
    // stdout through unwrapped) and a file the driver can always read.
    println(json)
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/bench.json"),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"[bench] write /tmp/bench.json failed: $e") }
    spark.stop()
  }
}
