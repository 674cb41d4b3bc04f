package graft

import graft.index.{IndexStore, LabelMatcher, MatchOp, TagIndex}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class IndexStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import MatchOp._
  val dir = "/root/testdata/sf0.001"
  lazy val store: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_index").toString + "/idx"
    IndexStore.materialize(TagIndex.forEvents(spark, dir), p)
    p
  }

  val matchers = Seq(
    LabelMatcher("typ", Eql, "purchase"),
    LabelMatcher("usr", Gte, "10"),
    LabelMatcher("usr", Neq, "12"))

  test("materialized index resolves identically to the in-memory index") {
    val mem = TagIndex.forEvents(spark, dir)
      .resolveMatchers(matchers).select("tsid").collect().map(_.getLong(0)).toSet
    val stored = IndexStore.resolvePostings(spark, store, matchers)
      .collect().map(_.getLong(0)).toSet
    assert(stored == mem && mem.nonEmpty)
  }

  test("store layout is partitioned by label_name (per-label pruning)") {
    val dirs = new java.io.File(store).listFiles().map(_.getName)
    assert(dirs.contains("label_name=usr") && dirs.contains("label_name=typ"))
    val one = IndexStore.load(spark, store)
      .filter(org.apache.spark.sql.functions.col("label_name") === "typ")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("label_name"), plan)
  }
}
