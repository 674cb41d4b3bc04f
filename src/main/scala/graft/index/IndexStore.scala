package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized inverted index — the Spark analog of the reference's
  * compaction: MemIndex snapshots are flushed into the on-disk
  * COW B+-tree (/root/reference/src/index/index_server.cpp
  * try_compact/compact, index_tree.cpp write paths).
  *
  * Here the flush target is a parquet table partitioned by label_name:
  * a matcher on `name op value` prunes to one partition directory
  * (the analog of the per-label tree descent) and pushes the value
  * predicate into row-group stats. The index is ∝ #series, so at
  * 100 TB of samples it stays a few GB and re-materializes
  * incrementally per ingest batch (append by max seen tsid, like the
  * reference's low-watermark snapshots).
  */
object IndexStore {

  /** Flush the index (compaction). */
  def materialize(idx: TagIndex, path: String): Unit =
    idx.invertedIndex
      .repartition(col("label_name"))
      .write.mode("overwrite").partitionBy("label_name").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Resolve matchers against the materialized index — same algebra as
    * the in-memory path (TagIndex.resolvePostings), but the per-matcher
    * label_name filter becomes a partition filter on the store.
    */
  def resolvePostings(spark: SparkSession, path: String,
      matchers: Seq[LabelMatcher],
      startTs: Option[Column] = None, endTs: Option[Column] = None): DataFrame =
    TagIndex.resolvePostings(load(spark, path), matchers, startTs, endTs)
}
