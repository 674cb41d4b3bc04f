package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized inverted index — the Spark analog of the reference's
  * compaction: MemIndex snapshots are flushed into the on-disk
  * COW B+-tree (/root/reference/src/index/index_server.cpp
  * try_compact/compact, index_tree.cpp write paths).
  *
  * The store is LSM-shaped, like the reference's flush-then-compact
  * cycle (index_server.h:50-66 keeps a compaction watermark and
  * flushes only entries past it):
  *
  *  - each flush appends a *segment* of inverted-index rows under a
  *    parquet table partitioned by label_name;
  *  - [[materializeIncremental]] indexes only samples newer than the
  *    store's ingest-time high watermark (the analog of
  *    last_compaction_wm/last_compaction_timestamp) — at 100 TB a
  *    per-batch flush touches the batch, never the history;
  *  - [[load]] is the merge-on-read view: per (label_name,
  *    label_value, tsid) the segment rows fold with min/max/sum, all
  *    decomposable, so the view equals a full rebuild exactly;
  *  - [[compact]] (manual_compact) folds the segments into one, so
  *    read amplification stays bounded between flushes.
  *
  * A matcher on `name op value` prunes to one label_name partition
  * directory (the analog of the per-label tree descent) and pushes the
  * value predicate into row-group stats. The index is ∝ #series, so at
  * 100 TB of samples it stays a few GB.
  */
object IndexStore {

  private def write(ix: DataFrame, path: String, mode: String): Unit =
    ix.repartition(col("label_name"))
      .write.mode(mode).partitionBy("label_name").parquet(path)

  /** Full flush (first compaction): rewrite the whole index. */
  def materialize(idx: TagIndex, path: String): Unit =
    write(idx.invertedIndex, path, "overwrite")

  /** Ingest-time high watermark of the store: the max sample timestamp
    * any flushed segment has seen (None for an empty/absent store).
    */
  def watermark(spark: SparkSession, path: String): Option[java.sql.Timestamp] =
    if (!exists(spark, path)) None
    else Option(spark.read.parquet(path).agg(max(col("max_ts"))).head().getTimestamp(0))

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Incremental flush (try_compact analog): index only the samples
    * past the store watermark and append them as a new segment. Cost is
    * ∝ the new batch — the history is never rescanned. The time filter
    * goes on the raw `ts_ns` long when present so it reaches parquet
    * row-group stats (a filter on the converted timestamp cannot push).
    */
  def materializeIncremental(idx: TagIndex, path: String): Unit =
    watermark(idx.samples.sparkSession, path) match {
      case None => materialize(idx, path)
      case Some(wm) =>
        val wmUs = wm.getTime * 1000L + (wm.getNanos / 1000L) % 1000L
        // series time bounds are µs-truncated, so "past the watermark"
        // means past the watermark MICROSECOND — a ts_ns with sub-µs
        // residue inside the watermark µs is already flushed
        val fresh =
          if (idx.samples.columns.contains("ts_ns"))
            idx.samples.filter(col("ts_ns") >= (wmUs + 1L) * 1000L)
          else
            idx.samples.filter(col("ts") > lit(wm))
        write(new TagIndex(fresh, idx.labelNames).invertedIndex, path, "append")
    }

  /** Merge-on-read view of the store: segments folded per entry. With
    * one segment (post-[[compact]]) the fold is the identity.
    */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("label_name"), col("label_value"), col("tsid"))
      .agg(min(col("min_ts")).as("min_ts"), max(col("max_ts")).as("max_ts"),
        sum(col("n_samples")).as("n_samples"))

  /** manual_compact: fold all segments into one merged segment. Writes
    * the merged view beside the store, then swaps directories, so a
    * crash mid-compact leaves the original store intact.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val tmp = path + ".compacting"
    write(load(spark, path), tmp, "overwrite")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** Resolve matchers against the materialized index — same algebra as
    * the in-memory path (TagIndex.resolvePostings), but the per-matcher
    * label_name filter becomes a partition filter on the store (the
    * predicate on the grouping key pushes below the merge fold).
    */
  def resolvePostings(spark: SparkSession, path: String,
      matchers: Seq[LabelMatcher],
      startTs: Option[Column] = None, endTs: Option[Column] = None): DataFrame =
    TagIndex.resolvePostings(load(spark, path), matchers, startTs, endTs)
}
