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
  *  - each flush writes a *segment* directory `seg=<wm_ns>` of
  *    inverted-index rows (partitioned by label_name inside), where
  *    `wm_ns` is the segment's EXCLUSIVE ingest-time high watermark in
  *    raw nanoseconds: every sample with ts_ns < wm_ns is covered by
  *    this or an earlier segment, every sample with ts_ns >= wm_ns by a
  *    later one. Half-open nanosecond intervals mean no boundary sample
  *    can ever be dropped or double-counted (a µs-truncated watermark
  *    could do both), and the watermark is read back from committed
  *    directory names — crash-consistent, no sidecar state;
  *  - [[materializeIncremental]] indexes only samples at-or-past the
  *    newest segment's watermark (the analog of last_compaction_wm) —
  *    at 100 TB a per-batch flush touches the batch, never the
  *    history. A retry after a crash between commit and anything else
  *    recomputes the same fresh set, lands on the same `seg=` name and
  *    overwrites it: flush is idempotent;
  *  - [[load]] is the merge-on-read view: per (label_name,
  *    label_value, tsid) the segment rows fold with min/max/sum, all
  *    decomposable, so the view equals a full rebuild exactly;
  *  - [[compact]] (manual_compact) folds the segments into one (built
  *    write-aside, swapped via backup-rename — a crash at any point
  *    leaves a complete store at either the path or the backup).
  *
  * A matcher on `name op value` prunes to the label_name partition
  * directories (the analog of the per-label tree descent) and pushes
  * the value predicate into row-group stats. The index is ∝ #series,
  * so at 100 TB of samples it stays a few GB.
  */
object IndexStore {

  private def write(ix: DataFrame, segDir: String): Unit =
    ix.repartition(col("label_name"))
      .write.mode("overwrite").partitionBy("label_name").parquet(segDir)

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(path))

  /** Raw-nanosecond event time of a sample frame (falls back to µs*1000
    * when only the converted timestamp is present — exact there, since
    * that column carries µs precision).
    */
  private def nsCol(df: DataFrame): Column =
    if (df.columns.contains("ts_ns")) col("ts_ns")
    else unix_micros(col("ts")) * 1000L

  /** Exclusive ns watermark of a batch: max sample ts_ns + 1. */
  private def batchWmNs(samples: DataFrame): Option[Long] =
    Option(samples.agg(max(nsCol(samples))).head().get(0))
      .map(_.asInstanceOf[Long] + 1L)

  /** Segment directory names that finished their write — a crash
    * mid-flush leaves a seg dir WITHOUT Spark's _SUCCESS commit marker,
    * and such a segment must count for nothing: not for the watermark
    * (its name alone would make the retry skip the lost rows) and not
    * for reads (partial files). Every store operation goes through this
    * filter; uncommitted leftovers are overwritten by the retry.
    */
  private def committedSegs(spark: SparkSession, path: String): Seq[String] =
    if (!exists(spark, path)) Seq.empty
    else {
      val f = fs(spark, path)
      f.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.isDirectory).map(_.getPath)
        .filter(p => p.getName.startsWith("seg=") &&
          f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
        .map(_.getName).toSeq
    }

  /** The store's exclusive ingest-time watermark in raw ns, read from
    * COMMITTED segment directory names (None for an empty/absent
    * store) — exactly what has been durably flushed, nothing else.
    */
  def storedWatermarkNs(spark: SparkSession, path: String): Option[Long] =
    committedSegs(spark, path)
      .filter(isNumericSeg) // skip seg=b<id> batch segments
      .map(_.stripPrefix("seg=").toLong).maxOption

  /** Ingest-time high watermark as a timestamp (µs-truncated view of
    * [[storedWatermarkNs]] - 1; None for an empty/absent store).
    */
  def watermark(spark: SparkSession, path: String): Option[java.sql.Timestamp] =
    storedWatermarkNs(spark, path).map { wm =>
      val us = (wm - 1L) / 1000L
      val t = new java.sql.Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }

  /** Full flush (first compaction): rewrite the whole store as one
    * segment. An empty batch rebuilds an EMPTY store (the path always
    * ends up replaced — a rebuild must never leave stale rows serving
    * reads; [[load]] renders a segment-less store as an empty index).
    *
    * Built write-aside and swapped via the same checked backup-rename
    * protocol as [[compact]]: the old store serves reads until the new
    * segment's write COMMITS, and a crash at any instant leaves a
    * complete store at `path` or `path.bak` (healed by [[recover]]) —
    * never the silently-empty index a delete-then-write would render
    * after a crash between the delete and the write.
    */
  def materialize(idx: TagIndex, path: String): Unit = {
    val spark = idx.samples.sparkSession
    recover(spark, path)
    val wm = batchWmNs(idx.samples)
    val f = fs(spark, path)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val tmp = path + ".compacting"
    val bak = path + ".bak"
    f.delete(p(tmp), true)
    wm match {
      case Some(w) => write(idx.invertedIndex, s"$tmp/seg=$w")
      case None    => f.mkdirs(p(tmp)) // empty batch → empty store
    }
    f.delete(p(bak), true)
    // rename onto an existing dir NESTS (see compact) — clear first
    if (exists(spark, path))
      require(f.rename(p(path), p(bak)) && !f.exists(p(path)),
        s"rename $path -> $bak failed")
    require(f.rename(p(tmp), p(path)), s"rename $tmp -> $path failed")
    f.delete(p(bak), true)
  }

  /** Incremental flush (try_compact analog): index only the samples
    * at-or-past the stored exclusive watermark and commit them as a new
    * segment named by the new watermark. Cost is ∝ the new batch — the
    * history is never rescanned. The ts_ns filter reaches parquet
    * row-group stats (a filter on the converted timestamp cannot push).
    *
    * Refuses a store built from batch-id segments ([[flushBatch]]):
    * those carry no event-time watermark, so a time-based incremental
    * flush cannot know what is already indexed — silently falling back
    * to a full [[materialize]] would DELETE the streamed history.
    */
  def materializeIncremental(idx: TagIndex, path: String): Unit = {
    val spark = idx.samples.sparkSession
    storedWatermarkNs(spark, path) match {
      case None =>
        require(committedSegs(spark, path).isEmpty,
          s"store at $path holds batch-id segments (streaming flushBatch); " +
            "time-watermark incremental flush does not apply — keep using flushBatch")
        materialize(idx, path)
      case Some(wm) =>
        val fresh = idx.samples.filter(nsCol(idx.samples) >= wm)
        batchWmNs(fresh).foreach { newWm =>
          write(new TagIndex(fresh, idx.labelNames).invertedIndex,
            s"$path/seg=$newWm")
        }
    }
  }

  /** Streaming flush: index an ENTIRE micro-batch as segment
    * `seg=b<batchId>`. In the streaming loop the micro-batch id is the
    * ingest clock (monotone and replay-stable under the checkpoint), so
    * this needs no event-time assumption — late data is indexed by the
    * batch that carries it. Idempotence under foreachBatch replay:
    * a COMMITTED segment for this batch id already holds exactly this
    * batch's rows, so the replayed flush is a no-op — which also makes
    * it safe for [[compact]] to reuse the max batch id as the merged
    * segment's name (a replay can never clobber merged history);
    * an UNCOMMITTED leftover (crash mid-write) is overwritten. Empty
    * micro-batches (idle stream ticks) write nothing. This is the
    * reference's WAL → MemIndex → try_compact loop
    * (index_server.h:48-66) with the checkpoint standing in for the WAL.
    */
  def flushBatch(idx: TagIndex, path: String, batchId: Long): Unit = {
    val spark = idx.samples.sparkSession
    // one listing serves both the family guard and the idempotence
    // check — per-micro-batch metadata RPCs stay O(#segments), not 2×
    val segs = committedSegs(spark, path)
    require(!segs.exists(s => isNumericSeg(s)),
      s"store at $path holds time-watermark segments; streaming flushBatch " +
        "into it would double-count samples past the watermark in the " +
        "merge-on-read fold — use a dedicated store path per ingest mode")
    // batch ids must be monotone over the store's life: a RESET streaming
    // checkpoint restarts ids at 0, whose segments no longer match the
    // committed history (especially after compact renamed it to the max
    // id), so already-merged rows would be re-flushed and double-counted
    // by the merge-on-read fold. Replay of the max id itself is the
    // legitimate foreachBatch retry and falls through to the skip below.
    val maxCommitted = segs.map(_.stripPrefix("seg=b"))
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).maxOption
    require(maxCommitted.forall(batchId >= _),
      s"flushBatch(batchId=$batchId) into $path, which already committed " +
        s"batch ${maxCommitted.getOrElse(-1L)}: checkpoint reset into an " +
        "existing store is unsupported — use a fresh store path")
    if (!segs.contains(s"seg=b$batchId") && !idx.samples.isEmpty)
      write(idx.invertedIndex, s"$path/seg=b$batchId")
  }

  private def isNumericSeg(name: String): Boolean = {
    val n = name.stripPrefix("seg=")
    n.nonEmpty && n.forall(_.isDigit)
  }

  /** Segment ordinal for tombstone scoping: the ns watermark of a
    * time segment, or the batch id of a `seg=b<id>` segment — both
    * monotone over the store's life (enforced by flushBatch /
    * materializeIncremental), which is what lets a tombstone pin
    * "everything flushed so far" as a single number.
    */
  private def segOrd(name: String): Long =
    name.stripPrefix("seg=").stripPrefix("b").toLong

  /** Committed tombstone directories (`del=<k>` + _SUCCESS). */
  private def committedDels(spark: SparkSession, path: String): Seq[String] =
    if (!exists(spark, path)) Seq.empty
    else {
      val f = fs(spark, path)
      f.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.isDirectory).map(_.getPath)
        .filter(p => p.getName.startsWith("del=") &&
          f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
        .map(_.getName).toSeq
    }

  /** delete_series — the admin surface every TSDB needs (Prometheus's
    * delete_series; tombstones over the reference's COW index): resolve
    * the matchers against the CURRENT merged view, record the matched
    * tsids in a tombstone `del=<k>` stamped with the store's max
    * segment ordinal. Merge-on-read hides tombstoned series in every
    * segment up to that ordinal; data flushed AFTER the delete
    * resurrects the series (delete covers existing blocks, never
    * future ingest — Prometheus semantics); [[compact]] physically
    * purges the rows and retires the tombstones with the swap. A full
    * [[materialize]] rebuild from samples also discards tombstones —
    * the source of truth wins. Like compact, deletes serialize with
    * other store mutations (run during an ingest pause). Returns the
    * number of series tombstoned.
    */
  def deleteSeries(spark: SparkSession, path: String,
      matchers: Seq[LabelMatcher]): Long = {
    import spark.implicits._
    val segs = committedSegs(spark, path)
    if (segs.isEmpty) return 0L
    val resolved = TagIndex.resolvePostings(load(spark, path), matchers)
      .select(col("tsid")).distinct()
    val upto = segs.map(segOrd).max
    def nextDel: Long = committedDels(spark, path)
      .map(_.stripPrefix("del=").toLong).maxOption.getOrElse(-1L) + 1L
    // Config-thresholded route (the Dedup.clusters discipline): below
    // the limit, collect-sort-write keeps the count trivially ≡ the
    // tombstone contents in one tiny file; ABOVE it (a matcher hitting
    // tens of millions of series would strain the driver), the set is
    // written distributed and the count is taken from reading the
    // COMMITTED tombstone back — count ≡ contents holds on both paths.
    val collectLimit = spark.conf
      .getOption("graft.index.deleteCollectLimit").map(_.toLong)
      .getOrElse(1000000L)
    val n = resolved.count()
    if (n == 0L) 0L
    else if (n < collectLimit) {
      val tsids = resolved.as[Long].collect().sorted
      tsids.toSeq.toDF("tsid").withColumn("upto", lit(upto))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/del=$nextDel")
      tsids.length.toLong
    } else {
      val del = s"$path/del=$nextDel"
      resolved.withColumn("upto", lit(upto))
        .sortWithinPartitions(col("tsid"))
        .write.mode("overwrite").parquet(del)
      spark.read.parquet(del).count()
    }
  }

  /** Merge-on-read view of the store: COMMITTED segments folded per
    * entry (an uncommitted crash leftover contributes nothing). With
    * one segment (post-[[compact]]) the fold is the identity.
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val segs = committedSegs(spark, path)
    if (segs.isEmpty) emptyView(spark)
    else loadSegs(spark, path, segs, committedDels(spark, path))
  }

  /** A store that exists but holds no committed segments yet (e.g. a
    * just-started streaming pipeline whose first batches were empty)
    * is an EMPTY index, not an error.
    */
  private def emptyView(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("label_name", StringType), StructField("label_value", StringType),
        StructField("tsid", LongType), StructField("min_ts", TimestampType),
        StructField("max_ts", TimestampType), StructField("n_samples", LongType))))
  }

  /** Snapshot (time-travel) read: the merge-on-read view as of segment
    * ordinal `maxOrd` — only segments with ordinal ≤ maxOrd and only
    * tombstones whose `upto` ≤ maxOrd contribute, so the result equals
    * what [[load]] returned when that segment was the store's newest.
    * Because committed segments and tombstones are immutable (flush
    * overwrites only UNcommitted leftovers, compact retires via
    * backup-rename), every historical view stays readable until a
    * compact folds it away — the debugging/replay surface a pipeline
    * needs when a bad ingest must be diffed against the pre-ingest
    * index.
    */
  def loadAt(spark: SparkSession, path: String, maxOrd: Long): DataFrame = {
    val segs = committedSegs(spark, path).filter(segOrd(_) <= maxOrd)
    if (segs.isEmpty) return emptyView(spark)
    val dels = committedDels(spark, path).filter { d =>
      spark.read.parquet(s"$path/$d")
        .agg(max(col("upto"))).head().getLong(0) <= maxOrd
    }
    loadSegs(spark, path, segs, dels)
  }

  /** The merge-on-read fold over an EXPLICIT segment + tombstone list —
    * lets compact build its merged copy from exactly the snapshot it is
    * about to replace, never a later listing. A tombstoned tsid's rows
    * are dropped from every segment at-or-below the tombstone's `upto`
    * ordinal BEFORE the fold (so a resurrected series' counts restart
    * from its post-delete segments only). The tombstone set is
    * ∝ deleted series — Catalyst broadcasts it into the row filter.
    */
  private def loadSegs(spark: SparkSession, path: String, segs: Seq[String],
      dels: Seq[String]): DataFrame = {
    val raw = spark.read.option("basePath", path)
      .parquet(segs.map(s => s"$path/$s"): _*)
    val live =
      if (dels.isEmpty) raw
      else {
        val tomb = spark.read.parquet(dels.map(d => s"$path/$d"): _*)
          .groupBy(col("tsid")).agg(max(col("upto")).as("__upto"))
        // `seg` is the partition column of the segment layout; its
        // ordinal comparison works for both families (b-prefix stripped)
        val ord = regexp_replace(col("seg").cast("string"), "^b", "").cast("long")
        raw.withColumn("__ord", ord)
          .join(tomb, Seq("tsid"), "left")
          .filter(col("__upto").isNull || col("__ord") > col("__upto"))
          .drop("__ord", "__upto")
      }
    live.groupBy(col("label_name"), col("label_value"), col("tsid"))
      .agg(min(col("min_ts")).as("min_ts"), max(col("max_ts")).as("max_ts"),
        sum(col("n_samples")).as("n_samples"))
  }

  /** manual_compact: fold all segments into one merged segment carrying
    * the same watermark identity — the numeric ns watermark when
    * present, else the max batch id (safe against foreachBatch replay
    * because [[flushBatch]] skips committed segments). Mixed stores
    * (both families) are refused: a numeric merged name would let a
    * later time-based flush re-index batch-segment samples past the
    * watermark and double-count them.
    *
    * The merged store is built write-aside, then swapped via a backup
    * rename with every rename result CHECKED — at every instant a
    * complete store exists at `path` or at `path.bak`, and a crash in
    * the window between the two renames is healed by the automatic
    * bak-restore at the start of the next compact (or [[recover]]).
    *
    * Like the reference's manual_compact (which serializes on
    * compaction_mutex, index_server.h:61-66), compact assumes no
    * concurrent flush into this store — run it during an ingest pause.
    * As a backstop: everything derives from ONE segment listing; after
    * the store is frozen (renamed to the backup) the frozen contents
    * are re-verified against that snapshot, and any unexpected state —
    * a commit in the snapshot-to-freeze gap, or a racing flush
    * recreating the store dir — ABORTS LOUDLY with both copies
    * preserved rather than guessing. Out-of-contract concurrency can
    * cost a retry, never data.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    recover(spark, path)
    // ONE listing drives the family guard, the merged name AND the
    // snapshot — a second listing could disagree under a racing flush
    // and hand the merged segment a stale identity
    val snapshot = committedSegs(spark, path)
    val numeric = snapshot.filter(isNumericSeg)
    val batchSegs = snapshot.filter(s => !isNumericSeg(s))
    require(numeric.isEmpty || batchSegs.isEmpty,
      s"store at $path mixes time-watermark and batch-id segments; " +
        "compact cannot assign the merged segment a safe identity")
    val segName = numeric.map(_.stripPrefix("seg=").toLong).maxOption
      .map(wm => s"seg=$wm")
      .orElse {
        batchSegs.map(_.stripPrefix("seg=b"))
          .filter(n => n.nonEmpty && n.forall(_.isDigit))
          .map(_.toLong).maxOption.map(b => s"seg=b$b")
      }
    segName.foreach { sn =>
      val tmp = path + ".compacting"
      val bak = path + ".bak"
      val f = fs(spark, path)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      // IMPORTANT rename semantics: Hadoop FileSystem.rename onto an
      // EXISTING directory does not fail — it nests the source inside
      // the destination. Every rename below therefore checks the
      // destination's absence explicitly first; on any unexpected
      // state the swap ABORTS LOUDLY with both copies preserved
      // (pre-compact store at bak, merged copy at tmp) — the store is
      // never silently lost, nested, or double-counted.
      f.delete(p(tmp), true)
      // tombstones from the same snapshot instant: the merged segment
      // is physically purged, and the del= dirs retire with the swap
      // (they move to the backup with the old store and are deleted)
      write(loadSegs(spark, path, snapshot, committedDels(spark, path)), s"$tmp/$sn")
      f.delete(p(bak), true)
      // freeze the store; from here no flush can commit into it
      require(f.rename(p(path), p(bak)) && !f.exists(p(path)),
        s"rename $path -> $bak failed")
      def abortPreserving(reason: String): Nothing =
        throw new IllegalStateException(
          s"$reason; pre-compact store preserved at $bak, merged copy at $tmp " +
            "— quiesce ingest, reconcile, then re-run compact")
      if (committedSegs(spark, bak).toSet != snapshot.toSet) {
        // something committed between the snapshot and the freeze and
        // is NOT in the merged copy — put the store back untouched
        if (f.exists(p(path)))
          abortPreserving(s"store at $path changed during compact AND was " +
            "recreated by a racing flush")
        require(f.rename(p(bak), p(path)), s"restore $bak -> $path failed")
        f.delete(p(tmp), true)
        throw new IllegalStateException(
          s"store at $path changed during compact; aborted without touching " +
            "the store — retry during an ingest pause")
      }
      if (f.exists(p(path)))
        abortPreserving(s"a racing flush recreated $path during compact")
      require(f.rename(p(tmp), p(path)), s"rename $tmp -> $path failed")
      f.delete(p(bak), true)
    }
  }

  /** Heal the compact crash window: if the store path is gone but a
    * complete backup exists, restore it. Invoked automatically by
    * [[compact]]; callable directly after a crash.
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val bak = path + ".bak"
    if (!exists(spark, path) && exists(spark, bak)) {
      val f = fs(spark, path)
      require(f.rename(new org.apache.hadoop.fs.Path(bak),
        new org.apache.hadoop.fs.Path(path)), s"restore $bak -> $path failed")
    }
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

  /** Matcher resolution against a HISTORICAL snapshot: the index view
    * as of segment ordinal `maxOrd` ([[loadAt]] — immutable segments
    * make time travel a partition-pruned read, and tombstones written
    * after the snapshot don't rewrite history). The reference's
    * equivalent is querying an old COW-tree root (cow_tree.h).
    */
  def resolvePostingsAt(spark: SparkSession, path: String, maxOrd: Long,
      matchers: Seq[LabelMatcher],
      startTs: Option[Column] = None, endTs: Option[Column] = None): DataFrame =
    TagIndex.resolvePostings(loadAt(spark, path, maxOrd), matchers, startTs, endTs)
}
