package graft.index

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Label matcher ops, mirroring the reference's promql::MatchOp set
  * (/root/reference/src/index/index_tree.cpp:113-140): equality,
  * inequality, lexicographic value ranges, anchored regex and its
  * negation.
  */
sealed trait MatchOp
object MatchOp {
  case object Eql extends MatchOp
  case object Neq extends MatchOp
  case object Lss extends MatchOp
  case object Gtr extends MatchOp
  case object Lte extends MatchOp
  case object Gte extends MatchOp
  case object EqlRegex extends MatchOp
  case object NeqRegex extends MatchOp
}

/** A single matcher `name <op> value`, e.g. `typ =~ "(click|view)"`.
  * Regexes are fully anchored, as in Prometheus / the reference.
  */
final case class LabelMatcher(name: String, op: MatchOp, value: String) {
  import MatchOp._
  /** Inclusive matchers select postings; exclusive ones subtract from
    * the inclusive result (reference: index_server.cpp:94-140 keeps
    * NEQ matchers out of the tree walk and applies them as and-not).
    */
  def inclusive: Boolean = op match {
    case Neq | NeqRegex => false
    case _ => true
  }
  /** Predicate over inverted-index rows (label_name, label_value).
    * For exclusive ops this is the predicate of the *positive* form;
    * the caller subtracts.
    */
  def indexPredicate: Column = {
    val v = col("label_value")
    val positive = op match {
      case Eql | Neq => v === value
      case Lss => v < value
      case Gtr => v > value
      case Lte => v <= value
      case Gte => v >= value
      case EqlRegex | NeqRegex =>
        // rlike cannot reach a parquet scan, but a derived literal
        // prefix can (StringStartsWith pushes into row-group stats on
        // the IndexStore path — the Spark analog of the reference's
        // tree descent by value prefix). Conjoining it is semantics-
        // preserving: every match of ^(?:prefix...)$ starts with the
        // prefix, and LabelMatcher.literalPrefix is conservative
        // (empty on alternation, quantified tails dropped).
        val base = v.rlike("^(?:" + value + ")$")
        val p = LabelMatcher.literalPrefix(value)
        if (p.nonEmpty) v.startsWith(p) && base else base
    }
    col("label_name") === name && positive
  }
}

object LabelMatcher {
  /** The maximal leading literal of an anchored regex that every match
    * must start with — "" when none can be derived safely: any `|`
    * disqualifies the whole pattern (top-level alternation can't be
    * detected without parsing), and a quantifier directly after the
    * literal run makes the run's last char optional, so it is dropped.
    */
  private[graft] def literalPrefix(re: String): String = {
    if (re.contains("|")) return ""
    val meta = ".[]{}()*+?^$\\"
    val run = re.takeWhile(c => !meta.contains(c))
    if (run.isEmpty) ""
    else if (re.drop(run.length).headOption.exists(c => "*+?{".contains(c)))
      run.dropRight(1)
    else run
  }
}

/** The tagging index re-expressed as Spark DataFrames.
  *
  * Reference model (/root/reference/include/tagtree/index/mem_index.h):
  * per (label_name, label_value) a Roaring posting list of TSIDs plus
  * [min_timestamp, max_timestamp]. Here the posting list is a DataFrame
  * (label_name, label_value, tsid, min_ts, max_ts, n_samples) — at
  * 100 TB this derived table is ∝ #series (millions of rows, not
  * trillions of samples), partitioned by label_name and broadcastable
  * into the sample scan, which is the Spark analog of the reference's
  * full-cache mode (index_server.h:26).
  *
  * Series identity: xxhash64 over the canonical label encoding —
  * the Spark analog of add_series' TSID assignment
  * (index_server.cpp:44-67), but deterministic and coordination-free
  * so a 1000-executor ingest needs no id counter.
  */
class TagIndex(val samples: DataFrame, val labelNames: Seq[String],
    preCatalog: Option[DataFrame] = None,
    preInverted: Option[DataFrame] = None) {

  /** Set by [[TagIndex.memo]] for instances that are themselves
    * memoized per (session, dir, label set): the gate for the
    * posting-resolution memo below. A fresh per-call instance (e.g. a
    * recorded-rule StoreTagIndex) stays untagged, so memoizing on it
    * could only leak one cache entry per invocation — untagged
    * indexes always resolve live.
    */
  private[graft] var memoTag: Option[String] = None

  /** Samples with a tsid column. */
  val labeled: DataFrame = {
    samples.withColumn("tsid",
      xxhash64(concat_ws("\u0000", labelNames.map(col): _*)))
  }

  /** One row per series: labels, tsid, time bounds, sample count.
    * Persisted — the reference's full-cache mode (index_server.h:26):
    * the index lives in memory, only sample scans hit storage. Size is
    * ∝ #series, so this holds on a cluster (executors cache partitions).
    */
  lazy val seriesCatalog: DataFrame =
    preCatalog.getOrElse(
      labeled.groupBy(col("tsid") +: labelNames.map(col): _*)
        .agg(min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
          count(lit(1)).as("n_samples")))
      .persist()

  /** Inverted index: (label_name, label_value, tsid, min_ts, max_ts).
    * Persisted like the catalog: resolveMatchers references it once per
    * matcher, and without the cache each branch would re-run the whole
    * catalog derivation.
    */
  lazy val invertedIndex: DataFrame = preInverted.getOrElse {
    val kvs = labelNames.flatMap(n => Seq(lit(n), col(n).cast("string")))
    seriesCatalog
      .select(col("tsid"), col("min_ts"), col("max_ts"), col("n_samples"),
        explode(map(kvs: _*)).as(Seq("label_name", "label_value")))
      .select("label_name", "label_value", "tsid", "min_ts", "max_ts", "n_samples")
  }.persist()

  /** resolve_label_matchers(matchers, start, end) → series.
    *
    * Inclusive matchers each select a posting set from the inverted
    * index; the conjunction is a single shuffle (union + groupBy tsid
    * HAVING count = k) rather than k-1 joins. Exclusive matchers are
    * applied as left_anti — the reference's bitmap and-not
    * (index_server.cpp:94-140). Time pruning uses the per-series
    * [min_ts, max_ts] exactly like index_tree.cpp:92-110.
    *
    * Returns the series catalog rows that match.
    */
  def resolveMatchers(matchers: Seq[LabelMatcher],
      startTs: Option[Column] = None, endTs: Option[Column] = None): DataFrame = {
    val resolved = TagIndex.resolvePostings(invertedIndex, matchers, startTs, endTs)
    // Postings → series. At scale `resolved` is small; broadcast it.
    seriesCatalog.join(resolved, Seq("tsid"), "left_semi")
  }

  /** Memoized tsid resolution (round 15, optimization): the inverted-
    * index union + conjunction aggregate re-ran per QUERY INVOCATION
    * even though this index is immutable — the reference keeps a warm
    * posting cache for exactly this reason (index_server.h full-cache
    * mode). The memo pins the RESOLVED tsid frame (∝ matched series,
    * tiny) per (index, matcher set, time window); resolution semantics
    * are untouched because the build goes through the VIRTUAL
    * [[resolveMatchers]] (a [[StoreTagIndex]] still resolves from its
    * materialized store). Only memoized index instances participate
    * (see [[memoTag]]); value-based keys mean a different matcher set
    * or window never reuses a stale frame.
    */
  def resolveTsidsMemo(matchers: Seq[LabelMatcher],
      loUs: Option[Long] = None, hiUs: Option[Long] = None): DataFrame = {
    def live = resolveMatchers(matchers,
      loUs.map(u => timestamp_micros(lit(u))),
      hiUs.map(u => timestamp_micros(lit(u)))).select("tsid")
    memoTag match {
      case Some(tag) => graft.Memo.cached(labeled.sparkSession,
        s"tagindex.tsids:$tag:${matchers.mkString("|")}:" +
          s"${loUs.getOrElse("-")}:${hiUs.getOrElse("-")}")(live)
      case None => live
    }
  }

  /** [[resolveMatchers]] riding the [[resolveTsidsMemo]] posting cache:
    * the catalog semi-join stays live (one broadcast stage), only the
    * conjunction work is pinned. Series-returning callers on the
    * gated-query path use this; semantics ≡ resolveMatchers.
    */
  def resolveMatchersMemo(matchers: Seq[LabelMatcher],
      loUs: Option[Long] = None, hiUs: Option[Long] = None): DataFrame =
    if (memoTag.isEmpty)
      resolveMatchers(matchers,
        loUs.map(u => timestamp_micros(lit(u))),
        hiUs.map(u => timestamp_micros(lit(u))))
    else seriesCatalog.join(resolveTsidsMemo(matchers, loUs, hiUs),
      Seq("tsid"), "left_semi")

  /** label_values(name) → distinct values (index_server.h:44). */
  def labelValues(name: String): DataFrame =
    invertedIndex.filter(col("label_name") === name)
      .select(col("label_value").as("value")).distinct()

  /** label_values(name, matchers...) — the constrained Prometheus-API
    * form (adapters/prom exposes it via the querier: resolve the
    * matcher set first, then distinct values of `name` over the matched
    * series only). Cost ∝ matched series, never samples.
    */
  def labelValues(name: String, matchers: Seq[LabelMatcher]): DataFrame =
    resolveMatchersMemo(matchers)
      .select(col(name).cast("string").as("value")).distinct()

  /** label_names(matchers...) — the constrained /api/v1/labels form:
    * the names carrying a non-null value on at least one MATCHED
    * series (a label a series does not define is a null catalog
    * column — the n-label generalization A14 introduced). One plan,
    * cost ∝ matched series: resolve postings, then explode the
    * per-series defined-name set and distinct.
    */
  def labelNames(matchers: Seq[LabelMatcher]): DataFrame = {
    val defined = array(labelNames.map(n =>
      when(col(n).isNotNull, lit(n))): _*)
    resolveMatchersMemo(matchers)
      .select(explode(defined).as("label_name"))
      .filter(col("label_name").isNotNull)
      .distinct()
  }

  /** exists(labels): exact label-set lookup (index_server.h:36). */
  def exists(labels: Map[String, String]): DataFrame =
    resolveMatchersMemo(labels.toSeq.map { case (n, v) => LabelMatcher(n, MatchOp.Eql, v) })

  /** select(matchers, mint, maxt): resolve postings then fetch samples
    * in range (storage.h Querier.select + adapters/prom/querier.cpp).
    * Index pruning is series-level (conservative); the sample-level
    * range filter makes the result exact. On a cluster the resolved
    * tsid set is broadcast into the partition-pruned sample scan.
    */
  def select(matchers: Seq[LabelMatcher], startTs: Column, endTs: Column): DataFrame = {
    val tsids = resolveMatchers(matchers, Some(startTs), Some(endTs)).select("tsid")
    // Tables.tsBetween lands the range on whichever time column is
    // file-native (raw ns long or µs timestamp), so the predicate
    // reaches the parquet scan as a row-group stats filter in either
    // encoding; semantics equal `ts ∈ [start,end]` µs-truncated.
    val timeFiltered = Tables.tsBetween(labeled, startTs, endTs)
    timeFiltered.join(broadcast(tsids), Seq("tsid"), "left_semi")
  }
}

/** A [[TagIndex]] whose matcher resolution consults a MATERIALIZED
  * inverted index at `storePath` (an [[IndexStore]] — batch-flushed or
  * maintained by the streaming ingest loop, H9) instead of the
  * in-memory derived one. Samples and the series catalog still come
  * from the live table; only posting resolution reads the store — the
  * reference's split between its on-disk index tree and the storage it
  * points into (include/tagtree/index/index_server.h:26-66).
  */
class StoreTagIndex(samples: DataFrame, labelNames: Seq[String],
    storePath: String) extends TagIndex(samples, labelNames) {
  override def resolveMatchers(matchers: Seq[LabelMatcher],
      startTs: Option[Column] = None, endTs: Option[Column] = None): DataFrame = {
    val resolved = TagIndex.resolvePostings(
      IndexStore.load(samples.sparkSession, storePath), matchers, startTs, endTs)
    seriesCatalog.join(resolved, Seq("tsid"), "left_semi")
  }
}

object TagIndex {

  /** Matcher resolution against any inverted-index DataFrame
    * (label_name, label_value, tsid, min_ts, max_ts) — in-memory
    * derived or materialized (IndexStore) — returning matching tsids.
    *
    * Inclusive matchers each select a posting set; the conjunction is
    * a single shuffle (union tagged by matcher id + groupBy tsid
    * HAVING countDistinct = k) rather than k-1 joins, and is correct
    * when several matchers hit the same label (usr >= "2" AND
    * usr <= "5"). Exclusive matchers are applied as left_anti — the
    * reference's bitmap and-not (index_server.cpp:94-140). Time
    * pruning uses per-entry [min_ts, max_ts] like index_tree.cpp:92-110.
    */
  def resolvePostings(index: DataFrame, matchers: Seq[LabelMatcher],
      startTs: Option[Column] = None, endTs: Option[Column] = None): DataFrame = {
    require(matchers.nonEmpty, "need at least one matcher")
    val (inc, exc) = matchers.partition(_.inclusive)

    val timePruned = (startTs, endTs) match {
      case (Some(s), Some(e)) =>
        index.filter(col("max_ts") >= s && col("min_ts") <= e)
      case _ => index
    }

    val base: DataFrame =
      if (inc.nonEmpty) {
        val tagged = inc.zipWithIndex.map { case (m, i) =>
          timePruned.filter(m.indexPredicate)
            .select(col("tsid"), lit(i).as("__mid"))
        }.reduce(_ unionAll _)
        tagged.groupBy(col("tsid"))
          .agg(countDistinct(col("__mid")).as("__k"))
          .filter(col("__k") === inc.size)
          .select("tsid")
      } else {
        // no inclusive matcher: start from the full posting universe
        // (the reference does the same fallback).
        timePruned.select("tsid").distinct()
      }

    exc.foldLeft(base) { (acc, m) =>
      acc.join(index.filter(m.indexPredicate).select("tsid"),
        Seq("tsid"), "left_anti")
    }
  }
  /** The events table as a TSDB: series = {usr, typ}, samples (ts, value).
    * user_id is carried as a *string* label — tagtree labels are
    * strings and its value ordering (LSS/GTR/…) is lexicographic.
    */
  // one index per (session, data dir, label set) — repeated queries
  // reuse the persisted catalog/index instead of re-deriving them from
  // raw samples (the reference keeps exactly one warm MemIndex per store)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), TagIndex]()

  /** Memoized index construction; `tag` distinguishes label models.
    * Stamps [[TagIndex.memoTag]] so the per-matcher posting memo knows
    * this instance is session-pinned (one instance per key → value-
    * keyed posting caches can never go stale or leak per call).
    */
  def memo(spark: SparkSession, dir: String, tag: String)(build: => TagIndex): TagIndex =
    cache.computeIfAbsent((spark, dir, tag), _ => {
      val i = build
      i.memoTag = Some(s"$dir#$tag")
      i
    })

  /** Disk-warm memoized construction: the first JVM to build this
    * index persists its catalog + inverted index as parquet under a
    * dataset-fingerprinted directory; every later session LOADS the two
    * small tables (∝ #series) instead of re-deriving them from the raw
    * samples — the reference's warm full-cache serving mode
    * (index_server.h:26) surviving process restarts, so a fresh
    * session's first matcher query skips the 3-4 s catalog groupBy.
    * `_done` commits the pair atomically-enough: a crash mid-write
    * leaves no marker and the next session rebuilds; a stale dataset
    * changes the fingerprint and falls out naturally. Failures to
    * persist degrade to the in-memory path, never to an error.
    */
  def memoWarm(spark: SparkSession, dir: String, tag: String,
      labels: Seq[String])(samplesBuild: => DataFrame): TagIndex =
    memo(spark, dir, tag) {
      val fp = Tables.fingerprint(s"$dir/events.parquet")
      val safe = tag.replaceAll("[^A-Za-z0-9]", "_")
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_warmidx_${fp}_$safe")
      val done = new java.io.File(base, "_done")
      val catP = new java.io.File(base, "catalog").toString
      val invP = new java.io.File(base, "inverted").toString
      if (done.exists())
        new TagIndex(samplesBuild, labels,
          Some(spark.read.parquet(catP)), Some(spark.read.parquet(invP)))
      else {
        val i = new TagIndex(samplesBuild, labels)
        try {
          // single-file layout: the tables are ∝ #series (MBs), and a
          // 32-file shuffle layout costs 32 footer reads + 32 reader
          // inits on every warm load — the exact latency this cache
          // exists to remove (at huge #series, bump to a few files)
          i.seriesCatalog.coalesce(1).write.mode("overwrite").parquet(catP)
          i.invertedIndex.coalesce(1).write.mode("overwrite").parquet(invP)
          done.createNewFile()
        } catch {
          case e: Throwable =>
            System.err.println(s"[graft] warm-index persist failed ($base): $e")
        }
        i
      }
    }

  /** Evict all memoized indexes (unpersisting their cached tables) —
    * for long-lived services; the memos otherwise live for the JVM.
    */
  def clearMemos(): Unit = {
    cache.values().forEach { i =>
      i.seriesCatalog.unpersist(false)
      i.invertedIndex.unpersist(false)
    }
    cache.clear()
  }

  def forEvents(spark: SparkSession, dir: String): TagIndex =
    memoWarm(spark, dir, "usr,typ", Seq("usr", "typ")) {
      val raw = Tables.eventsRaw(spark, dir)
      raw.select(
        col("event_id"), col("ts_ns"),
        Tables.tsCol(raw).as("ts"), col("value"),
        col("user_id").cast("string").as("usr"),
        col("event_type").as("typ"))
    }

  /** Derived classic-histogram bucket series over the events stream —
    * the data model Prometheus's histogram_quantile consumes: each
    * sample contributes one membership row to EVERY bucket whose bound
    * ≥ its value (cumulative buckets, le ∈ {25, 50, 100, 200, +Inf} —
    * B19's bounds), labels (typ, le), value 1 per observation so
    * `count_over_time` over a window IS the cumulative bucket counter.
    * One explode over the pruned scan — ∝ #buckets rows per sample,
    * the same blow-up a real `_bucket` metric family carries.
    */
  def forBucketedEvents(spark: SparkSession, dir: String): TagIndex =
    memoWarm(spark, dir, "typ,le", Seq("typ", "le")) {
      val raw = Tables.eventsRaw(spark, dir)
      val bounds = Seq(25.0, 50.0, 100.0, 200.0)
      val buckets = array(
        bounds.map(b => struct(
          lit(if (b == b.floor) b.toLong.toString else b.toString).as("le"),
          lit(b).as("bound"))) :+
          struct(lit("+Inf").as("le"),
            lit(Double.PositiveInfinity).as("bound")): _*)
      raw.select(
        col("event_id"), Tables.tsCol(raw).as("ts"), col("value"),
        col("event_type").as("typ"))
        .withColumn("__b", explode(buckets))
        .filter(col("value") <= col("__b.bound"))
        .select(col("event_id"), col("ts"), lit(1.0).as("value"),
          col("typ"), col("__b.le").as("le"))
    }
}
