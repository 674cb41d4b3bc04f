package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F14: BM25 top-k retrieval — the lexical search half of a
  * training-data stack (quality-ranked example selection, hard-negative
  * mining for retrievers, RAG source ranking). The whole scorer is the
  * classic Okapi/Lucene formulation computed as pure column
  * arithmetic over the same inverted shape as the tag index: a
  * (doc, term, tf) postings table, a term→df table, and a tiny
  * query-term table joined against the postings.
  *
  * Determinism across engines AND partitionings: each per-term
  * contribution is quantized to the dyadic 2⁻²⁰ grid before the
  * per-(query, doc) sum (the text_lm_score trick), so the score never
  * depends on aggregation order; ranking orders by that exact
  * quantized double with a zero-padded doc-id string as the tie key
  * (what the bounded-heap TopKAgg's (v desc, a asc) comparator
  * implements natively).
  *
  * Shape at 100 TB: df and the query-term set are vocabulary- and
  * query-bounded (≪ corpus) — both broadcast; the postings stream is
  * touched once with no self-join; per-(query, doc) scoring is one
  * partial-aggregated hash aggregate; top-k rides the bounded heap
  * (≤ k entries per query through the shuffle), so a query with 10⁸
  * matching docs still moves only k rows. No window functions.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75
  val TopK = 10

  /** Queries = first 4 words of every doc_id ≡ 0 (mod 101) document
    * (qid = doc_id): deterministic, derivable by the oracle, and
    * guaranteed non-vacuous (each query's source doc matches itself).
    */
  def topk(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    rankPostings(spark, cachedPostings(spark, s"docs:$dir", postings(docs)),
      docs, Some(s"docs:$dir"))
  }

  // Postings memoized per (session, source): every invocation would
  // otherwise cache a fresh copy of the same table (see graft.Memo).
  private def cachedPostings(spark: SparkSession, key: String,
      build: => DataFrame): DataFrame =
    graft.Memo.cached(spark, s"text.bm25:$key")(build)

  /** Corpus-generic form (the scale probe drives the same pipeline
    * over replicated corpora).
    */
  def topkOn(spark: SparkSession, docs: DataFrame): DataFrame =
    rankPostings(spark, postings(docs), docs)

  /** The inverted (doc, term, tf) postings derivation — what
    * [[TermStore]] persists per flushed batch.
    */
  private[graft] def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))

  /** BM25 ranking over an ALREADY-BUILT postings table — shared by the
    * direct path (postings derived in-query) and the stored path
    * (postings loaded from [[TermStore]] segments), so one oracle
    * gates both. `queryDocs` only sources the query-term table.
    */
  private[graft] def rankPostings(spark: SparkSession, tf0: DataFrame,
      queryDocs: DataFrame, memoKey: Option[String] = None): DataFrame = {
    // the postings table is the ONE expensive intermediate — every
    // derived table (dl, df, corpus stats, the scored stream) reads it,
    // so cache it instead of replaying tokenize+aggregate per branch
    // (a no-op when the caller passed a memoized already-cached table)
    val tf = tf0.cache()
    val docs = queryDocs
    // round 15 (optimization, round-14 VERDICT #6): the doc-length and
    // document-frequency tables are INDEX components (∝ docs / ∝
    // vocabulary, the two sidecars every BM25 index persists), not
    // query results — memoize them per postings key so each of the
    // three gated consumers (bm25_topk, ann_hybrid_rrf's lexical arm,
    // the stored/streamed rankings) pays the two aggregates once per
    // session instead of once per invocation. Probe paths with no
    // memo key (ScaleProbe's one-shot corpora) keep deriving live.
    def memod(sub: String)(build: => DataFrame): DataFrame =
      memoKey match {
        case Some(k) => graft.Memo.cached(spark, s"text.bm25_$sub:$k")(build)
        case None => build
      }
    val dl = memod("dl")(tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // round 14 (optimization): evaluated restricting this df aggregate
    // to the query-term set (semi-join before the groupBy) — measured
    // SLOWER at sf0.1 (1.26 → 1.61 s warm: the extra broadcast barrier
    // + second qterms derivation outweigh the saved full-vocab agg,
    // which runs over the memoized in-memory tf). Left as-is; at true
    // 100 TB vocabulary the restricted form wins and is the documented
    // follow-up (OPTIMIZATION_r14.md).
    val dfreq = memod("df")(tf.groupBy(col("w")).agg(count(lit(1)).as("df")))
    val qterms = docs.filter(pmod(col("doc_id"), lit(101)) === 0)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(slice(split(col("text"), " "), 1, 4))).as("w"))

    // idf/df ride the broadcast query-term table; the big postings
    // stream joins it once (inner join = only candidate docs survive)
    val qidf = qterms
      .join(dfreq, Seq("w"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .select(col("qid"), col("w"), col("idf"), col("n_docs"), col("sum_dl"))

    val scored = tf
      .join(broadcast(qidf), Seq("w"))
      .join(dl, Seq("doc_id"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
      .withColumn("q", floor(col("contrib") * 1048576 + 0.5) / 1048576)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("q")).as("sq"))

    scored
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.column(spark, col("sq"),
        lpad(col("doc_id").cast("string"), 8, "0"), col("qid").cast("string"),
        TopK).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).as("rk"),
        col("col.a").cast("long").as("doc_id"),
        (floor(col("col.v") * 10000 + 0.5) / 10000).as("score"))
  }

  // one materialized term store per source dataset (written once/JVM)
  private val stores = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** F14b (oracle-gated): BM25 resolved from the MATERIALIZED term
    * store instead of in-query postings — the text-index twin of C9's
    * `match_conj_stored`: the corpus is flushed in two batches,
    * merge-on-read unions the segments, and the identical ranking
    * (and oracle) over them proves flushed postings answer exactly
    * like freshly-derived ones. Documents are immutable, so segments
    * are append-only; the ranking here is served from the COMPACTED
    * store (round 11) — the same oracle staying green proves the
    * [[TermStore.compact]] fold changes nothing a reader can observe.
    */
  def storedTopk(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val path = stores.computeIfAbsent(dir, _ => {
      val p = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_termstore_" + graft.Tables.fingerprint(s"$dir/documents.parquet")).toString
      TermStore.flush(docs.filter(pmod(col("doc_id"), lit(2)) === 0), p, 0L)
      TermStore.flush(docs.filter(pmod(col("doc_id"), lit(2)) === 1), p, 1L)
      TermStore.compact(docs.sparkSession, p)
      p
    })
    rankPostings(spark,
      cachedPostings(spark, s"store:$path", TermStore.load(spark, path)),
      docs, Some(s"store:$path"))
  }

  /** Ranking over an arbitrary materialized TermStore (H31's
    * stream-built store) — same memoized-postings + ranking path as
    * [[storedTopk]], `memoKey` namespacing the per-store cache. */
  private[graft] def rankStored(spark: SparkSession, path: String,
      queryDocs: DataFrame, memoKey: String): DataFrame =
    rankPostings(spark,
      cachedPostings(spark, s"store:$memoKey", TermStore.load(spark, path)),
      queryDocs, Some(s"store:$memoKey"))
}

/** LSM-lite store for the BM25 postings: one `seg=b<batchId>` parquet
  * directory per flushed document batch, `_SUCCESS`-gated and
  * idempotent (a committed batch id is never rewritten — safe under
  * foreachBatch replay). Append-only because documents are immutable;
  * merge-on-read is the union of committed segments.
  *
  * Round 11 adds [[compact]]: a year of micro-batches would otherwise
  * make every read a million-segment union — the planning cost (file
  * listing + footer fetches) grows ∝ #segments even though the data
  * volume doesn't. Compaction folds all committed segments into ONE
  * under the HIGHEST batch ordinal, via the IndexStore backup-rename
  * swap (the reference's try_compact shape, cow_tree.h discipline):
  * write the merged copy aside, freeze the store by renaming it to
  * `.bak`, verify nothing committed in between, swap the merged copy
  * in, drop the backup. A crash at any point leaves either the old
  * store, or the backup that [[recover]] restores — never a nested,
  * doubled, or lost store. Replayed flushes of compacted-away batch
  * ids stay no-ops (the max-ordinal guard below), which is what makes
  * compaction safe under a live foreachBatch ingest loop.
  */
object TermStore {
  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedSegs(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg=b"))
      .filter(s => f.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName).toIndexedSeq.sorted
  }

  private def segId(name: String): Long =
    name.stripPrefix("seg=b").toLong

  private def maxCommittedId(spark: SparkSession, path: String): Long =
    committedSegs(spark, path).map(segId).foldLeft(-1L)(math.max)

  def flush(docsBatch: DataFrame, path: String, batchId: Long): Unit = {
    val spark = docsBatch.sparkSession
    val seg = new org.apache.hadoop.fs.Path(s"$path/seg=b$batchId")
    val f = fs(spark, path)
    if (f.exists(new org.apache.hadoop.fs.Path(seg, "_SUCCESS"))) return
    // a batch id at or below the store's max ordinal was already
    // committed — its segment may have been folded away by [[compact]],
    // and re-flushing it would double-count the batch's tokens
    if (batchId <= maxCommittedId(spark, path)) return
    Bm25.postings(docsBatch)
      .write.mode("overwrite").parquet(seg.toString)
  }

  def load(spark: SparkSession, path: String): DataFrame = {
    recover(spark, path)
    val segs = committedSegs(spark, path).map(n => s"$path/$n")
    require(segs.nonEmpty, s"no committed term-store segments at $path")
    spark.read.option("basePath", path).parquet(segs: _*)
      .select("doc_id", "w", "tf")
  }

  /** Fold every committed segment into one under the max batch
    * ordinal. Safe against a racing flush: the store is frozen
    * (renamed aside) before the swap, and if the frozen snapshot
    * differs from what was merged the compact ABORTS restoring the
    * original — both copies preserved, nothing double-counted.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    recover(spark, path)
    val snapshot = committedSegs(spark, path)
    if (snapshot.size <= 1) return // already compact (or empty)
    val sn = s"seg=b${snapshot.map(segId).max}"
    val tmp = path + ".compacting"
    val bak = path + ".bak"
    val f = fs(spark, path)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // Hadoop rename onto an EXISTING directory nests the source inside
    // the destination — every rename checks destination absence first
    // (the IndexStore.compact lesson)
    f.delete(p(tmp), true)
    spark.read.option("basePath", path)
      .parquet(snapshot.map(n => s"$path/$n"): _*)
      .select("doc_id", "w", "tf")
      .write.mode("overwrite").parquet(s"$tmp/$sn")
    f.delete(p(bak), true)
    require(f.rename(p(path), p(bak)) && !f.exists(p(path)),
      s"rename $path -> $bak failed")
    if (committedSegs(spark, bak).toSet != snapshot.toSet) {
      require(!f.exists(p(path)) && f.rename(p(bak), p(path)),
        s"restore $bak -> $path failed; pre-compact store at $bak")
      f.delete(p(tmp), true)
      throw new IllegalStateException(
        s"term store at $path changed during compact; aborted without " +
          "touching the store — retry during an ingest pause")
    }
    require(!f.exists(p(path)) && f.rename(p(tmp), p(path)),
      s"rename $tmp -> $path failed; pre-compact store preserved at $bak")
    f.delete(p(bak), true)
  }

  /** Heal the compact crash window: store path gone + complete backup
    * present → restore the backup. Invoked by [[load]] and
    * [[compact]]. */
  def recover(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    if (!f.exists(new org.apache.hadoop.fs.Path(path)) && f.exists(bak))
      require(f.rename(bak, new org.apache.hadoop.fs.Path(path)),
        s"recover: rename $bak -> $path failed")
  }
}
