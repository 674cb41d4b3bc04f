package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TermStore segment compaction (round 11): the backup-rename fold of
  * committed `seg=b*` postings segments. The DuckDB gates
  * (`bm25_stored`, `stream_bm25`) prove the compacted store RANKS
  * identically; this spec pins the store mechanics the oracle can't
  * see — merged-view equivalence at the postings level, idempotent
  * re-compaction, the replayed-flush no-op that makes compaction safe
  * under a live ingest loop, and crash-window recovery.
  */
class TermStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val tmp = java.nio.file.Files
    .createTempDirectory("graft_termstore_spec").toString

  private def docs(ids: (Long, String)*) = {
    import spark.implicits._
    ids.toSeq.toDF("doc_id", "text")
  }

  private def postingsSet(path: String): Set[(Long, String, Long)] =
    text.TermStore.load(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def segNames(path: String): Seq[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
      .map(_.getName).toSeq.sorted

  test("compact folds all committed segments into ONE under the max " +
      "ordinal; the merged view is unchanged; re-compaction is a no-op") {
    val p = s"$tmp/fold"
    text.TermStore.flush(docs(1L -> "a b a", 2L -> "b c"), p, 0L)
    text.TermStore.flush(docs(3L -> "a c c"), p, 1L)
    text.TermStore.flush(docs(4L -> "d"), p, 2L)
    val before = postingsSet(p)
    assert(segNames(p) == Seq("seg=b0", "seg=b1", "seg=b2"))
    text.TermStore.compact(spark, p)
    assert(segNames(p) == Seq("seg=b2"), "one segment, max ordinal")
    assert(postingsSet(p) == before, "merged view must be unchanged")
    // idempotent: a second compact leaves the store as-is
    text.TermStore.compact(spark, p)
    assert(segNames(p) == Seq("seg=b2") && postingsSet(p) == before)
    // no backup or working copy left behind
    assert(!new java.io.File(p + ".bak").exists())
    assert(!new java.io.File(p + ".compacting").exists())
  }

  test("a replayed flush of a compacted-away batch id is a NO-OP — " +
      "compaction is safe under foreachBatch redelivery") {
    val p = s"$tmp/replay"
    text.TermStore.flush(docs(1L -> "x y"), p, 0L)
    text.TermStore.flush(docs(2L -> "y z"), p, 1L)
    text.TermStore.compact(spark, p) // seg=b0 folded into seg=b1
    val after = postingsSet(p)
    // the checkpoint replays batch 0: its segment is gone, but its
    // tokens are in the fold — re-flushing would double-count
    text.TermStore.flush(docs(1L -> "x y"), p, 0L)
    assert(segNames(p) == Seq("seg=b1"))
    assert(postingsSet(p) == after)
    // a genuinely NEW batch id still lands
    text.TermStore.flush(docs(3L -> "w"), p, 2L)
    assert(segNames(p) == Seq("seg=b1", "seg=b2"))
    assert(postingsSet(p) == after + ((3L, "w", 1L)))
  }

  test("crash window: store renamed aside but swap unfinished → " +
      "recover (via load) restores the backup") {
    val p = s"$tmp/crash"
    text.TermStore.flush(docs(1L -> "q r"), p, 0L)
    val before = postingsSet(p)
    // simulate the crash between `path -> bak` and `tmp -> path`
    assert(new java.io.File(p).renameTo(new java.io.File(p + ".bak")))
    assert(postingsSet(p) == before, "load must self-heal from the backup")
    assert(!new java.io.File(p + ".bak").exists())
  }
}
