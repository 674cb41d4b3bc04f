package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship composite: a training-data curation pipeline over the
  * document corpus — exactly what this engine exists for at 100 TB.
  *
  * Stages (each individually oracle-verified elsewhere):
  *  1. exact dedup: keep the min doc_id per identical text
  *  2. near-dup dedup: connected components over the Jaccard≥0.8 pair
  *     graph (graft.dedup.Dedup.clusters); keep each component's min id
  *  3. quality gate: word count in [20, 1000], stopword ratio ≤ 0.3,
  *     lexical diversity ≥ 0.3 (graft.text.TextAnalysis.quality)
  * Output: surviving corpus statistics per language.
  *
  * At scale every stage is the bucket-local / partial-agg shape used by
  * its standalone operator; the composition adds no extra shuffles
  * beyond its parts.
  */
object Curation {

  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)

    // 1. exact dedup survivors
    val exactKeep = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")

    // 2. near-dup clusters: drop every member that is not its
    //    component's representative (docs in no cluster survive)
    val clusterDrop = graft.dedup.Dedup.clusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")

    // 3. quality gate
    val q = graft.text.TextAnalysis.quality(spark, dir)
      .filter(col("n_words").between(20, 1000) &&
        col("stop_ratio") <= 0.3 && col("uniq_ratio") >= 0.3)
      .select("doc_id")

    docs.join(exactKeep, Seq("doc_id"), "left_semi")
      .join(clusterDrop, Seq("doc_id"), "left_anti")
      .join(q, Seq("doc_id"), "left_semi")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
  }

  /** F10: per-source cap + corpus-mix report — the domain-diversity
    * control every web-scale curation run applies (a handful of hosts
    * must not dominate the training mix): keep the top `cap` documents
    * per source by (n_chars, doc_id), then report each source's share
    * of the capped corpus.
    *
    * Shape at 100 TB: the cap is a per-source top-k — a bounded-heap
    * aggregate or window over a hash partition by source (never a
    * global sort); the mix report is a two-level aggregate whose
    * second level is #sources rows. Share is a ratio of exact longs,
    * rounded once at the end — engine-deterministic.
    */
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val kept = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    val total = kept.agg(sum(col("kept_chars")).as("tot"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"))
      .crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_kept"), col("kept_chars"),
        (floor(col("kept_chars").cast("double") / col("tot") * 10000 + 0.5) / 10000)
          .as("share"))
  }

  /** F15: deterministic content-keyed shard assignment + balance
    * report — how a pipeline splits a curated corpus into training
    * shards so that (a) the same document always lands in the same
    * shard regardless of run, partitioning, or arrival order (content
    * hash, not row position), and (b) shard sizes stay balanced. The
    * shard key is the dual polynomial content hash
    * ([[graft.functions.DualPolyHash]], replayable char-by-char by the
    * DuckDB oracle) modulo a PRIME shard count — 31 decorrelates the
    * assignment from the hash's dyadic packing (h mod 2^k would read
    * only the low polynomial's bits).
    *
    * Shape at 100 TB: one codegen hash per document + one partial-agg
    * groupBy on a 31-value key; the report is 31 rows. Assignment
    * itself is a pure column — `write.partitionBy(shard)` on it is the
    * production write path.
    */
  def shardAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", graft.functions.DualPolyHash.column(spark, col("text")))
      .withColumn("shard", pmod(col("h"), lit(31)).cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))

  /** F21: temperature-based mixture weighting — how a multi-source
    * pretraining run rebalances its corpus mix (the α-temperature
    * sampling of multilingual/multi-domain training: weight ∝ tokens^α
    * flattens the head so small sources aren't drowned). α = 0.5 here,
    * so the un-normalized score is sqrt(token count) — an IEEE
    * correctly-rounded primitive both engines evaluate identically,
    * unlike pow(x, 0.7), whose libm rounding is not pinned.
    *
    * Determinism: each source's score is quantized to an integer
    * (floor(sqrt·10⁶ + ½)) BEFORE the normalization sum, so the
    * denominator is an exact long (order-free); each weight and token
    * allocation is then a single double multiply+divide of exact
    * integers — bit-identical across engines and partitionings.
    *
    * Shape at 100 TB: one map-side size() per document, one partial-agg
    * groupBy(source) (#sources rows out), one broadcast of the 1-row
    * denominator. The allocation column is what the sampling stage
    * downstream consumes as its per-source token budget (here 10⁸).
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_cnt"))
      .withColumn("ci",
        floor(sqrt(col("tok_cnt").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long"))
    val denom = per.agg(sum(col("ci")).as("denom"))
    per.crossJoin(broadcast(denom))
      .select(col("source"), col("n_docs"), col("tok_cnt"),
        (floor(col("ci").cast("double") * lit(1.0e9) / col("denom").cast("double")
          + lit(0.5)) / lit(1.0e9)).as("weight"),
        floor(col("ci").cast("double") * lit(1.0e8) / col("denom").cast("double"))
          .cast("long").as("alloc_tok"))
  }
}
