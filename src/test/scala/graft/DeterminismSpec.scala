package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-independence for the round-4 operators whose
  * implementations are order-sensitive internally: the greedy packing
  * fold (per-partition state machine), the incremental-dedup window,
  * and the vocabulary coverage curve (TakeOrdered + tiny window). The
  * driver hash gate already proves one partitioning matches DuckDB;
  * this proves the OUTPUT doesn't depend on which partitioning ran —
  * the property that makes the answer stable from local[4] to a
  * 1000-executor cluster.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def runAt(partitions: Int, q: String): Set[Seq[Any]] = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    // Drop memoized intermediates and force domain_rank's distributed
    // path: otherwise the 3/16-partition runs reuse the 1-partition
    // run's cached build and the invariance is vacuous.
    Memo.clear(spark)
    spark.conf.set("graft.text.domainRankDriverLimit", "0")
    try SparkEntry.queries(q)(spark, dir).collect().map(_.toSeq).toSet
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", old)
      Memo.clear(spark)
    }
  }

  // round-5 additions: bm25's heap ranking (quantized scores + padded
  // tie key), range_eval's as-of window with last-writer tie-break,
  // and containment's prefix-filtered candidate set must all be
  // partitioning-invariant
  // round-5 batch 2: domain_rank's iterative contributions sum dyadic
  // rationals (must not drift with partition order), dedup_lines and
  // mm_phash_dedup derive flags through joins whose physical order
  // varies with partitioning, rate_extrapolated chains divisions off
  // per-bucket extrema
  for (q <- Seq("seq_pack", "dedup_incremental", "text_vocab", "mm_integrity",
      "bm25_topk", "range_eval", "dedup_containment", "shard_assign",
      "domain_rank", "dedup_lines", "mm_phash_dedup", "rate_extrapolated",
      // round-5 batch 3: ngram_count's top-100 rides a total order
      // (n DESC, g); temperature_mix quantizes per-source scores to
      // integers BEFORE the normalization sum (order-free denominator)
      "ngram_count", "temperature_mix", "bpe_pairs",
      // round-5 batch 4: the bloom-prefiltered verdicts must not vary
      // with how the sketch build or confirm join partitions
      "dedup_bloom", "embed_quantize",
      // round-5 batch 5: the MV merge must not depend on which side
      // (view/batch partial states) arrives first in the union
      "mv_merge",
      // round-7: the session ordinal is a running sum over a
      // total-ordered window; the quantized mean duration must not
      // drift with partial-agg order; the ancestor closure's
      // pointer-doubling round count is data-determined, not
      // partitioning-determined
      "sessionize", "ancestor_closure",
      // round-8: the MRL/BQ candidate cuts ride exact (dyadic /
      // integer) scores with id tie-breaks; PassJoin candidates and
      // the CDC shared-chunk join vary their physical join order with
      // partitioning but not their sets; the PromQL histogram
      // interpolation folds a sorted bucket array
      "ann_mrl", "ann_bq", "dedup_editdist", "text_cdc", "promql_histq",
      // round-9 batch 2: the greedy k-center selection rides exact
      // dyadic distances + id tie-breaks (the argmax must not depend
      // on which partition reports first); scd2's versions ride a
      // total-ordered window; the substring df join varies physical
      // order with partitioning but not its sets; the alert islands
      // derive from a keyed window over the evaluated grid
      "ann_kcenter", "scd2", "dedup_substring", "promql_alerts",
      // round-9 session 3: paragraph keep-first rides a total-ordered
      // window on the paragraph text; the MMR greedy rides exact
      // dyadic scores + id tie-breaks through a collected candidate
      // set whose arrival order varies with partitioning; the Gopher
      // top-gram pick breaks count ties lexicographically; the pair
      // assembly chains the phash join + a bucketed wraparound window
      "dedup_paragraph", "ann_mmr", "text_gopher_rep", "mm_pairs",
      // round-9 session 4: the BPE trainer aggregates the word-freq
      // table into a driver map (order-free counts, lexicographic
      // tie-break), encode is a broadcast-joined literal replace chain
      "bpe_encode",
      // round-9 session 4 cont.: the priority sample's top-(n+1) heap
      // and τ ride exact doubles + id tie-breaks (the TakeOrdered must
      // not depend on which partition reports first); DSIR's per-doc
      // scores sum dyadic λ contributions (order-free) before the
      // ranked cut; the rollup daily fold merges per-hour partials
      // whose arrival order varies with partitioning (max_by struct
      // keys make last_v order-free)
      "weighted_sample", "dsir_sample", "rollup_serve",
      // round-10: the native-histogram quantile folds a sorted sparse
      // bucket array with exact integer cumulatives (the hit-bucket
      // comparison must not depend on partial-agg order); the rate
      // form diffs raw counts; the rule-group alert islands derive
      // from two chained recorded series through keyed windows
      "promql_native_histq", "promql_native_rate", "promql_rule_group",
      // round-10: RRF fuses two bounded-heap rankings whose arrival
      // order varies with partitioning; exact quotients + id ties;
      // span removal rides a keep-first window on a total order and
      // the reassembled content is hash-pinned
      "ann_hybrid_rrf", "dedup_span_remove",
      // round-11: the mixed-schema sum folds downscaled buckets whose
      // merge order varies with partitioning (exact integer counts);
      // the limit-capped rule group discards whole steps off a keyed
      // window count; the NHCB quantile compares exact per-bound
      // cumulatives; the extrapolated rate's five per-window
      // aggregates must not depend on partial-agg order
      "promql_native_schema", "promql_rule_limit", "promql_nhcb",
      "promql_rate_extrap")) {
    test(s"$q is identical at 1, 3 and 16 shuffle partitions") {
      val runs = Seq(1, 3, 16).map(p => runAt(p, q))
      assert(runs(0).nonEmpty)
      assert(runs(0) == runs(1) && runs(1) == runs(2),
        s"$q output depends on partitioning")
    }
  }
}
