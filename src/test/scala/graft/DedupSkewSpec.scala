package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filter guarantees for the n-gram Jaccard join: (1) a viral
  * shingle shared by 10k documents must NOT produce k² candidates —
  * the classic dedup skew-bomb at 100 TB; (2) the filter is exact —
  * every pair with J ≥ t survives candidate generation.
  */
class DedupSkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("one shingle in 10k docs yields zero hot-key candidates") {
    import spark.implicits._
    // every doc shares shingle 0 (df = 10k) plus 4 unique shingles;
    // no pair has J >= 0.8 (overlap 1/9), so candidates should be ~0 —
    // a naive shared-shingle join would emit ~5*10^7 pairs here
    val sh = (0L until 10000L).flatMap { d =>
      0L +: (1L to 4L).map(k => d * 10 + k)
    }.zip((0L until 10000L).flatMap(d => Seq.fill(5)(d)))
      .map { case (sid, d) => (d, sid) }.toDF("doc_id", "sid")
    val nCand = dedup.Dedup.prefixCandidates(sh, 0.8).count()
    assert(nCand == 0, s"hot shingle leaked $nCand candidate pairs")
  }

  test("containment: hot shingle in 10k docs yields zero candidates too") {
    import spark.implicits._
    // same skew-bomb corpus as above; containment's contained-side
    // prefix (t=0.9, n=5 -> prefix length 1 = the rarest shingle only)
    // must keep the shared shingle out of every prefix
    val sh = (0L until 10000L).flatMap { d =>
      0L +: (1L to 4L).map(k => d * 10 + k)
    }.zip((0L until 10000L).flatMap(d => Seq.fill(5)(d)))
      .map { case (sid, d) => (d, sid) }.toDF("doc_id", "sid")
    val nCand = dedup.Dedup.containmentCandidates(sh, 0.9).count()
    assert(nCand == 0, s"hot shingle leaked $nCand containment candidates")
  }

  test("prefix candidates are a superset of all true j>=0.8 pairs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // naive exact pairs via the unfiltered shared-shingle join
    val sh = docs
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(split(text,' ')) - 2, 0)),
           i -> xxhash64(xxhash64(split(text,' ')[i-1]),
                         xxhash64(split(text,' ')[i]),
                         xxhash64(split(text,' ')[i+1])))""")).as("sid"))
      .distinct().cache()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val truth = sh.select(col("doc_id").as("ia"), col("sid"))
      .join(sh.select(col("doc_id").as("ib"), col("sid")), Seq("sid"))
      .filter(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("c"))
      .join(cnt.select(col("doc_id").as("ia"), col("n").as("na")), Seq("ia"))
      .join(cnt.select(col("doc_id").as("ib"), col("n").as("nb")), Seq("ib"))
      .filter(col("c") / (col("na") + col("nb") - col("c")) >= 0.8)
      .select("ia", "ib")
    val cand = dedup.Dedup.prefixCandidates(sh, 0.8)
    val missed = truth.exceptAll(cand).count()
    assert(missed == 0, s"$missed true pairs missing from prefix candidates")
    assert(truth.count() > 0, "vacuous test: no true pairs at sf0.001")
  }

  test("distributed PageRank loop equals the driver power iteration") {
    // same short-circuit contract as clusters: the driver path must be
    // bit-identical (dyadic-quantized contributions sum exactly), so
    // forcing the DataFrame loop by zeroing the threshold must
    // reproduce every rank and n_out
    val key = "graft.text.domainRankDriverLimit"
    val local = text.TextAnalysis.domainRank(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.get(2)))).toMap
    try {
      spark.conf.set(key, "0")
      val dist = text.TextAnalysis.domainRank(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getString(0), (r.getDouble(1), r.get(2)))).toMap
      assert(dist == local && local.nonEmpty)
    } finally spark.conf.unset(key)
  }

  test("distributed CC propagation equals driver union-find on the same graph") {
    // force the distributed min-label-propagation path by zeroing the
    // small-graph threshold (now session-configurable), then compare
    // against the default driver union-find — both must converge to
    // the min doc_id per connected component
    val key = "graft.dedup.smallGraphLimit"
    val local = dedup.Dedup.computeClusters(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    try {
      spark.conf.set(key, "0")
      val dist = dedup.Dedup.computeClusters(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(dist == local && local.nonEmpty)
    } finally spark.conf.unset(key)
  }

  /** D13 SemDeDup: the cluster-scoped removal set is a SUBSET of the
    * global (k=1) one — within-cell pairs ⊆ all pairs under the same
    * τ and rounding — and k=1 degenerates exactly to the D5 global
    * rule (that identity is the oracle gate; this pins the pruned
    * path's relationship to it).
    */
  test("semantic dedup: removed(k=8) ⊆ removed(k=1), k=1 ≡ global rule") {
    val dir = "/root/testdata/sf0.001"
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val pruned = ids(dedup.Dedup.semanticDedup(spark, dir))
    val full = ids(dedup.Dedup.semanticDedupFull(spark, dir))
    assert(full.nonEmpty, "fixture corpus has no cs≥0.45 pairs")
    assert(pruned.subsetOf(full),
      s"cluster-scoped removals not ⊆ global: ${pruned -- full}")
    // k=1 ≡ distinct larger-ids of the exact D5 pair set
    val viaD5 = dedup.Dedup.embeddingCosine(spark, dir)
      .select("ib").collect().map(_.getLong(0)).toSet
    assert(full == viaD5)
    // within-cell tiling is pure parallelism: any tiles count yields
    // the identical removal set (each pair meets exactly once)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("norm",
        sqrt(org.apache.spark.sql.functions.call_function(
          "vec_dot", col("v"), col("v"))))
    val t1 = ids(dedup.Dedup.semanticRemovedOn(spark, e, k = 8, tau = 0.45,
      tiles0 = 1))
    val t4 = ids(dedup.Dedup.semanticRemovedOn(spark, e, k = 8, tau = 0.45,
      tiles0 = 4))
    assert(t1 == t4, s"tiling changed the result: ${t1 union t4 -- (t1 intersect t4)}")
  }

  test("D14: substring density — injected boilerplate shares windows " +
      "across same-phase docs; clean docs bounded by natural overlap") {
    val dir = "/root/testdata/sf0.001"
    val d = dedup.Dedup.substringDensity(spark, dir)
      .select("doc_id", "n_windows", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d.nonEmpty)
    // every doc's share accounting is internally consistent
    assert(d.forall { case (_, nw, ns) => ns >= 0 && ns <= nw })
    // the injected tail guarantees SOME cross-doc sharing exists:
    // ≥2 injected docs with the same text-length phase (mod the
    // stride) share full in-boilerplate windows
    val injectedShared = d.filter { case (id, _, ns) => id % 31 == 0 && ns > 0 }
    assert(injectedShared.nonEmpty,
      "no injected doc shares a window — boilerplate injection vacuous")
  }

  test("D15: paragraph dedup is first-writer-wins with ordered reassembly") {
    import spark.implicits._
    def words(tag: String): String = (1 to 8).map(tag + _).mkString(" ")
    val (a, b, c) = (words("a"), words("b"), words("c"))
    val docs = Seq(
      (1L, s"$a $b"),      // introduces A, B
      (2L, s"$b $c"),      // B already seen → keeps C only
      (3L, s"$a $a"))      // A seen (doc 1) AND self-repeated → keeps nothing
      .toDF("doc_id", "text")
    val out = dedup.Dedup.paragraphDedupOn(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, s"$a $b")), s"doc1=${out(1L)}")
    assert(out(2L) == ((2L, 1L, c)), s"doc2=${out(2L)}")
    assert(out(3L) == ((2L, 0L, "")), s"doc3=${out(3L)}")
    // corpus-level invariant: every distinct paragraph survives exactly once
    val kept = out.values.map(_._2).sum
    assert(kept == 3L, s"3 distinct paragraphs must survive, got $kept")
  }
}
