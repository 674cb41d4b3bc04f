package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: replicates the sf0.1 events table Nx (shifted ids so
  * series counts scale too) and times representative operators, to
  * observe how wall time grows with data volume on the same plans —
  * evidence that the operator shapes are scan/shuffle-bound, not
  * driver-bound. Run: `sbt "runMain graft.ScaleProbe [factor]"`.
  * This synthesizes load for TIMING only — correctness gates always
  * run on the driver-generated tables untouched.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // the factor is parsed ONLY from args before the `only` keyword
    // (a digit-only row name must not be misread as the factor), and
    // an empty-string arg is never the factor
    val onlyIdx = args.indexOf("only")
    val preOnly = if (onlyIdx >= 0) args.take(onlyIdx) else args
    val factor = preOnly.find(a => a.nonEmpty && a.forall(_.isDigit))
      .map(_.toInt).getOrElse(10)
    // `headline` mode (round 9): only the headline shapes, for the
    // 100x tier where the full probe's quadratic-candidate entries
    // (ngram_jaccard, containment, editdist) would run for hours;
    // round 10 adds the round-9 shapes the verdict asked to carry to
    // the 100x tier
    val headlineOnly = args.contains("headline")
    val headline = Set("match_conj", "agg_hourly", "promql_range_grid",
      "minhash_bands", "ivfpq_train_probe",
      "rollup_tier_daily", "dsir_buckets", "paragraph_dedup",
      "gapfill_grid", "rowlevel_update", "mor_update", "mor_bulk_delete")
    // `only <row names...>`: probe just the named rows (new-operator
    // measurement without re-running the full suite)
    val only: Set[String] =
      if (onlyIdx >= 0) args.drop(onlyIdx + 1).filter(_.nonEmpty).toSet
      else Set.empty
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // The k-way union inherits k×32 tiny cache partitions; above 10×
    // that layout is pure task-scheduling overhead (3 200 partitions of
    // 3 k rows at 100×) that no real table would have — compact to a
    // production-shaped 320 partitions there, and leave factors ≤ 10
    // untouched so their SCALE.md series stays comparable.
    def compacted(df: DataFrame): DataFrame =
      if (factor > 10) df.repartition(320) else df
    val base = Tables.events(spark, "/root/testdata/sf0.1")
    val big = compacted((0 until factor).map { k =>
      base.withColumn("user_id", col("user_id") + lit(k * 10000L))
        .withColumn("event_id", col("event_id") + lit(k * 10000000L))
    }.reduce(_ unionAll _)).cache()
    println(s"rows: ${big.count()} (factor $factor)")

    def t(name: String)(df: => DataFrame): Unit =
      if ((!headlineOnly || headline(name)) &&
          (only.isEmpty || only(name))) {
        val t0 = System.nanoTime()
        df.count()
        println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val idx = new index.TagIndex(big.select(
      col("event_id"), col("ts"), col("value"),
      col("user_id").cast("string").as("usr"), col("event_type").as("typ")),
      Seq("usr", "typ"))
    t("series_catalog")(idx.seriesCatalog)
    t("match_conj")(idx.resolveMatchers(Seq(
      index.LabelMatcher("typ", index.MatchOp.Eql, "purchase"),
      index.LabelMatcher("usr", index.MatchOp.Gte, "10"))))
    t("agg_hourly")(big.groupBy(col("event_type"),
        date_trunc("hour", col("ts"))).agg(sum(col("value"))))
    t("window_seek")(
      {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"))
        big.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      })
    t("distinct_series")(big.select("user_id", "event_type").distinct())
    // round-7 additions: single-exchange sessionization (window flag +
    // running ordinal + two stacked aggs, all in one user_id exchange —
    // growth driver: the window sort ∝ rows/partition) and the PromQL
    // range-grid evaluation (samples explode to ≤ range/step+1 grid
    // copies, per-window partial-agg folds — growth ∝ rows × copies)
    t("sessionize")(operators.Relational.sessionizeOn(big))
    t("promql_range_grid")(promql.PromQl.evalRangeIndexed(idx,
      """sum by (typ) (rate({typ=~".*"}[2d]))""",
      "2024-01-08 00:00:00", "2024-01-28 00:00:00", 86400L))
    // bounded-state folds: memory stays O(1)/series at any factor
    t("holt_winters")(tsdb.Tsdb.holtWintersOn(spark, idx.labeled))
    t("hw_seasonal")(tsdb.Tsdb.holtWintersSeasonalOn(spark, idx.labeled))

    // tiled exact cosine join over a factor× corpus (replicas shifted;
    // the N² dot count is the inherent cost being measured)
    graft.functions.VecFunctions.register(spark)
    val ebase = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding").as("v"))
    val ebig = (0 until factor).map { k =>
      ebase.withColumn("vec_id", col("vec_id") + lit(k * 1000000L))
    }.reduce(_ unionAll _)
      .withColumn("norm", sqrt(call_function("vec_dot", col("v"), col("v"))))
      .cache()
    println(s"vectors: ${ebig.count()}")
    t("cosine_tiled")(dedup.Dedup.embeddingCosineOn(spark, ebig))

    // LSH candidate scan (the D5b high-threshold path): replicas get
    // k-dependent sign flips so they are NOT near-dups of each other —
    // the probe then measures pure candidate generation + exact verify
    // over a factor× corpus, with bucket-local joins the only shuffle
    val edecor = compacted((0 until factor).map { k =>
      ebase.withColumn("vec_id", col("vec_id") + lit(k * 1000000L))
        .withColumn("v", expr(s"transform(v, (x, i) -> IF(i % ${k + 2} = 0, -x, x))"))
    }.reduce(_ unionAll _))
      .withColumn("norm", sqrt(call_function("vec_dot", col("v"), col("v"))))
      .cache()
    println(s"decorrelated vectors: ${edecor.count()}")
    // IVF train+probe over the factor× corpus, FIXED 10-query set:
    // training is `iters` scan+partial-agg rounds (the driver holds
    // only k×dim centroid sums — a broadcast-sized state at any N);
    // probing reads nprobe/k of the corpus per query. Growth drivers:
    // train ∝ N·k·iters dots, probe ∝ N·nprobe/k dots.
    t("ivf_train_probe")(similarity.Ann.ivfTopkOn(edecor, col("vec_id") < 10))
    // PQ codebook train (per-subspace k-means on a bounded sample) +
    // ADC scan: the scan reads every code but only m byte-lookups per
    // vector (compressed domain); candN re-rank is heap-bounded.
    // Growth drivers: encode ∝ N·m·256 dots once, scan ∝ N·m adds.
    t("pq_train_adc")(similarity.Ann.pqTopkOn(edecor, col("vec_id") < 10, candN = 64))
    // round-9 headline: the composed IVF-PQ serving path (coarse
    // quantizer + residual product codes). Growth drivers: train ∝
    // N·(k + m·ks)·iters dots, probe ∝ N·nprobe/k ADC byte-lookups.
    t("ivfpq_train_probe")(similarity.Ann.ivfPqTopkOn(edecor, col("vec_id") < 10))
    // round-8 quantized-serving ladder over the factor× decorrelated
    // corpus, fixed 10-query set: the MRL prefix scan reads d0/dim of
    // the vector bytes per candidate dot; the BQ Hamming scan is two
    // xor+popcounts per pair — growth ∝ N for both (one corpus pass
    // per query batch), re-rank heap-bounded
    t("mrl_scan")(similarity.Ann.mrlTopkOn(
      edecor.withColumn("u", expr("transform(v, x -> cast(x as double) / norm)")),
      col("vec_id") < 10, d0 = 16, candN = 50))
    t("bq_scan")(similarity.Ann.bqTopkOn(edecor, col("vec_id") < 10))
    t("lsh_pair_scan") {
      // same candidate + verify pipeline as the gated dedup_embedding_lsh
      dedup.Dedup.cosineVerify(
        similarity.Ann.lshPairCandidates(edecor, bits = 8, tables = 24),
        edecor, 0.9)
    }

    // prefix-filtered jaccard over a factor× corpus. Replica words are
    // salted so replicas are NOT near-dups of each other — otherwise
    // every document becomes a factor-way true duplicate and the
    // OUTPUT (not the plan) grows ∝ factor²; salted, the true-dup
    // structure scales linearly, which is what a probe should measure.
    val dbase = Tables.documents(spark, "/root/testdata/sf0.1")
    val dbig = compacted((0 until factor).map { k =>
      dbase.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"r${k}_$$1"))
    }.reduce(_ unionAll _))
    val shBig = dedup.Dedup.shingles(dbig).cache()
    t("ngram_jaccard")(dedup.Dedup.jaccardPairs(shBig, 0.8))
    // round-9 headline: the full D2 sig→band→bucket-join→verify
    // pipeline. Growth drivers: signatures ∝ shingles (64 mins in one
    // aggregate buffer), candidates ∝ Σ bucket² (bands are a log(N)
    // parameter at production scale)
    t("minhash_bands")(dedup.Dedup.minhashPairsOn(spark, shBig))
    // round-8: PassJoin edit-distance blocking (segments × shifted
    // probes per key — growth ∝ Σ block² over (i, 8-gram) blocks; the
    // salted replicas keep blocks from collapsing into one hot key)
    // and the CDC chunk pass (8·chars codegen hashes + one chunk
    // exchange — growth ∝ chars)
    t("editdist_passjoin")(dedup.Dedup.editDistPairsOn(
      dbig.select(col("doc_id"), col("text"))))
    t("cdc_chunks")(text.TextAnalysis.cdcChunksOn(
      dbig.select(col("doc_id"), col("text"))))
    // round-4 pipeline additions: the packing fold (bounded state per
    // source, one exchange) and the vocabulary aggregate (vocab-bounded
    // count table + TakeOrdered top-k) over the factor× corpus
    t("seq_pack_fold")(text.TextAnalysis.seqPackOn(spark, dbig))
    t("vocab_top50")(text.TextAnalysis.vocabOn(dbig))
    // round-5 additions: the BM25 retrieval pipeline (postings +
    // broadcast query terms + bounded-heap ranking) and the
    // contained-side prefix-filtered containment join
    t("bm25_topk")(text.Bm25.topkOn(spark,
      dbig.select(col("doc_id"), col("text"))))
    t("containment")(dedup.Dedup.containmentOn(spark,
      dbig.select(col("doc_id"), col("text")), 1000000000L))
    // round-5 batch 2: line-level boilerplate removal (line DF table +
    // broadcast join back) and the blockhash payload near-dup (linear
    // fingerprint scan + chunk-bucket join; twins recur per replica so
    // true-pair structure stays linear)
    t("line_dedup")(dedup.Dedup.lineDedupOn(dbig))
    // keep-first paragraph dedup: one window shuffle on the paragraph
    // text + one doc groupBy (replicas share every paragraph, so the
    // window groups grow ∝ factor — the worst case for the shape)
    t("paragraph_dedup")(dedup.Dedup.paragraphDedupOn(dbig))
    t("phash_dedup")(multimodal.Multimodal.phashDedupOn(
      dbig.select(col("doc_id"), col("text"))))
    // round-5 batch 3/4: the trigram two-level aggregate (document
    // frequency without an Expand), the hashed linear scorer (codegen
    // hash + one partial agg), and the bloom sketch build + probe —
    // two corpus passes total, the incremental-dedup scale pattern
    t("ngram_trigrams")(text.TextAnalysis.ngramCountOn(dbig))
    // round-8: the pointer-doubling closure. Replicated doc_ids keep
    // the same depth distribution at factor× rows, so rounds stay
    // ~log(maxDepth) and build wall must grow ∝ rows (each round is
    // one co-partitioned self-join over N rows), while CONSUMPTION is
    // a single cache scan — the round-7 verdict's replay scale-killer.
    t("ancestor_closure") {
      val conv = operators.Relational.ancestorClosureConverged(
        dbig.select(col("doc_id")))
      val out = conv.select(col("node"), col("depth"))
      out.count() // consume through the cache
      conv.unpersist()
      out.limit(0)
    }
    t("quality_classify")(text.TextAnalysis.qualityClassifyOn(spark, dbig))
    // round-9 batch 2: the SCD2 lag-dedup+lead-close window (one
    // user_id exchange — growth driver: window sort ∝ rows/partition),
    // the strided substring-window join (≈ chars/8 window rows, one
    // distinct + one df groupBy + one keyed join), and the greedy
    // k-center loop (k passes of least()-folded dots + TakeOrdered
    // top-1 — growth ∝ k·N dots, zero pairwise shuffle)
    t("scd2_versions")(operators.Relational.scd2On(big))
    // round-9 session 4: the rollup-tier build + daily fold (two
    // partial-agg groupBys — growth ∝ rows for the build, ∝ tier rows
    // for the fold) and the shuffle-free priority-sample TakeOrdered
    t("rollup_tier_daily")(tsdb.Rollup.dailyFromHours(
      tsdb.Rollup.buildHourTierOn(big.select(
        col("user_id").cast("string").as("usr"),
        col("event_type").as("typ"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")))))
    t("priority_sample") {
      val m = 1099511627776L
      val u = (pmod(graft.functions.DualPolyHash.column(spark,
          col("doc_id").cast("string")), lit(m)) + 1L).cast("double") /
        lit(m.toDouble)
      dbig.select(col("doc_id"),
          (length(col("text")).cast("double") / u).as("priority"))
        .orderBy(col("priority").desc, col("doc_id")).limit(201)
    }
    // the DSIR bucket aggregation — the corpus-scan-bound stage (the
    // λ table and top-k that follow are B- and k-bounded)
    t("dsir_buckets")(dbig
      .withColumn("__w", split(col("text"), " "))
      .select(explode(concat(col("__w"),
        when(size(col("__w")) >= 2,
          transform(sequence(lit(1), size(col("__w")) - 1),
            i => concat_ws(" ", element_at(col("__w"), i),
              element_at(col("__w"), i + 1))))
          .otherwise(array().cast("array<string>")))).as("f"))
      .groupBy(pmod(graft.functions.DualPolyHash.column(spark, col("f")),
        lit(2048L)).as("b"))
      .agg(count(lit(1)).as("s_b")))
    // the bounded-frame collect_list window (state ∝ k per row)
    t("feature_assembly")(operators.Relational.featureAssemblyOn(big))
    t("substr_windows")(dedup.Dedup.substringDensityOn(
      dbig.select(col("doc_id"), col("text").as("t"))))
    // round-10: disjoint-tile keep-first removal (one tile-string
    // shuffle + one doc groupBy — growth ∝ corpus bytes; the salted
    // replicas keep tiles from collapsing into factor-way duplicates)
    t("span_remove")(dedup.Dedup.spanRemoveOn(spark,
      dbig.select(col("doc_id"), col("text"))))
    // round-11: the native-histogram model builds — the schema-3
    // ladder assignment (104-literal boundary filter per row, the
    // mixed model's dominant map-side cost) and the NHCB per-bound
    // conditional aggregation; both reduce to (typ, hour[, idx])
    // groups ∝ series × hours — tier-scale, never sample-scale
    t("native_s3_buckets") {
      val sec = unix_timestamp(col("ts"))
      big.select(col("event_type").as("typ"),
        (sec - pmod(sec, lit(3600L))).as("h_sec"),
        (lit(promql.NativeHist.minIdxAt(3)) + size(filter(
          typedlit(promql.NativeHist.uppersAt(3)),
          b => b < col("value")))).as("idx"))
        .groupBy(col("typ"), col("h_sec"), col("idx")).agg(count(lit(1)))
    }
    t("nhcb_counts") {
      val sec = unix_timestamp(col("ts"))
      val aggs = count(lit(1)).as("dcnt") +:
        promql.NativeHist.nhcbBounds.zipWithIndex.map { case (b, i) =>
          sum(when(col("value") <= b, 1L).otherwise(0L)).as(s"db$i")
        }
      big.select(col("event_type").as("typ"),
        (sec - pmod(sec, lit(3600L))).as("h_sec"), col("value"))
        .groupBy(col("typ"), col("h_sec")).agg(aggs.head, aggs.tail: _*)
    }
    t("kcenter_greedy")(similarity.Ann.kcenterProbe(spark,
      edecor.select(col("vec_id"), col("v")), 8))
    // doubling k must ~double wall (flat per-round cost): the round-10
    // cache-swap fix makes each greedy round ONE new dot column over
    // the cached predecessor instead of re-evaluating the whole
    // least() lineage (O(k·N), was O(k²·N))
    t("kcenter_greedy16")(similarity.Ann.kcenterProbe(spark,
      edecor.select(col("vec_id"), col("v")), 16))
    // the B52 gapfill grid: series × 168 hourly grid rows, LOCF +
    // bracketing interpolation in ONE keyed window pass pair — growth
    // ∝ series (the grid), never samples; partitions stay 168 rows
    t("gapfill_grid") {
      import org.apache.spark.sql.expressions.Window
      val t0 = 1704067200L
      val sec = unix_timestamp(col("ts"))
      val ev = big.filter(col("event_type") === "purchase")
        .select(col("user_id").cast("string").as("usr"),
          (sec - pmod(sec, lit(3600L))).as("h_sec"), col("value"))
      val obs = ev.groupBy(col("usr"), col("h_sec"))
        .agg(max(col("value")).as("mx"))
      val grid = ev.select(col("usr")).distinct()
        .withColumn("h_sec", explode(sequence(lit(t0),
          lit(t0 + 167L * 3600L), lit(3600L))))
      val wp = Window.partitionBy(col("usr")).orderBy(col("h_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf2 = Window.partitionBy(col("usr")).orderBy(col("h_sec"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(obs, Seq("usr", "h_sec"), "left")
        .withColumn("pv", last(col("mx"), ignoreNulls = true).over(wp))
        .withColumn("nv", first(col("mx"), ignoreNulls = true).over(wf2))
    }
    t("bloom_build_probe") {
      val h = dbig.select(xxhash64(col("text")).as("h"))
      val sk = h.agg(functions.BloomFuncs
          .bloomAgg(spark, col("h"), 1000000L, 8000000L).as("bf"))
        .head.getAs[Array[Byte]](0)
      h.filter(functions.BloomFuncs.mightContain(spark, lit(sk), col("h")))
    }
    // round 12 s3: SQL UPDATE via the row-level COW rewrite — the
    // probe updates a FIXED event_id band on a range-laid commit-log
    // table whose file count grows with the factor; the runtime group
    // filter prunes the rewrite to the band's files and everything
    // else carries by reference, so wall time should stay FLAT as the
    // table grows (the 100-TB claim: an UPDATE pays for what it
    // touches). Table build happens outside the timer.
    if (only.isEmpty || only("rowlevel_update") ||
        (headlineOnly && headline("rowlevel_update"))) {
      val rloDir = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_probe_rlo_$factor")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(rloDir)
      val tdir = new java.io.File(rloDir, "wh/t").toString
      sources.Io.tableAppend(
        big.select(col("event_id"), col("event_type").as("typ"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
          .repartitionByRange(32 * math.max(1, factor / 2),
            col("event_id")),
        tdir)
      spark.conf.set("spark.sql.catalog.gprobe",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.gprobe.warehouse",
        new java.io.File(rloDir, "wh").toString)
      t("rowlevel_update") {
        spark.sql("UPDATE gprobe.t SET cents = cents + 1 " +
          "WHERE event_id >= 5000 AND event_id < 15000")
      }
    }
    // round 13: the same fixed-band UPDATE through the MERGE-ON-READ
    // delta path (graft.dml.mode=mor) — no file is rewritten at ALL:
    // the write is ∝ matched rows (a DV parquet of (file,pos) entries
    // + one small insert file), the scan pushes the band predicate to
    // parquet, so wall time should stay flat AND sit below the COW
    // probe at every factor (write amplification 1, the 100-TB DML
    // end-state).
    if (only.isEmpty || only("mor_update") ||
        (headlineOnly && headline("mor_update"))) {
      val morDir = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_probe_mor_$factor")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(morDir)
      val tdir = new java.io.File(morDir, "wh/t").toString
      sources.Io.tableAppend(
        big.select(col("event_id"), col("event_type").as("typ"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
          .repartitionByRange(32 * math.max(1, factor / 2),
            col("event_id")),
        tdir)
      spark.conf.set("spark.sql.catalog.gmprobe",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.gmprobe.warehouse",
        new java.io.File(morDir, "wh").toString)
      spark.conf.set("graft.dml.mode", "mor")
      try t("mor_update") {
        spark.sql("UPDATE gmprobe.t SET cents = cents + 1 " +
          "WHERE event_id >= 5000 AND event_id < 15000")
      } finally spark.conf.unset("graft.dml.mode")
    }
    // round 14: BULK MOR delete — ~40% of every file matches, so the
    // over-threshold fallback (GraftDeltaWrite commit guard) must
    // materialize the touched files in its follow-up commit and leave
    // BOUNDED DV state; the untranslatable tail keeps the predicate
    // off the metadata-delete path so WriteDelta (the guarded path) is
    // what runs. Time includes delta + materialize — the claim is
    // bounded state at bulk scale, not zero rewrites.
    if (only.isEmpty || only("mor_bulk_delete") ||
        (headlineOnly && headline("mor_bulk_delete"))) {
      val mbDir = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_probe_morbulk_$factor")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(mbDir)
      val tdir = new java.io.File(mbDir, "wh/t").toString
      sources.Io.tableAppend(
        big.select(col("event_id"), col("event_type").as("typ"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
          .repartitionByRange(32 * math.max(1, factor / 2),
            col("event_id")),
        tdir)
      spark.conf.set("spark.sql.catalog.gmbprobe",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.gmbprobe.warehouse",
        new java.io.File(mbDir, "wh").toString)
      spark.conf.set("graft.dml.mode", "mor")
      try t("mor_bulk_delete") {
        spark.sql("DELETE FROM gmbprobe.t " +
          "WHERE typ IN ('view', 'click') AND cents % 1 = 0")
      } finally spark.conf.unset("graft.dml.mode")
      val t2 = tdir
      val head = sources.Io.tableVersion(spark, t2)
      println(s"mor_bulk_delete: head v$head, dv dirs " +
        s"${sources.Io.dvDirsOf(spark, t2, head).size} (bounded)")
    }
    spark.stop()
  }
}
