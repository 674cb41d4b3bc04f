package graft.promql

import graft.{Memo, Tables}
import graft.index.{LabelMatcher, MatchOp}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prometheus NATIVE histograms (the 3.x headline feature) over Spark:
  * a sample is a whole histogram — observation count, sum, a zero
  * bucket, and SPARSE buckets at exponential boundaries — and the
  * `histogram_*` function family evaluates against those samples.
  * The reference's Prometheus adapter
  * (/root/reference/include/tagtree/adapters/prom/querier.h:14-24)
  * serves PromQL clients, and 3.x clients send these functions; this
  * module closes that last language-family gap (round-10 VERDICT #1).
  *
  * Sample model (schema s: base 2^(2^−s) bucket boundaries; the
  * legacy model scrapes everything at schema 0 — the coarsest
  * standard resolution — and the MIXED model at per-series schema
  * 0/3, since 3.x clients default to schema 3; the derivation
  * parallels [[graft.index.TagIndex.forBucketedEvents]]'s classic
  * `le` fixture):
  *  - one histogram sample per (typ, hour) over Jan 1-7 (168 hours),
  *    stamped `t_sec` = END of its hour (the scrape instant);
  *  - CUMULATIVE counter semantics from the window start, exactly a
  *    live `*_bucket` counter family: sample at t covers every
  *    observation with ts < t;
  *  - positive bucket `idx` covers (base^(idx-1), base^idx];
  *    observations ≤ zeroThreshold = 2^-4 land in the ZERO bucket
  *    (Prometheus's zero-bucket contract, width chosen so it does
  *    real work on the corpus); `buckets` stores (idx, count)
  *    sparsely, only non-empty buckets — the wire format's
  *    spans/deltas carry exactly this; `sum by` over mixed schemas
  *    DOWNSCALES to the group's coarsest schema by pairwise bucket
  *    merging (idx' = ((idx−1) >> d) + 1), Prometheus's aggregation
  *    rule;
  *  - `hsum` accumulates observation values dyadically quantized at
  *    2^-20 (the model's declared ingest precision): dyadic addends
  *    make the float sum EXACT in any order — both a 1000-executor
  *    aggregation and the DuckDB oracle reproduce it bit-for-bit.
  *
  * Function semantics (Prometheus 3.x, pinned in PromConformanceSpec):
  *  - histogram_quantile: rank = φ·count; if rank falls in the zero
  *    bucket, LINEAR interpolation in [0, zeroThreshold] (lower bound
  *    0 when no negative buckets — Prometheus's special case); else
  *    EXPONENTIAL interpolation within the hit bucket:
  *    2^(idx-1+frac) (3.x interpolates native buckets in log space;
  *    classic `le` buckets stay linear — see the B19/B45 path);
  *  - histogram_fraction(lo, hi): interpolated cumulative F(hi)-F(lo)
  *    over count, same per-bucket interpolation rules;
  *  - histogram_stddev/stdvar: per-bucket midpoint = GEOMETRIC mean
  *    √(lower·upper) = √(2^(2·idx-1)) (Prometheus's funcHistogramStdDev),
  *    zero bucket midpoint 0; population variance against mean=sum/count;
  *  - rate(h[d]): per-bucket counter difference over the window
  *    divided by its seconds — component-wise, yielding a rate
  *    histogram consumable by every function above. Like B4/B42 rate,
  *    WITHOUT Prometheus's window-edge extrapolation (graft's
  *    documented divergence; the derived counters never reset).
  *
  * Scale: the sample table is ∝ series × hours × occupied buckets —
  * rollup-tier-sized (3-4 orders under raw samples), built in one
  * pruned scan + two keyed window passes; every function is one
  * explode + groupBy over ≤ 14-entry arrays per series.
  */
object NativeHist {

  val t0Sec = 1704067200L // 2024-01-01 00:00:00 UTC
  val hours = 168
  val zeroThreshold = 0.0625 // 2^-4

  /** Bucket resolutions the derived model uses. Schema s has base
    * 2^(2^−s) buckets: positive bucket idx covers
    * (base^(idx−1), base^idx] (Prometheus 3.x; schema 0 = base 2 is
    * the coarsest standard resolution, schema 3 = base 2^(1/8) is
    * what 3.x clients scrape by default). */
  val schemas: Seq[Int] = Seq(0, 3)

  /** First bucket above the zero threshold at schema s:
    * 2^-4 = base^(−4·2^s). */
  def minIdxAt(s: Int): Int = -4 * (1 << s) + 1
  /** Ladder top at schema s: 2^9 = base^(9·2^s) covers the corpus max
    * inside the model window (487.4 at sf0.1); [[samples]] guards the
    * bound at build time. */
  def maxIdxAt(s: Int): Int = 9 * (1 << s)

  /** Upper bounds base^minIdx .. base^maxIdx at schema s — LITERAL
    * doubles compared (not log'd) on both engines, so bucket
    * assignment is bit-identical regardless of pow() rounding:
    * the oracle SQL interpolates the same literals
    * ([[uppersSqlList]]). */
  def uppersAt(s: Int): Seq[Double] =
    (minIdxAt(s) to maxIdxAt(s)).map(i => math.pow(2.0, i.toDouble / (1 << s)))

  /** The schema-s boundary ladder as a DuckDB list literal — %.17g
    * round-trips a double exactly, so both engines compare identical
    * boundary values. */
  def uppersSqlList(s: Int): String =
    uppersAt(s).map(d => f"$d%.17g").mkString("[", ", ", "]")

  // legacy (schema-0) aliases — the streaming twin H30 builds the
  // sample shape from these
  val minIdx: Int = minIdxAt(0)
  val maxIdx: Int = maxIdxAt(0)
  val uppers: Seq[Double] = uppersAt(0)

  private val q20 = 1048576.0 // 2^20 — dyadic ingest quantization

  /** Per-series schema assignment of the MIXED model: click/error
    * scrape at schema 3, the rest at schema 0 — deterministic and
    * trivially replayed by the oracle (typ < 'n'). */
  private def mixedSchema: Column =
    when(col("typ") < "n", lit(3)).otherwise(lit(0))

  /** Bucket index of `value` at schema s (boundary-literal compare). */
  private def idxAt(s: Int): Column =
    lit(minIdxAt(s)) +
      size(filter(typedlit(uppersAt(s)), b => b < col("value")))

  /** The native-histogram sample series:
    * (typ, schema, t_sec, cnt, zcnt, hsum, buckets:
    * array<struct<idx,c>>). The legacy model scrapes everything at
    * schema 0; [[samplesMixed]] is the 3.x-shaped corpus.
    */
  def samples(spark: SparkSession, dir: String): DataFrame =
    samplesModel(spark, dir, mixed = false)

  /** The MIXED-resolution sample series: per-series schema via
    * [[mixedSchema]] — what a real 3.x fleet sends (clients scrape at
    * schema 3 and downscale under memory pressure, so a corpus is
    * never single-resolution). */
  def samplesMixed(spark: SparkSession, dir: String): DataFrame =
    samplesModel(spark, dir, mixed = true)

  private def samplesModel(spark: SparkSession, dir: String,
      mixed: Boolean): DataFrame =
    Memo.cached(spark, s"nativehist.samples:$mixed:$dir") {
      val schemaC = if (mixed) mixedSchema else lit(0)
      val endSec = t0Sec + hours * 3600L
      val raw = Tables.tsBetween(Tables.eventsRaw(spark, dir),
        timestamp_micros(lit(t0Sec * 1000000L)),
        timestamp_micros(lit(endSec * 1000000L - 1L)))
      val sec = unix_timestamp(Tables.tsCol(raw))
      // the ladder-top guard (any schema tops out at 2^9): an
      // observation above it would be counted in cnt but dropped from
      // the bucket model, silently breaking quantileOf's
      // `cum_max = cnt ≥ rank` invariant — fail the build instead
      val idxC = when(col("value") > lit(uppers.last),
          raise_error(format_string(
            "native-histogram observation %s above the 2^9 bucket ladder",
            col("value").cast("string"))).cast("int"))
        .when(col("value") <= zeroThreshold, lit(null).cast("int"))
        .otherwise(schemas.tail.foldLeft(idxAt(schemas.head)) {
          case (acc, s) => when(col("schema") === s, idxAt(s)).otherwise(acc)
        })
      val ev = raw.select(
        col("event_type").as("typ"),
        (sec - pmod(sec, lit(3600L))).as("h_sec"),
        col("value"),
        (floor(col("value") * q20 + 0.5) / q20).as("qv"))
        .withColumn("schema", schemaC)
        .withColumn("idx", idxC)
      val typs = ev.select(col("typ")).distinct()
        .withColumn("schema", schemaC)
      val grid = typs.withColumn("h_sec",
        explode(sequence(lit(t0Sec), lit(endSec - 3600L), lit(3600L))))
      // per-bucket hourly deltas → time-cumulative per (typ, idx);
      // the window is keyed by series×bucket, so the pass shuffles
      // tier-scale rows, never samples
      val hb = ev.filter(col("idx").isNotNull)
        .groupBy(col("typ"), col("h_sec"), col("idx"))
        .agg(count(lit(1)).as("dc"))
      // each series explodes ITS schema's ladder (13 buckets at
      // schema 0, 104 at schema 3 — still tier-scale)
      val ladder = schemas.tail.foldLeft(
        sequence(lit(minIdxAt(schemas.head)), lit(maxIdxAt(schemas.head)))) {
        case (acc, s) => when(col("schema") === s,
          sequence(lit(minIdxAt(s)), lit(maxIdxAt(s)))).otherwise(acc)
      }
      val bgrid = grid.withColumn("idx", explode(ladder))
      val wcum = Window.partitionBy(col("typ"), col("idx"))
        .orderBy(col("h_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumB = bgrid.join(hb, Seq("typ", "h_sec", "idx"), "left")
        .withColumn("cum", sum(coalesce(col("dc"), lit(0L))).over(wcum))
        .filter(col("cum") > 0) // sparse: only occupied buckets land
        .groupBy(col("typ"), col("h_sec"))
        .agg(sort_array(collect_list(struct(col("idx"), col("cum").as("c"))))
          .as("buckets"))
      val hs = ev.groupBy(col("typ"), col("h_sec")).agg(
        count(lit(1)).as("dcnt"),
        sum(when(col("idx").isNull, 1L).otherwise(0L)).as("dz"),
        sum(col("qv")).as("ds"))
      val wc = Window.partitionBy(col("typ")).orderBy(col("h_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hs, Seq("typ", "h_sec"), "left")
        .withColumn("cnt", sum(coalesce(col("dcnt"), lit(0L))).over(wc))
        .withColumn("zcnt", sum(coalesce(col("dz"), lit(0L))).over(wc))
        .withColumn("hsum", sum(coalesce(col("ds"), lit(0.0))).over(wc))
        .join(cumB, Seq("typ", "h_sec"), "left")
        .select(col("typ"), col("schema"), (col("h_sec") + 3600L).as("t_sec"),
          col("cnt"), col("zcnt"), col("hsum"),
          coalesce(col("buckets"),
            typedlit(Seq.empty[(Int, Long)])
              .cast("array<struct<idx:int,c:bigint>>")).as("buckets"))
    }

  // ---------------- selection ----------------

  /** Matchers applied directly to the sample series' label column —
    * the full MatchOp set, anchored regexes like the index path. */
  private def matcherPred(ms: Seq[LabelMatcher]): Column =
    ms.map { m =>
      val c = col(if (m.name == "__name__") "typ" else m.name)
      m.op match {
        case MatchOp.Eql => c === m.value
        case MatchOp.Neq => c =!= m.value
        case MatchOp.Lss => c < m.value
        case MatchOp.Gtr => c > m.value
        case MatchOp.Lte => c <= m.value
        case MatchOp.Gte => c >= m.value
        case MatchOp.EqlRegex => c.rlike("^(?:" + m.value + ")$")
        case MatchOp.NeqRegex => !c.rlike("^(?:" + m.value + ")$")
      }
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** Instant vector of histogram samples: per series the latest sample
    * at-or-before T (as-of — the staleness lookback is the sample
    * interval here, samples land every hour by construction). Counts
    * emerge as DOUBLE; `rsec` is the rate denominator (1 for instant).
    */
  private def histAt(spark: SparkSession, dir: String,
      ms: Seq[LabelMatcher], tSec: Long,
      mixed: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("typ")).orderBy(col("t_sec").desc)
    samplesModel(spark, dir, mixed)
      .filter(matcherPred(ms) && col("t_sec") <= tSec)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("typ"), col("schema"),
        col("cnt").cast("double").as("cnt"),
        col("zcnt").cast("double").as("zcnt"), col("hsum"),
        expr("transform(buckets, x -> named_struct(" +
          "'idx', x.idx, 'c', cast(x.c as double)))").as("buckets"),
        lit(1.0).as("rsec"))
  }

  /** rate(h[rangeSec]) at T: component-wise counter difference of the
    * samples at T and T-range. The diffs stay RAW (exact integers in
    * doubles) with `rsec` carrying the denominator: quantile/fraction/
    * stddev/avg are scale-invariant, so bucket selection compares
    * exact counts — no cross-engine float-ordering surface — and only
    * histogram_count/sum divide (one exact IEEE quotient each, the
    * priority-sampling precedent). A series absent at T-range diffs
    * against the empty histogram.
    */
  private def histRate(spark: SparkSession, dir: String,
      ms: Seq[LabelMatcher], tSec: Long, rangeSec: Long,
      mixed: Boolean = false): DataFrame =
    histDiff(histAt(spark, dir, ms, tSec, mixed),
      histAt(spark, dir, ms, tSec - rangeSec, mixed), Seq("typ"), rangeSec)

  /** a − b per histogram component, keyed by `keys` (the range form
    * adds t_sec to the key set — every evaluator downstream is
    * label-generic, so per-step histograms flow through unchanged).
    */
  private def histDiff(a: DataFrame, b: DataFrame, keys: Seq[String],
      rangeSec: Long): DataFrame = {
    val kcols = keys.map(col)
    val ae = a.select(kcols :+ explode(col("buckets")).as("x"): _*)
      .select(kcols ++ Seq(col("x.idx").as("idx"), col("x.c").as("dc")): _*)
    val be = b.select(kcols :+ explode(col("buckets")).as("x"): _*)
      .select(kcols ++ Seq(col("x.idx").as("idx"), (-col("x.c")).as("dc")): _*)
    val db = ae.unionByName(be)
      .groupBy(kcols :+ col("idx"): _*).agg(sum(col("dc")).as("d"))
      .filter(col("d") > 0)
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(struct(col("idx"),
        col("d").as("c")))).as("buckets"))
    // post-aggregation joins have no Catalyst stats and would fall
    // back to sort-merge (the promql_ignoring lesson); both right
    // sides are ∝ matched series — broadcast-sized for any dashboard
    // selection
    // rate never crosses series, so a's schema IS the diff's schema
    a.join(broadcast(b.select(kcols ++ Seq(col("cnt").as("bcnt"),
        col("zcnt").as("bzcnt"), col("hsum").as("bhsum")): _*)),
        keys, "left")
      .select(kcols ++ Seq(col("schema"),
        (col("cnt") - coalesce(col("bcnt"), lit(0.0))).as("cnt"),
        (col("zcnt") - coalesce(col("bzcnt"), lit(0.0))).as("zcnt"),
        (col("hsum") - coalesce(col("bhsum"), lit(0.0))).as("hsum")): _*)
      .join(broadcast(db), keys, "left")
      .withColumn("buckets", coalesce(col("buckets"),
        typedlit(Seq.empty[(Int, Double)])
          .cast("array<struct<idx:int,c:double>>")))
      .withColumn("rsec", lit(rangeSec.toDouble))
  }

  /** Histogram samples at every grid step (the range-query selection):
    * grid steps must land on the hourly sample grid, where a sample
    * exists per series by construction — selection is an equi-join on
    * t_sec, one scan for the whole grid (`shift` re-stamps the frame
    * forward for the rate subtrahend). */
  private def histAtGrid(spark: SparkSession, dir: String,
      ms: Seq[LabelMatcher], grid: Seq[Long], shift: Long,
      mixed: Boolean = false): DataFrame = {
    // g - shift == t0Sec is the virtual zero histogram at the counter
    // epoch — no sample row exists, and histDiff's left join reads the
    // absence as zero, which IS the correct cumulative-counter value
    grid.foreach { g =>
      require((g - shift - t0Sec) % 3600 == 0 &&
        g - shift >= t0Sec && g - shift <= t0Sec + hours * 3600L,
        s"grid step ${g - shift} off the hourly native-sample grid")
    }
    samplesModel(spark, dir, mixed)
      .filter(matcherPred(ms) &&
        col("t_sec").isInCollection(grid.map(_ - shift)))
      .select(col("typ"), col("schema"), (col("t_sec") + shift).as("t_sec"),
        col("cnt").cast("double").as("cnt"),
        col("zcnt").cast("double").as("zcnt"), col("hsum"),
        expr("transform(buckets, x -> named_struct(" +
          "'idx', x.idx, 'c', cast(x.c as double)))").as("buckets"),
        lit(1.0).as("rsec"))
  }

  // ---------------- function math ----------------

  private def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4

  // a histogram frame = label columns + the histogram payload; the
  // evaluators key by whatever labels the frame carries (typ for the
  // raw series, aggregated label subsets after sum by (...))
  private val hMeta = Set("cnt", "zcnt", "hsum", "buckets", "rsec", "rank",
    "schema")
  private def hLabels(h: DataFrame): Seq[String] =
    h.columns.filterNot(hMeta).toSeq

  // pre-mixed callers (the streaming twin, conformance fixtures) build
  // the sample payload without a schema column — they are schema 0
  private def withSchema(h: DataFrame): DataFrame =
    if (h.columns.contains("schema")) h else h.withColumn("schema", lit(0))

  /** φ-quantile per series: explode the ≤14-entry bucket array, running
    * cumulative over idx, first bucket with cum ≥ rank, exponential
    * interpolation (zero bucket linear from 0). */
  private[graft] def quantileOf(h0: DataFrame, q: Double): DataFrame = {
    val h = withSchema(h0)
    val labels = hLabels(h)
    val lcols = labels.map(col)
    // explode_outer keeps bucket-less series as a null-bucket row, so
    // every series resolves on its FIRST row with cum ≥ rank (cum_max
    // = cnt ≥ rank guarantees one exists) and no join back to h is
    // needed — a single-branch plan that also survives histogram
    // frames whose lineage contains joins or memory-sink views
    val e = h.withColumn("rank", col("cnt") * lit(q))
      .select(lcols ++ Seq(col("schema"), col("cnt"), col("zcnt"),
        col("rank"), explode_outer(col("buckets")).as("x")): _*)
      .select(lcols ++ Seq(col("schema"), col("cnt"), col("zcnt"),
        col("rank"), col("x.idx").as("idx"),
        coalesce(col("x.c"), lit(0.0)).as("c")): _*)
    val wcum = Window.partitionBy(lcols: _*).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exponential in-bucket interpolation: base^(idx−1+frac) =
    // 2^((idx−1+frac)·2^−s). The schema-0 branch keeps the exact
    // round-10 float form (split pow product), so existing gates stay
    // bit-identical; higher schemas use the single-pow generalization
    // the oracle mirrors verbatim.
    val frac = (col("rank") - (col("cum") - col("c"))) / col("c")
    e.withColumn("cum", col("zcnt") + sum(col("c")).over(wcum))
      .filter(col("cum") >= col("rank"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(lcols: _*).orderBy(col("idx"))))
      .filter(col("__rn") === 1)
      .select(lcols :+
        when(col("cnt") <= 0, lit(Double.NaN))
          .when(col("rank") <= col("zcnt"),
            lit(zeroThreshold) * col("rank") / col("zcnt"))
          .when(col("idx").isNull, lit(Double.NaN))
          .when(col("schema") === 0,
            pow(lit(2.0), col("idx") - 1) * pow(lit(2.0), frac))
          .otherwise(pow(lit(2.0),
            (col("idx") - lit(1) + frac) / pow(lit(2.0), col("schema"))))
          .as("value"): _*)
  }

  /** Component-wise histogram SUM (`sum by (...) (H)`): native
    * histograms of equal schema add per bucket — the Prometheus
    * aggregation behind every `histogram_quantile(φ, sum(rate(...)))`
    * dashboard panel. Exact: counts are raw integers (rate scaling is
    * deferred via rsec, which must be uniform across the summed
    * series) and hsum is dyadic, so the sums are order-independent on
    * both engines. An empty `by` aggregates everything into one
    * histogram (a hidden constant key keeps the keyed plan shape; the
    * eval hook strips it from the output).
    */
  private[graft] def sumHists(h0: DataFrame, by: Seq[String]): DataFrame = {
    val h = withSchema(h0)
    val keys = if (by.nonEmpty) by else Seq("__g")
    val base = if (by.nonEmpty) h else h.withColumn("__g", lit(1))
    val kcols = keys.map(col)
    // Prometheus sums MIXED-schema histograms by DOWNSCALING every
    // series to the group's COARSEST schema (min): d = s − target
    // merges 2^d consecutive buckets, idx' = ((idx−1) >> d) + 1 —
    // computed as exact floor division (doubles are exact at these
    // magnitudes, and floor matches the arithmetic shift on negatives).
    // The target schema travels on the result, so downstream
    // interpolation happens at the aggregated resolution.
    // round 14 (optimization note): tried deriving this target schema
    // from the main scalar aggregate below (broadcasting its
    // (keys, schema) projection into the bucket branch) to drop one
    // evaluation of `base` — measured SLOWER at sf0.1 (1.56 → 2.66 s
    // warm on promql_native_schema): a BroadcastExchange over an
    // aggregate subtree is NOT reusable with the same aggregate's
    // shuffle-side twin, so the full aggregate ran twice and the
    // bucket branch serialized behind it. The separate cheap min()
    // aggregate keeps tgt and the main aggregate independent (they run
    // concurrently) and is what the measurements favor.
    val tgt = base.groupBy(kcols: _*).agg(min(col("schema")).as("schema"))
    val sb = base.select(kcols ++ Seq(col("schema").as("__s"),
        explode(col("buckets")).as("x")): _*)
      .join(broadcast(tgt), keys.toSeq)
      .withColumn("idx",
        (floor((col("x.idx") - lit(1)).cast("double") /
          pow(lit(2.0), col("__s") - col("schema"))) + lit(1)).cast("int"))
      .groupBy(kcols :+ col("idx"): _*)
      .agg(sum(col("x.c")).as("c"))
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(struct(col("idx"), col("c"))))
        .as("buckets"))
    base.groupBy(kcols: _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("zcnt")).as("zcnt"),
        sum(col("hsum")).as("hsum"), min(col("schema")).as("schema"),
        min(col("rsec")).as("__rmin"), max(col("rsec")).as("__rmax"))
      // the guard lives INSIDE rsec so it fires exactly when a
      // consumer (count/sum) reads the scale of a mixed-range sum
      .withColumn("rsec",
        when(col("__rmin") =!= col("__rmax"),
          raise_error(lit("sum over histograms with mixed rate ranges")))
          .otherwise(col("__rmin")))
      .drop("__rmin", "__rmax")
      .join(sb, keys.toSeq, "left")
      .withColumn("buckets", coalesce(col("buckets"),
        typedlit(Seq.empty[(Int, Double)])
          .cast("array<struct<idx:int,c:double>>")))
  }

  /** Interpolated cumulative count F(x) of a literal bound x ≥ 0 —
    * log-space position within the containing bucket, matching the
    * quantile's exponential rule. ln(x)/ln(2) is evaluated IN each
    * engine (the 1-ulp-identical ln precedent: F9/F18, 5 rounds). */
  private def interpCumAt(x: Double, s: Int): Column = {
    if (x == 0) lit(0.0)
    else if (x <= zeroThreshold) col("zcnt") * (lit(x) / lit(zeroThreshold))
    else if (x > uppersAt(s).last) col("cnt")
    else {
      val ix = (minIdxAt(s) to maxIdxAt(s))
        .find(i => x <= math.pow(2.0, i.toDouble / (1 << s))).get
      val below = expr(
        s"aggregate(filter(buckets, b -> b.idx < $ix), 0D, (a, b) -> a + b.c)")
      val cb = coalesce(
        expr(s"get(filter(buckets, b -> b.idx = $ix), 0).c"), lit(0.0))
      // log-space position within the schema-s bucket:
      // log_base(x) − (ix−1), log_base(x) = log2(x)·2^s (the s=0 form
      // kept verbatim for hash stability of the round-10 gates)
      val posC =
        if (s == 0) log(lit(x)) / log(lit(2.0)) - lit(ix - 1)
        else (log(lit(x)) / log(lit(2.0))) * lit((1 << s).toDouble) -
          lit((ix - 1).toDouble)
      col("zcnt") + below + cb * posC
    }
  }

  private def interpCum(x: Double): Column = {
    require(x >= 0, s"histogram_fraction bound $x < 0: the derived " +
      "model has no negative buckets")
    schemas.tail.foldLeft(interpCumAt(x, schemas.head)) {
      case (acc, s) => when(col("schema") === s, interpCumAt(x, s))
        .otherwise(acc)
    }
  }

  private[graft] def fractionOf(h0: DataFrame, lo: Double, hi: Double): DataFrame = {
    val h = withSchema(h0)
    h.select(hLabels(h).map(col) :+
      when(col("cnt") <= 0, lit(Double.NaN))
        .otherwise((interpCum(hi) - interpCum(lo)) / col("cnt"))
        .as("value"): _*)
  }

  /** count/sum/avg/stddev/stdvar of the histogram itself. Only count
    * and sum see `rsec` — the rest are scale-invariant ratios, so the
    * rate path keeps exact integer counts throughout. */
  private[graft] def statOf(h0: DataFrame, name: String): DataFrame = {
    val h = withSchema(h0)
    val lcols = hLabels(h).map(col)
    name match {
      case "histogram_count" =>
        h.select(lcols :+ (col("cnt") / col("rsec")).as("value"): _*)
      case "histogram_sum" =>
        h.select(lcols :+ (col("hsum") / col("rsec")).as("value"): _*)
      case "histogram_avg" =>
        h.select(lcols :+ (col("hsum") / col("cnt")).as("value"): _*)
      case _ => // stddev / stdvar: geometric bucket midpoints, zero at 0
        // midpoint √(base^(2idx−1)) = 2^((2idx−1)/(2·2^s)); the s=0
        // branch keeps the round-10 sqrt(pow(...)) float form
        val mid = "(CASE WHEN schema = 0 " +
          "THEN sqrt(pow(2D, 2 * b.idx - 1)) " +
          "ELSE pow(2D, cast(2 * b.idx - 1 AS DOUBLE) / " +
          "(2.0 * pow(2D, cast(schema AS DOUBLE)))) END)"
        val mean = col("hsum") / col("cnt")
        val varCol = (expr(
          "aggregate(buckets, 0D, (a, b) -> a + b.c * " +
            s"($mid - __mean) * " +
            s"($mid - __mean))") +
          col("zcnt") * col("__mean") * col("__mean")) / col("cnt")
        val withVar = h.withColumn("__mean", mean).withColumn("__var", varCol)
        if (name == "histogram_stdvar")
          withVar.select(lcols :+ col("__var").as("value"): _*)
        else withVar.select(lcols :+ sqrt(col("__var")).as("value"): _*)
    }
  }

  // ------------- SIGNED histograms: negative buckets (round 11) -------------
  // Prometheus native histograms mirror the exponential ladder below
  // the zero bucket: negative bucket idx covers [−2^idx, −2^(idx−1))
  // — exactly the positive rule on |v| (the closed end lands on the
  // larger magnitude). The events corpus is non-negative, so the
  // signed model derives a DEVIATION metric (value − 50, the
  // "distance from target" shape that makes gauges signed in
  // practice); the gate replays the derivation, both ladders, and the
  // signed quantile from raw events. Quantile semantics: rank counts
  // from the MOST NEGATIVE value — negative buckets in descending
  // idx, then the zero bucket (linear across [−zt, zt] when negative
  // mass exists — Prometheus's two-sided zero-bucket rule), then the
  // positive buckets; in-bucket interpolation stays exponential with
  // the mirror orientation (value = −2^(idx−frac): frac 0 → the
  // bucket's most negative edge).

  private val signedShift = 50.0

  /** The signed sample series: (typ, t_sec, cnt, zcnt, hsum,
    * buckets, nbuckets) — schema 0; nbuckets are the negative ladder
    * counts, idx-sorted. */
  def samplesSigned(spark: SparkSession, dir: String): DataFrame =
    Memo.cached(spark, s"nativehist.signed:$dir") {
      val endSec = t0Sec + hours * 3600L
      val raw = Tables.tsBetween(Tables.eventsRaw(spark, dir),
        timestamp_micros(lit(t0Sec * 1000000L)),
        timestamp_micros(lit(endSec * 1000000L - 1L)))
      val sec = unix_timestamp(Tables.tsCol(raw))
      val vc = col("value") - lit(signedShift)
      val idxOf: Column => Column = v =>
        lit(minIdx) + size(filter(typedlit(uppers), b => b < v))
      val ev = raw.select(
        col("event_type").as("typ"),
        (sec - pmod(sec, lit(3600L))).as("h_sec"),
        vc.as("vc"),
        (floor(vc * q20 + 0.5) / q20).as("qv"))
        .withColumn("side",
          when(abs(col("vc")) > lit(uppers.last),
            raise_error(lit("signed observation beyond the 2^9 ladder"))
              .cast("int"))
          .when(abs(col("vc")) <= zeroThreshold, lit(0))
          .when(col("vc") > 0, lit(1)).otherwise(lit(-1)))
        .withColumn("idx",
          when(col("side") === 1, idxOf(col("vc")))
            .when(col("side") === -1, idxOf(-col("vc")))
            .otherwise(lit(null).cast("int")))
      val typs = ev.select(col("typ")).distinct()
      val grid = typs.withColumn("h_sec",
        explode(sequence(lit(t0Sec), lit(endSec - 3600L), lit(3600L))))
      def cumSide(side: Int, name: String): DataFrame = {
        val hb = ev.filter(col("side") === side)
          .groupBy(col("typ"), col("h_sec"), col("idx"))
          .agg(count(lit(1)).as("dc"))
        val bgrid = grid.withColumn("idx",
          explode(sequence(lit(minIdx), lit(maxIdx))))
        val wcum = Window.partitionBy(col("typ"), col("idx"))
          .orderBy(col("h_sec"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bgrid.join(hb, Seq("typ", "h_sec", "idx"), "left")
          .withColumn("cum", sum(coalesce(col("dc"), lit(0L))).over(wcum))
          .filter(col("cum") > 0)
          .groupBy(col("typ"), col("h_sec"))
          .agg(sort_array(collect_list(struct(col("idx"),
            col("cum").as("c")))).as(name))
      }
      val hs = ev.groupBy(col("typ"), col("h_sec")).agg(
        count(lit(1)).as("dcnt"),
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("dz"),
        sum(col("qv")).as("ds"))
      val wc = Window.partitionBy(col("typ")).orderBy(col("h_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val empty = typedlit(Seq.empty[(Int, Long)])
        .cast("array<struct<idx:int,c:bigint>>")
      grid.join(hs, Seq("typ", "h_sec"), "left")
        .withColumn("cnt", sum(coalesce(col("dcnt"), lit(0L))).over(wc))
        .withColumn("zcnt", sum(coalesce(col("dz"), lit(0L))).over(wc))
        .withColumn("hsum", sum(coalesce(col("ds"), lit(0.0))).over(wc))
        .join(cumSide(1, "buckets"), Seq("typ", "h_sec"), "left")
        .join(cumSide(-1, "nbuckets"), Seq("typ", "h_sec"), "left")
        .select(col("typ"), (col("h_sec") + 3600L).as("t_sec"),
          col("cnt"), col("zcnt"), col("hsum"),
          coalesce(col("buckets"), empty).as("buckets"),
          coalesce(col("nbuckets"), empty).as("nbuckets"))
    }

  /** φ-quantile of the signed model at T per series. Ordering: most
    * negative bucket (largest negative idx) first, zero bucket, then
    * the positive ladder. */
  def signedQuantile(spark: SparkSession, dir: String, q: Double,
      t: String): DataFrame = {
    val tSec = tSecOf(t)
    val w = Window.partitionBy(col("typ")).orderBy(col("t_sec").desc)
    val h = samplesSigned(spark, dir)
      .filter(col("t_sec") <= tSec)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    // one exploded frame over both ladders + the zero bucket, ordered
    // by value: ord = −idx (neg) < 100 (zero) < 200 + idx (pos)
    val parts = h.select(col("typ"), col("cnt"), col("zcnt"),
      expr("""concat(
        transform(nbuckets, x -> named_struct(
          'ord', -x.idx, 'side', -1, 'idx', x.idx,
          'c', cast(x.c as double))),
        array(named_struct('ord', 100, 'side', 0, 'idx', 0,
          'c', cast(zcnt as double))),
        transform(buckets, x -> named_struct(
          'ord', 200 + x.idx, 'side', 1, 'idx', x.idx,
          'c', cast(x.c as double))))""").as("bs"))
      .select(col("typ"), col("cnt"), col("zcnt"),
        expr("aggregate(filter(bs, b -> b.side = -1), 0D, (a, b) -> a + b.c)")
          .as("negTotal"),
        explode(col("bs")).as("x"))
      .select(col("typ"), col("cnt"), col("zcnt"), col("negTotal"),
        col("x.ord").as("ord"), col("x.side").as("side"),
        col("x.idx").as("idx"), col("x.c").as("c"))
      .filter(col("c") > 0)
      .withColumn("rank", col("cnt").cast("double") * lit(q))
    val wcum = Window.partitionBy(col("typ")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zt = zeroThreshold
    val frac = (col("rank") - (col("cum") - col("c"))) / col("c")
    parts.withColumn("cum", sum(col("c")).over(wcum))
      .filter(col("cum") >= col("rank"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("typ")).orderBy(col("ord"))))
      .filter(col("__rn") === 1)
      .select(col("typ"),
        when(col("cnt") <= 0, lit(Double.NaN))
          .when(col("side") === -1,
            -pow(lit(2.0), col("idx") - frac))
          .when(col("side") === 0,
            when(col("negTotal") > 0,
              lit(-zt) + lit(2 * zt) *
                ((col("rank") - col("negTotal")) / col("zcnt")))
              .otherwise(lit(zt) * col("rank") / col("zcnt")))
          .otherwise(pow(lit(2.0), col("idx") - 1) *
            pow(lit(2.0), frac))
          .as("value"))
  }

  import PromQl.{Agg, Expr, Func, HistFrac, Sel}

  // ---------------- NHCB: custom buckets (round 11) ----------------
  // Native Histograms with Custom Buckets (Prometheus 3.x schema -53):
  // how classic `le` histograms MIGRATE into the native sample model —
  // one whole-histogram sample per scrape carrying an arbitrary sorted
  // bound ladder + cumulative per-bound counts, instead of one series
  // per `le` label. Semantics follow the classic rules, not the
  // exponential ones: LINEAR in-bucket interpolation (the B19/B45
  // formula), a rank falling in the +Inf bucket returns the highest
  // finite bound, the lowest bucket interpolates from 0, and
  // aggregation REQUIRES identical bound ladders (Prometheus refuses
  // to sum mismatched custom buckets — the raise_error guard below).
  // Scale shape: samples are ∝ series × hours with a fixed-width
  // array payload; every function is column arithmetic over that
  // array — no explode, no join.

  /** The migrated classic ladder (B19's bounds; +Inf implicit). */
  val nhcbBounds: Seq[Double] = Seq(25.0, 50.0, 100.0, 200.0)

  /** Round 12: the PER-METRIC ladder registry — a migrated fleet does
    * not share one bucket layout; each metric declares the bounds its
    * classic histogram used (Prometheus's
    * `convert_classic_histograms_to_nhcb` keeps each scrape target's
    * own `le` ladder). Metrics absent from the map use [[nhcbBounds]].
    * Ladders must share a LENGTH (the sample payload is a fixed-width
    * array); values are free — and [[sumNhcb]] refuses to aggregate
    * across metrics whose ladders differ, exactly like Prometheus. */
  val nhcbLadders: Map[String, Seq[Double]] =
    Map("purchase" -> Seq(40.0, 80.0, 160.0, 320.0))

  /** Round 12, session 3: VARIABLE-LENGTH per-metric ladders — a real
    * migrated fleet's layouts differ in bucket COUNT, not just bucket
    * values (a 3-bucket error histogram next to a 6-bucket purchase
    * one). The sample payload is a per-metric-width array and every
    * consumer computes bucket selection as COLUMN arithmetic over
    * `size(bounds)` (no compile-time width anywhere), so ladders of
    * any length serve quantile/fraction/stats/rate; [[sumNhcb]] still
    * refuses mismatched ladders (length or values) exactly like
    * Prometheus. */
  val nhcbLaddersVar: Map[String, Seq[Double]] =
    Map("purchase" -> Seq(20.0, 40.0, 80.0, 160.0, 320.0, 640.0),
      "error" -> Seq(30.0, 90.0, 270.0))

  /** NHCB sample series: (typ, t_sec, bounds, cnt, bcum, hsum) —
    * cumulative counter semantics like [[samples]],
    * cumulative-in-value like the classic `le` form (bcum(i) =
    * observations ≤ bounds(i)); `hsum` accumulates the dyadically
    * quantized observation sum (the migrated `_sum` series — same
    * 2^-20 ingest quantization as the exponential model, so sums are
    * order-independent on both engines). */
  def nhcbSamples(spark: SparkSession, dir: String): DataFrame =
    nhcbSamplesModel(spark, dir, Map.empty, "u")

  /** The per-metric-ladder corpus (round 12): same construction, each
    * typ's bounds drawn from [[nhcbLadders]]. */
  def nhcbSamplesLadders(spark: SparkSession, dir: String): DataFrame =
    nhcbSamplesModel(spark, dir, nhcbLadders, "pm")

  /** The variable-length corpus (round 12, session 3): ladders from
    * [[nhcbLaddersVar]] — each metric its own bucket COUNT. */
  def nhcbSamplesVar(spark: SparkSession, dir: String): DataFrame =
    nhcbSamplesModel(spark, dir, nhcbLaddersVar, "var")

  // The builder is width-generic: per-event bucket membership explodes
  // the metric's OWN ladder (posexplode — the cost class of classic
  // `le` series ingestion, ∝ events × ladder length), per-position
  // hour-cumulative counters ride an ordinary window, and the array
  // payload reassembles by sorted position. No compile-time width.
  private def nhcbSamplesModel(spark: SparkSession, dir: String,
      ladders: Map[String, Seq[Double]], tagKey: String): DataFrame =
    Memo.cached(spark, s"nativehist.nhcb:$tagKey:$dir") {
      // the metric's bound ladder as a column (uniform when no registry)
      val boundsC: Column =
        if (ladders.isEmpty) typedlit(nhcbBounds)
        else coalesce(
          element_at(typedlit(ladders), col("typ")),
          typedlit(nhcbBounds))
      val endSec = t0Sec + hours * 3600L
      val raw = Tables.tsBetween(Tables.eventsRaw(spark, dir),
        timestamp_micros(lit(t0Sec * 1000000L)),
        timestamp_micros(lit(endSec * 1000000L - 1L)))
      val sec = unix_timestamp(Tables.tsCol(raw))
      val ev = raw.select(col("event_type").as("typ"),
        (sec - pmod(sec, lit(3600L))).as("h_sec"), col("value"),
        (floor(col("value") * q20 + 0.5) / q20).as("qv"))
        .withColumn("bounds", boundsC)
      val typs = ev.select(col("typ"), col("bounds")).distinct()
      val grid = typs.withColumn("h_sec",
        explode(sequence(lit(t0Sec), lit(endSec - 3600L), lit(3600L))))
      val wc = Window.partitionBy(col("typ")).orderBy(col("h_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hs = ev.groupBy(col("typ"), col("h_sec"))
        .agg(count(lit(1)).as("dcnt"), sum(col("qv")).as("ds"))
      val cum = grid.select(col("typ"), col("h_sec"))
        .join(hs, Seq("typ", "h_sec"), "left")
        .withColumn("cnt", sum(coalesce(col("dcnt"), lit(0L))).over(wc))
        .withColumn("hsum", sum(coalesce(col("ds"), lit(0.0))).over(wc))
        .select(col("typ"), col("h_sec"), col("cnt"), col("hsum"))
      // per-(typ, hour, bucket) deltas over the metric's own ladder
      val evb = ev.select(col("typ"), col("h_sec"), col("value"),
        posexplode(col("bounds")).as(Seq("__i", "__ub")))
      val hb = evb.groupBy(col("typ"), col("h_sec"), col("__i"), col("__ub"))
        .agg(sum(when(col("value") <= col("__ub"), 1L).otherwise(0L))
          .as("db"))
      val bgrid = grid.select(col("typ"), col("h_sec"),
        posexplode(col("bounds")).as(Seq("__i", "__ub")))
      val wcb = Window.partitionBy(col("typ"), col("__i"))
        .orderBy(col("h_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val barr = bgrid
        .join(hb, Seq("typ", "h_sec", "__i", "__ub"), "left")
        .withColumn("b", sum(coalesce(col("db"), lit(0L))).over(wcb))
        .groupBy(col("typ"), col("h_sec"))
        .agg(
          expr("transform(array_sort(collect_list(struct(__i, __ub, b)))," +
            " x -> x.__ub)").as("bounds"),
          expr("transform(array_sort(collect_list(struct(__i, __ub, b)))," +
            " x -> x.b)").as("bcum"))
      cum.join(barr, Seq("typ", "h_sec"))
        .select(col("typ"), (col("h_sec") + 3600L).as("t_sec"),
          col("bounds"), col("cnt"), col("bcum"), col("hsum"))
    }

  /** Instant NHCB vector at T (latest sample per series, like
    * [[histAt]]); counts emerge as doubles for the shared math.
    * `rsec` = 1 (the rate denominator discipline of the exponential
    * model — only count/sum consume it). */
  private def nhcbAtFrom(samples: DataFrame, tSec: Long): DataFrame = {
    val w = Window.partitionBy(col("typ")).orderBy(col("t_sec").desc)
    samples
      .filter(col("t_sec") <= tSec)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("typ"), col("bounds"),
        col("cnt").cast("double").as("cnt"),
        expr("transform(bcum, x -> cast(x as double))").as("bcum"),
        col("hsum"), lit(1.0).as("rsec"))
  }

  private def nhcbAt(spark: SparkSession, dir: String,
      tSec: Long): DataFrame =
    nhcbAtFrom(nhcbSamples(spark, dir), tSec)

  /** rate-form NHCB at T over [T−rangeSec, T): component-wise counter
    * diffs, raw with the range carried in `rsec` (the quantile is
    * scale-invariant; count/sum divide at the end — integer-exact
    * bucket comparisons cross-engine). */
  private def nhcbRateFrom(samples: DataFrame, tSec: Long,
      rangeSec: Long): DataFrame = {
    val a = nhcbAtFrom(samples, tSec)
    val b = nhcbAtFrom(samples, tSec - rangeSec)
      .select(col("typ"), col("cnt").as("bcnt"), col("bcum").as("bbcum"),
        col("hsum").as("bhsum"))
    a.join(broadcast(b), Seq("typ"), "left")
      .select(col("typ"), col("bounds"),
        (col("cnt") - coalesce(col("bcnt"), lit(0.0))).as("cnt"),
        coalesce(
          expr("zip_with(bcum, bbcum, (x, y) -> x - y)"), col("bcum"))
          .as("bcum"),
        (col("hsum") - coalesce(col("bhsum"), lit(0.0))).as("hsum"),
        lit(rangeSec.toDouble).as("rsec"))
  }

  private def nhcbRate(spark: SparkSession, dir: String, tSec: Long,
      rangeSec: Long): DataFrame =
    nhcbRateFrom(nhcbSamples(spark, dir), tSec, rangeSec)

  /** Grid-vectorized NHCB selection (round 12 — the custom-bucket twin
    * of [[histAtGrid]]): every requested step must land on the hourly
    * sample grid, selection is one equi-join filter for the whole
    * grid; `shift` re-stamps the frame forward for the rate
    * subtrahend, and a step whose shifted source is the counter epoch
    * reads as the zero histogram through the left join in
    * [[nhcbDiffGrid]]. */
  private def nhcbAtGrid(samples: DataFrame, grid: Seq[Long],
      shift: Long): DataFrame = {
    grid.foreach { g =>
      require((g - shift - t0Sec) % 3600 == 0 &&
        g - shift >= t0Sec && g - shift <= t0Sec + hours * 3600L,
        s"grid step ${g - shift} off the hourly NHCB sample grid")
    }
    samples.filter(col("t_sec").isInCollection(grid.map(_ - shift)))
      .select(col("typ"), (col("t_sec") + shift).as("t_sec"),
        col("bounds"),
        col("cnt").cast("double").as("cnt"),
        expr("transform(bcum, x -> cast(x as double))").as("bcum"),
        col("hsum"), lit(1.0).as("rsec"))
  }

  /** Component-wise counter diffs across the whole grid — one shifted
    * self-join on (typ, t_sec); absence on the right is the zero
    * histogram (cumulative counters from the epoch). */
  private def nhcbDiffGrid(a: DataFrame, b: DataFrame,
      rangeSec: Long): DataFrame =
    a.join(b.select(col("typ"), col("t_sec"), col("cnt").as("bcnt"),
        col("bcum").as("bbcum"), col("hsum").as("bhsum")),
      Seq("typ", "t_sec"), "left")
      .select(col("typ"), col("t_sec"), col("bounds"),
        (col("cnt") - coalesce(col("bcnt"), lit(0.0))).as("cnt"),
        coalesce(
          expr("zip_with(bcum, bbcum, (x, y) -> x - y)"), col("bcum"))
          .as("bcum"),
        (col("hsum") - coalesce(col("bhsum"), lit(0.0))).as("hsum"),
        lit(rangeSec.toDouble).as("rsec"))

  /** Component-wise NHCB sum — Prometheus refuses to aggregate
    * custom-bucket histograms with MISMATCHED ladders; the guard rides
    * the bounds column so it fires exactly when a consumer reads the
    * mixed sum. Empty `by` sums everything (the hidden-key trick). */
  private[graft] def sumNhcb(h0: DataFrame, by: Seq[String]): DataFrame = {
    val h = withNhcbDefaults(h0)
    val keys = if (by.nonEmpty) by else Seq("__g")
    val base = if (by.nonEmpty) h else h.withColumn("__g", lit(1))
    val kcols = keys.map(col)
    // width-generic element-wise bucket sum: positions explode, sum
    // per (keys, position), reassemble sorted — the in-group ladders
    // are identical by the guard below, so positions align
    val bsum = base
      .select(kcols :+ posexplode(col("bcum")).as(Seq("__i", "__c")): _*)
      .groupBy((keys :+ "__i").map(col): _*)
      .agg(sum(col("__c")).as("__cs"))
      .groupBy(kcols: _*)
      .agg(expr("transform(array_sort(collect_list(struct(__i, __cs)))," +
        " x -> x.__cs)").as("bcum"))
    base.groupBy(kcols: _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("hsum")).as("hsum"),
        min(col("bounds")).as("__bmin"), max(col("bounds")).as("__bmax"),
        min(col("rsec")).as("__rmin"), max(col("rsec")).as("__rmax"))
      .join(bsum, keys)
      .withColumn("bounds",
        when(col("__bmin") =!= col("__bmax"),
          raise_error(lit("sum over NHCB histograms with mismatched " +
            "custom bucket ladders")).cast(s"array<double>"))
          .otherwise(col("__bmin")))
      // like sumHists: the guard rides rsec so it fires exactly when a
      // consumer (count/sum) reads the scale of a mixed-range sum
      .withColumn("rsec",
        when(col("__rmin") =!= col("__rmax"),
          raise_error(lit("sum over NHCB histograms with mixed rate " +
            "ranges")))
          .otherwise(col("__rmin")))
      .drop("__bmin", "__bmax", "__rmin", "__rmax")
  }

  // streaming twins / fixtures may hand frames without the round-12
  // hsum/rsec columns — they are instant (rsec 1) sum-less payloads
  private def withNhcbDefaults(h: DataFrame): DataFrame = {
    val a = if (h.columns.contains("hsum")) h
      else h.withColumn("hsum", lit(0.0))
    if (a.columns.contains("rsec")) a else a.withColumn("rsec", lit(1.0))
  }

  private val nhcbMeta = Set("bounds", "cnt", "bcum", "hsum", "rsec", "__g")
  private def nhcbLabels(h: DataFrame): Seq[String] =
    h.columns.filterNot(nhcbMeta).toSeq


  /** φ-quantile of an NHCB frame — the CLASSIC linear rule (B19's
    * exact formula and operation order, so the DuckDB oracle replays
    * it verbatim): first bucket with cum ≥ rank, lower bound 0 below
    * the ladder, rank past the last finite count returns the highest
    * finite bound. */
  private[graft] def quantileNhcb(h: DataFrame, q: Double): DataFrame = {
    val labels = nhcbLabels(h)
    // width-generic bucket selection (round 12 s3): the hit index is
    // the count of cumulative entries strictly below the rank (bcum is
    // nondecreasing), computed per row over the metric's OWN ladder —
    // the interpolation expression keeps the exact classic operand
    // order, so the DuckDB oracle replays it verbatim at any width
    val staged = h
      .withColumn("__rk", col("cnt") * lit(q))
      .withColumn("__n", size(col("bounds")))
      .withColumn("__qi",
        expr("size(filter(bcum, c -> c < __rk))"))
    val lo = expr("if(__qi = 0, 0.0d, element_at(bounds, __qi))")
    val up = expr("element_at(bounds, __qi + 1)")
    val cPrev = expr("if(__qi = 0, 0.0d, element_at(bcum, __qi))")
    val cHit = expr("element_at(bcum, __qi + 1)")
    val interp = when(col("__qi") >= col("__n"),
      element_at(col("bounds"), size(col("bounds"))))
      .otherwise(lo + (col("__rk") - cPrev) / (cHit - cPrev) * (up - lo))
    staged.select(labels.map(col) :+
      when(col("cnt") <= 0, lit(Double.NaN)).otherwise(interp)
        .as("value"): _*)
  }

  /** Interpolated cumulative count F(x) under the CLASSIC linear rule
    * — the custom-bucket twin of [[interpCumAt]]: position within the
    * containing bucket is linear in value; x at-or-beyond the highest
    * finite bound counts everything (+Inf carries no width to
    * interpolate into). */
  // F(x) with the hit index pre-staged in `idxCol` (the count of
  // bounds strictly below x — width-generic, classic operand order)
  private def nhcbCumAtIdx(x: Double, idxCol: String): Column = {
    require(x >= 0, s"histogram_fraction bound $x < 0: custom-bucket " +
      "ladders here are non-negative")
    val lo = expr(s"if($idxCol = 0, 0.0d, element_at(bounds, $idxCol))")
    val up = expr(s"element_at(bounds, $idxCol + 1)")
    val cPrev = expr(s"if($idxCol = 0, 0.0d, element_at(bcum, $idxCol))")
    val cHit = expr(s"element_at(bcum, $idxCol + 1)")
    when(col(idxCol) >= size(col("bounds")), col("cnt"))
      .otherwise(cPrev + (lit(x) - lo) / (up - lo) * (cHit - cPrev))
  }

  /** histogram_fraction over NHCB: (F(hi) − F(lo)) / count, classic
    * linear interpolation (round 12 — parity with the exponential
    * model's [[fractionOf]]). */
  private[graft] def fractionNhcb(h0: DataFrame, lo: Double,
      hi: Double): DataFrame = {
    val labels = nhcbLabels(h0)
    val h = withNhcbDefaults(h0)
      .withColumn("__fh",
        expr(s"size(filter(bounds, b -> b < cast('$hi' as double)))"))
      .withColumn("__fl",
        expr(s"size(filter(bounds, b -> b < cast('$lo' as double)))"))
    h.select(labels.map(col) :+
      when(col("cnt") <= 0, lit(Double.NaN))
        .otherwise(
          (nhcbCumAtIdx(hi, "__fh") - nhcbCumAtIdx(lo, "__fl")) /
            col("cnt"))
        .as("value"): _*)
  }

  /** histogram_count/sum/avg/stddev/stdvar over NHCB (round 12):
    * count and sum see `rsec` (rate scale), avg and the moments are
    * scale-invariant. stddev/stdvar use ARITHMETIC bucket midpoints
    * ((lo+up)/2 — custom buckets are linear, unlike the exponential
    * ladder's geometric midpoints), the +Inf bucket collapsing to the
    * highest finite bound, zero-width mass at the mean contributing 0
    * — the classic-histogram convention. */
  private[graft] def statNhcb(h0: DataFrame, name: String): DataFrame = {
    val h = withNhcbDefaults(h0)
    val lcols = nhcbLabels(h).map(col)
    name match {
      case "histogram_count" =>
        h.select(lcols :+ (col("cnt") / col("rsec")).as("value"): _*)
      case "histogram_sum" =>
        h.select(lcols :+ (col("hsum") / col("rsec")).as("value"): _*)
      case "histogram_avg" =>
        h.select(lcols :+ (col("hsum") / col("cnt")).as("value"): _*)
      case _ =>
        val mean = col("hsum") / col("cnt")
        // width-generic: per-bucket terms built over the metric's own
        // ladder with an indexed transform, summed left-to-right by
        // aggregate() — the same association order as the old
        // fixed-width reduce, so IEEE sums are identical
        val finiteSum = expr(
          """aggregate(
            |  transform(sequence(1, size(bounds)), i ->
            |    (element_at(bcum, i) -
            |       if(i = 1, 0.0d, element_at(bcum, i - 1))) *
            |    (((if(i = 1, 0.0d, element_at(bounds, i - 1)) +
            |        element_at(bounds, i)) / 2.0d) - __mean) *
            |    (((if(i = 1, 0.0d, element_at(bounds, i - 1)) +
            |        element_at(bounds, i)) / 2.0d) - __mean)),
            |  0.0d, (acc, t) -> acc + t)""".stripMargin)
        val infTerm =
          (col("cnt") - expr("element_at(bcum, size(bcum))")) *
            (expr("element_at(bounds, size(bounds))") - col("__mean")) *
            (expr("element_at(bounds, size(bounds))") - col("__mean"))
        val varCol = (finiteSum + infTerm) / col("cnt")
        val withVar = h.withColumn("__mean", mean).withColumn("__var", varCol)
        if (name == "histogram_stdvar")
          withVar.select(lcols :+ col("__var").as("value"): _*)
        else withVar.select(lcols :+ sqrt(col("__var")).as("value"): _*)
    }
  }

  /** The NHCB gate surfaces — since round 12 these are thin forms over
    * [[evalNhcb]], so the gates exercise the SHARED PromQL grammar
    * (parse → histogram-valued inner → function math), exactly like
    * the exponential model's [[eval]]. */
  def nhcbQuantile(spark: SparkSession, dir: String, q: Double,
      t: String): DataFrame =
    evalNhcb(spark, dir, s"""histogram_quantile($q, {typ=~".*"})""", t)

  def nhcbRateQuantile(spark: SparkSession, dir: String, q: Double,
      t: String, rangeSec: Long): DataFrame =
    evalNhcb(spark, dir,
      s"""histogram_quantile($q, rate({typ=~".*"}[${rangeSec}s]))""", t)

  def nhcbSumQuantile(spark: SparkSession, dir: String, q: Double,
      t: String): DataFrame =
    evalNhcb(spark, dir,
      s"""histogram_quantile($q, sum({typ=~".*"}))""", t)

  /** Round 12: evaluate an NHCB PromQL expression (the SHARED grammar
    * — [[PromQl.parse]]) as an instant query at `t`: the same
    * expression class as the exponential [[eval]] — one more
    * sample-model source, exactly the architecture note at [[eval]].
    * `histogram_quantile/fraction/count/sum/avg/stddev/stdvar` over an
    * instant selector, `rate(sel[d])`, or `sum [by (...)]` of either.
    * `perMetric = true` serves the [[nhcbLadders]] corpus (each metric
    * its own bound ladder; cross-ladder sums refuse at read). */
  def evalNhcb(spark: SparkSession, dir: String, exprStr: String,
      t: String, corpus: String = "uniform"): DataFrame = {
    val tSec = tSecOf(t)
    def inner(e: Expr): DataFrame =
      Memo.cached(spark, s"nativehist.nhcbinner:$corpus:$tSec:$e:$dir") {
        val samples = nhcbCorpus(spark, dir, corpus)
        e match {
          case Sel(ms, None, 0, None, None) =>
            nhcbAtFrom(samples, tSec).filter(matcherPred(ms))
          case Func("rate", Sel(ms, Some(r), 0, None, None), None) =>
            nhcbRateFrom(samples, tSec, r).filter(matcherPred(ms))
          case Agg("sum", by, Seq(), arg, None, None) =>
            sumNhcb(inner(arg), by)
          case other => sys.error(s"NHCB argument must be an instant " +
            s"selector, rate(sel[d]), or sum by (...) of either, got $other")
        }
      }
    val out = PromQl.parse(exprStr) match {
      case Func("histogram_quantile", arg, Some(q)) =>
        quantileNhcb(inner(arg), q)
      case HistFrac(lo, hi, arg) => fractionNhcb(inner(arg), lo, hi)
      case Func(n, arg, None) if PromQl.nativeHistFuncs(n) =>
        statNhcb(inner(arg), n)
      case other => sys.error(s"not an NHCB histogram expression: $other")
    }
    if (out.columns.contains("__g")) out.drop("__g") else out
  }

  /** RANGE-query form over NHCB (round 12 — the /query_range twin of
    * [[evalNhcb]], mirroring the exponential [[evalRange]]): the same
    * expression class evaluated at every grid step, `t_sec` riding as
    * one more label through the label-generic evaluators — one plan
    * for the whole grid, rate as one shifted self-join. Composes with
    * the per-metric ladder corpus. */
  /** Corpus selector: "uniform" (one ladder), "perMetric" (the
    * fixed-width registry), "var" (variable-length ladders). */
  private def nhcbCorpus(spark: SparkSession, dir: String,
      corpus: String): DataFrame = corpus match {
    case "uniform" => nhcbSamples(spark, dir)
    case "perMetric" => nhcbSamplesLadders(spark, dir)
    case "var" => nhcbSamplesVar(spark, dir)
    case other => sys.error(s"unknown NHCB corpus '$other' " +
      "(uniform | perMetric | var)")
  }

  def evalRangeNhcb(spark: SparkSession, dir: String, exprStr: String,
      start: String, end: String, stepSec: Long,
      corpus: String = "uniform"): DataFrame = {
    val (su, eu) = (tSecOf(start), tSecOf(end))
    require(stepSec > 0 && eu >= su, "need end >= start and step > 0")
    val grid: Seq[Long] = (su to eu by stepSec)
    val samples = nhcbCorpus(spark, dir, corpus)
    // memoized per (corpus, grid, expr, dataset) — the evalRange
    // discipline above: a sum-under-quantile reads its input from
    // several branches, and the cached frame is ∝ series × grid points
    def inner(e: Expr): DataFrame = Memo.cached(spark,
      s"nativehist.nhcbrangeinner:$corpus:$su:$eu:$stepSec:$e:$dir") {
      e match {
        case Sel(ms, None, 0, None, None) =>
          nhcbAtGrid(samples, grid, 0L).filter(matcherPred(ms))
        case Func("rate", Sel(ms, Some(r), 0, None, None), None) =>
          nhcbDiffGrid(
            nhcbAtGrid(samples, grid, 0L).filter(matcherPred(ms)),
            nhcbAtGrid(samples, grid, r).filter(matcherPred(ms)), r)
        case Agg("sum", by, Seq(), arg, None, None) =>
          sumNhcb(inner(arg),
            if (by.contains("t_sec")) by else by :+ "t_sec")
        case other => sys.error(s"NHCB range argument must be a " +
          s"selector, rate(sel[d]), or sum by (...), got $other")
      }
    }
    val out = PromQl.parse(exprStr) match {
      case Func("histogram_quantile", arg, Some(q)) =>
        quantileNhcb(inner(arg), q)
      case HistFrac(lo, hi, arg) => fractionNhcb(inner(arg), lo, hi)
      case Func(n, arg, None) if PromQl.nativeHistFuncs(n) =>
        statNhcb(inner(arg), n)
      case other => sys.error(s"not an NHCB histogram expression: $other")
    }
    if (out.columns.contains("__g")) out.drop("__g") else out
  }

  /** The four-stat dashboard row per series over NHCB (round 12) —
    * [[statsAll]]'s custom-bucket twin, every column through the
    * parser. */
  def nhcbStatsAll(spark: SparkSession, dir: String, sel: String,
      t: String): DataFrame = {
    def f(fn: String) = evalNhcb(spark, dir, s"$fn($sel)", t)
    f("histogram_count").withColumnRenamed("value", "h_count")
      .join(f("histogram_sum").withColumnRenamed("value", "h_sum"), Seq("typ"))
      .join(f("histogram_avg").withColumnRenamed("value", "h_avg"), Seq("typ"))
      .join(f("histogram_stddev").withColumnRenamed("value", "h_stddev"),
        Seq("typ"))
      .select(col("typ"), col("h_count").cast("long").as("h_count"),
        col("h_sum"), r4(col("h_avg")).as("h_avg"),
        r4(col("h_stddev")).as("h_stddev"))
  }

  private def tSecOf(t: String): Long =
    java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)

  // ---------------- the language hook ----------------


  /** Evaluate a native-histogram PromQL expression (parsed by
    * [[PromQl.parse]] — the shared grammar) as an instant query at
    * `t`. Supported shapes: `histogram_quantile(φ, H)`,
    * `histogram_fraction(lo, hi, H)`, `histogram_count/sum/avg/
    * stddev/stdvar(H)`, where H is a histogram-valued expression:
    * an instant selector over the native sample series, `rate(sel[d])`
    * of it, or `sum [by (...)]` of either — the
    * `histogram_quantile(φ, sum(rate(h[5m])))` dashboard shape.
    */
  def eval(spark: SparkSession, dir: String, exprStr: String,
      t: String, mixed: Boolean = false): DataFrame = {
    val tSec = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)
    // the inner histogram FRAME is memoized per (expression, instant):
    // a dashboard serves several panels from one evaluated histogram
    // (quantile + count in promql_native_agg/rate, FOUR stats in
    // statsAll), and the frames are tiny (∝ matched series) — one
    // pinned copy ends the rebuild-per-panel cost
    def inner(e: Expr): DataFrame =
      Memo.cached(spark, s"nativehist.inner:$mixed:$tSec:$e:$dir") {
        e match {
          case Sel(ms, None, 0, None, None) =>
            histAt(spark, dir, ms, tSec, mixed)
          case Func("rate", Sel(ms, Some(r), 0, None, None), None) =>
            histRate(spark, dir, ms, tSec, r, mixed)
          case Agg("sum", by, Seq(), arg, None, None) =>
            sumHists(inner(arg), by)
          case other => sys.error(s"native-histogram argument must be " +
            s"an instant selector, rate(sel[d]), or sum by (...) of " +
            s"either, got $other")
        }
      }
    val out = PromQl.parse(exprStr) match {
      case Func("histogram_quantile", arg, Some(q)) => quantileOf(inner(arg), q)
      case HistFrac(lo, hi, arg) => fractionOf(inner(arg), lo, hi)
      case Func(n, arg, None) if PromQl.nativeHistFuncs(n) =>
        statOf(inner(arg), n)
      case other => sys.error(s"not a native-histogram expression: $other")
    }
    if (out.columns.contains("__g")) out.drop("__g") else out
  }

  /** RANGE-query form (the /query_range panel over native histograms):
    * the same expression class evaluated at every grid step
    * start + i·step ≤ end, emitted with a `t_sec` column. Because the
    * evaluators are label-generic, the per-step histograms just carry
    * t_sec as one more key — one plan for the whole grid, no
    * per-timestamp re-scan (grid selection is an equi-join on the
    * hourly sample grid; rate is one shifted self-join).
    */
  def evalRange(spark: SparkSession, dir: String, exprStr: String,
      start: String, end: String, stepSec: Long,
      mixed: Boolean = false): DataFrame = {
    def sec(s: String) = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val (su, eu) = (sec(start), sec(end))
    require(stepSec > 0 && eu >= su, "need end >= start and step > 0")
    val grid: Seq[Long] = (su to eu by stepSec)
    // round 14 (optimization): memoize each inner histogram frame per
    // (grid, expr, dataset) — the SAME discipline the instant path has
    // always used (`nativehist.inner:` below). Without it, a
    // sum-by-under-quantile range query evaluated the rate subtree
    // (two grid scans + the counter-diff join) once PER CONSUMING
    // BRANCH: sumHists alone reads its input three times (target
    // schema, bucket fold, scalar fold). The cached frame is tiny —
    // ∝ series × grid points — and the quantile/stat math on top stays
    // live per run. promql_native_agg 1.43 → see OPTIMIZATION_r14.md.
    def inner(e: Expr): DataFrame = Memo.cached(spark,
      s"nativehist.rangeinner:$mixed:$su:$eu:$stepSec:$e:$dir") {
      e match {
        case Sel(ms, None, 0, None, None) =>
          histAtGrid(spark, dir, ms, grid, 0L, mixed)
        case Func("rate", Sel(ms, Some(r), 0, None, None), None) =>
          histDiff(histAtGrid(spark, dir, ms, grid, 0L, mixed),
            histAtGrid(spark, dir, ms, grid, r, mixed), Seq("typ", "t_sec"), r)
        case Agg("sum", by, Seq(), arg, None, None) =>
          sumHists(inner(arg), if (by.contains("t_sec")) by
            else by :+ "t_sec")
        case other => sys.error(s"native-histogram range argument must " +
          s"be a selector, rate(sel[d]), or sum by (...), got $other")
      }
    }
    val out = PromQl.parse(exprStr) match {
      case Func("histogram_quantile", arg, Some(q)) => quantileOf(inner(arg), q)
      case HistFrac(lo, hi, arg) => fractionOf(inner(arg), lo, hi)
      case Func(n, arg, None) if PromQl.nativeHistFuncs(n) =>
        statOf(inner(arg), n)
      case other => sys.error(s"not a native-histogram expression: $other")
    }
    if (out.columns.contains("__g")) out.drop("__g") else out
  }

  /** The four-stat dashboard row per series (count, sum, avg, stddev)
    * — one frame for the gate; each column is the corresponding
    * histogram_* function. */
  def statsAll(spark: SparkSession, dir: String, sel: String,
      t: String): DataFrame = {
    def f(fn: String) = eval(spark, dir, s"$fn($sel)", t)
    f("histogram_count").withColumnRenamed("value", "h_count")
      .join(f("histogram_sum").withColumnRenamed("value", "h_sum"), Seq("typ"))
      .join(f("histogram_avg").withColumnRenamed("value", "h_avg"), Seq("typ"))
      .join(f("histogram_stddev").withColumnRenamed("value", "h_stddev"),
        Seq("typ"))
      .select(col("typ"), col("h_count").cast("long").as("h_count"),
        col("h_sum"), r4(col("h_avg")).as("h_avg"),
        r4(col("h_stddev")).as("h_stddev"))
  }
}
