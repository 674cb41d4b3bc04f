package graft.tsdb

import graft.Tables
import graft.index.TagIndex
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** PromQL-flavoured analytics over the tag-indexed sample stream
  * (SURVEY.md §2.B) — what a user of the reference's Prometheus
  * adapter (/root/reference/include/tagtree/adapters/prom/querier.h)
  * computes downstream of select().
  *
  * All operators are per-series window or groupBy compositions:
  * one shuffle on (tsid) or (bucket), partial-agg friendly, no
  * driver-side iteration. At 100 TB the sample table is partitioned
  * by date and bucketed by tsid, so per-series windows are sort-only
  * within buckets and bucket aggs shuffle pre-combined rows.
  */
object Tsdb {

  private def idx(spark: SparkSession, dir: String): TagIndex =
    TagIndex.forEvents(spark, dir)

  private val hourSec = unix_timestamp(date_trunc("hour", col("ts"))).as("hour_sec")

  /** Input / output rows of the holt_winters streaming fold (top-level
    * visibility: Dataset encoders codegen against these classes).
    */
  case class HwRow(tsid: Long, usr: String, typ: String,
      us: Long, eid: Long, v: Double)
  case class HwOut(usr: String, typ: String, n: Long, hw: Double)

  /** B2: SeriesIterator.seek(t) (storage.h:15) as a set operation —
    * for every series, the first sample at-or-after t.
    */
  def seriesSeek(spark: SparkSession, dir: String): DataFrame = {
    val t0 = lit("2024-01-15 00:00:00").cast("timestamp")
    val w = Window.partitionBy(col("tsid")).orderBy(col("ts"), col("event_id"))
    idx(spark, dir).labeled
      .filter(col("ts") >= t0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("usr"), col("typ"),
        unix_timestamp(col("ts")).as("ts_sec"), round(col("value"), 2).as("value"))
  }

  /** B3: instant aggregation by label per hour bucket (sum/avg/count by).
    * avg is rounded via floor(x*1e4 + 0.5)/1e4 — pure IEEE ops that both
    * engines evaluate identically, unlike round(), whose half-tie
    * handling differs (Spark shortest-string HALF_UP vs DuckDB binary).
    */
  def aggByLabel(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .groupBy(col("typ"), hourSec)
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_v"),
        (floor(avg(col("value")) * 10000 + 0.5) / 10000).as("avg_v"))

  /** B4: rate() — per-series cumulative counter, per-hour increase over
    * elapsed time. The cumsum is an ordered window (deterministic
    * summation order on both engines); the per-hour delta is
    * max(cum)-min(cum) over the bucket.
    */
  def rate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("tsid")).orderBy(col("ts"), col("event_id"))
    idx(spark, dir).labeled
      .withColumn("cum", sum(col("value")).over(w))
      .withColumn("us", unix_micros(col("ts")))
      .groupBy(col("usr"), col("typ"), hourSec)
      .agg(count(lit(1)).as("n"), max(col("cum")).as("cmax"),
        min(col("cum")).as("cmin"), max(col("us")).as("umax"), min(col("us")).as("umin"))
      .filter(col("n") >= 2)
      .select(col("usr"), col("typ"), col("hour_sec"), col("n"),
        round((col("cmax") - col("cmin")) / ((col("umax") - col("umin")) / lit(1e6)), 4)
          .as("rate"))
  }

  /** B39: extrapolated rate — the boundary-extrapolation algorithm
    * behind Prometheus's real rate()/increase() (public semantics:
    * promql/functions.go extrapolatedRate). B4's first-to-last slope
    * systematically underestimates the per-range increase when samples
    * don't land exactly on the bucket edges, so the sampled delta is
    * scaled out toward the edges — but by at most half an average
    * sample interval per side (edge gaps beyond 1.1x the average
    * interval are treated as series start/end), and never past the
    * counter's zero point.
    *
    * Every term is an algebraic function of five per-bucket aggregates
    * (n, first/last cum, first/last ts), so the plan is B4's plan: one
    * per-series cumsum window + one partial-agg groupBy. The arithmetic
    * is written in the same operation order as the DuckDB oracle so
    * both engines produce bit-identical doubles before the dyadic
    * floor(x*1e6+0.5) quantization.
    */
  def rateExtrapolated(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("tsid")).orderBy(col("ts"), col("event_id"))
    val sampled = (col("umax") - col("umin")) / lit(1e6)
    val delta = col("cmax") - col("cmin")
    val avgIv = sampled / (col("n") - lit(1))
    val thresh = avgIv * lit(1.1)
    val dStart0 = col("umin") / lit(1e6) - col("hour_sec")
    val dEnd = (col("hour_sec") + lit(3600)) - col("umax") / lit(1e6)
    // counter zero-point cap: extrapolating the window start further
    // back than where the (synthetic) counter hits zero is nonsense
    val dStart = when(delta > 0 && col("cmin") >= 0,
      least(dStart0, sampled * (col("cmin") / delta))).otherwise(dStart0)
    val extrap = sampled +
      when(dStart < thresh, dStart).otherwise(avgIv / lit(2)) +
      when(dEnd < thresh, dEnd).otherwise(avgIv / lit(2))
    idx(spark, dir).labeled
      .withColumn("cum", sum(col("value")).over(w))
      .withColumn("us", unix_micros(col("ts")))
      .groupBy(col("usr"), col("typ"), hourSec)
      .agg(count(lit(1)).as("n"), max(col("cum")).as("cmax"),
        min(col("cum")).as("cmin"), max(col("us")).as("umax"), min(col("us")).as("umin"))
      .filter(col("n") >= 2 && col("umax") > col("umin"))
      .select(col("usr"), col("typ"), col("hour_sec"), col("n"),
        (floor(delta * (extrap / sampled) / lit(3600) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("rate_x"))
  }

  /** B5: *_over_time — the full PromQL trailing-range stat set
    * (avg/sum/min/max/count/stddev) over a 1h range window per series.
    * stddev is sample stddev (NULL on 1-row windows in both engines);
    * its rounding uses the floor(x*1e4+0.5)/1e4 form so half-ties
    * resolve identically to the oracle.
    */
  def overTime(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("tsid")).orderBy(col("ts_sec"))
      .rangeBetween(-3600, Window.currentRow)
    idx(spark, dir).labeled
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("avg_1h", round(avg(col("value")).over(w), 4))
      .withColumn("sum_1h", round(sum(col("value")).over(w), 2))
      .withColumn("min_1h", round(min(col("value")).over(w), 2))
      .withColumn("max_1h", round(max(col("value")).over(w), 2))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sd_1h", floor(stddev(col("value")).over(w) * 10000 + 0.5) / 10000)
      .select(col("event_id"), col("usr"), col("typ"), col("ts_sec"),
        col("avg_1h"), col("sum_1h"), col("min_1h"), col("max_1h"),
        col("n_1h"), col("sd_1h"))
  }

  /** B29: quantile_over_time / last_over_time — the order-statistic
    * half of the PromQL trailing-range set (B5 covers the moments).
    * Exact per-window percentiles (linear interpolation, matching
    * DuckDB's quantile_cont — the same parity as B7); last_over_time
    * picks the window's newest sample with an explicit (ts, event_id)
    * key, so same-second ties resolve identically in any engine
    * (PromQL timestamps are unique per series; the key makes the gate
    * deterministic anyway). At 100 TB: same shuffle as B5 — one
    * hash-partition by series, windows evaluated within partitions.
    */
  def overTimeQuantile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("tsid")).orderBy(col("ts_sec"))
      .rangeBetween(-3600, Window.currentRow)
    idx(spark, dir).labeled
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      // events carry < 10^7 ids, so ts·10^7 + id is a collision-free
      // "newest sample, ties by id" ordering key that fits a long
      .withColumn("ordk", col("ts_sec") * lit(10000000L) + col("event_id"))
      .withColumn("p50_1h",
        floor(expr("percentile(value, 0.5D)").over(w) * 10000 + 0.5) / 10000)
      .withColumn("p90_1h",
        floor(expr("percentile(value, 0.9D)").over(w) * 10000 + 0.5) / 10000)
      .withColumn("last_1h", expr("max_by(value, ordk)").over(w))
      .select(col("event_id"), col("usr"), col("typ"), col("ts_sec"),
        col("p50_1h"), col("p90_1h"), col("last_1h"))
  }

  /** B36: mad_over_time — median absolute deviation of sample values
    * per series per hour (PromQL mad_over_time, the robust-dispersion
    * counterpart of B5's stddev): mad = median(|v − median(v)|).
    * Two percentile aggregates bridged by an equi-join on the group
    * key — the join probe is the sample stream, the build side is
    * group-bounded (one median row per series-hour); no windows, so
    * both aggregations keep map-side partials for everything but the
    * percentile buffers themselves.
    */
  def madOverTime(spark: SparkSession, dir: String): DataFrame = {
    val hourly = idx(spark, dir).labeled
      .select(col("usr"), col("typ"), hourSec, col("value"))
    val med = hourly.groupBy(col("usr"), col("typ"), col("hour_sec"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
    hourly.join(med, Seq("usr", "typ", "hour_sec"))
      .groupBy(col("usr"), col("typ"), col("hour_sec"))
      .agg(count(lit(1)).as("n"),
        (floor(expr("percentile(abs(value - med), 0.5D)") * 10000 + 0.5) / 10000)
          .as("mad_1h"),
        (floor(max(col("med")) * 10000 + 0.5) / 10000).as("p50_1h"))
  }

  /** B30: deriv — per-series least-squares slope of value over time
    * (PromQL deriv), reported per hour so the 4-decimal gate keeps
    * real precision. Same single-pass regr_slope partial aggregate as
    * B17 (predict_linear), minus the extrapolation.
    */
  def deriv(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .withColumn("sec", unix_micros(col("ts")) / lit(1e6))
      .groupBy(col("usr"), col("typ"))
      .agg(count(lit(1)).as("n"), expr("regr_slope(value, sec)").as("slope"))
      .filter(col("n") >= 2 && col("slope").isNotNull)
      .select(col("usr"), col("typ"),
        (floor(col("slope") * 3600 * 10000 + 0.5) / 10000).as("deriv_1h"))

  /** B31: the PromQL scalar math surface (abs/ceil/floor/sqrt/sgn and
    * clamp/clamp_min/clamp_max) as one vectorized projection — every
    * op IEEE-exact (sqrt is correctly rounded), so the gate needs no
    * rounding at all. Stays inside whole-stage codegen: one scan, no
    * shuffle, the shape that matters when this projection runs over
    * 100 TB of samples.
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame = {
    val v = col("value") - lit(250.0) // center so abs/sgn/clamp all bite
    idx(spark, dir).labeled
      .select(col("event_id"), col("usr"), col("typ"),
        abs(v).as("abs_v"),
        ceil(v).as("ceil_v"),
        floor(v).as("floor_v"),
        sqrt(abs(v)).as("sqrt_v"),
        signum(v).as("sgn_v"),
        least(greatest(v, lit(-100.0)), lit(100.0)).as("clamp_v"),
        greatest(v, lit(0.0)).as("clamp_min_v"),
        least(v, lit(0.0)).as("clamp_max_v"))
  }

  /** B6: topk(3) series by hourly sum(value). Ordering key is the
    * *rounded* sum plus full label tiebreak, so ranking is
    * deterministic and engine-independent.
    *
    * Uses the bounded-heap TopKAgg instead of a row_number window: at
    * scale a window sorts every group's full row set, while the
    * aggregate carries ≤ k entries per group through partial
    * aggregation and the shuffle (graft.functions.TopKAgg).
    */
  def topk(spark: SparkSession, dir: String): DataFrame =
    topBottomK(spark, dir, asc = false)

  /** B6b: bottomk(3) — the ascending half of the same bounded-heap
    * aggregate: both directions carry ≤ k entries through partial agg
    * and the shuffle (no per-group window sort anywhere in B6).
    */
  def bottomk(spark: SparkSession, dir: String): DataFrame =
    topBottomK(spark, dir, asc = true)

  private def topBottomK(spark: SparkSession, dir: String, asc: Boolean): DataFrame = {
    val hourly = idx(spark, dir).labeled
      .groupBy(col("usr"), col("typ"), hourSec)
      .agg(round(sum(col("value")), 2).as("sum_v"))
    hourly.groupBy(col("hour_sec"))
      .agg(graft.functions.TopKAgg.column(spark,
        col("sum_v"), col("usr"), col("typ"), 3, asc).as("top"))
      .select(col("hour_sec"), posexplode(col("top")))
      .select(col("hour_sec"), (col("pos") + 1).as("rk"),
        col("col.a").as("usr"), col("col.b").as("typ"), col("col.v").as("sum_v"))
  }

  /** B7: exact interpolated quantiles of sample values per label. */
  def quantile(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .groupBy(col("typ"))
      .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))

  /** B24: quantile sketch — approx_percentile (Greenwald-Khanna
    * summary) per label: the mergeable-sketch scale path for B7's
    * exact quantiles (partial-agg friendly; memory bounded by the
    * accuracy parameter, not the group size). Accuracy is set above
    * the test-SF group sizes, where the summary stores every value and
    * the answer is the exact nearest-rank quantile — so the DuckDB
    * discrete-quantile oracle gates the full pipeline; at 100 TB the
    * same plan degrades gracefully to ε-approximate.
    */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .groupBy(col("typ"))
      .agg(expr("approx_percentile(value, array(0.5D, 0.9D, 0.99D), 1000000)").as("qs"))
      .select(col("typ"),
        round(element_at(col("qs"), 1), 4).as("p50"),
        round(element_at(col("qs"), 2), 4).as("p90"),
        round(element_at(col("qs"), 3), 4).as("p99"))

  /** B8: count_values — histogram of floor(value) per label. */
  def countValues(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .groupBy(col("typ"), floor(col("value")).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** B9: downsample/align — last sample value per series per 15-min step
    * (the gauge variant of the adapter's step-aligned iteration).
    */
  def downsample(spark: SparkSession, dir: String): DataFrame = {
    val step = (unix_timestamp(col("ts")) - (unix_timestamp(col("ts")) % 900)).as("step_sec")
    val w = Window.partitionBy(col("tsid"), col("step_sec"))
      .orderBy(col("ts").desc, col("event_id").desc)
    idx(spark, dir).labeled
      .withColumn("step_sec", step)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("usr"), col("typ"), col("step_sec"), round(col("value"), 2).as("last_v"))
  }

  /** B52 (round 9): gap-filled downsampling — the
    * `time_bucket_gapfill` / InfluxDB `fill()` query class a TSDB
    * serves for dashboards over sparse series: an hourly grid per
    * series (Jan 1-7 × the purchase series of usr ≤ 3), the observed
    * per-hour value (MAX — exact and order-free, no float-sum
    * surface), then two fills computed in the SAME keyed window pass:
    * LOCF (last observation carried forward — `last(ignoreNulls)` over
    * the preceding frame) and LINEAR interpolation between the
    * bracketing observations (prev/next value+hour via
    * ignore-nulls last/first over the two one-sided frames; null
    * outside the observed span, where interpolation is undefined).
    * One exchange on the series key carries grid join and all four
    * window columns; the grid is #series × 168 rows — tiny relative
    * to samples at any scale, and the fills never re-scan samples.
    */
  def gapfill(spark: SparkSession, dir: String): DataFrame = {
    val t0 = 1704067200L // 2024-01-01 00:00:00 UTC
    val endSec = t0 + 168L * 3600L
    // time range through Tables.tsBetween so the predicate lands on the
    // file-native time column (parquet row-group pruning in either
    // events encoding); end-1µs keeps the half-open [t0, end) semantics
    // under tsBetween's inclusive bound
    val raw = Tables.tsBetween(Tables.eventsRaw(spark, dir),
      timestamp_micros(lit(t0 * 1000000L)),
      timestamp_micros(lit(endSec * 1000000L - 1L)))
    val tsS = unix_timestamp(Tables.tsCol(raw))
    val ev = raw
      .filter(col("event_type") === "purchase" && col("user_id") <= 3)
      .select(col("user_id").cast("string").as("usr"),
        (tsS - pmod(tsS, lit(3600L))).as("h_sec"),
        col("value"))
    val obs = ev.groupBy(col("usr"), col("h_sec"))
      .agg(max(col("value")).as("mx"))
    val grid = ev.select(col("usr")).distinct()
      .withColumn("h_sec", explode(sequence(lit(t0), lit(t0 + 167L * 3600L),
        lit(3600L))))
    val wp = Window.partitionBy(col("usr")).orderBy(col("h_sec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("usr")).orderBy(col("h_sec"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def r4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4
    val obsH = when(col("mx").isNotNull, col("h_sec"))
    grid.join(obs, Seq("usr", "h_sec"), "left")
      .withColumn("pv", last(col("mx"), ignoreNulls = true).over(wp))
      .withColumn("ph", last(obsH, ignoreNulls = true).over(wp))
      .withColumn("nv", first(col("mx"), ignoreNulls = true).over(wf))
      .withColumn("nh", first(obsH, ignoreNulls = true).over(wf))
      .select(col("usr"), col("h_sec"),
        r4(col("mx")).as("observed"),
        r4(col("pv")).as("locf"),
        when(col("mx").isNotNull, r4(col("mx")))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            r4(col("pv") + (col("nv") - col("pv")) *
              ((col("h_sec") - col("ph")).cast("double") / (col("nh") - col("ph")))))
          .as("interp"))
  }

  /** B12: delta() — last minus first sample value per series per 6h
    * bucket (gauge delta). max_by/min_by keep it a single partial-agg
    * groupBy — no window, no second shuffle.
    */
  def delta(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (unix_timestamp(col("ts")) - (unix_timestamp(col("ts")) % 21600)).as("bucket_sec")
    idx(spark, dir).labeled
      .groupBy(col("usr"), col("typ"), bucket)
      .agg(count(lit(1)).as("n"),
        round(max_by(col("value"), col("ts")) - min_by(col("value"), col("ts")), 2).as("delta"))
      .filter(col("n") >= 2)
  }

  /** B13: irate() — instantaneous rate from the last two samples of
    * each series (PromQL irate at the range end).
    */
  def irate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("tsid")).orderBy(col("ts").desc, col("event_id").desc)
    idx(spark, dir).labeled
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col("usr"), col("typ"))
      .agg(count(lit(1)).as("n"),
        max_by(col("value"), col("ts")).as("v1"), min_by(col("value"), col("ts")).as("v0"),
        max(unix_micros(col("ts"))).as("u1"), min(unix_micros(col("ts"))).as("u0"))
      .filter(col("n") === 2 && col("u1") > col("u0"))
      .select(col("usr"), col("typ"),
        round(abs(col("v1") - col("v0")) / ((col("u1") - col("u0")) / lit(1e6)), 4).as("irate"))
  }

  /** B14: resets() — count of value decreases per series (counter reset
    * detection over the whole range).
    */
  def resets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("tsid")).orderBy(col("ts"), col("event_id"))
    idx(spark, dir).labeled
      .withColumn("__prev", lag(col("value"), 1).over(w))
      .groupBy(col("usr"), col("typ"))
      .agg(sum(when(col("value") < col("__prev"), 1).otherwise(0)).as("resets"))
  }

  /** B28: changes() — count of consecutive-sample value CHANGES per
    * series (any difference, vs resets() which counts only decreases).
    * Same one-window-one-groupBy shape as B14.
    */
  def changes(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("tsid")).orderBy(col("ts"), col("event_id"))
    idx(spark, dir).labeled
      .withColumn("__prev", lag(col("value"), 1).over(w))
      .groupBy(col("usr"), col("typ"))
      .agg(sum(when(col("__prev").isNotNull && col("value") =!= col("__prev"), 1)
        .otherwise(0)).as("changes"))
  }

  /** B15: label_replace + label_join — PromQL's label-manipulation
    * surface: rewrite typ through an anchored regex into a coarser
    * class, join labels into an instance id, re-aggregate.
    */
  def labelOps(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .withColumn("klass",
        regexp_replace(col("typ"), "^(click|view)$", "interaction"))
      .withColumn("instance", concat_ws(":", col("usr"), col("typ")))
      .groupBy(col("klass"))
      .agg(countDistinct(col("instance")).as("n_instances"),
        count(lit(1)).as("n_samples"),
        round(sum(col("value")), 2).as("sum_v"))

  /** B11: as-of join — every series' value as of fixed checkpoint
    * times (the set-form of iterator seek; graft.plans.AsOfJoin).
    */
  def asofCheckpoints(spark: SparkSession, dir: String): DataFrame = {
    val i = idx(spark, dir)
    val checkpoints = Seq("2024-01-05", "2024-01-10", "2024-01-15",
      "2024-01-20", "2024-01-25").map(d => lit(d + " 00:00:00").cast("timestamp"))
    val probes = i.seriesCatalog.select(col("usr"), col("typ"))
      .withColumn("pts", explode(array(checkpoints: _*)))
    graft.plans.AsOfJoin.asofJoin(
      i.labeled.select(col("usr"), col("typ"), col("ts"), col("value")),
      probes, Seq("usr", "typ"), "ts", "value", "pts")
      .select(col("usr"), col("typ"),
        unix_timestamp(col("pts")).as("pts_sec"),
        round(col("asof_value"), 2).as("v"))
  }

  /** B37: range-query grid evaluation — the Prom HTTP API's
    * `query_range` semantics (the adapter surface's other half beside
    * the instant `@` of B25): evaluate every series on a regular step
    * grid, each point carrying the latest sample at-or-before it,
    * DROPPED when that sample is older than the staleness horizon
    * (Prom marks the series stale and removes it from the vector).
    * One as-of join of the grid against the sample stream — grid
    * points are (#series × #steps) rows, never a per-step query loop.
    */
  def rangeEval(spark: SparkSession, dir: String): DataFrame = {
    val i = idx(spark, dir)
    val probes = i.seriesCatalog.select(col("usr"), col("typ"))
      .withColumn("pts", explode(expr(
        "sequence(timestamp'2024-01-10 00:00:00'," +
          " timestamp'2024-01-15 00:00:00', interval 1 hour)")))
    // same-µs ties resolve to the LAST WRITER (max event_id) before the
    // as-of join, so the winner is deterministic in both engines
    val samples = i.labeled
      .groupBy(col("usr"), col("typ"), col("ts"))
      .agg(expr("max_by(value, event_id)").as("value"))
    graft.plans.AsOfJoin.asofJoin(samples,
      probes, Seq("usr", "typ"), "ts", "value", "pts")
      .filter(col("asof_ts").isNotNull &&
        col("asof_ts") > col("pts") - expr("interval 2 hours"))
      .select(col("usr"), col("typ"), unix_timestamp(col("pts")).as("pts_sec"),
        round(col("asof_value"), 2).as("v"))
  }

  /** B16: hopping-window aggregation — 10-minute windows sliding by 5
    * (each sample lands in two windows). Same `window()` construct the
    * streaming path uses, here over the batch table.
    */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("typ"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(unix_timestamp(col("window.start")).as("win_start_sec"),
        col("typ"), col("n"), col("sum_v"))

  /** B17: predict_linear — per-series least-squares fit of value over
    * time, extrapolated 1h past the range end (PromQL predict_linear).
    * regr_slope/regr_intercept are single-pass partial aggregates.
    */
  def predictLinear(spark: SparkSession, dir: String): DataFrame = {
    val horizon = unix_timestamp(lit("2024-01-31 00:00:00").cast("timestamp")) + 3600
    idx(spark, dir).labeled
      .withColumn("sec", unix_micros(col("ts")) / lit(1e6))
      .groupBy(col("usr"), col("typ"))
      .agg(count(lit(1)).as("n"),
        expr("regr_slope(value, sec)").as("slope"),
        expr("regr_intercept(value, sec)").as("icept"))
      .filter(col("n") >= 2 && col("slope").isNotNull)
      .select(col("usr"), col("typ"),
        round(col("icept") + col("slope") * horizon, 2).as("predicted"))
  }

  /** B18: session windows — per-series activity sessions with a
    * 30-minute inactivity gap (the streaming `session_window` construct
    * over the batch table; oracle via gaps-and-islands SQL).
    */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .groupBy(session_window(col("ts"), "30 minutes"), col("usr"), col("typ"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(unix_timestamp(col("session_window.start")).as("sess_start_sec"),
        col("usr"), col("typ"), col("n"), col("sum_v"))

  /** B19: histogram_quantile — cumulative bucket counts over fixed
    * bounds (le ∈ {25,50,100,200,+Inf}) with PromQL's linear
    * interpolation inside the target bucket. Pure conditional
    * aggregation: one pass, partial-agg friendly.
    */
  def histogramQuantile(spark: SparkSession, dir: String): DataFrame = {
    val bounds = Seq(25.0, 50.0, 100.0, 200.0)
    def cum(b: Double) = sum(when(col("value") <= b, 1).otherwise(0)).as(s"c${b.toInt}")
    def interp(q: Double): Column = {
      val rank = col("total") * q
      val lowers: Seq[Double] = 0.0 +: bounds.dropRight(1)
      bounds.zip(lowers).foldRight(lit(bounds.last): Column) {
        case ((b: Double, lo: Double), rest: Column) =>
          val cPrev = if (lo == 0.0) lit(0) else col(s"c${lo.toInt}")
          when(col(s"c${b.toInt}") >= rank,
            lit(lo) + (rank - cPrev) / (col(s"c${b.toInt}") - cPrev) * (b - lo))
            .otherwise(rest)
      }
    }
    idx(spark, dir).labeled
      .groupBy(col("typ"))
      .agg(count(lit(1)).as("total"), cum(25), cum(50), cum(100), cum(200))
      .select(col("typ"), col("total"),
        round(interp(0.5), 4).as("hq50"), round(interp(0.9), 4).as("hq90"))
  }

  /** B38: histogram_fraction — B19's sibling: the fraction of
    * observations inside an arbitrary (lower, upper] value range,
    * linearly interpolated inside the buckets the range endpoints land
    * in (PromQL histogram_fraction over classic buckets). Same one-pass
    * conditional aggregation as B19 — the interpolation is pure
    * arithmetic over the cumulative counts, so fractions for any
    * number of ranges cost one scan total.
    */
  def histogramFraction(spark: SparkSession, dir: String): DataFrame = {
    // interpolated count ≤ x, for x inside static bucket (lo, b]
    def ic(x: Double, lo: Double, b: Double): Column = {
      val cPrev = if (lo == 0.0) lit(0) else col(s"c${lo.toInt}")
      cPrev + (lit(x) - lit(lo)) / (lit(b) - lit(lo)) * (col(s"c${b.toInt}") - cPrev)
    }
    def cum(b: Double) = sum(when(col("value") <= b, 1).otherwise(0)).as(s"c${b.toInt}")
    idx(spark, dir).labeled
      .groupBy(col("typ"))
      .agg(count(lit(1)).as("total"), cum(25), cum(50), cum(100), cum(200))
      .select(col("typ"), col("total"),
        (floor(ic(30.0, 25.0, 50.0) / col("total") * 10000 + 0.5) / 10000)
          .as("frac_le_30"),
        (floor((ic(150.0, 100.0, 200.0) - ic(30.0, 25.0, 50.0))
          / col("total") * 10000 + 0.5) / 10000).as("frac_30_150"))
  }

  /** B40: histogram_stats — histogram_count/sum/avg/stddev estimated
    * from classic bucket counters (the PromQL histogram_avg/
    * histogram_stddev family over the B19 bucket scheme): each bucket
    * contributes its count at its midpoint, the +Inf bucket at the
    * midpoint of (200, 500] (500 = the value domain's cap, the same
    * convention PromQL applies using the largest finite bound).
    *
    * Determinism: bucket counts are exact longs (conditional sums);
    * every midpoint and squared midpoint is exactly representable
    * (dyadic: 12.5, 37.5, 75, 150, 350), so the moment sums are exact
    * doubles evaluated in fixed textual order, and avg/stddev are one
    * divide + one IEEE sqrt — bit-identical across engines. Same
    * one-pass partial-agg shape as B19/B38.
    */
  def histogramStats(spark: SparkSession, dir: String): DataFrame = {
    def cum(b: Double) = sum(when(col("value") <= b, 1).otherwise(0)).as(s"c${b.toInt}")
    // per-bucket counts from the cumulative columns
    val b1 = col("c25"); val b2 = col("c50") - col("c25")
    val b3 = col("c100") - col("c50"); val b4 = col("c200") - col("c100")
    val b5 = col("total") - col("c200")
    val hSum = b1 * lit(12.5) + b2 * lit(37.5) + b3 * lit(75.0) +
      b4 * lit(150.0) + b5 * lit(350.0)
    val hSq = b1 * lit(156.25) + b2 * lit(1406.25) + b3 * lit(5625.0) +
      b4 * lit(22500.0) + b5 * lit(122500.0)
    val avg = hSum / col("total")
    idx(spark, dir).labeled
      .groupBy(col("typ"))
      .agg(count(lit(1)).as("total"), cum(25), cum(50), cum(100), cum(200))
      .select(col("typ"), col("total").as("h_count"), hSum.as("h_sum"),
        (floor(avg * 1000000 + 0.5) / 1000000).as("h_avg"),
        (floor(sqrt(hSq / col("total") - avg * avg) * 1000000 + 0.5) / 1000000)
          .as("h_stddev"))
  }

  /** B41: clamp / clamp_min / clamp_max / sgn — the PromQL value-
    * shaping functions (prometheus functions.md: clamp family + sgn),
    * evaluated per sample. All four are pure IEEE comparisons/copies
    * on the raw double (no arithmetic at all), so parity is trivial
    * and the map stage stays inside whole-stage codegen with zero
    * shuffle — the same no-exchange contract as F22's filter.
    */
  def clampFuncs(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("event_id"), col("value"),
        least(greatest(col("value"), lit(50.0)), lit(200.0)).as("v_clamp"),
        greatest(col("value"), lit(50.0)).as("v_clamp_min"),
        least(col("value"), lit(200.0)).as("v_clamp_max"),
        signum(col("value") - lit(100.0)).as("sgn"))

  /** B20: holt_winters — PromQL double exponential smoothing
    * (sf=0.3, tf=0.1) per series over the time-ordered sample stream,
    * emitting the final smoothed level.
    *
    * The recurrence is order-dependent and non-associative, so no
    * partial-aggregate merge can express it. Instead: hash-repartition
    * by tsid, secondary-sort within partitions by (us, eid), then a
    * streaming per-partition fold carrying ONLY (s, b) per open series
    * — a billion-sample series costs O(1) executor memory, unlike a
    * collect_list of the series. (mapPartitions is the right tool here:
    * the 100 TB layout buckets samples by tsid sorted by ts, making the
    * exchange free.) The DuckDB oracle runs the same shifted recurrence
    * through list_reduce with identical IEEE op order, so doubles match
    * bit-for-bit before rounding.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame =
    holtWintersOn(spark, idx(spark, dir).labeled)

  /** DataFrame-generic holt_winters; input needs (tsid, usr, typ, ts,
    * event_id, value). Exposed so the scale probe can drive the same
    * fold over replicated data.
    */
  def holtWintersOn(spark: SparkSession, labeled: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = labeled
      .select(col("tsid"), col("usr"), col("typ"),
        unix_micros(col("ts")).as("us"), col("event_id").as("eid"),
        col("value").as("v"))
      .repartition(col("tsid"))
      .sortWithinPartitions(col("tsid"), col("us"), col("eid"))
      .as[HwRow]
    val folded = rows.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer.empty[HwOut]
      // n == 0 is the explicit "no open series" test — a sentinel tsid
      // value could collide with a real series' xxhash64
      var cur = 0L
      var usr = ""; var typ = ""
      var s = 0.0; var b = 0.0; var n = 0L
      def close(): Unit = if (n > 0) out += HwOut(usr, typ, n, s)
      it.foreach { r =>
        if (n == 0L || r.tsid != cur) {
          close()
          cur = r.tsid; usr = r.usr; typ = r.typ
          s = r.v; b = 0.0; n = 1L
        } else {
          // identical op order to the oracle's list_reduce recurrence
          if (n == 1L) { b = r.v - s; s = r.v }
          else {
            val s2 = 0.3 * r.v + 0.7 * (s + b)
            b = 0.1 * (s2 - s) + 0.9 * b
            s = s2
          }
          n += 1L
        }
      }
      close()
      out.iterator
    }
    folded.toDF()
      .filter(col("n") >= 3)
      .select(col("usr"), col("typ"), col("n"), round(col("hw"), 4).as("hw"))
  }

  /** B20b: holt_winters with a seasonal term — additive triple
    * smoothing (α=0.3, β=0.1, γ=0.2, period 4 by sample index) per
    * series, emitting the final level and the one-step-ahead forecast
    * (s + b + c[next]). Seasonal components start at zero and the
    * level/trend recurrence degrades exactly to B20's double smoothing
    * when every c[j] stays 0, so the two operators share semantics.
    *
    * Same bounded-state contract as B20: the fold carries ONLY
    * (s, b, c[4]) per open series through one hash-repartition +
    * secondary sort — O(p) state per series, no collect_list. The
    * DuckDB oracle replays the identical IEEE op order through a
    * recursive CTE carrying the seasonal LIST, so doubles match
    * bit-for-bit before rounding.
    */
  def holtWintersSeasonal(spark: SparkSession, dir: String): DataFrame =
    holtWintersSeasonalOn(spark, idx(spark, dir).labeled)

  case class HwSeasOut(usr: String, typ: String, n: Long, hw: Double, fc: Double)

  def holtWintersSeasonalOn(spark: SparkSession, labeled: DataFrame): DataFrame = {
    import spark.implicits._
    val p = 4
    val rows = labeled
      .select(col("tsid"), col("usr"), col("typ"),
        unix_micros(col("ts")).as("us"), col("event_id").as("eid"),
        col("value").as("v"))
      .repartition(col("tsid"))
      .sortWithinPartitions(col("tsid"), col("us"), col("eid"))
      .as[HwRow]
    val folded = rows.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer.empty[HwSeasOut]
      var cur = 0L
      var usr = ""; var typ = ""
      var s = 0.0; var b = 0.0; var n = 0L
      var c = new Array[Double](p)
      def close(): Unit =
        if (n > 0) out += HwSeasOut(usr, typ, n, s, s + b + c((n % p).toInt))
      it.foreach { r =>
        if (n == 0L || r.tsid != cur) {
          close()
          cur = r.tsid; usr = r.usr; typ = r.typ
          s = r.v; b = 0.0; n = 1L; c = new Array[Double](p)
        } else {
          // identical op order to the oracle's recursive CTE
          val j = (n % p).toInt // 0-based index of THIS sample is n; season slot n mod p
          val s2 = 0.3 * (r.v - c(j)) + 0.7 * (s + b)
          b = 0.1 * (s2 - s) + 0.9 * b
          c(j) = 0.2 * (r.v - s2) + 0.8 * c(j)
          s = s2
          n += 1L
        }
      }
      close()
      out.iterator
    }
    folded.toDF()
      .filter(col("n") >= 6)
      .select(col("usr"), col("typ"), col("n"),
        round(col("hw"), 4).as("hw"), round(col("fc"), 4).as("fc"))
  }

  /** B22: PromQL subquery semantics — `max_over_time(rate(x[1h])[1d:1h])`:
    * the inner range function is step-evaluated (1h steps, each step's
    * rate = that hour's increase / 3600s), and the outer range function
    * aggregates the step series over a trailing 1d window (24 steps,
    * hour_sec range -82800..0). Two composed window/groupBy passes —
    * the subquery re-evaluation costs one extra hourly aggregate, never
    * a per-sample re-scan. Steps are evaluated where the series has
    * samples (sparse evaluation; the oracle mirrors this). The inner
    * step value is floor-rounded before the outer max so both engines
    * rank identical doubles.
    */
  def subqueryRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("usr"), col("typ")).orderBy(col("hour_sec"))
      .rangeBetween(-82800, Window.currentRow)
    idx(spark, dir).labeled
      .groupBy(col("usr"), col("typ"), hourSec)
      .agg(round(sum(col("value")), 2).as("sum_v"))
      .withColumn("rate_1h", floor(col("sum_v") / 3600 * 1000000 + 0.5) / 1000000)
      .withColumn("max_rate_1d", max(col("rate_1h")).over(w))
      .select(col("usr"), col("typ"), col("hour_sec"),
        col("rate_1h"), col("max_rate_1d"))
  }

  /** B25: PromQL `@` modifier — an instant vector pinned to a fixed
    * evaluation timestamp: for every series, the most recent sample at
    * or before T (with PromQL's staleness horizon: nothing older than
    * 5m before T). One filtered scan + max_by aggregate — the time
    * filter rides the raw ts_ns column into parquet row-group stats,
    * so at scale only the partitions around T are read.
    */
  def atModifier(spark: SparkSession, dir: String): DataFrame = {
    val t = lit("2024-01-20 12:00:00").cast("timestamp")
    val stale = lit("2024-01-20 00:00:00").cast("timestamp") // wide horizon: sparse series
    val i = idx(spark, dir)
    val window = Tables.tsBetween(i.labeled, stale, t)
    window.groupBy(col("usr"), col("typ"))
      .agg(unix_timestamp(max(col("ts"))).as("sample_ts_sec"),
        round(max_by(col("value"), struct(col("ts"), col("event_id"))), 2).as("value_at"))
  }

  /** B23: PromQL binary operation with vector matching —
    * `series_hourly / on(usr, hour) group_left user_hourly`: the many
    * side (per-series hourly sums, extra label typ) divides by the one
    * side (per-user all-type hourly sums) matched on (usr, hour).
    * One equi-join on the matching labels — the Spark form of PromQL's
    * label-matched vector arithmetic; group_left = the many side keeps
    * its extra labels through the join. Both vectors aggregate from
    * the same shuffle key prefix, so at scale the second aggregate
    * reuses the first's partitioning.
    */
  def binaryOp(spark: SparkSession, dir: String): DataFrame = {
    val l = idx(spark, dir).labeled
    val hourly = l.groupBy(col("usr"), col("typ"), hourSec)
      .agg(round(sum(col("value")), 2).as("sum_v"))
    val byUser = l.groupBy(col("usr"), hourSec)
      .agg(round(sum(col("value")), 2).as("user_v"))
    hourly.join(byUser, Seq("usr", "hour_sec"))
      .filter(col("user_v") =!= 0) // a share of a zero total is undefined
      .select(col("usr"), col("typ"), col("hour_sec"), col("sum_v"), col("user_v"),
        (floor(col("sum_v") / col("user_v") * 10000 + 0.5) / 10000).as("share"))
  }

  /** B26: PromQL logical/set binary operators — `and` / `or` /
    * `unless` with vector matching, the alerting set algebra the
    * reference's Prometheus adapter surface feeds (querier.h:14-24;
    * e.g. `hot_series and on(usr) errors`, `hot unless maintenance`).
    *
    * Instant vectors: A = per-series total sum_v above a threshold
    * (the `metric > T` filter vector), B = the 'error' series. Mapping
    * to Spark set joins, exactly PromQL's semantics:
    *  - `A and on(usr) B`   → left_semi join on the matched label —
    *    keep A entries whose usr has any B entry, values from A;
    *  - `A unless on(usr) B`→ left_anti join on usr;
    *  - `A or B`            → A plus the B entries whose FULL label
    *    set (usr, typ) has no A entry: union + left_anti.
    * All three are one hash join on the match labels; the B side of
    * and/unless is distinct label values only (broadcast-size in
    * practice: a maintenance/error series set, not samples).
    */
  def logicalOps(spark: SparkSession, dir: String): DataFrame = {
    val base = idx(spark, dir).labeled
      .groupBy(col("usr"), col("typ"))
      .agg(round(sum(col("value")), 2).as("sum_v"))
    val a = base.filter(col("sum_v") > 600)
    // B = the heavy-error series (the "maintenance/noisy" vector) —
    // selective on BOTH label and value so and/unless each keep a
    // nontrivial subset at every SF
    val bVec = base.filter(col("typ") === "error" && col("sum_v") > 750)
    val bKeys = broadcast(bVec.select(col("usr")).distinct())
    val andV = a.join(bKeys, Seq("usr"), "left_semi")
      .withColumn("op", lit("and"))
    val unlessV = a.join(bKeys, Seq("usr"), "left_anti")
      .withColumn("op", lit("unless"))
    val orV = a.unionByName(bVec.join(a, Seq("usr", "typ"), "left_anti"))
      .withColumn("op", lit("or"))
    andV.unionByName(unlessV).unionByName(orV)
      .select(col("op"), col("usr"), col("typ"), col("sum_v"))
  }

  /** B21: offset comparison — PromQL's `offset` modifier as day-over-
    * day deltas: each series' daily sum vs its value one day earlier
    * (lag window over day buckets).
    */
  def offsetCompare(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("usr"), col("typ")).orderBy(col("day"))
    idx(spark, dir).labeled
      .groupBy(col("usr"), col("typ"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(round(sum(col("value")), 2).as("sum_v"))
      .withColumn("prev_v", lag(col("sum_v"), 1).over(w))
      .filter(col("prev_v").isNotNull)
      .select(col("usr"), col("typ"), col("day"),
        col("sum_v"), col("prev_v"),
        round(col("sum_v") - col("prev_v"), 2).as("dod"))
  }

  /** B32: absent_over_time — step-evaluated presence per series: of
    * the hourly steps spanning the table's global range, how many have
    * at least one sample and how many are silent (the alerting dual of
    * absent(): per-series gap accounting instead of whole-selector
    * emptiness). One hourly aggregate + a broadcast 1-row span join —
    * no step grid is ever materialized, so the plan is independent of
    * range length (a year of hourly steps costs the same join).
    */
  def absentOverTime(spark: SparkSession, dir: String): DataFrame = {
    val l = idx(spark, dir).labeled
    val span = l.agg(
      unix_timestamp(date_trunc("hour", min(col("ts")))).as("h0"),
      unix_timestamp(date_trunc("hour", max(col("ts")))).as("h1"))
    l.groupBy(col("usr"), col("typ"))
      .agg(countDistinct(unix_timestamp(date_trunc("hour", col("ts")))).as("n_present"))
      .crossJoin(broadcast(span))
      .select(col("usr"), col("typ"), col("n_present"),
        (((col("h1") - col("h0")) / 3600).cast("long") + 1 - col("n_present"))
          .as("n_absent"))
  }

  /** B33: idelta() — signed difference of the last two samples of each
    * series (the gauge companion of B13's irate: same two-sample
    * window, no time division, sign preserved).
    */
  def idelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("tsid")).orderBy(col("ts").desc, col("event_id").desc)
    idx(spark, dir).labeled
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col("usr"), col("typ"))
      .agg(count(lit(1)).as("n"),
        max_by(col("value"), col("ts")).as("v1"), min_by(col("value"), col("ts")).as("v0"),
        max(unix_micros(col("ts"))).as("u1"), min(unix_micros(col("ts"))).as("u0"))
      .filter(col("n") === 2 && col("u1") > col("u0"))
      .select(col("usr"), col("typ"), round(col("v1") - col("v0"), 2).as("idelta"))
  }

  /** B34: the PromQL spread aggregators — stddev / stdvar (population
    * moments, as PromQL defines them) plus the `group`/`count`
    * membership pair, per label. One partial-agg groupBy; the moment
    * outputs use the floor-quantize gate (B3's avg rule) because
    * population variance is a ratio of order-summed doubles.
    */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .groupBy(col("typ"))
      .agg(countDistinct(col("usr")).as("n_series"),
        count(lit(1)).as("n_samples"),
        (floor(stddev_pop(col("value")) * 10000 + 0.5) / 10000).as("sd_pop"),
        (floor(var_pop(col("value")) * 100 + 0.5) / 100).as("var_pop"))
      .withColumn("grp", lit(1L))

  /** B35: the PromQL time-function surface — day_of_week (0=Sunday,
    * PromQL convention), hour, day_of_month, month, days_in_month of
    * the sample timestamp (UTC), aggregated to a calendar heat-map.
    * Pure codegen'd projections on the scan; the groupBy keys are
    * low-cardinality, so partial aggregation collapses everything
    * map-side.
    */
  def timeFuncs(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .select((dayofweek(col("ts")) - 1).as("dow"), hour(col("ts")).as("hr"),
        dayofmonth(col("ts")).as("dom"), month(col("ts")).as("mon"),
        dayofmonth(last_day(col("ts"))).as("dim"), col("value"))
      .groupBy(col("dow"), col("hr"), col("dom"), col("mon"), col("dim"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))

  /** B10: appender commit batch — day-partitioned ingest summary
    * (the parquet-layout analog of appender.h + WAL commit).
    */
  def ingestBatch(spark: SparkSession, dir: String): DataFrame =
    idx(spark, dir).labeled
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("typ"))
      .agg(count(lit(1)).as("n_samples"),
        countDistinct(col("usr")).as("n_series"),
        round(sum(col("value")), 2).as("sum_v"))
}
