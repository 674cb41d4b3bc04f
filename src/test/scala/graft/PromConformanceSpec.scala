package graft

import graft.index.TagIndex
import graft.promql.PromQl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prometheus-conformance fixtures (round 9, SURVEY §7 stretch).
  *
  * A hand-built sample set small enough that the Prometheus evaluation
  * rules (promql/functions.go, the documented extrapolation and
  * staleness semantics) can be applied BY HAND, giving exact expected
  * numbers to pin the evaluator against. This container has no network
  * and no Prometheus binary, so the fixtures are derived from the
  * published semantics rather than recorded from a live server — every
  * expected value below is annotated with its derivation, and every
  * INTENTIONAL divergence from Prometheus is asserted at graft's value
  * with the Prometheus-true value in the comment (the full divergence
  * table lives in SURVEY §2 B42 notes).
  *
  * Fixture series (base = 2024-01-01 00:00:00 UTC):
  *  - A = cnt{usr="1"}:   t = 0..600 step 60, v = 0,10,...,100 (counter,
  *    perfectly linear: v(t) = t/6)
  *  - B = cnt{usr="2"}:   t = 0..300 step 60, v = 0,5,10,2,7,12 (counter
  *    with one reset at the 10→2 step)
  *  - G = gauge{usr="1"}: t = 0..600 step 60,
  *    v = 5,3,8,1,6,4,9,2,7,0,11
  * Instant queries use lookback = 300 s — Prometheus's 5-minute
  * staleness window, exactly.
  */
class PromConformanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Lookback = 300L
  // eval points: T630 sees only series A/G (B is stale); T330 sees all
  private val T630 = "2024-01-01 00:10:30"
  private val T330 = "2024-01-01 00:05:30"
  private val BaseEpoch = 1704067200L

  lazy val idx: TagIndex = {
    import spark.implicits._
    val a = (0 to 10).map(i => (100L + i, i * 60L, i * 10.0, "1", "cnt"))
    val b = Seq(0.0, 5.0, 10.0, 2.0, 7.0, 12.0).zipWithIndex
      .map { case (v, i) => (200L + i, i * 60L, v, "2", "cnt") }
    val g = Seq(5.0, 3.0, 8.0, 1.0, 6.0, 4.0, 9.0, 2.0, 7.0, 0.0, 11.0)
      .zipWithIndex.map { case (v, i) => (300L + i, i * 60L, v, "1", "gauge") }
    val df = (a ++ b ++ g).toDF("event_id", "off", "value", "usr", "typ")
      .withColumn("ts", timestamp_seconds(lit(BaseEpoch) + col("off")))
      .drop("off")
    new TagIndex(df, Seq("usr", "typ"))
  }

  private def one(expr: String, t: String): Double = {
    val rows = PromQl.evalIndexed(idx, expr, t, Lookback).collect()
    assert(rows.length == 1, s"$expr at $t: expected 1 row, got ${rows.length}")
    rows.head.getAs[Double]("value")
  }
  private def byUsr(expr: String, t: String): Map[String, Double] =
    PromQl.evalIndexed(idx, expr, t, Lookback).collect()
      .map(r => r.getAs[String]("usr") -> r.getAs[Double]("value")).toMap

  test("instant selection and 5m staleness") {
    // A's last sample in [330, 630] is (600, 100)
    assert(one("""cnt{usr="1"}""", T630) == 100.0)
    // B's last sample (t=300) is outside the 5m lookback at T630 —
    // Prometheus staleness drops the series entirely
    assert(one("""count(cnt)""", T630) == 1.0)
    assert(byUsr("""cnt""", T330) == Map("1" -> 50.0, "2" -> 12.0))
    // offset re-anchors: window [270, 570] → last A sample (540, 90)
    assert(one("""cnt{usr="1"} offset 1m""", T630) == 90.0)
    // @ pins the window to epoch base+300: last sample (300, 50)
    assert(one(s"""cnt{usr="1"} @ ${BaseEpoch + 300}""", T630) == 50.0)
    // timestamp() is the sample's own epoch second
    assert(one("""timestamp(cnt{usr="1"})""", T630) == (BaseEpoch + 600).toDouble)
  }

  test("over_time folds match hand evaluation (window [330, 630])") {
    // G samples in window: (360,9),(420,2),(480,7),(540,0),(600,11)
    assert(one("""sum_over_time(gauge[5m])""", T630) == 29.0)
    assert(one("""avg_over_time(gauge[5m])""", T630) == 5.8)
    assert(one("""min_over_time(gauge[5m])""", T630) == 0.0)
    assert(one("""max_over_time(gauge[5m])""", T630) == 11.0)
    assert(one("""count_over_time(gauge[5m])""", T630) == 5.0)
    assert(one("""last_over_time(gauge[5m])""", T630) == 11.0)
  }

  test("counter functions: conformant idelta/changes/resets; documented non-extrapolated increase") {
    // idelta = last minus second-to-last: 11 - 0 (conformant)
    assert(one("""idelta(gauge[5m])""", T630) == 11.0)
    // changes: 9→2→7→0→11 = 4 transitions (conformant)
    assert(one("""changes(gauge[5m])""", T630) == 4.0)
    // resets over all of B: one counter reset at 10→2 (conformant)
    assert(one("""resets(cnt{usr="2"}[10m])""", T330) == 1.0)
    // DOCUMENTED DIVERGENCE — extrapolation: samples in [330, 630] are
    // (360,60)..(600,100); raw increase = 40. Prometheus extrapolates
    // to the window edges (30 s on each side < 1.1×avg interval 66 s):
    // 40 × 300/240 = 50. graft's promql layer is the raw ordered-delta
    // form; the extrapolated form is the standalone B39 operator.
    assert(one("""increase(cnt{usr="1"}[5m])""", T630) == 40.0)
    assert(math.abs(one("""rate(cnt{usr="1"}[5m])""", T630) - 40.0 / 300.0) < 1e-12)
    // DOCUMENTED DIVERGENCE — delta(gauge) is last−first = 11−9 = 2
    // here; Prometheus extrapolates gauges too (2 × 300/240 = 2.5)
    assert(one("""delta(gauge[5m])""", T630) == 2.0)
  }

  test("opt-in extrapolation (graft.promql.extrapolate): the parser's " +
      "increase/rate reproduce Prometheus's extrapolated values on the " +
      "divergence fixture") {
    spark.conf.set("graft.promql.extrapolate", "true")
    try {
      // the documented 40-vs-50 fixture: 30 s edge gaps < 1.1×avg
      // interval (66 s) → 40 × 300/240 = 50, Prometheus's number
      assert(one("""increase(cnt{usr="1"}[5m])""", T630) == 50.0)
      assert(math.abs(one("""rate(cnt{usr="1"}[5m])""", T630)
        - 50.0 / 300.0) < 1e-12)
    } finally spark.conf.unset("graft.promql.extrapolate")
    // and the default stays the raw ordered-delta form
    assert(one("""increase(cnt{usr="1"}[5m])""", T630) == 40.0)
  }

  test("regression functions on a perfectly linear counter are exact") {
    // A is v(t) = t/6 → slope 1/6 (regression is exact on a line,
    // extrapolation plays no role: conformant with Prometheus)
    assert(math.abs(one("""deriv(cnt{usr="1"}[5m])""", T630) - 1.0 / 6.0) < 1e-9)
    // predict_linear(v[5m], 60): value at eval time + 60 s = (630+60)/6
    assert(math.abs(one("""predict_linear(cnt{usr="1"}[5m], 60)""", T630) - 115.0) < 1e-9)
  }

  test("aggregation operators at T330 (both cnt series alive)") {
    assert(byUsr("""sum by (usr) (cnt)""", T330) == Map("1" -> 50.0, "2" -> 12.0))
    assert(one("""sum(cnt)""", T330) == 62.0)
    assert(one("""max(cnt)""", T330) == 50.0)
    assert(one("""min(cnt)""", T330) == 12.0)
    // Prometheus quantile: linear interpolation between order stats
    assert(one("""quantile(0.5, cnt)""", T330) == 31.0)
    val tk = byUsr("""topk(1, cnt)""", T330)
    assert(tk == Map("1" -> 50.0))
  }

  test("comparison filters and bool (Prometheus filter semantics)") {
    assert(one("""max_over_time(gauge[5m]) > 10""", T630) == 11.0)
    assert(one("""max_over_time(gauge[5m]) > bool 10""", T630) == 1.0)
    assert(PromQl.evalIndexed(idx, """max_over_time(gauge[5m]) > 11""",
      T630, Lookback).count() == 0)
  }

  test("scalar functions over the instant vector") {
    // gauge at T630 = 11
    assert(one("""abs(gauge - 20)""", T630) == 9.0)
    // round: nearest integer, ties toward +Inf: 5.5 → 6
    assert(one("""round(gauge / 2)""", T630) == 6.0)
    assert(one("""clamp(gauge, 2, 8)""", T630) == 8.0)
    assert(one("""sgn(gauge - 20)""", T630) == -1.0)
  }

  test("absent carries the selector's equality labels") {
    val rows = PromQl.evalIndexed(idx, """absent(cnt{usr="9"})""",
      T630, Lookback).collect()
    assert(rows.length == 1 && rows.head.getAs[Double]("value") == 1.0)
    assert(rows.head.getAs[String]("usr") == "9")
  }

  test("histogram_quantile interpolation matches the Prometheus formula") {
    import spark.implicits._
    // one cumulative-bucket family at t=600: le=1→2, le=2→5, le=+Inf→6
    val hb = Seq(("1", 2.0), ("2", 5.0), ("+Inf", 6.0)).zipWithIndex
      .map { case ((le, v), i) => (400L + i, 600L, v, "hb", le) }
      .toDF("event_id", "off", "value", "typ", "le")
      .withColumn("ts", timestamp_seconds(lit(BaseEpoch) + col("off")))
      .drop("off")
    val hidx = new TagIndex(hb, Seq("typ", "le"))
    // rank = 0.5×6 = 3 falls in (1, 2]: 1 + (3−2)/(5−2)×(2−1) = 4/3
    val v = PromQl.evalIndexed(hidx,
      """histogram_quantile(0.5, last_over_time({typ="hb"}[5m]))""",
      T630, Lookback).collect()
    assert(v.length == 1 && math.abs(v.head.getAs[Double]("value") - 4.0 / 3.0) < 1e-12)
  }

  test("set operators on the label identity at T330") {
    val or = byUsr("""cnt{usr="1"} or cnt{usr="2"}""", T330)
    assert(or == Map("1" -> 50.0, "2" -> 12.0))
    val unless = byUsr("""cnt unless cnt{usr="2"}""", T330)
    assert(unless == Map("1" -> 50.0))
    val and = byUsr("""cnt and cnt{usr="2"}""", T330)
    assert(and == Map("2" -> 12.0))
  }

  test("round-9 operators: % is Go math.Mod, ^ right-associative, " +
      "atan2 quadrants, trig at libm, deg/pi, negative offset") {
    // gauge{usr="1"} at T630 = 11 (last sample (600, 11))
    // %: Go math.Mod keeps the DIVIDEND's sign: Mod(-11, 4) = -3
    assert(one("""(0 - gauge{usr="1"}) % 4""", T630) == -3.0)
    assert(one("""gauge{usr="1"} % 4""", T630) == 3.0)
    // ^ binds tighter than * and is RIGHT-associative: 2^3^2 = 2^9
    assert(one("2 ^ 3 ^ 2", T630) == 512.0)
    assert(one("""gauge{usr="1"} ^ 2""", T630) == 121.0)
    // atan2 quadrants (infix, Go math.Atan2 ≡ JDK Math.atan2)
    assert(one("""gauge{usr="1"} atan2 gauge{usr="1"}""", T630)
      == math.Pi / 4)
    assert(one("(0 - 1) atan2 (0 - 1)", T630) == -3 * math.Pi / 4)
    // trig family evaluates at libm accuracy (JDK StrictMath-class
    // results; Go's libm agrees on these arguments)
    assert(one("""sin(gauge{usr="1"})""", T630) == math.sin(11.0))
    assert(one("""cosh(cnt{usr="2"})""", T330) == math.cosh(12.0))
    // deg(pi()) = 180 exactly; rad is its inverse
    assert(one("deg(pi())", T630) == 180.0)
    assert(one("rad(deg(pi()))", T630) == math.Pi)
    // negative offset looks FORWARD: at T330, offset -5m selects the
    // newest sample ≤ 630 inside the shifted lookback → (600, 100)
    assert(one("""cnt{usr="1"} offset -5m""", T330) == 100.0)
  }

  // ---------------- native histograms (round 10, B55) ----------------

  /** A hand-evaluable native histogram (schema 0, zeroThreshold 2^-4):
    * observations {0.05, 1.5, 3.0, 6.0, 12.0} → zero bucket 1 (0.05),
    * positive buckets (1,2]:1, (2,4]:1, (4,8]:1, (8,16]:1.
    * cnt=5, sum=22.55.
    */
  private def nhFixture(rsec: Double): DataFrame = {
    import spark.implicits._
    Seq(("x", 5.0, 1.0, 22.55, Seq((1, 1.0), (2, 1.0), (3, 1.0), (4, 1.0)),
      rsec))
      .toDF("typ", "cnt", "zcnt", "hsum", "bs", "rsec")
      .withColumn("buckets",
        expr("transform(bs, b -> named_struct('idx', b._1, 'c', b._2))"))
      .drop("bs")
  }
  private def nhOne(df: DataFrame): Double =
    df.collect().head.getAs[Double]("value")

  test("native histogram_quantile: exponential interpolation in " +
      "positive buckets, linear in the zero bucket (Prometheus 3.x)") {
    import graft.promql.NativeHist
    val h = nhFixture(1.0)
    // φ=0.5: rank=2.5; cum zero:1, b1:2, b2:3 ≥ 2.5 → hit (2,4],
    // frac=(2.5-2)/1=0.5 → 2^(1+0.5) = 2·√2 (3.x log-space rule;
    // pre-3.0 linear would give 2 + 0.5·2 = 3)
    assert(nhOne(NativeHist.quantileOf(h, 0.5)) == math.pow(2.0, 1.5))
    // φ=0.1: rank=0.5 ≤ zcnt=1 → zero bucket, LINEAR from lower bound
    // 0 (no negative buckets): 0.0625·0.5/1 = 0.03125 exactly
    assert(nhOne(NativeHist.quantileOf(h, 0.1)) == 0.03125)
    // φ=1: rank=5=cum of the last bucket → frac=1 → its upper bound 16
    assert(nhOne(NativeHist.quantileOf(h, 1.0)) == 16.0)
    // a RATE histogram (uniformly scaled counts) has the same
    // quantiles — scale invariance is why the evaluator keeps raw
    // counts and only count/sum see rsec
    assert(nhOne(NativeHist.quantileOf(nhFixture(100.0), 0.5))
      == math.pow(2.0, 1.5))
  }

  test("native histogram_fraction: interpolated cumulative in log " +
      "space; power-of-two bounds are exact") {
    import graft.promql.NativeHist
    val h = nhFixture(1.0)
    // F(8): bucket (4,8], below = 1(zero)+1+1 = 3, frac = log2(8)-2 = 1
    //   → 4; F(2): bucket (1,2], below = 1, frac = log2(2)-0 = 1 → 2;
    //   fraction = (4-2)/5 = 0.4 (ln-ratio log2 is 1-ulp exact here)
    assert(math.abs(nhOne(NativeHist.fractionOf(h, 2.0, 8.0)) - 0.4) < 1e-12)
    // bounds spanning everything → 1; below the zero bucket → z share
    assert(math.abs(nhOne(NativeHist.fractionOf(h, 0.0, 512.0)) - 1.0) < 1e-12)
    // F(0.03125) = zcnt·(0.03125/0.0625) = 0.5 → 0.1 of the count
    assert(math.abs(nhOne(NativeHist.fractionOf(h, 0.0, 0.03125)) - 0.1)
      < 1e-12)
  }

  test("native histogram stats: geometric bucket midpoints, zero " +
      "bucket at 0, population variance (funcHistogramStdDev)") {
    import graft.promql.NativeHist
    val h = nhFixture(1.0)
    assert(nhOne(NativeHist.statOf(h, "histogram_count")) == 5.0)
    assert(nhOne(NativeHist.statOf(h, "histogram_sum")) == 22.55)
    assert(nhOne(NativeHist.statOf(h, "histogram_avg")) == 22.55 / 5.0)
    // midpoints √(2^(2i-1)): √2, √8, √32, √128; zero bucket 0
    val mean = 22.55 / 5.0
    val mids = Seq(0.0, math.sqrt(2.0), math.sqrt(8.0), math.sqrt(32.0),
      math.sqrt(128.0))
    val varExp = mids.map(m => (m - mean) * (m - mean)).sum / 5.0
    assert(math.abs(nhOne(NativeHist.statOf(h, "histogram_stdvar")) - varExp)
      < 1e-9)
    assert(math.abs(nhOne(NativeHist.statOf(h, "histogram_stddev"))
      - math.sqrt(varExp)) < 1e-9)
    // rate scaling reaches ONLY count and sum
    val hr = nhFixture(10.0)
    assert(nhOne(NativeHist.statOf(hr, "histogram_count")) == 0.5)
    assert(nhOne(NativeHist.statOf(hr, "histogram_sum")) == 2.255)
    assert(nhOne(NativeHist.statOf(hr, "histogram_avg")) == 22.55 / 5.0)
  }

  test("native-histogram sample model: cumulative counter semantics " +
      "and sparse occupancy on the events corpus") {
    import graft.promql.NativeHist
    val dir = "/root/testdata/sf0.001"
    val s = NativeHist.samples(spark, dir).cache()
    // one sample per series-hour over the whole grid
    val typs = s.select("typ").distinct().count()
    assert(s.count() == typs * NativeHist.hours)
    // cnt is the cumulative event count: the last sample equals the
    // window's total per typ
    val last = s.filter(col("t_sec") ===
        NativeHist.t0Sec + NativeHist.hours * 3600L)
      .select("typ", "cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val raw = Tables.events(spark, dir)
      .filter(unix_timestamp(col("ts")) >= NativeHist.t0Sec &&
        unix_timestamp(col("ts")) < NativeHist.t0Sec + 168L * 3600L)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last == raw)
    // counters never decrease, and bucket arrays are sparse (no
    // zero-count entries) and idx-sorted
    val bad = s.select(col("typ"), col("t_sec"), col("cnt"),
        lag(col("cnt"), 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy("typ")
            .orderBy("t_sec")).as("prev"))
      .filter(col("prev").isNotNull && col("cnt") < col("prev")).count()
    assert(bad == 0)
    assert(s.filter(expr("exists(buckets, b -> b.c <= 0)")).count() == 0)
    // (size < 2 arrays are trivially sorted; sequence(1, 0) would run
    // DESCENDING — the documented Spark trap — so guard on size)
    assert(s.filter(size(col("buckets")) >= 2 && expr(
      "exists(sequence(1, size(buckets) - 1), " +
        "i -> get(buckets, i - 1).idx >= get(buckets, i).idx)")).count() == 0)
  }

  // ------------- native histograms at schema > 0 (round 11) -------------

  /** A schema-3 histogram (base 2^(1/8)): buckets idx 4 (covers
    * (2^(3/8), 2^(1/2)]): 2 obs and idx 9 ((2^1, 2^(9/8)]): 2 obs,
    * plus 1 zero-bucket obs. cnt=5. */
  private def nhFixture3(): DataFrame = {
    import spark.implicits._
    Seq(("x", 3, 5.0, 1.0, 7.0, Seq((4, 2.0), (9, 2.0)), 1.0))
      .toDF("typ", "schema", "cnt", "zcnt", "hsum", "bs", "rsec")
      .withColumn("buckets",
        expr("transform(bs, b -> named_struct('idx', b._1, 'c', b._2))"))
      .drop("bs")
  }

  test("schema-3 quantile: exponential interpolation at base 2^(1/8) — " +
      "value = 2^((idx-1+frac)/8)") {
    import graft.promql.NativeHist
    val h = nhFixture3()
    // φ=0.6: rank=3 = cum of bucket idx 4 (zero 1 + 2) → frac=1 →
    // exactly the bucket upper bound 2^(4/8) = √2
    assert(nhOne(NativeHist.quantileOf(h, 0.6)) == math.pow(2.0, 0.5))
    // φ=0.8: rank=4; bucket idx 9: cum 5 ≥ 4, frac=(4-3)/2=0.5 →
    // 2^((9-1+0.5)/8) = 2^(8.5/8)
    assert(nhOne(NativeHist.quantileOf(h, 0.8)) == math.pow(2.0, 8.5 / 8.0))
    // zero bucket stays linear regardless of schema
    assert(nhOne(NativeHist.quantileOf(h, 0.1)) == 0.03125)
  }

  test("downscale: sum over mixed schemas lands at the COARSEST common " +
      "schema, merging 2^d consecutive buckets (idx' = ((idx-1)>>d)+1)") {
    import graft.promql.NativeHist
    import spark.implicits._
    val s0 = Seq(("a", 0, 4.0, 0.0, 10.0, Seq((1, 4.0)), 1.0))
      .toDF("typ", "schema", "cnt", "zcnt", "hsum", "bs", "rsec")
      .withColumn("buckets",
        expr("transform(bs, b -> named_struct('idx', b._1, 'c', b._2))"))
      .drop("bs")
    val mixed = nhFixture3().unionByName(s0)
    val out = NativeHist.sumHists(mixed, Seq.empty)
    val row = out.collect().head
    assert(row.getAs[Int]("schema") == 0, "target must be min(schema)")
    assert(row.getAs[Double]("cnt") == 9.0 && row.getAs[Double]("zcnt") == 1.0)
    // schema-3 idx 4 → ceil(4/8) = 1 (merges with s0's idx 1: 2+4=6);
    // idx 9 → ceil(9/8) = 2
    val bs = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      "buckets").map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(bs == Seq((1, 6.0), (2, 2.0)), s"got $bs")
    // and the downscaled sum serves quantiles at schema 0: φ=0.5 →
    // rank 4.5, bucket (1,2] idx 1 cum 7 ≥ 4.5, frac=(4.5-1)/6 →
    // 2^0 · 2^(3.5/6)
    assert(nhOne(NativeHist.quantileOf(out, 0.5))
      == math.pow(2.0, 0.0) * math.pow(2.0, 3.5 / 6.0))
  }

  test("signed histograms: rank counts from the most negative bucket, " +
      "mirrored exponential interpolation, two-sided zero bucket") {
    import graft.promql.NativeHist
    // hand model via the real corpus path is exercised by the gate;
    // here pin the interpolation algebra on a tiny synthetic corpus:
    // write 8 events with known deviations and read the quantile back
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_signed_fixture").toString
    import spark.implicits._
    // deviations vc = v − 50: {-40,-40,-3,-0.05,0.05,3,40,400} —
    // 2 in neg idx 6 ([-64,-32)), 1 in neg idx 2, 2 in the zero
    // bucket, 1 in pos idx 2, 1 in pos idx 6, 1 in pos idx 9
    val vs = Seq(10.0, 10.0, 47.0, 49.95, 50.05, 53.0, 90.0, 450.0)
    vs.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:0$i:00"),
        "t", 1L, v, "{}")
    }.toDF("event_id", "ts", "event_type", "user_id", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def q(phi: Double): Double =
      NativeHist.signedQuantile(spark, tmp, phi, "2024-01-08 00:00:00")
        .collect().head.getAs[Double]("value")
    // φ=0.25 → rank 2 = cum of neg idx 6 → frac 1 → −2^(6−1) = −32
    assert(q(0.25) == -32.0)
    // φ=0.125 → rank 1, neg idx 6, frac 0.5 → −2^5.5 (1-ulp tolerance:
    // the JIT's Math.pow intrinsic and the interpreted call may differ
    // in the last bit on fractional exponents — the gates' 1e-4
    // quantization absorbs this; integer-exponent results are exact)
    assert(math.abs(q(0.125) - -math.pow(2.0, 5.5)) < 1e-9)
    // φ=0.5 → rank 4 = neg(3) + first zero obs: two-sided zero bucket
    // linear: −zt + 2zt·(4−3)/2 = 0 exactly
    assert(q(0.5) == 0.0)
    // φ=0.75 → rank 6 = cum through pos idx 2 → its upper bound 4
    assert(q(0.75) == 4.0)
  }

  test("NHCB (custom buckets): classic linear interpolation, +Inf rank " +
      "returns the highest finite bound, mismatched ladders refuse to sum") {
    import graft.promql.NativeHist
    import spark.implicits._
    // cumulative counts over the [25,50,100,200] ladder: 2,5,9,14 of
    // cnt=16 (2 observations above 200 live in the +Inf bucket)
    val h = Seq(("x", Seq(25.0, 50.0, 100.0, 200.0), 16.0,
        Seq(2.0, 5.0, 9.0, 14.0)))
      .toDF("typ", "bounds", "cnt", "bcum")
    // φ=0.5: rank 8 lands in (50,100] (cum 9 ≥ 8): 50 + (8−5)/(9−5)·50
    assert(nhOne(NativeHist.quantileNhcb(h, 0.5)) == 50.0 + 3.0 / 4.0 * 50.0)
    // φ=0.125: rank 2 = c0 → first bucket, linear from 0: 2/2·25 = 25
    assert(nhOne(NativeHist.quantileNhcb(h, 0.125)) == 25.0)
    // φ=1: rank 16 > c3=14 → the +Inf bucket → highest finite bound
    assert(nhOne(NativeHist.quantileNhcb(h, 1.0)) == 200.0)
    // identical ladders sum element-wise…
    val sum2 = NativeHist.sumNhcb(h.unionByName(h), Seq.empty)
    assert(sum2.collect().head.getAs[Double]("cnt") == 32.0)
    assert(nhOne(NativeHist.quantileNhcb(sum2, 0.5))
      == 50.0 + 3.0 / 4.0 * 50.0, "sum of identical histograms keeps quantiles")
    // …mismatched ladders refuse loudly (the Prometheus NHCB rule)
    val other = Seq(("x", Seq(10.0, 50.0, 100.0, 200.0), 16.0,
        Seq(2.0, 5.0, 9.0, 14.0)))
      .toDF("typ", "bounds", "cnt", "bcum")
    val err = intercept[Exception] {
      NativeHist.sumNhcb(h.unionByName(other), Seq.empty).collect()
    }
    assert(err.getMessage.contains("mismatched"))
  }

  test("NHCB variable-length ladders (round 12 s3): consumers are " +
      "width-generic — 3- and 6-bucket histograms serve side by side, " +
      "cross-length sums refuse") {
    import graft.promql.NativeHist
    import spark.implicits._
    val h = Seq(
      ("short", Seq(30.0, 90.0, 270.0), 10.0, Seq(4.0, 7.0, 9.0)),
      ("long", Seq(10.0, 20.0, 40.0, 80.0, 160.0, 320.0), 12.0,
        Seq(1.0, 3.0, 6.0, 9.0, 11.0, 12.0)))
      .toDF("typ", "bounds", "cnt", "bcum")
    val q = NativeHist.quantileNhcb(h, 0.5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // short: rank 5 in (30,90] → 30 + (5−4)/(7−4)·60
    assert(q("short") == 30.0 + 1.0 / 3.0 * 60.0)
    // long: rank 6 = c2 → (20,40] → 20 + (6−3)/(6−3)·20 = 40
    assert(q("long") == 40.0)
    // rank beyond the last finite count → top bound, any width
    val q1 = NativeHist.quantileNhcb(
      h.filter($"typ" === "short").withColumn("cnt",
        org.apache.spark.sql.functions.lit(20.0)), 1.0)
    assert(nhOne(q1) == 270.0)
    // fraction at mixed widths: F(90)−F(30) on short = (7−4)/10
    assert(nhOne(NativeHist.fractionNhcb(
      h.filter($"typ" === "short"), 30.0, 90.0)) == 3.0 / 10.0)
    // stddev over a 3-bucket ladder: masses 4,3,2 at midpoints
    // 15/60/180 + 1 in +Inf at 270, mean 50
    val hs = h.filter($"typ" === "short")
      .withColumn("hsum", org.apache.spark.sql.functions.lit(500.0))
      .withColumn("rsec", org.apache.spark.sql.functions.lit(1.0))
    val mean = 50.0
    val expVar = (4 * (15.0 - mean) * (15.0 - mean)
      + 3 * (60.0 - mean) * (60.0 - mean)
      + 2 * (180.0 - mean) * (180.0 - mean)
      + 1 * (270.0 - mean) * (270.0 - mean)) / 10.0
    assert(nhOne(NativeHist.statNhcb(hs, "histogram_stdvar")) == expVar)
    // summing across LENGTHS refuses like any mismatched ladder
    val err = intercept[Exception] {
      NativeHist.sumNhcb(h, Seq.empty).collect()
    }
    assert(err.getMessage.contains("mismatched"))
  }

  test("NHCB fraction/stats (round 12): classic linear F(x), arithmetic " +
      "bucket midpoints, +Inf mass at the top bound; count/sum see rsec") {
    import graft.promql.NativeHist
    import spark.implicits._
    // ladder [25,50,100,200], cum 2,5,9,14 of cnt=16, hsum=1000
    val h = Seq(("x", Seq(25.0, 50.0, 100.0, 200.0), 16.0,
        Seq(2.0, 5.0, 9.0, 14.0), 1000.0, 1.0))
      .toDF("typ", "bounds", "cnt", "bcum", "hsum", "rsec")
    // F(30) = 2 + (30−25)/(50−25)·3 = 2.6; F(150) = 9 + 0.5·5 = 11.5
    assert(nhOne(NativeHist.fractionNhcb(h, 30.0, 150.0))
      == (11.5 - 2.6) / 16.0)
    // F at the top finite bound is its cumulative count (2 of 16 live
    // in +Inf); only a bound BEYOND the ladder counts everything
    assert(nhOne(NativeHist.fractionNhcb(h, 0.0, 200.0)) == 14.0 / 16.0)
    assert(nhOne(NativeHist.fractionNhcb(h, 0.0, 999.0)) == 1.0)
    // a bound ON the ladder is exact: F(50) = c1 = 5
    assert(nhOne(NativeHist.fractionNhcb(h, 25.0, 50.0)) == 3.0 / 16.0)
    // stats: count/sum raw (rsec 1), avg = hsum/cnt
    assert(nhOne(NativeHist.statNhcb(h, "histogram_count")) == 16.0)
    assert(nhOne(NativeHist.statNhcb(h, "histogram_sum")) == 1000.0)
    assert(nhOne(NativeHist.statNhcb(h, "histogram_avg")) == 62.5)
    // stdvar: masses 2,3,4,5 at midpoints 12.5/37.5/75/150 + 2 at 200
    val mean = 62.5
    val expVar = (2 * (12.5 - mean) * (12.5 - mean)
      + 3 * (37.5 - mean) * (37.5 - mean)
      + 4 * (75.0 - mean) * (75.0 - mean)
      + 5 * (150.0 - mean) * (150.0 - mean)
      + 2 * (200.0 - mean) * (200.0 - mean)) / 16.0
    assert(nhOne(NativeHist.statNhcb(h, "histogram_stdvar")) == expVar)
    assert(nhOne(NativeHist.statNhcb(h, "histogram_stddev"))
      == math.sqrt(expVar))
    // a rate frame divides count/sum by its range, not the quantiles
    val hr = h.withColumn("rsec", org.apache.spark.sql.functions.lit(100.0))
    assert(nhOne(NativeHist.statNhcb(hr, "histogram_count")) == 0.16)
    assert(nhOne(NativeHist.statNhcb(hr, "histogram_avg")) == 62.5)
    // summing a rate frame with an instant frame refuses (mixed rsec)
    val mixed = intercept[Exception] {
      NativeHist.sumNhcb(h.unionByName(hr), Seq.empty)
        .select(org.apache.spark.sql.functions.col("rsec")).collect()
    }
    assert(mixed.getMessage.contains("mixed rate ranges"))
  }

  test("mixed sample model: per-series schema, schema-3 ladders, and " +
      "downscale-to-0 count preservation on the events corpus") {
    import graft.promql.NativeHist
    val dir = "/root/testdata/sf0.001"
    val s = NativeHist.samplesMixed(spark, dir).cache()
    // click/error scrape at schema 3, the rest at 0
    val sch = s.select("typ", "schema").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(sch.forall { case (t, x) => x == (if (t < "n") 3 else 0) })
    // schema-3 bucket indices live on the schema-3 ladder
    assert(s.filter(col("schema") === 3 && expr(
      s"exists(buckets, b -> b.idx < ${NativeHist.minIdxAt(3)} or " +
        s"b.idx > ${NativeHist.maxIdxAt(3)})")).count() == 0)
    // downscaling a schema-3 series to 0 preserves per-bucket totals:
    // final-hour cumulative counts of the mixed model, remapped, must
    // equal the legacy schema-0 model's final buckets
    val tEnd = NativeHist.t0Sec + NativeHist.hours * 3600L
    def finalBuckets(df: org.apache.spark.sql.DataFrame, remap: Boolean) =
      df.filter(col("t_sec") === tEnd && col("typ") === "click")
        .select(explode(col("buckets")).as("x"), col("schema"))
        .select((if (remap)
          (floor((col("x.idx") - 1).cast("double") /
            pow(lit(2.0), col("schema"))) + 1).cast("int")
        else col("x.idx")).as("idx"), col("x.c").as("c"))
        .groupBy("idx").agg(sum("c").as("c")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val remapped = finalBuckets(s, remap = true)
    val legacy = finalBuckets(NativeHist.samples(spark, dir), remap = false)
    assert(remapped == legacy)
  }
}
