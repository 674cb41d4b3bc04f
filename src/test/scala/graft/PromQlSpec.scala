package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PromQL-subset surface (promql/PromQl.scala): parser shape,
  * instant-query semantics, and the SQL TVF path. The gated
  * `promql_*` queries hash-compare the evaluator against DuckDB; this
  * spec pins the algebraic identities the oracle can't see (offset
  * shifting, scalar precedence, operator equivalences).
  */
class PromQlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  val T = "2024-01-31 00:00:00"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSet

  test("parser: precedence and scalar arithmetic") {
    assert(promql.PromQl.eval(spark, dir, "1 + 2 * 3", T).head().getDouble(0) == 7.0)
    assert(promql.PromQl.eval(spark, dir, "(1 + 2) * 3", T).head().getDouble(0) == 9.0)
    assert(promql.PromQl.eval(spark, dir, "clamp_max(abs(0 - 5), 3)", T)
      .head().getDouble(0) == 3.0)
  }

  test("parser: malformed input fails with a pointed message") {
    val bad = Seq(
      "rate({typ=\"x\"}[5q])",      // bad duration unit
      "frobnicate({typ=\"x\"})",    // unknown function
      "sum by (usr ({typ=\"x\"})",  // broken by-clause
      "{typ=\"x\"} extra")          // trailing garbage
    for (b <- bad) {
      val e = intercept[Exception](promql.PromQl.eval(spark, dir, b, T))
      assert(e.getMessage != null, b)
    }
    // range function without a range selector is a semantic error
    val e2 = intercept[Exception](
      promql.PromQl.eval(spark, dir, "rate({typ=\"click\"})", T))
    assert(e2.getMessage.contains("range"))
  }

  test("instant selector ≡ last_over_time over the lookback window") {
    val a = promql.PromQl.eval(spark, dir, "{typ=\"click\"}", T, lookbackSec = 86400L)
    val b = promql.PromQl.eval(spark, dir, "last_over_time({typ=\"click\"}[1d])", T)
    assert(rows(a) == rows(b) && rows(a).nonEmpty)
  }

  test("offset shifts the evaluation window") {
    val off = promql.PromQl.eval(spark, dir, "{typ=\"view\"} offset 1d", T)
    val at = promql.PromQl.eval(spark, dir, "{typ=\"view\"}", "2024-01-30 00:00:00")
    assert(rows(off) == rows(at) && rows(off).nonEmpty)
  }

  test("vector-scalar op broadcasts; agg without by() is global") {
    val base = promql.PromQl.eval(spark, dir,
      "sum(count_over_time({typ=~\".*\"}[30d]))", T)
    val twice = promql.PromQl.eval(spark, dir,
      "sum(count_over_time({typ=~\".*\"}[30d])) * 2", T)
    assert(twice.head().getDouble(0) == 2 * base.head().getDouble(0))
    assert(base.head().getDouble(0) > 0)
  }

  test("vector-vector default matching joins on the shared label set") {
    val ratio = promql.PromQl.eval(spark, dir,
      "sum by (typ) (count_over_time({typ=~\".*\"}[30d]))" +
        " / sum by (typ) (count_over_time({typ=~\".*\"}[30d]))", T)
    val vals = ratio.select("value").collect().map(_.getDouble(0)).toSet
    assert(vals == Set(1.0))
    val e = intercept[Exception](promql.PromQl.eval(spark, dir,
      "sum by (typ) (count_over_time({typ=~\".*\"}[30d]))" +
        " / sum by (usr) (count_over_time({typ=~\".*\"}[30d]))", T))
    assert(e.getMessage.contains("label sets"))
  }

  test("topk is deterministic under re-evaluation and bounded") {
    val q = "topk(3, sum by (usr) (count_over_time({typ=~\".*\"}[30d])))"
    val a = promql.PromQl.eval(spark, dir, q, T)
    val b = promql.PromQl.eval(spark, dir, q, T)
    assert(rows(a) == rows(b) && a.count() == 3)
  }

  test("without(...) is the complement of by(...)") {
    val a = promql.PromQl.eval(spark, dir,
      """sum without (usr) (count_over_time({typ=~".*"}[30d]))""", T)
    val b = promql.PromQl.eval(spark, dir,
      """sum by (typ) (count_over_time({typ=~".*"}[30d]))""", T)
    assert(rows(a) == rows(b) && rows(a).nonEmpty)
  }

  test("comparison filters keep entries, values unchanged") {
    val all = promql.PromQl.eval(spark, dir,
      """max_over_time({typ="view"}[30d])""", T)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val kept = promql.PromQl.eval(spark, dir,
      """max_over_time({typ="view"}[30d]) > 50""", T)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(kept.toSet == all.filter(_._3 > 50).toSet)
    assert(kept.nonEmpty && kept.length < all.length)
    // vector-vector comparison: x == x keeps everything
    val self = promql.PromQl.eval(spark, dir,
      """max_over_time({typ="view"}[30d]) == max_over_time({typ="view"}[30d])""", T)
    assert(self.count() == all.length)
  }

  test("quantile_over_time: q=0 is min, q=1 is max") {
    val lo = promql.PromQl.eval(spark, dir,
      """quantile_over_time(0, {typ="click"}[30d])""", T)
    val mn = promql.PromQl.eval(spark, dir,
      """min_over_time({typ="click"}[30d])""", T)
    assert(rows(lo) == rows(mn) && rows(lo).nonEmpty)
    val hi = promql.PromQl.eval(spark, dir,
      """quantile_over_time(1, {typ="click"}[30d])""", T)
    val mx = promql.PromQl.eval(spark, dir,
      """max_over_time({typ="click"}[30d])""", T)
    assert(rows(hi) == rows(mx))
  }

  test("metric-name sugar desugars to a typ matcher") {
    val sugar = promql.PromQl.eval(spark, dir, """click{usr="3"}""", T, 86400L * 31)
    val full = promql.PromQl.eval(spark, dir, """{typ="click", usr="3"}""", T, 86400L * 31)
    assert(rows(sugar) == rows(full) && rows(sugar).nonEmpty)
    val bare = promql.PromQl.eval(spark, dir,
      """count_over_time(click[30d])""", T)
    val braced = promql.PromQl.eval(spark, dir,
      """count_over_time({typ="click"}[30d])""", T)
    assert(rows(bare) == rows(braced) && rows(bare).nonEmpty)
    val e = intercept[Exception](
      promql.PromQl.eval(spark, dir, """click{typ="view"}""", T))
    assert(e.getMessage.contains("conflicts"))
  }

  test("on(...) group_left vector matching") {
    // shares per user sum to 1 across typs
    val shares = promql.PromQl.eval(spark, dir,
      """sum by (usr, typ) (count_over_time({typ=~".*"}[30d]))
        | / on(usr) group_left sum by (usr) (count_over_time({typ=~".*"}[30d]))""".stripMargin, T)
    val perUsr = shares.groupBy("usr").sum("value")
      .collect().map(_.getDouble(1))
    assert(perUsr.nonEmpty && perUsr.forall(s => math.abs(s - 1.0) < 1e-9))
    // without group_left the many side must reduce to the on-labels
    val e = intercept[Exception](promql.PromQl.eval(spark, dir,
      """sum by (usr, typ) (count_over_time({typ=~".*"}[30d]))
        | / on(usr) sum by (usr) (count_over_time({typ=~".*"}[30d]))""".stripMargin, T))
    assert(e.getMessage.contains("group_left"))
  }

  test("set operators: and/or/unless on the label identity") {
    val A = """last_over_time({typ="click"}[30d])"""
    val B = """last_over_time({usr<="3"}[30d])"""
    val a = promql.PromQl.eval(spark, dir, A, T)
    assert(rows(promql.PromQl.eval(spark, dir, s"$A or $A", T)) == rows(a))
    assert(promql.PromQl.eval(spark, dir, s"$A unless $A", T).count() == 0)
    val and = promql.PromQl.eval(spark, dir, s"$A and $B", T)
    val unless = promql.PromQl.eval(spark, dir, s"$A unless $B", T)
    assert(and.count() + unless.count() == a.count() && and.count() > 0)
    // or = union without duplicating matched series
    val b = promql.PromQl.eval(spark, dir, B, T)
    val or = promql.PromQl.eval(spark, dir, s"$A or $B", T)
    assert(or.count() == a.count() + b.count() -
      promql.PromQl.eval(spark, dir, s"$B and $A", T).count())
  }

  test("label_replace / label_join manipulate the label set") {
    val lj = promql.PromQl.eval(spark, dir,
      """label_join({typ="click"}, "series", "-", "usr", "typ")""", T, 86400L * 31)
    assert(lj.columns.toSeq == Seq("usr", "typ", "series", "value"))
    assert(lj.filter(col("series") =!= concat_ws("-", col("usr"), col("typ"))).count() == 0)
    assert(lj.count() > 0)
    val lr = promql.PromQl.eval(spark, dir,
      """label_replace({typ="click"}, "ub", "$1", "usr", "(.)[0-9]*")""", T, 86400L * 31)
    assert(lr.filter(col("ub") =!= substring(col("usr"), 1, 1)).count() == 0)
    // non-matching regex leaves dst empty (empty ≡ absent)
    val miss = promql.PromQl.eval(spark, dir,
      """label_replace({typ="click"}, "ub", "$1", "usr", "x(.)")""", T, 86400L * 31)
    assert(miss.filter(col("ub") =!= "").count() == 0 && miss.count() > 0)
    // aggregation can group by a REPLACED label
    val byUb = promql.PromQl.eval(spark, dir,
      """sum by (ub) (label_replace(count_over_time({typ=~".*"}[30d]), "ub", "$1", "usr", "(.)[0-9]*"))""",
      T)
    assert(byUb.count() > 0 && byUb.columns.toSeq == Seq("ub", "value"))
  }

  test("subquery: outer fold over the inner grid points") {
    // sum_over_time over a [2d:1d] subquery of daily counts = the sum
    // of the 3 grid points' counts (windows overlap is intentional)
    val sub = promql.PromQl.eval(spark, dir,
      """sum_over_time(sum by (typ) (count_over_time({typ="click"}[1d]))[2d:1d])""", T)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val pts = Seq("2024-01-29 00:00:00", "2024-01-30 00:00:00", "2024-01-31 00:00:00")
    val manual = pts.flatMap { t =>
      promql.PromQl.eval(spark, dir,
        """sum by (typ) (count_over_time({typ="click"}[1d]))""", t)
        .collect().map(r => r.getDouble(1))
    }.sum
    assert(sub("click") == manual && manual > 0)
    // a bare subquery (no outer range function) errors loudly
    val e = intercept[Exception](promql.PromQl.eval(spark, dir,
      """sum by (typ) (count_over_time({typ="click"}[1d]))[2d:1d]""", T))
    assert(e.getMessage.contains("subquery"))
  }

  test("absent() fires only when the vector is empty, carrying Eql labels") {
    val yes = promql.PromQl.eval(spark, dir, """absent({typ="nonexistent"})""", T)
    val rows = yes.select("typ", "value").collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq
      == Seq(("nonexistent", 1.0)))
    val no = promql.PromQl.eval(spark, dir, """absent({typ="click"})""", T)
    assert(no.count() == 0)
    // only single-use Eql matchers become labels (Prometheus rule):
    // a regex matcher contributes nothing
    val rx = promql.PromQl.eval(spark, dir, """absent({typ=~"nonexi.*"})""", T)
    assert(rx.columns.toSeq == Seq("value") && rx.count() == 1)
  }

  test("range query ≡ instant query at every grid point") {
    val q = """sum by (typ) (count_over_time({typ=~".*"}[2d]))"""
    val grid = promql.PromQl.evalRange(spark, dir, q,
      "2024-01-10 00:00:00", "2024-01-12 00:00:00", 86400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val pts = Seq("2024-01-10 00:00:00", "2024-01-11 00:00:00", "2024-01-12 00:00:00")
    val single = pts.flatMap { t =>
      val tSec = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC)
      promql.PromQl.eval(spark, dir, q, t)
        .collect().map(r => (r.getString(0), tSec, r.getDouble(1)))
    }.toSet
    assert(grid == single && grid.nonEmpty)
  }

  test("overlapping windows: a sample lands in range/step + 1 grid points") {
    // one series' samples, window 2d, step 1d: total per-grid-point
    // counts must equal the sum over samples of their window multiplicity
    val grid = promql.PromQl.evalRange(spark, dir,
      """count_over_time({typ="signup"}[2d])""",
      "2024-01-05 00:00:00", "2024-01-29 00:00:00", 86400L)
    val total = grid.agg(sum("value")).head().getDouble(0)
    val singles = promql.PromQl.evalRange(spark, dir,
      """count_over_time({typ="signup"}[1d])""",
      "2024-01-05 00:00:00", "2024-01-29 00:00:00", 86400L)
      .agg(sum("value")).head().getDouble(0)
    // every [1d] window is contained in two consecutive [2d] windows
    // away from the grid edges, so the 2d total must exceed the 1d one
    assert(total > singles && singles > 0)
  }

  test("@ modifier ≡ evaluating at the anchor time") {
    // 1706486400 = 2024-01-29 00:00:00 UTC
    val at = promql.PromQl.eval(spark, dir,
      """max_over_time({typ="view"}[2d] @ 1706486400)""", T)
    val direct = promql.PromQl.eval(spark, dir,
      """max_over_time({typ="view"}[2d])""", "2024-01-29 00:00:00")
    assert(rows(at) == rows(direct) && rows(at).nonEmpty)
  }

  test("ignoring(...) ≡ on(complement) for one-to-one matching") {
    val ign = promql.PromQl.eval(spark, dir,
      """last_over_time({typ="click"}[30d])
        | - ignoring(typ) last_over_time({typ="view"}[30d])""".stripMargin, T)
    // same match keys spelled as on(usr) — needs both sides reduced
    val on = promql.PromQl.eval(spark, dir,
      """sum by (usr) (last_over_time({typ="click"}[30d]))
        | - on(usr) sum by (usr) (last_over_time({typ="view"}[30d]))""".stripMargin, T)
    assert(rows(ign.select("usr", "value")) == rows(on.select("usr", "value"))
      && rows(ign).nonEmpty)
  }

  test("group_right mirrors group_left with swapped operands") {
    val gl = promql.PromQl.eval(spark, dir,
      """sum by (usr, typ) (count_over_time({typ=~".*"}[30d]))
        | / on(usr) group_left sum by (usr) (count_over_time({typ=~".*"}[30d]))""".stripMargin, T)
    val gr = promql.PromQl.eval(spark, dir,
      """sum by (usr) (count_over_time({typ=~".*"}[30d]))
        | / on(usr) group_right sum by (usr, typ) (count_over_time({typ=~".*"}[30d]))""".stripMargin, T)
    val a = gl.select(col("usr"), col("typ"), col("value")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val b = gr.select(col("usr"), col("typ"), (lit(1.0) / col("value")).as("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    for ((k, v) <- a) assert(math.abs(v - b(k)) < 1e-12, k)
  }

  test("aggregation operators: quantile bounds, group, count_values") {
    val mn = promql.PromQl.eval(spark, dir,
      """min by (typ) (last_over_time({typ="click"}[30d]))""", T)
      .head().getDouble(1)
    val mx = promql.PromQl.eval(spark, dir,
      """max by (typ) (last_over_time({typ="click"}[30d]))""", T)
      .head().getDouble(1)
    val q = promql.PromQl.eval(spark, dir,
      """quantile by (typ) (0.5, last_over_time({typ="click"}[30d]))""", T)
      .head().getDouble(1)
    assert(mn <= q && q <= mx)
    val g = promql.PromQl.eval(spark, dir,
      """group by (typ) (last_over_time({typ=~".*"}[30d]))""", T)
    assert(g.collect().forall(_.getDouble(1) == 1.0) && g.count() > 0)
    // count_values partitions the series set: counts sum to series count
    val cv = promql.PromQl.eval(spark, dir,
      """count_values("b", floor(last_over_time({typ=~".*"}[30d]) / 10))""", T)
      .agg(sum("value")).head().getDouble(0)
    val n = promql.PromQl.eval(spark, dir,
      """last_over_time({typ=~".*"}[30d])""", T).count()
    assert(cv == n.toDouble && n > 0)
  }

  test("scalar functions: round, sgn via vector()") {
    def one(e: String): Double =
      promql.PromQl.eval(spark, dir, e, T).head().getDouble(0)
    assert(one("round(vector(2.34))") == 2.0)
    assert(one("round(vector(2.6))") == 3.0)
    assert(one("round(vector(2.26), 0.5)") == 2.5)
    assert(one("sgn(vector(0 - 3))") == -1.0)
    assert(one("sgn(vector(4))") == 1.0)
  }

  test("time() is the evaluation timestamp; vector() broadcasts per t_sec") {
    val t = promql.PromQl.eval(spark, dir, "vector(time())", T).head().getDouble(0)
    assert(t == 1706659200.0) // 2024-01-31 00:00:00 UTC
    // no-label vector arithmetic keeps the labeled side's identity
    val doubled = promql.PromQl.eval(spark, dir,
      """sum by (usr) (count_over_time({typ="click"}[30d])) * vector(2)""", T)
    val base = promql.PromQl.eval(spark, dir,
      """sum by (usr) (count_over_time({typ="click"}[30d]))""", T)
    val d = doubled.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = base.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d.keySet == b.keySet && d.nonEmpty)
    for ((k, v) <- b) assert(d(k) == v * 2, k)
  }

  test("deriv/predict_linear/irate: regression identities") {
    // predict_linear at horizon 0 is the regression value AT the eval
    // time; the deriv slope links two prediction horizons exactly:
    // predict(t) - predict(0) = slope * t
    val p0 = promql.PromQl.eval(spark, dir,
      """predict_linear({typ="view"}[30d], 0)""", T)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    val p1 = promql.PromQl.eval(spark, dir,
      """predict_linear({typ="view"}[30d], 86400)""", T)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    val sl = promql.PromQl.eval(spark, dir,
      """deriv({typ="view"}[30d])""", T)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(p0.keySet == sl.keySet && p0.nonEmpty)
    for ((k, s) <- sl)
      assert(math.abs((p1(k) - p0(k)) - s * 86400) < 1e-6, k)
    // irate uses only the last sample pair: invariant under window growth
    // as long as both windows contain ≥ the last two samples
    val i1 = promql.PromQl.eval(spark, dir, """irate({typ="view"}[20d])""", T)
    val i2 = promql.PromQl.eval(spark, dir, """irate({typ="view"}[30d])""", T)
    val m1 = i1.collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    val m2 = i2.collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    for (k <- m1.keySet.intersect(m2.keySet)) assert(m1(k) == m2(k), k)
    assert(m1.nonEmpty)
    // predict_linear without its scalar argument is a parse error
    val e = intercept[Exception](promql.PromQl.eval(spark, dir,
      """predict_linear({typ="view"}[30d])""", T))
    assert(e.getMessage.contains("predict_linear"))
  }

  test("bool modifier: 0/1 map over all entries; scalar-scalar legal") {
    val filt = promql.PromQl.eval(spark, dir,
      """max_over_time({typ="click"}[30d]) > 50""", T)
    val bool = promql.PromQl.eval(spark, dir,
      """max_over_time({typ="click"}[30d]) > bool 50""", T)
    val all = promql.PromQl.eval(spark, dir,
      """max_over_time({typ="click"}[30d])""", T)
    // bool keeps every entry; its 1-count equals the filter's row count
    assert(bool.count() == all.count())
    assert(bool.filter(col("value") === 1.0).count() == filt.count())
    assert(bool.collect().forall(r => r.getDouble(2) == 0.0 || r.getDouble(2) == 1.0))
    // scalar-scalar needs bool (Prometheus rule); with it, it evaluates
    assert(promql.PromQl.eval(spark, dir, "2 > bool 1", T).head().getDouble(0) == 1.0)
    val e = intercept[Exception](promql.PromQl.eval(spark, dir, "2 > 1", T))
    assert(e.getMessage.contains("bool"))
  }

  test("present_over_time / mad_over_time / timestamp / log2 / log10") {
    val p = promql.PromQl.eval(spark, dir,
      """present_over_time({typ="click"}[30d])""", T)
    assert(p.collect().forall(_.getDouble(2) == 1.0) && p.count() > 0)
    val m = promql.PromQl.eval(spark, dir,
      """mad_over_time({typ="view"}[30d])""", T)
    assert(m.collect().forall(_.getDouble(2) >= 0.0) && m.count() > 0)
    // timestamp(v) lies within the lookback window [T-1d, T]
    val ts = promql.PromQl.eval(spark, dir, """timestamp({typ="click"})""", T)
    assert(ts.count() > 0 && ts.collect().forall(r =>
      r.getDouble(2) >= 1706572800.0 && r.getDouble(2) <= 1706659200.0))
    def one(e: String): Double =
      promql.PromQl.eval(spark, dir, e, T).head().getDouble(0)
    assert(one("log2(vector(8))") == 3.0)
    assert(one("log10(vector(1000))") == 3.0)
  }

  test("topk by(...): k winners per group; absent_over_time; calendar funcs") {
    val t2 = promql.PromQl.eval(spark, dir,
      """topk by (typ) (2, sum by (usr, typ) (count_over_time({typ=~".*"}[30d])))""", T)
    val perType = t2.groupBy("typ").count().collect()
    assert(perType.nonEmpty && perType.forall(_.getLong(1) <= 2))
    // the global form is the 1-group special case
    val tg = promql.PromQl.eval(spark, dir,
      """topk(3, sum by (usr) (count_over_time({typ=~".*"}[30d])))""", T)
    assert(tg.count() == 3)
    // absent_over_time: 1 when the whole window is empty, nothing otherwise
    val yes = promql.PromQl.eval(spark, dir,
      """absent_over_time({typ="nonexistent"}[7d])""", T)
    assert(yes.select("value").collect().map(_.getDouble(0)).toSeq == Seq(1.0))
    val no = promql.PromQl.eval(spark, dir,
      """absent_over_time({typ="click"}[7d])""", T)
    assert(no.count() == 0)
    // calendar functions over a known epoch: 2024-01-31 00:00:00 UTC is
    // a Wednesday (dow 3), January, 31-day month
    def one(e: String): Double =
      promql.PromQl.eval(spark, dir, e, T).head().getDouble(0)
    assert(one("hour(vector(1706659200))") == 0.0)
    assert(one("minute(vector(1706659260))") == 1.0)
    assert(one("day_of_week(vector(1706659200))") == 3.0)
    assert(one("day_of_month(vector(1706659200))") == 31.0)
    assert(one("month(vector(1706659200))") == 1.0)
    assert(one("year(vector(1706659200))") == 2024.0)
    assert(one("days_in_month(vector(1706659200))") == 31.0)
  }

  test("range-query subquery ≡ instant subquery at each grid point") {
    // valid whenever the outer step is a multiple of the inner step
    // (the shared inner grid then aligns with every per-point grid)
    val q = """max_over_time(sum by (typ) (count_over_time({typ=~".*"}[1d]))[2d:1d])"""
    val grid = promql.PromQl.evalRange(spark, dir, q,
      "2024-01-10 00:00:00", "2024-01-12 00:00:00", 86400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val pts = Seq("2024-01-10 00:00:00", "2024-01-11 00:00:00", "2024-01-12 00:00:00")
    val single = pts.flatMap { t =>
      val tSec = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC)
      promql.PromQl.eval(spark, dir, q, t)
        .collect().map(r => (r.getString(0), tSec, r.getDouble(1)))
    }.toSet
    assert(grid == single && grid.nonEmpty)
  }

  test("histogram_quantile over the bucket index ≡ the standalone B19 operator") {
    // the language path: real le-labeled cumulative bucket series +
    // generic runtime-bound interpolation; B19: hardcoded 4-bucket
    // conditional aggregate. Same events, same arithmetic → equal.
    val viaPromql = promql.PromQl.evalIndexed(
      index.TagIndex.forBucketedEvents(spark, dir),
      """histogram_quantile(0.9, count_over_time({typ=~".*", le=~".*"}[30d]))""",
      T).select(col("typ"), round(col("value"), 4).as("hq90"))
    val viaB19 = tsdb.Tsdb.histogramQuantile(spark, dir)
      .select(col("typ"), col("hq90"))
    assert(rows(viaPromql) == rows(viaB19) && rows(viaB19).nonEmpty)
  }

  test("holt_winters(v[30d], 0.3, 0.1) ≡ the standalone B20 fold") {
    // the B20 operator runs the same recurrence with factors 0.3/0.1
    // over whole series; a 30d window at T covers every sample, so the
    // two paths must agree wherever B20 emits (its n ≥ 3 cut)
    val viaPromql = promql.PromQl.eval(spark, dir,
      """holt_winters({typ=~".*"}[30d], 0.3, 0.1)""", T)
      .select(col("usr"), col("typ"), round(col("value"), 4).as("hw"))
    val viaB20 = tsdb.Tsdb.holtWinters(spark, dir)
      .select(col("usr"), col("typ"), col("hw"))
    val p = viaPromql.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val b = viaB20.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(b.nonEmpty && b.forall { case (k, v) => p.get(k).contains(v) },
      s"B20 keys missing or drifted: ${b.filterNot { case (k, v) => p.get(k).contains(v) }.take(3)}")
  }

  test("clamp(v, lo, hi) ≡ clamp_max(clamp_min(v, lo), hi)") {
    val a = promql.PromQl.eval(spark, dir,
      """clamp(last_over_time({typ=~".*"}[30d]), 10, 100)""", T)
    val b = promql.PromQl.eval(spark, dir,
      """clamp_max(clamp_min(last_over_time({typ=~".*"}[30d]), 10), 100)""", T)
    assert(rows(a) == rows(b) && rows(a).nonEmpty)
    // lo > hi is rejected loudly (Prometheus yields NaN — documented)
    intercept[IllegalArgumentException] {
      promql.PromQl.parse("clamp({typ=\"x\"}, 5, 1)")
    }
  }

  test("scalar(): singleton vector broadcasts; multi-series vector → NaN") {
    val shares = promql.PromQl.eval(spark, dir,
      """count_over_time({typ="click"}[30d])
        | / scalar(sum(count_over_time({typ="click"}[30d])))""".stripMargin, T)
      .select(col("value")).collect().map(_.getDouble(0))
    assert(shares.nonEmpty && math.abs(shares.sum - 1.0) < 1e-9,
      s"shares must sum to 1, got ${shares.sum}")
    // scalar() of a multi-series vector is NaN per the Prometheus spec
    val nan = promql.PromQl.eval(spark, dir,
      """scalar(count_over_time({typ=~".*"}[30d]))""", T)
      .select(col("value")).head().getDouble(0)
    assert(nan.isNaN)
  }

  test("sort_desc emits rows in non-increasing value order") {
    val vals = promql.PromQl.eval(spark, dir,
      """sort_desc(sum by (typ) (count_over_time({typ=~".*"}[30d])))""", T)
      .select(col("value")).collect().map(_.getDouble(0))
    assert(vals.length > 1 && vals.sliding(2).forall(p => p(0) >= p(1)), vals.toSeq)
    val asc = promql.PromQl.eval(spark, dir,
      """sort(sum by (typ) (count_over_time({typ=~".*"}[30d])))""", T)
      .select(col("value")).collect().map(_.getDouble(0))
    assert(asc.toSeq == vals.sorted.toSeq)
  }

  test("sort_by_label orders rows by the named label, content unchanged") {
    val sorted = promql.PromQl.eval(spark, dir,
      """sort_by_label(sum by (typ) (count_over_time({typ=~".*"}[30d])), "typ")""", T)
    val typs = sorted.select("typ").collect().map(_.getString(0))
    assert(typs.length > 1 && typs.toSeq == typs.sorted.toSeq)
    val desc = promql.PromQl.eval(spark, dir,
      """sort_by_label_desc(sum by (typ) (count_over_time({typ=~".*"}[30d])), "typ")""", T)
    assert(desc.select("typ").collect().map(_.getString(0)).toSeq
      == typs.sorted.reverse.toSeq)
    intercept[IllegalArgumentException] {
      promql.PromQl.eval(spark, dir,
        """sort_by_label(sum by (typ) (count_over_time({typ=~".*"}[30d])), "zzz")""", T)
        .collect()
    }
  }

  test("%, ^, atan2, trig, deg/rad/pi: scalar identities and precedence") {
    def scalarOf(e: String): Double =
      promql.PromQl.eval(spark, dir, s"vector($e)", T).head()
        .getAs[Double]("value")
    // ^ binds tighter than * and is RIGHT-associative: 2^3^2 = 512
    assert(scalarOf("2 ^ 3 ^ 2") == 512.0)
    assert(scalarOf("2 * 3 ^ 2") == 18.0)
    // % has * precedence and Go math.Mod sign (dividend's)
    assert(scalarOf("7 % 3 + 1") == 2.0)
    assert(scalarOf("0 - (7 % 3)") == -1.0)
    assert(scalarOf("5 + 7 % 3") == 6.0)
    // atan2 quadrant table (Go math.Atan2 = java.lang.Math.atan2)
    assert(scalarOf("1 atan2 1") == math.Pi / 4)
    assert(scalarOf("1 atan2 (0-1)") == 3 * math.Pi / 4)
    assert(scalarOf("(0-1) atan2 (0-1)") == -3 * math.Pi / 4)
    assert(scalarOf("(0-1) atan2 1") == -math.Pi / 4)
    // deg/rad are inverses; pi() is the scalar constant
    assert(scalarOf("deg(pi())") == 180.0)
    assert(math.abs(scalarOf("rad(deg(2)) - 2")) < 1e-12)
    assert(scalarOf("pi()") == math.Pi)
    // trig identity sin²+cos² = 1 (within fp)
    assert(math.abs(scalarOf("sin(1)^2 + cos(1)^2") - 1.0) < 1e-12)
    assert(math.abs(scalarOf("tan(1) - sin(1)/cos(1)")) < 1e-12)
    // inverse hyperbolics invert their duals
    assert(math.abs(scalarOf("asinh(sinh(2)) - 2")) < 1e-9)
    assert(math.abs(scalarOf("acosh(cosh(2)) - 2")) < 1e-9)
    assert(math.abs(scalarOf("atanh(tanh(2)) - 2")) < 1e-9)
  }

  test("x % 86400 over epoch-second values ≡ seconds-since-midnight (B35 overlap)") {
    // the classic dashboard expression: timestamp(sel) % 86400 must
    // agree with hour/minute decomposition of the same values
    val modv = promql.PromQl.eval(spark, dir,
      """timestamp({typ="click"}) % 86400""", T)
      .select("usr", "typ", "value")
    val cal = promql.PromQl.eval(spark, dir,
      """hour(timestamp({typ="click"})) * 3600
        | + minute(timestamp({typ="click"})) * 60""".stripMargin, T)
      .select("usr", "typ", "value")
    val m = modv.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val c = cal.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.nonEmpty && m.keySet == c.keySet)
    // mod keeps the seconds component; the calendar path truncates it
    m.foreach { case (k, v) =>
      val d = v - c(k); assert(d >= 0 && d < 60, s"$k: $v vs ${c(k)}") }
  }

  test("@ start()/end() and negative offset: grid anchors and forward look") {
    // negative offset ≡ evaluating the plain selector later by |offset|
    val neg = rows(promql.PromQl.eval(spark, dir,
      """{typ="view"} offset -1d""", "2024-01-30 00:00:00"))
    val fwd = rows(promql.PromQl.eval(spark, dir,
      """{typ="view"}""", T))
    assert(neg == fwd && neg.nonEmpty)
    // @ end() in a range query: every grid point equals the instant
    // value at the grid END; @ start() likewise at the grid START
    val start = "2024-01-29 00:00:00"
    def gridVals(anchor: String): Set[Seq[String]] =
      rows(promql.PromQl.evalRange(spark, dir,
        s"""sum by (usr) (count_over_time({typ="click"}[30d] @ $anchor))""",
        start, T, 86400L).select("usr", "value").distinct())
    val atEnd = rows(promql.PromQl.eval(spark, dir,
      """sum by (usr) (count_over_time({typ="click"}[30d]))""", T))
    val atStart = rows(promql.PromQl.eval(spark, dir,
      """sum by (usr) (count_over_time({typ="click"}[30d]))""", start))
    assert(gridVals("end()") == atEnd && atEnd.nonEmpty)
    assert(gridVals("start()") == atStart && atStart.nonEmpty)
  }

  test("limitk / limit_ratio: deterministic subset semantics") {
    val all = rows(promql.PromQl.eval(spark, dir,
      """sum by (usr) (count_over_time({typ=~".*"}[30d]))""", T))
    // limitk is a subset of the vector, first-k by label order
    val lk = rows(promql.PromQl.eval(spark, dir,
      """limitk(3, sum by (usr) (count_over_time({typ=~".*"}[30d])))""", T))
    assert(lk.subsetOf(all) && lk.size == math.min(3, all.size))
    val firstUsrs = all.map(_.head).toSeq.sorted.take(3).toSet
    assert(lk.map(_.head) == firstUsrs)
    // limit_ratio(r) and limit_ratio(r-1) PARTITION the vector
    // (Prometheus's complement property), and ±1 are the identity
    val pos = rows(promql.PromQl.eval(spark, dir,
      """limit_ratio(0.4, sum by (usr) (count_over_time({typ=~".*"}[30d])))""", T))
    val neg = rows(promql.PromQl.eval(spark, dir,
      """limit_ratio(-0.6, sum by (usr) (count_over_time({typ=~".*"}[30d])))""", T))
    assert((pos intersect neg).isEmpty)
    assert((pos union neg) == all)
    assert(rows(promql.PromQl.eval(spark, dir,
      """limit_ratio(1, sum by (usr) (count_over_time({typ=~".*"}[30d])))""", T)) == all)
    assert(rows(promql.PromQl.eval(spark, dir,
      """limit_ratio(-1, sum by (usr) (count_over_time({typ=~".*"}[30d])))""", T)) == all)
  }

  test("graft_promql TVF: SQL path ≡ Scala eval") {
    index.IndexSql.register(spark)
    val viaSql = spark.sql(
      s"""SELECT usr, typ, value FROM graft_promql('$dir',
         |  'max_over_time({usr<="3"}[30d])', '$T')""".stripMargin)
    val viaApi = promql.PromQl.eval(spark, dir,
      """max_over_time({usr<="3"}[30d])""", T)
      .select("usr", "typ", "value")
    assert(rows(viaSql) == rows(viaApi) && rows(viaSql).nonEmpty)
  }
}
