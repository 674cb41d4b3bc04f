package graft.operators

import graft.{Memo, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational core: scan/filter/agg, joins (broadcast where the dim is
  * small), windows, semi/anti joins, distinct counting, JSON extraction.
  *
  * Scale notes: every query here is declarative so Catalyst pushes
  * filters/pruning into the parquet scan; dimension tables (region,
  * nation, supplier, customer at TPC-H ratios) are broadcast explicitly
  * so the fact scan never shuffles for them; aggregations are
  * partial-agg friendly (map-side combine).
  */
object Relational {

  /** TPC-H Q1-style pricing summary: one full lineitem scan, 4-group agg.
    * At 100 TB this is scan-bound; partial aggregation makes the shuffle
    * 4 rows per task.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3-style: customer ⋈ orders ⋈ lineitem, revenue per order,
    * top-N. customer is broadcast (small dim); orders⋈lineitem shuffles
    * on orderkey — the natural co-partitioning key for both tables.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: full star join; all dims broadcast so lineitem
    * (the 100 TB fact) is scanned once with zero dim-induced shuffles;
    * the only shuffle is the final tiny groupBy(n_name).
    */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val cust = Tables.customer(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** Window functions: per-supplier ship-order ranking + running
    * quantity. Single shuffle on l_suppkey; both windows share the
    * same partitioning so Spark evaluates them in one Window node.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        round(sum(col("l_quantity")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .filter(col("rn") <= 5)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
        col("l_linenumber"), col("running_qty"))
  }

  /** Semi + anti join: customers with an open ('O') order but no
    * finished ('F') order. Both sides aggregate to key-sets before the
    * join at scale; expressed as left_semi/left_anti so Catalyst can
    * choose broadcast/shuffle-hash and skip payload columns.
    */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val open = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val fin = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
      .join(fin, cust("c_custkey") === fin("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Exact + approximate distinct counting. The exact count shuffles
    * on the key; approx (HLL) is a constant-size sketch mergeable
    * map-side — the 100 TB default. Oracle checks the exact column;
    * approx is emitted alongside for the bench.
    */
  def distinctCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
  }

  /** Interval (range) join: for every error event, purchases by the
    * same user within ±1h — the batch form of a stream-stream interval
    * join. µs-exact bounds on unix_micros so the oracle is bitwise
    * comparable; at scale both sides bucket by (usr, time-band) so the
    * range condition is band-local.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("u"), unix_micros(col("ts")).as("eu"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu_u"), unix_micros(col("ts")).as("pu"))
    // the range bound lives in the JOIN condition: errors with no
    // in-range purchase must survive with n_nearby = 0
    err.join(pur,
        col("u") === col("pu_u") && abs(col("pu") - col("eu")) <= 3600L * 1000000L,
        "left_outer")
      .groupBy(col("event_id"), col("u"))
      .agg(count(col("pid")).as("n_nearby"))
      .select(col("event_id"), col("u").cast("string").as("usr"), col("n_nearby"))
  }

  /** C21: incremental materialized-view maintenance — the algebraic
    * partial-state merge that keeps a 100 TB rollup fresh without
    * rescanning the fact table: the maintained view stores mergeable
    * state (count, sum, sum-of-squares per group), a new batch
    * aggregates to the same state shape, and refresh = union the two
    * state tables and sum-merge per group — cost ∝ |batch| + |view|,
    * never ∝ |history|. Count/sum/moments merge exactly; the derived
    * stddev is computed once at read time from the merged moments.
    *
    * The oracle recomputes the view from ALL events in one pass — the
    * gate proves the incremental path is indistinguishable from full
    * recompute, which is the MV-maintenance correctness contract.
    * Determinism: sums are exact integer cents (and cents², bounded
    * well inside long range), so merge order can't matter; stddev is
    * a fixed sequence of IEEE ops on exact integers, floored to the
    * 1e-6 grid.
    */
  def mvMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("string").as("usr"),
        col("event_type").as("typ"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    def state(df: DataFrame): DataFrame =
      df.groupBy(col("usr"), col("typ"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          sum(col("cents") * col("cents")).as("sq"))
    // the stored view state (history) and the incoming batch
    val view = state(ev.filter(pmod(col("event_id"), lit(7)) =!= 0))
    val batch = state(ev.filter(pmod(col("event_id"), lit(7)) === 0))
    view.unionAll(batch)
      .groupBy(col("usr"), col("typ"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"), sum(col("sq")).as("sq"))
      .select(col("usr"), col("typ"), col("n"),
        col("s").as("sum_cents"),
        (floor(sqrt(col("sq").cast("double") / col("n")
          - (col("s").cast("double") / col("n"))
          * (col("s").cast("double") / col("n"))) * 1e6 + 0.5) / 1e6)
          .as("stddev_cents"))
  }

  /** C20: data-quality audit — the expectation suite every ingest runs
    * before data reaches training (the Deequ/dbt-test shape): primary-
    * key uniqueness, referential integrity, domain-range checks, and
    * null-rate bounds, reported as one row per check with violation
    * counts. The mix is deliberately non-vacuous: the events value cap
    * check FAILS on this corpus (values run past 300), so the report
    * path for failures is exercised, not just the all-green path.
    *
    * Shape at 100 TB: all checks against one table fold into ONE
    * conditional-aggregate pass over it (a naive suite scans the table
    * once per check); the FK orphan check is the only join and it
    * broadcasts the dimension's key set. Results are O(#checks) rows
    * unioned from scalar aggregates.
    */
  def dataAudit(spark: SparkSession, dir: String): DataFrame = {
    def chk(name: String, n: Column, viol: Column): Column =
      struct(lit(name).as("check_name"), n.cast("long").as("n_checked"),
        viol.cast("long").as("n_viol"), (viol === 0).as("pass"))
    // one 1-row aggregate per table -> explode into its check rows
    def checksOf(df: DataFrame, rows: Column*): DataFrame =
      df.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
    val li = Tables.lineitem(spark, dir)
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)
          .otherwise(0)).as("v_qty"),
        sum(when(col("l_extendedprice") <= 0, 1).otherwise(0)).as("v_price"))
    val ev = Tables.events(spark, dir)
      .agg(count(lit(1)).as("n"),
        sum(when(col("value").isNull, 1).otherwise(0)).as("v_null"),
        sum(when(col("value") > 300, 1).otherwise(0)).as("v_cap"))
    val ord = Tables.orders(spark, dir)
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"))
    val orphans = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"))), Seq("o_custkey"),
        "left_anti")
      .agg(count(lit(1)).as("v_fk"))
    checksOf(li,
      chk("lineitem_qty_in_1_50", col("n"), col("v_qty")),
      chk("lineitem_price_positive", col("n"), col("v_price")))
      .unionAll(checksOf(ord.crossJoin(orphans),
        chk("orders_pk_unique", col("n"), col("v_pk")),
        chk("orders_fk_customer", col("n"), col("v_fk"))))
      .unionAll(checksOf(ev,
        chk("events_value_not_null", col("n"), col("v_null")),
        chk("events_value_le_300", col("n"), col("v_cap"))))
  }

  /** C19: banded range join — classify every event value into an
    * irregular band table (SLO/latency bands) where the ONLY join key
    * is a range predicate. The naive plan is a broadcast nested loop
    * (O(N·M) compares — fatal once the band table is 10⁵ rules);
    * the scale shape used here is the bucketed range join: each band
    * explodes into the fixed-width buckets it overlaps, events derive
    * their bucket in the projection, and the join is a plain hash
    * equi-join on bucket with the band predicate as a residual filter
    * — O(N) probes regardless of band-table size, the same trick
    * Databricks' range-join optimization applies under the hood.
    *
    * Bands are right-closed (lo, hi] and non-overlapping, so each
    * event lands in exactly one band; per-band value sums go through
    * exact integer cents (the corpus carries 2-decimal doubles).
    */
  def bandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val width = 25.0
    val bands = Seq(
      ("fast", 0.0, 5.0), ("ok", 5.0, 20.0), ("slow", 20.0, 80.0),
      ("degraded", 80.0, 150.0), ("critical", 150.0, 400.0))
      .toDF("band", "lo", "hi")
      .select(col("band"), col("lo"), col("hi"),
        explode(sequence(floor(col("lo") / width).cast("long"),
          floor(col("hi") / width).cast("long"))).as("bucket"))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("value"),
        floor(col("value") / width).cast("long").as("bucket"))
    ev.join(broadcast(bands), Seq("bucket"))
      .filter(col("value") > col("lo") && col("value") <= col("hi"))
      .groupBy(col("band"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_cents"))
  }

  /** C17: funnel analysis — ordered-step conversion (view → click →
    * purchase, strictly increasing event time, completion within 7
    * days of the first step). The per-user step anchors are min()
    * chains — each step is one groupBy over the pre-filtered step
    * events joined to the previous anchor, so the plan is three
    * partial-agg aggregations co-partitioned on user_id (at scale one
    * shuffle each, or zero extra with a user-bucketed layout, I5) —
    * never a self-join of the full event table per step.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("us") > col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("us")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("us") > col("t2"))
      .groupBy(col("user_id"), col("t1"), col("t2")).agg(min(col("us")).as("t3"))
      .filter(col("t3") - col("t1") <= lit(7L * 24 * 3600 * 1000000L))
    val n1 = s1.agg(count(lit(1)).as("n")).select(col("n"))
    val n2 = s2.agg(count(lit(1)).as("n")).select(col("n"))
    val n3 = s3.agg(count(lit(1)).as("n")).select(col("n"))
    n1.select(col("n").as("n_view"))
      .crossJoin(n2.select(col("n").as("n_click")))
      .crossJoin(n3.select(col("n").as("n_purchase")))
      .withColumn("cr_click",
        floor(col("n_click") / col("n_view") * lit(1e4) + lit(0.5)) / lit(1e4))
      .withColumn("cr_full",
        floor(col("n_purchase") / col("n_view") * lit(1e4) + lit(0.5)) / lit(1e4))
  }

  /** C18: retention cohorts — users grouped by first-activity day,
    * per-day-offset distinct-active counts and retention ratios
    * (offsets 0..7). Two aggregations over (user, day) distinct
    * activity plus one small join — the standard cohort-matrix plan;
    * both aggregations shuffle on user_id/cohort only, and the
    * cohort-size table is broadcast back.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("n0"))
    act.join(first, Seq("user_id"))
      .withColumn("k", datediff(col("day"), col("cohort")))
      .filter(col("k") <= 7)
      .groupBy(col("cohort"), col("k"))
      .agg(countDistinct(col("user_id")).as("n"))
      .join(broadcast(sizes), Seq("cohort"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("k").cast("long").as("day_offset"), col("n"), col("n0"),
        (floor(col("n") / col("n0") * lit(1e4) + lit(0.5)) / lit(1e4))
          .as("retained"))
  }

  /** C22: gap-based sessionization — per-user event streams split into
    * sessions at inactivity gaps > 30 min, then per-user session stats
    * (count, busiest session, distinct-type width, mean duration).
    *
    * The whole operator is ONE shuffle on user_id: the gap flag and the
    * running session ordinal are window functions over (user_id; ts,
    * event_id), and both aggregation levels (per-session, then
    * per-user) reuse that partitioning — Catalyst plans them as
    * partial aggs over the same exchange, no self-join, no per-session
    * data movement. At 100 TB the skew bound is the busiest single
    * user's history, the same bound the window sort already pays.
    * Reference framing: tagtree's per-series time-ordered sample
    * streams (include/tagtree/tsdb/series.h) are this layout; a
    * session is the analytics-side analog of its time-bounded
    * segments.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeOn(Tables.events(spark, dir))

  /** DataFrame-generic sessionization; input needs (user_id, event_id,
    * event_type, ts). Exposed so the scale probe can drive the same
    * plan over replicated corpora.
    */
  def sessionizeOn(events: DataFrame): DataFrame = {
    val gapUs = 30L * 60 * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val ev = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val flagged = ev
      .withColumn("__prev", lag(col("us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("us") - col("__prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_ord", sum(col("__new")).over(w))
    val sessions = flagged.groupBy(col("user_id"), col("session_ord"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        ((max(col("us")) - min(col("us"))) / lit(1000000.0)).as("dur_sec"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_events"),
        max(col("n_types")).as("max_types"),
        (floor(avg(col("dur_sec")) * lit(1e4) + lit(0.5)) / lit(1e4))
          .as("avg_dur_sec"))
  }

  /** C25 (round 9): slowly-changing-dimension TYPE 2 build — the
    * warehouse pattern that turns an event stream into a versioned
    * dimension: per user, each CHANGE of the tracked attribute (here
    * event_type as the user's "current activity") opens a new version
    * row with [valid_from, valid_to) validity, `valid_to` closed by
    * the next change (lead), the open row flagged current. One
    * user_id exchange carries the lag-dedup, the lead-close and the
    * version numbering (three window functions, same partitioning —
    * Catalyst evaluates them in one Window run per ordering). At
    * 100 TB: shuffle ∝ events once on the natural key, output ∝
    * #changes — the standard MERGE-free SCD2 derivation that
    * backfills a dimension from history in one pass.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame =
    scd2On(Tables.events(spark, dir))

  /** DataFrame-generic SCD2; input needs (user_id, event_id,
    * event_type, ts). Exposed so the scale probe drives the same plan
    * over replicated corpora.
    */
  def scd2On(events: DataFrame): DataFrame = {
    val ev = events.select(
      col("user_id"), col("event_id"),
      col("event_type").as("attr"), unix_micros(col("ts")).as("us"))
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val changes = ev
      .withColumn("__prev", lag(col("attr"), 1).over(wOrd))
      .filter(col("__prev").isNull || col("__prev") =!= col("attr"))
    val wCh = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    changes
      .withColumn("valid_to_us", lead(col("us"), 1).over(wCh))
      .withColumn("version", row_number().over(wCh).cast("long"))
      .select(col("user_id"), col("attr"),
        col("us").as("valid_from_us"), col("valid_to_us"),
        col("version"), col("valid_to_us").isNull.as("is_current"))
  }

  /** C28 (round 10): POINT-IN-TIME (as-of) dimension join — the
    * leakage-safe feature join every ML warehouse needs: each PURCHASE
    * fact joins the SCD2 dimension version that was valid AT the
    * fact's own timestamp (never a later one — the label-leakage bug
    * this operator class exists to prevent). Composition: C25's
    * version build → drop degenerate same-µs predecessors (so
    * valid_from is a strict total order per user and the as-of pick is
    * deterministic) → [[graft.plans.AsOfJoin]] (union + ordered
    * window — ONE exchange on the natural key, no range join, no
    * per-fact probe; the at-scale shape for billions of facts against
    * millions of dimension versions). The gate aggregates spend by
    * at-purchase-time dimension state; the oracle replays the interval
    * join form (vf ≤ us < vt) — as-of ≡ interval containment because
    * the filtered versions PARTITION each user's timeline, so the gate
    * is also a cross-form equivalence proof.
    */
  def scd2AsOf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = scd2On(ev)
      .filter(col("valid_to_us").isNull ||
        col("valid_from_us") < col("valid_to_us"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    // distinct probe instants, then re-attach fact payloads: two
    // purchases at the same µs share one as-of resolution and must
    // not fan out through the re-join
    val joined = graft.plans.AsOfJoin.asofJoin(
      dim.select(col("user_id"), col("valid_from_us"), col("attr")),
      facts.select(col("user_id"), col("us")).distinct(),
      Seq("user_id"), "valid_from_us", "attr", "us")
    joined.join(facts, Seq("user_id", "us"))
      .groupBy(col("asof_value").as("attr_at"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** C26 (round 9): trailing-window feature assembly — the
    * feature-engineering pattern that turns an event stream into
    * supervised training examples: for every PURCHASE event, the
    * user's previous five event types (most recent last) become the
    * example's sequence feature, with the count of available history.
    * One user_id exchange carries the whole derivation: collect_list
    * over the ordered ROWS [-5, -1] frame is deterministic (frame
    * order = window order), and the label filter applies AFTER the
    * window so short histories still emit with what exists. At 100 TB
    * this is the one-pass alternative to the 5-way self-join a naive
    * "previous k events" query runs — shuffle ∝ events on the natural
    * key, state ∝ k per row.
    */
  def featureAssembly(spark: SparkSession, dir: String): DataFrame =
    featureAssemblyOn(Tables.events(spark, dir))

  /** DataFrame-generic assembly; input needs (user_id, event_id,
    * event_type, ts). Exposed for the scale probe. */
  def featureAssemblyOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
      .rowsBetween(-5, -1)
    events
      .withColumn("hist", collect_list(col("event_type")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        concat_ws(",", col("hist")).as("prev5"),
        size(col("hist")).as("n_prev"))
  }

  /** C23: Count–Min sketch — the mergeable bounded-memory frequency
    * estimator that pairs with C13's Misra–Gries (which keeps top
    * candidates; CMS answers point queries for ANY key). d=4 rows ×
    * w=2048 counters; row hashes are the standard pairwise scheme
    * h_i = (h1 + i·h2) mod w over the [[graft.functions.DualPolyHash]]
    * codegen token hash; point estimate = min_i counter[i][h_i(x)].
    *
    * Plan shape: ONE token-stream pass builds the counter table with
    * partial aggregation over a BOUNDED keyspace (≤ d·w rows — the
    * sketch stays broadcast-sized at any corpus volume; this is the
    * whole point: at 100 TB the counters are the only state that
    * moves). The top-20 true tokens then probe the broadcast counter
    * table. The CMS guarantee est ≥ true is implicit in the gate: the
    * DuckDB oracle replays the identical counters, so both columns
    * hash-match exactly.
    * Reference framing: the same mergeable-summary role as tagtree's
    * per-segment postings stats (include/tagtree/index/mem_index.h) —
    * a fixed-size synopsis standing in for the full distribution.
    */
  def cmsEstimate(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 2048
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    def withHashes(df: DataFrame): DataFrame = df
      .withColumn("__p", graft.functions.DualPolyHash.column(spark, col("tok")))
      .withColumn("__h1", expr("__p div 2147483648"))
      .withColumn("__h2", col("__p") % lit(2147483648L))
    val counters = withHashes(toks)
      .withColumn("i", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("bucket", (col("__h1") + col("i") * col("__h2")) % lit(w.toLong))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_n"))
      .orderBy(col("true_n").desc, col("tok").asc).limit(20)
    withHashes(top)
      .withColumn("i", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("bucket", (col("__h1") + col("i") * col("__h2")) % lit(w.toLong))
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy(col("tok"), col("true_n"))
      .agg(min(col("c")).as("est_n"))
      .select(col("tok"), col("true_n"), col("est_n"))
  }

  /** C24: recursive ancestor closure — per-node root-path depth in a
    * synthetic hash-parent forest (parent(d) = ((d·2654435761) mod
    * 1000000007) mod d for d > 0 — pseudo-random, strictly decreasing,
    * so the graph is a tree rooted at 0), the recursive-query class
    * (org charts, BOM explosions, thread ancestry) Spark has no native
    * operator for.
    *
    * Resolution runs by POINTER DOUBLING: each round joins every
    * node's known ancestor pointer with that ancestor's own pointer
    * and adds the two path lengths, so a depth-D chain resolves in
    * ⌈log₂ D⌉ self-joins instead of D. At 100 TB that is the whole
    * story: 30 co-partitioned equi-joins cover depth 2³⁰, where the
    * per-level walk (which the DuckDB oracle replays as a recursive
    * CTE — cross-form equivalence, the corr_subquery precedent) needs
    * D full passes. Root rows map to themselves with length 0, so
    * converged nodes are fixpoints of the doubling step; convergence
    * is one scalar count per round (the Dedup.clusters discipline),
    * and each round's cache replaces the previous one. The CONVERGED
    * frame is memoized (one pinned copy per session+dataset, released
    * by Memo.clear): each round's lineage references the previous
    * round twice (cur ⋈ m), so an uncached replay of the final frame
    * fans out ~2^rounds base-table scans — the cache is not an
    * optimization here but the thing that keeps consumption O(rows).
    */
  def ancestorClosure(spark: SparkSession, dir: String): DataFrame = {
    val converged = Memo.cached(spark, s"relational.ancestorClosure:$dir") {
      ancestorClosureConverged(Tables.documents(spark, dir))
    }
    converged.select(col("node").as("doc_id"), col("depth"))
  }

  /** The doubling loop on an arbitrary `doc_id` frame. Returns the
    * CONVERGED frame (node, anc, depth), cached and fully materialized
    * (the convergence count of the last round scans it) — the caller
    * owns its release (Memo above; explicit unpersist in ScaleProbe).
    */
  private[graft] def ancestorClosureConverged(docs: DataFrame): DataFrame = {
    val parent = (col("doc_id") * lit(2654435761L)) % lit(1000000007L) % col("doc_id")
    var cur = docs.select(
      col("doc_id").as("node"),
      when(col("doc_id") === 0, lit(0L)).otherwise(parent).as("anc"),
      when(col("doc_id") === 0, lit(0L)).otherwise(lit(1L)).as("depth"))
      .cache()
    var unresolved = cur.filter(col("anc") =!= 0).count()
    while (unresolved > 0) {
      val m = cur.select(col("node").as("anc"),
        col("anc").as("anc2"), col("depth").as("d2"))
      val next = cur.join(m, Seq("anc"))
        .select(col("node"), col("anc2").as("anc"),
          (col("depth") + col("d2")).as("depth"))
        .cache()
      unresolved = next.filter(col("anc") =!= 0).count()
      cur.unpersist()
      cur = next
    }
    cur
  }

  /** C12: pivot — long-to-wide aggregation (per-user event-type count
    * matrix). The pivot value set is declared explicitly: Spark then
    * plans ONE pass with a conditional aggregate per value instead of
    * a distinct-scan to discover columns (which at 100 TB is an extra
    * full pass and a driver-side schema surprise).
    */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "error", "signup")
    val wide = Tables.events(spark, dir)
      .groupBy(col("user_id").cast("string").as("usr"))
      .pivot("event_type", types)
      .count()
    wide.select(col("usr") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** C11: ROLLUP — the subtotal lattice over (returnflag, linestatus):
    * the OLAP grouping-sets surface. Spark expands the lattice map-side
    * (one Expand node, one shuffle) — same cost class as the flat
    * groupBy. Grouping-null subtotal rows are labeled 'ALL' on both
    * engines (the data columns are never NULL here, so coalesce is
    * unambiguous).
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"), col("sum_price"))

  /** C15: full CUBE over (source, lang) — all four grouping-set
    * marginals of the corpus-mix matrix in one pass (C11's rollup emits
    * only the prefix hierarchy). One Expand + one partial-agg
    * aggregate; the 2^k set expansion happens map-side, never as k
    * separate scans.
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .cube(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .select(coalesce(col("source"), lit("ALL")).as("source"),
        coalesce(col("lang"), lit("ALL")).as("lang"),
        col("n_docs"), col("sum_chars"))

  /** JSON extraction over events.props — the tagtree "extended labels"
    * path (arbitrary tag maps). get_json_object is codegen'd; at scale
    * prefer from_json with an explicit schema once known.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("k")), 4).as("avg_k"),
        max(col("k")).as("max_k"))
  }

  /** C14: correlated scalar subquery (TPC-H Q17 shape) — per-brand
    * revenue from "small" line items, where small is defined against
    * each PART's own average quantity (the correlated aggregate).
    * Spark-first decorrelation: the per-part averages are ONE groupBy
    * over lineitem reused across all outer rows — the same rewrite
    * Catalyst applies to a correlated scalar subquery, stated
    * explicitly so the plan is one aggregate + one shuffle join + one
    * broadcast dim join, never a per-row re-scan. The DuckDB oracle
    * keeps the subquery in correlated form, gating cross-form
    * equivalence. Quantities are integer-valued doubles, so per-part
    * avg = exact_sum/n is order-independent and the `< 0.5*avg`
    * threshold compares identical doubles on both engines.
    */
  def corrSubquery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val avgQty = li.groupBy(col("l_partkey")).agg(avg(col("l_quantity")).as("__aq"))
    li.join(avgQty, Seq("l_partkey"))
      .filter(col("l_quantity") < col("__aq") * 0.5)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(countDistinct(col("p_partkey")).as("n_parts"),
        count(lit(1)).as("n_small"),
        round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** C13: frequent items (heavy hitters) — top-5 floor(value) buckets
    * per label via the mergeable Misra–Gries summary
    * (graft.functions.FreqItemsAgg): O(capacity) state per group
    * through partial agg and the shuffle, vs a full per-group key
    * histogram. Capacity (1024) exceeds the distinct-bucket count at
    * test SF (≤ 328), where the summary is provably exact and the
    * DuckDB group-by oracle gates the whole pipeline — the same
    * exact-at-test-scale framing as the quantile sketch (B24); at
    * 100 TB the identical plan degrades gracefully to ε-approximate
    * heavy hitters (error ≤ n/1025).
    */
  /** C16: corpus snapshot diff — classify every document across two
    * corpus revisions as added / removed / changed / unchanged and
    * report counts per source. Snapshot B is derived from the corpus
    * deterministically (doc_id%13 dropped, doc_id%10 text-revised,
    * doc_id%17 cloned as fresh docs) so all four classes are
    * populated and the oracle rebuilds the identical revision.
    *
    * One full-outer sort-merge join on doc_id + a partial-agg rollup —
    * the canonical "what changed between two 100 TB snapshot dumps"
    * plan. At scale both snapshots are bucketed by doc_id so the
    * full-outer join is co-located (I5); comparing xxhash64(text)
    * instead of text keeps the shuffle narrow (hash-prefilter + the
    * D8 exact-confirm pattern if hashes must not be trusted).
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val b = a.filter(pmod(col("doc_id"), lit(13)) =!= 0)
      .withColumn("text", when(pmod(col("doc_id"), lit(10)) === 0,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      .unionByName(a.filter(pmod(col("doc_id"), lit(17)) === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("source"),
          concat(col("text"), lit(" fresh")).as("text")))
    val av = a.select(col("doc_id"), col("source").as("src_a"),
      col("text").as("text_a"))
    val bv = b.select(col("doc_id"), col("source").as("src_b"),
      col("text").as("text_b"))
    av.join(bv, Seq("doc_id"), "full_outer")
      .withColumn("cls",
        when(col("text_a").isNull, lit("added"))
          .when(col("text_b").isNull, lit("removed"))
          .when(col("text_a") === col("text_b"), lit("same"))
          .otherwise(lit("changed")))
      .groupBy(coalesce(col("src_a"), col("src_b")).as("source"))
      .agg(
        sum(when(col("cls") === "added", lit(1L)).otherwise(lit(0L))).as("n_added"),
        sum(when(col("cls") === "removed", lit(1L)).otherwise(lit(0L))).as("n_removed"),
        sum(when(col("cls") === "changed", lit(1L)).otherwise(lit(0L))).as("n_changed"),
        sum(when(col("cls") === "same", lit(1L)).otherwise(lit(0L))).as("n_same"))
  }

  /** C27 (round 9): weighted sampling WITHOUT replacement — priority
    * sampling (Duffield–Lund–Thorup, JACM 2007), the curation
    * primitive that draws a fixed-size corpus sample where heavy
    * documents are proportionally more likely, with an unbiased
    * subset-sum estimator attached. Each doc gets priority
    * p = w / u: weight w = n_chars, u a DETERMINISTIC dyadic uniform
    * in (0, 1] — the low 40 bits of the [[graft.functions.DualPolyHash]]
    * of the doc id, +1, over 2^40. Both factors are exact in a
    * double and p is ONE IEEE division, so priorities are
    * bit-identical on any engine — the DuckDB oracle replays the
    * whole draw including the doubles, no rounding. The sample is
    * the n highest priorities; with τ = the (n+1)-th priority, the
    * Horvitz–Thompson estimate ŵ = max(w, τ) makes Σŵ unbiased for
    * Σw over ANY subset-sum query — the published guarantee that
    * lets a 200-doc sample answer corpus-size questions.
    *
    * Plan shape: one scan + TakeOrderedAndProject top-(n+1) — no
    * row ever shuffles; each task contributes its local top-(n+1)
    * and the driver holds n+1 rows at any corpus size.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val n = 200
    val m = 1099511627776L // 2^40
    val u = (pmod(graft.functions.DualPolyHash.column(spark,
        col("doc_id").cast("string")), lit(m)) + 1L).cast("double") /
      lit(m.toDouble)
    val pri = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        (col("n_chars").cast("double") / u).as("priority"))
    // Memo: τ and the sample both read the top-(n+1) frame — cache it
    // so the corpus is scanned ONCE, not once per consumer
    val top = graft.Memo.cached(spark, s"rel.wsample_top:$dir") {
      pri.orderBy(col("priority").desc, col("doc_id")).limit(n + 1)
    }
    val tau = top.agg(min(col("priority")).as("tau"))
    top.orderBy(col("priority").desc, col("doc_id")).limit(n)
      .crossJoin(broadcast(tau))
      .select(col("doc_id"), col("n_chars"), col("priority"),
        greatest(col("n_chars").cast("double"), col("tau")).as("w_hat"))
  }

  def freqItems(spark: SparkSession, dir: String): DataFrame = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_items_1024",
      exprs => graft.functions.FreqItemsAgg(exprs.head, 1024), "built-in")
    // explicit non-null key filter: the Misra–Gries update skips nulls
    // while a plain GROUP BY oracle would emit a NULL bucket — align the
    // semantics by construction rather than by corpus luck
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type").as("typ"))
      .agg(call_function("freq_items_1024",
        floor(col("value")).cast("long")).as("fi"))
      .select(col("typ"), posexplode(slice(col("fi"), 1, 5)))
      .select(col("typ"), (col("pos") + 1).as("rk"),
        col("col.k").as("bucket"), col("col.n").as("n"))
  }
}
