package graft.registry

import graft.core.{Diff, DiffOptions, Records}
import graft.ext.{Assemble, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.mapper.Mapper
import graft.pipeline.{ImportService, Preset}
import graft.sources.InlineSource
import graft.targets.{FileTarget, JdbcTarget}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Shared._

  /** Analytics surface (beyond reference parity — the engine is a
    * full Spark SQL engine; these pin the behaviors to oracles). */
private[graft] object AnalyticsRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON extraction (source S1/S2 decode JSON; here: nested field)
    "q_json" -> ((s, dir) =>
      tbl(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // date/time bucketing (K2 version-parse machinery generalized)
    "q_datetime" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * 100).cast("long")).as("value_cents"))),

    // window functions: rank + running sum per user
    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events").select(
        col("event_id"), col("user_id"),
        row_number().over(w).as("rn"),
        sum(floor(col("value") * 100).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .as("running_cents"))
    }),

    // relational set ops (set semantics — both engines dedup) over
    // (user, day) keys: purchase∩view days and view∖purchase days,
    // tagged. User-level keys would leave EXCEPT vacuously empty at
    // this density (every user purchases); user-days exercise both
    // branches with real rows.
    "q_setops" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      def userDays(t: String) =
        ev.filter(col("event_type") === t)
          .select(col("user_id"),
            floor(unix_timestamp(col("ts")) / 86400L).cast("long")
              .as("day_no"))
      userDays("purchase").intersect(userDays("view"))
        .select(lit("both").as("op"), col("user_id"), col("day_no"))
        .unionByName(
          userDays("view").except(userDays("purchase"))
            .select(lit("view_only").as("op"), col("user_id"),
              col("day_no")))
    }),

    // RANGE-framed window over event time: trailing 7-day sum/count
    // per user. A RANGE frame is defined by the ORDER value, so peer
    // rows (equal ts) share one frame and the result is
    // tie-order-insensitive — the deterministic way to express
    // "trailing window" when the sort key has duplicates (a ROWS
    // frame would be order-dependent there).
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-7L * 86400L * 1000000L, 0L)
      tbl(s, dir, "events").select(
        col("event_id"), col("user_id"),
        sum(floor(col("value") * 100).cast("long")).over(w)
          .as("trail7d_cents"),
        count(lit(1)).over(w).as("n_7d"))
    }),

    // SLIDING event-time windows (1 h length, 30 min step): every
    // event lands in exactly two windows; `window()` plans the
    // assignment as a narrow explode-and-project before ONE grouped
    // exchange — no self-join, no per-window scan
    "q_window_sliding" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("cents"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("n"), col("cents"))),

    // Markov transition counts: per-user event sequences (total
    // order ts, event_id) → (from, to) pair counts + truncating
    // integer ppm of the row-conditional probability. One window
    // pass partitioned by user + one grouped exchange.
    // fixed-width histogram of value_cents (500-cent buckets): the
    // classic distribution profile — one map-side-combined exchange
    "q_histogram" -> ((s, dir) =>
      tbl(s, dir, "events")
        .select((floor(floor(col("value") * 100) / 500) * 500)
          .cast("long").as("bucket_lo"))
        .groupBy(col("bucket_lo"))
        .agg(count(lit(1)).as("n"))),

    // bounded ordered list aggregation: per event type, the 5
    // smallest event ids joined as a string. The top-5 filter runs
    // BEFORE the collect (WindowGroupLimit keeps per-task heaps), so
    // no unbounded per-group list ever materializes — collect_list
    // only sees ≤ 5 rows per group
    "q_string_agg" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("event_id"))
      tbl(s, dir, "events")
        .select(col("event_type"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy(col("event_type"))
        .agg(concat_ws(",",
          sort_array(collect_list(col("event_id")))).as("first_ids"),
          count(lit(1)).as("n_listed"))
    }),

    "q_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = tbl(s, dir, "events")
        .select(col("user_id"), col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTotals = pairs.groupBy(col("from_type"))
        .agg(sum(col("n")).as("row_total"))
      pairs.join(fromTotals, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          expr("n * 1000000 div row_total").as("p_ppm"))
    }),

    // recency-decay engagement score: Σ cents·exp(−age_days) per
    // user, each event's contribution floored to micro units BEFORE
    // the sum (integer sum ⇒ order-free exact aggregate; the only FP
    // is the per-event exp, identical input ⇒ identical double on
    // both engines)
    "q_decay_score" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      // empty table ⇒ max is NULL ⇒ no rows downstream; 0 keeps the
      // fold-back literal total and the empty-in/empty-out contract
      val tMaxRow = ev.agg(max(unix_micros(col("ts")))).collect()(0)
      val tMax = if (tMaxRow.isNullAt(0)) 0L else tMaxRow.getLong(0)
      ev.select(col("user_id"),
        floor(floor(col("value") * 100) *
          exp(-(lit(tMax) - unix_micros(col("ts"))).cast("double")
            / lit(86400000000.0)))
          .cast("long").as("contrib_micro"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("contrib_micro")).as("score_micro"))
    }),

    // pivot (long → wide): per-user value_cents by event type. The
    // value list is EXPLICIT — deterministic column set, no
    // distinct-values pre-scan job on the driver
    "q_pivot" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(floor(col("value") * 100).cast("long")))),

    // unpivot (wide → long): lineitem measures melted to
    // (measure, cents) rows — all cast to exact integer cents BEFORE
    // the melt so the unified value column has one type
    "q_unpivot" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          floor(col("l_quantity") * 100).cast("long").as("quantity"),
          floor(col("l_extendedprice") * 100).cast("long").as("extendedprice"),
          floor(col("l_discount") * 100).cast("long").as("discount"),
          floor(col("l_tax") * 100).cast("long").as("tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
          Array(col("quantity"), col("extendedprice"),
            col("discount"), col("tax")),
          "measure", "cents")),

    // gap-based sessionization (30-minute inactivity boundary)
    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("new_session"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("event_id"), col("user_id"), col("session_seq"))
    }),

    // grouping sets: rollup region → nation
    "q_rollup" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val n = s.read.parquet(t(dir, "nation"))
      val r = s.read.parquet(t(dir, "region"))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
    }),

    // top-k with deterministic total order
    "q_topk" -> ((s, dir) =>
      tbl(s, dir, "events")
        .select(col("event_id"),
          floor(col("value") * 100).cast("long").as("value_cents"))
        .orderBy(col("value_cents").desc, col("event_id"))
        .limit(100)),

    // grouped top-k through the custom bounded-buffer Aggregator
    // (map-side combine, no per-group full sort) — oracle-checked
    // against the window formulation in DuckDB
    "q_topk_grouped" -> ((s, dir) =>
      graft.ext.Similarity.topKAgg(
        tbl(s, dir, "events")
          .select(col("event_type").as("q_id"),
            floor(col("value") * 100).cast("double").as("sim"),
            col("event_id").as("n_id")), k = 5)
        .select(col("q_id").as("event_type"),
          col("n_id").as("event_id"),
          col("sim").cast("long").as("value_cents"),
          col("rank").cast("long").as("rank"))),

    // distinct
    "q_distinct" -> ((s, dir) =>
      tbl(s, dir, "events").select(col("event_type")).distinct()),

    // grouping sets: full cube
    "q_cube" -> ((s, dir) =>
      tbl(s, dir, "events")
        .cube(col("event_type"),
          date_format(col("ts"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("cnt"))),

    // explicit GROUPING SETS — the general form cube/rollup
    // specialize: two independent single-column breakdowns plus the
    // grand total in ONE pass (one Expand + one aggregate exchange,
    // not three scans), with grouping_id disambiguating which set
    // each output row belongs to
    "q_grouping_sets" -> ((s, dir) =>
      tbl(s, dir, "events")
        .withColumn("user_mod", pmod(col("user_id"), lit(10L)))
        .groupingSets(
          Seq(Seq(col("event_type")), Seq(col("user_mod")), Seq()),
          col("event_type"), col("user_mod"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("cents"),
          grouping_id().as("gid"))),

    // multi-join aggregation (TPC-H Q5 shape): revenue by nation
    "q5_join" -> ((s, dir) => {
      val r = s.read.parquet(t(dir, "region")).filter(col("r_name") === "ASIA")
      val n = s.read.parquet(t(dir, "nation"))
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      val l = s.read.parquet(t(dir, "lineitem"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"))
    }),

    // anti-join (NOT EXISTS): customers with no orders
    "q_antijoin" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // as-of join: each event's most recent strictly-prior click
    // bucketized range join: events against per-user first-6h
    // windows — one equi-join on the time bucket instead of a
    // nested-loop theta join (oracle: DuckDB range predicate)
    "q_range_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val pts = e.select(col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"))
      val iv = e.filter(col("user_id") % 50 === 0)
        .groupBy(col("user_id").as("iv_user"))
        .agg(min(unix_timestamp(col("ts"))).as("start_s"))
        .withColumn("end_s", col("start_s") + 21600L)
      graft.core.RangeJoin.rangeJoin(pts, "ts_s", iv,
          "start_s", "end_s", bucketWidth = 3600L)
        .select(col("event_id"), col("iv_user"), col("ts_s"))
    }),

    "q_asof" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
      graft.core.AsOfJoin.asofJoin(
        e, clicks, key = Seq("user_id"),
        leftOrder = Seq("ts_us", "event_id"),
        rightOrder = Seq("ts_us", "event_id"),
        rightPayload = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("prev_click_id"))
    }),

    // Exact interpolated percentiles per group. SCALE CONSTRAINT:
    // exact percentile buffers each group's values on its reducer —
    // with few groups that is few hot tasks holding group-size state.
    // At 100 TB swap in approx_percentile (t-digest, mergeable
    // map-side partials, documented error bound); it is not used HERE
    // because the oracle gate needs bit-exact cross-engine results.
    // Compared columns are floor-micro integers: floor(x·1e6) has no
    // round-half convention to disagree about (only the accepted
    // 1-ulp-at-a-boundary risk every micro-unit column carries) —
    // both engines interpolate a + (b−a)·f over the same doubles.
    "q_percentile" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          floor(percentile(col("value"), lit(0.5)) * 1000000L)
            .cast("long").as("p50_micro"),
          floor(percentile(col("value"), lit(0.95)) * 1000000L)
            .cast("long").as("p95_micro"))),

    // The 100 TB scale path for q_percentile, oracle-certified: Spark's
    // `percentile_approx` (Greenwald-Khanna sketch, mergeable map-side
    // partials — no reducer ever buffers a group). The sketch is
    // DETERMINISTIC below its compression threshold: with error budget
    // 2·n/accuracy < 1 no sample is ever merged away, and query(p)
    // provably returns the element at rank ceil(p·n) — which the
    // DuckDB oracle replays as an exact rank selection (gate groups
    // are ~2000 events at accuracy 10000, budget 0.4). Past the
    // threshold the answer degrades gracefully to ±n/accuracy ranks —
    // the documented approx contract; the gate certifies the sketch
    // path's plumbing and its small-group exactness.
    "q_percentile_approx" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          floor(percentile_approx(col("value"), lit(0.5), lit(10000))
            * 1000000L).cast("long").as("p50_micro"),
          floor(percentile_approx(col("value"), lit(0.95), lit(10000))
            * 1000000L).cast("long").as("p95_micro"))),

    // salted join for skewed keys — result equals the plain join
    "q_salted_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val users = e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_events"))
      graft.core.Skew.saltedJoin(e, users, "user_id", saltFactor = 8)
        .groupBy(col("user_id"), col("user_events"))
        .agg(count(lit(1)).as("n"))
    }),

    // ── Bloom-prefiltered SELECTIVE join — the runtime-filter shape
    // (what Spark's InjectRuntimeFilter does for DPP-ineligible
    // joins), built explicitly so the prefilter is plan-visible: the
    // ~2%-selective order-key set builds a Bloom sketch (one agg job
    // over the small side); the probe rides the lineitem scan as the
    // codegen'd native BloomFilterMightContain — a NARROW map-side
    // filter that drops ~98% of the fact side BEFORE the join
    // shuffle. The exact semi-join after it absorbs the bloom's
    // false positives, so the output is identical to the plain join
    // — which is exactly what the oracle computes (same
    // composed-path certification as q_contamination_bloom, on the
    // relational tier). At 100 TB the sketch is KB-sized driver
    // metadata; the 98% never leaves the scan stage. ──
    "q_bloom_join" -> ((s, dir) => {
      val sel = tbl(s, dir, "orders")
        .filter(col("o_totalprice") > 490000.0)
        .select(col("o_orderkey"))
      val l = tbl(s, dir, "lineitem")
      val nSel = sel.count()
      val pre =
        if (nSel == 0L) l.filter(lit(false))
        else {
          val bloom = sel.stat.bloomFilter("o_orderkey", nSel, 0.01)
          val bytes = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bytes)
          l.filter(graft.functions.GraftFunctions.bloom_might_contain(
            lit(bytes.toByteArray), col("l_orderkey")))
        }
      pre.join(sel, pre("l_orderkey") === sel("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * 100).cast("long"))
            .as("revenue_cents"))
    }),

    // ── HLL++ approx-distinct CONTRACT row (the q_percentile_approx
    // certification pattern): per event type, the exact user
    // cardinality plus a boolean asserting the sketch estimate
    // landed within 3·rsd (= 6%) of it. The oracle recomputes the
    // exact count and expects ok = TRUE — the row goes red if the
    // mergeable HLL sketch (the only distinct-count shape that
    // survives 100 TB without shuffling raw ids to one reducer per
    // group) drifts out of its own error bound. ──
    "q_approx_distinct" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("__approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("__approx") - col("n_exact")) <=
            ceil(col("n_exact").cast("double") * 0.06).cast("long"))
            .as("approx_ok"))),

    // ── mergeable SKETCH-AS-COLUMN contract row: per-(type, shard)
    // Datasketches HLL binaries built in one pass, then UNIONED per
    // type — the incremental-profiling shape where shard sketches
    // persist to a stats catalog and later merges never rescan raw
    // data (a day's new shards fold into a year's cardinality in
    // milliseconds). The contract bit asserts the merged estimate
    // lands within 6% of the exact cardinality (≳3·rse ≈ 4.9% at
    // lgK=12, same slack convention as q_approx_distinct); the oracle
    // recomputes the exact count and expects union_ok = TRUE. ──
    "q_sketch_union" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val shardSketches = e
        .withColumn("shard", pmod(col("event_id"), lit(8L)))
        .groupBy(col("event_type"), col("shard"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val merged = shardSketches.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("__merged"))
      e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .join(merged, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("__merged") - col("n_exact")) <=
            ceil(col("n_exact").cast("double") * 0.06).cast("long"))
            .as("union_ok"))
    }),

    // ── FUNNEL analysis: per user, the earliest view → first click
    // AFTER that view → first purchase AFTER that click (strict
    // event-order funnel, the product-analytics staple). Three
    // chained window aggregates over ONE hash exchange on user_id —
    // each stage's threshold is a per-user constant from the
    // previous select, so the plan is exchange + 3 WindowExecs, no
    // self-joins. Timestamps exact epoch micros; depth is the count
    // of reached stages. ──
    "q_funnel" -> ((s, dir) => {
      val u = Window.partitionBy(col("user_id"))
      val staged = tbl(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("us"))).over(u))
        .withColumn("t2",
          min(when(col("event_type") === "click" &&
            col("us") > col("t1"), col("us"))).over(u))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" &&
            col("us") > col("t2"), col("us"))).over(u))
      staged.groupBy(col("user_id"))
        .agg(first(col("t1")).as("t1_us"), first(col("t2")).as("t2_us"),
          first(col("t3")).as("t3_us"))
        .withColumn("depth",
          when(col("t3_us").isNotNull, 3)
            .when(col("t2_us").isNotNull, 2)
            .when(col("t1_us").isNotNull, 1).otherwise(0))
    }),

    // ── COHORT retention: users grouped by first-seen week (vs the
    // corpus start), activity bucketed by week offset from their
    // cohort — the classic retention triangle. Pure integer epoch
    // arithmetic (no calendar functions with engine-specific week
    // conventions); corpus start is a broadcast scalar, first-seen a
    // per-user window min, the triangle one exact distinct-count
    // aggregation. ──
    "q_cohort" -> ((s, dir) => {
      val wk = 604800000000L // 7 days in micros
      val ev = tbl(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val t0 = ev.agg(min(col("us")).as("t0"))
      val u = Window.partitionBy(col("user_id"))
      ev.crossJoin(broadcast(t0))
        .withColumn("first_us", min(col("us")).over(u))
        // `div`, not `/`: Spark's `/` on longs is DOUBLE division
        .withColumn("cohort_week",
          expr(s"(first_us - t0) div $wk"))
        .withColumn("week_offset",
          expr(s"(us - t0) div $wk") - col("cohort_week"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // ── Salted two-phase AGGREGATION (the agg half of the skew
    // toolkit; q_salted_join covers joins): count+sum per user split
    // across 16 deterministic salts in phase 1, combined per key in
    // phase 2 — result equals the plain groupBy exactly, which is
    // the associativity property the oracle certifies. At 100 TB
    // this is the manual fix for a hot grouping key AQE cannot
    // re-plan (aggregations have no skew-split). ──
    "q_salted_agg" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .withColumn("cents", floor(col("value") * 100).cast("long"))
      graft.core.Skew.saltedCountSum(e, "user_id", "cents",
        salt = pmod(col("event_id"), lit(16L)))
    }),

    // ── Distributed GLOBAL RANK (core.Ranking): range-repartition +
    // local rank + broadcast prefix-sum offsets — the total-order
    // rank WITHOUT the single-task empty-PARTITION-BY window. Every
    // 97th rank is emitted to bound the row's output; the oracle is
    // the plain total-order row_number, so a green row proves the
    // distributed recipe equals the naive global window. ──
    "q_global_rank" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      graft.core.Ranking.globalRank(e, Seq(col("us"), col("event_id")))
        .filter(pmod(col("rank"), lit(97L)) === 0)
        .select(col("event_id"), col("us"), col("rank"))
    }),

    // ── Approx TOP-K (heavy hitters) CONTRACT row, completing the
    // sketch family (Bloom, HLL, GK percentile already certified):
    // per event type, the rank-k user-frequency counts from
    // approx_top_k must equal the exact ones — maxItemsTracked is
    // sized above the key cardinality, where the sketch is provably
    // exact, so the gate pins the sketch plumbing (the same
    // total-coverage pattern as q_ann_ivf). Only (rank, count) is
    // compared — counts are tie-proof where the item pick is not. ──
    "q_approx_topk" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(expr("approx_top_k(user_id, 5, 10000)").as("tk"))
        .select(col("event_type"), posexplode(col("tk")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
          col("col.count").cast("long").as("n"))),

    // ── S1's JSON path certified IN the oracle harness (it was
    // spec-only: the parquet-driven verify never touched it): a
    // bounded slice stages as ONE JSON ARRAY document — the
    // reference's whole-file model (FileSource.php:37-41) — and
    // flows back through the engine's FileSource multiLine read
    // into an aggregate the oracle recomputes from the parquet
    // table. Green = the staged bytes, the reader, and the JSON
    // number round-trip are all faithful. ──
    "q_source_json" -> ((s, dir) => {
      val slice = tbl(s, dir, "events")
        .filter(pmod(col("event_id"), lit(7)) === 0)
        .select(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"))
      if (slice.isEmpty) emptySourceAgg(s)
      else {
        val work = tempStateDir()
        val staged = stageJsonArray(slice, work)
        graft.sources.FileSource(staged, Some("json")).load(s)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value_cents")).as("cents"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
      }
    }),

    // ── S2 HTTP source certified IN the oracle harness (the last
    // spec-only source family): the staged JSON array document is
    // served from an in-query loopback HttpServer and flows through
    // HttpSource.load — driver-side fetch (one control-feed document,
    // HttpSource.php:50-74), distributed parse — into the same
    // aggregation shape the oracle recomputes from the parquet
    // table. load() is eager about the fetch, so the server only
    // needs to live across the call. ──
    "q_source_http" -> ((s, dir) => {
      val slice = tbl(s, dir, "events")
        .filter(pmod(col("event_id"), lit(7)) === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"))
      if (slice.isEmpty) emptySourceAgg(s)
      else {
        val work = tempStateDir()
        val staged = new java.io.File(stageJsonArray(slice, work))
        val server = com.sun.net.httpserver.HttpServer.create(
          new java.net.InetSocketAddress("127.0.0.1", 0), 0)
        try {
          server.createContext("/events",
            (exchange: com.sun.net.httpserver.HttpExchange) => {
              val bytes = java.nio.file.Files.readAllBytes(staged.toPath)
              exchange.getResponseHeaders
                .add("Content-Type", "application/json")
              exchange.sendResponseHeaders(200, bytes.length)
              val os = exchange.getResponseBody
              try os.write(bytes) finally os.close()
            })
          server.start()
          val port = server.getAddress.getPort
          graft.sources.HttpSource(s"http://127.0.0.1:$port/events")
            .load(s)
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value_cents")).as("cents"),
              min(col("event_id")).as("min_id"),
              max(col("event_id")).as("max_id"))
        } finally server.stop(0)
      }
    }),

    // ── S1's CSV path, same certification shape (distributed
    // header+inferSchema read over a staged part-file directory;
    // inferred INT widths normalized by the explicit casts) ──
    "q_source_csv" -> ((s, dir) => {
      val slice = tbl(s, dir, "events")
        .filter(pmod(col("event_id"), lit(5)) === 0)
        .select(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"))
      if (slice.isEmpty) emptySourceAgg(s)
      else {
        val work = tempStateDir()
        slice.coalesce(4).write.option("header", "true")
          .mode("overwrite").csv(s"$work/ev_csv")
        graft.sources.FileSource(s"$work/ev_csv", Some("csv")).load(s)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value_cents").cast("long")).as("cents"),
            min(col("event_id").cast("long")).as("min_id"),
            max(col("event_id").cast("long")).as("max_id"))
      }
    }),

    // S1 file-scan, ORC round-trip — completes the columnar format
    // matrix (parquet/JSON/CSV/ORC): stage a slice as ORC through
    // FileSource, re-read it, aggregate. ORC is typed like parquet,
    // so no cast-on-read step; the k%5=2 slice keeps the three
    // staged-source rows disjoint.
    "q_source_orc" -> ((s, dir) => {
      val slice = tbl(s, dir, "events")
        .filter(pmod(col("event_id"), lit(5)) === 2)
        .select(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"))
      if (slice.isEmpty) emptySourceAgg(s)
      else {
        val work = tempStateDir()
        slice.coalesce(4).write.mode("overwrite").orc(s"$work/ev_orc")
        graft.sources.FileSource(s"$work/ev_orc", Some("orc")).load(s)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value_cents")).as("cents"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
      }
    }),

    // ── S3 standalone: the PARTITIONED JDBC scan itself, not just
    // via the e2e sync rows — a deterministic orders slice (k%4=2)
    // staged into Derby, read back through JdbcSource with
    // partitionColumn/numPartitions=8 (real MIN/MAX bounds queried
    // driver-side, so every stride is busy — JdbcSourceSpec pins the
    // no-empty-shards property; THIS row certifies the scanned
    // VALUES against the parquet oracle, full rows, no aggregation
    // hiding a short read). ──
    "q_source_jdbc" -> ((s, dir) => {
      val db = "srcq_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try conn.createStatement().execute(
        // unquoted DDL ⇒ canonical UPPERCASE names (the
        // q_sync_apply_jdbc convention)
        "CREATE TABLE src_orders (okey BIGINT PRIMARY KEY, " +
          "ckey BIGINT, total_cents BIGINT, status VARCHAR(8))")
      finally conn.close()
      graft.util.Tables.spread(s.read.parquet(t(dir, "orders")))
        .filter(col("o_orderkey") % 4 === 2)
        .select(col("o_orderkey").as("OKEY"),
          col("o_custkey").as("CKEY"),
          floor(col("o_totalprice") * 100).cast("long").as("TOTAL_CENTS"),
          col("o_orderstatus").as("STATUS"))
        .coalesce(8)
        .write.mode("append").format("jdbc")
        .option("url", url).option("dbtable", "src_orders").save()
      try {
        graft.sources.JdbcSource(url, "src_orders",
            partitionColumn = Some("OKEY"), numPartitions = 8)
          .load(s)
          .select(col("OKEY").cast("long").as("o_orderkey"),
            col("CKEY").cast("long").as("o_custkey"),
            col("TOTAL_CENTS").cast("long").as("total_cents"),
            col("STATUS").as("o_orderstatus"))
          .localCheckpoint() // materialize, then the db can drop
      } finally dropDerby(db)
    }),

    // ── S1 corrupt-record channel: stage JSONL where every id ≡ 3
    // (mod 10) line is truncated mid-object, read back PERMISSIVE
    // with a corrupt-record column — bad lines land in the channel
    // (all data columns NULL), good lines parse fully, and the scan
    // keeps going (per-record error isolation at the source layer,
    // the file-side analogue of the JDBC sink's error channel). ──
    "q_source_corrupt" -> ((s, dir) => {
      val slice = tbl(s, dir, "events")
        .filter(pmod(col("event_id"), lit(3)) === 2)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"))
      if (slice.isEmpty) emptySourceAgg(s)
      else {
        val work = tempStateDir()
        val line = concat(lit("{\"event_id\":"), col("event_id"),
          lit(",\"event_type\":\""), col("event_type"),
          lit("\",\"value_cents\":"), col("value_cents"), lit("}"))
        slice.select(
          when(pmod(col("event_id"), lit(10)) === 3,
            substring(line, 1, 20)).otherwise(line).as("value"))
          .coalesce(4).write.mode("overwrite").text(s"$work/jsonl")
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value_cents",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("_bad",
            org.apache.spark.sql.types.StringType)))
        s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_bad")
          .json(s"$work/jsonl")
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("_bad").isNotNull, 1L).otherwise(0L))
              .as("n_corrupt"),
            sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_good"),
            sum(when(col("_bad").isNull, col("value_cents"))
              .otherwise(0L)).as("good_cents"),
            min(when(col("_bad").isNull, col("event_id")))
              .as("min_good_id"))
      }
    }),

    // ── S1 schema evolution: two staged parquet generations (the
    // second adds a column) read through ONE mergeSchema scan —
    // rows from the legacy generation surface the new column as
    // NULL, the declarative-mapping contract (M1) applied at the
    // source layer. The aggregate certifies both the union (row
    // counts per type) and the NULL semantics (legacy rows counted,
    // excluded from the sum). ──
    "q_source_evolve" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val gen1 = ev.filter(pmod(col("event_id"), lit(3)) === 0)
        .select(col("event_id"), col("event_type"))
      val gen2 = ev.filter(pmod(col("event_id"), lit(3)) === 1)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"))
      if (gen1.isEmpty && gen2.isEmpty) emptySourceAgg(s)
      else {
        val work = tempStateDir()
        gen1.coalesce(2).write.mode("overwrite").parquet(s"$work/gen1")
        gen2.coalesce(2).write.mode("overwrite").parquet(s"$work/gen2")
        graft.sources.FileSource(s"$work/gen*", Some("parquet"),
          Map("mergeSchema" -> "true")).load(s)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value_cents").isNull, 1L).otherwise(0L))
              .as("n_legacy"),
            sum(coalesce(col("value_cents"), lit(0L))).as("cents"))
      }
    })
  )

  /** DuckDB oracles for this tier's queries. */
  val oracles: Map[String, String] = Map(

    "q_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    "q_datetime" ->
      """SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1""".stripMargin,

    "q_window" ->
      """SELECT event_id, user_id,
        |       CAST(row_number() OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
        |FROM events""".stripMargin,

    "q_setops" ->
      """WITH p AS (SELECT user_id,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS BIGINT)
        |      AS day_no
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id,
        |    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS BIGINT)
        |      AS day_no
        |  FROM events WHERE event_type = 'view')
        |SELECT 'both' AS op, user_id, day_no FROM
        |  (SELECT * FROM p INTERSECT SELECT * FROM v)
        |UNION ALL
        |SELECT 'view_only' AS op, user_id, day_no FROM
        |  (SELECT * FROM v EXCEPT SELECT * FROM p)""".stripMargin,

    // RANGE frame on epoch micros — peers share a frame, so the
    // trailing sums are tie-order-insensitive on both engines
    "q_window_range" ->
      """SELECT event_id, user_id,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER
        |         (PARTITION BY user_id ORDER BY epoch_us(ts)
        |          RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS trail7d_cents,
        |       count(*) OVER
        |         (PARTITION BY user_id ORDER BY epoch_us(ts)
        |          RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |         AS n_7d
        |FROM events""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(CAST(floor(value * 100) AS BIGINT) / 500)
        |         * 500 AS BIGINT) AS bucket_lo,
        |       count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q_string_agg" ->
      """SELECT event_type,
        |       string_agg(CAST(event_id AS VARCHAR), ','
        |         ORDER BY event_id) AS first_ids,
        |       count(*) AS n_listed
        |FROM (SELECT event_type, event_id,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY event_id) AS rn
        |      FROM events)
        |WHERE rn <= 5 GROUP BY event_type""".stripMargin,

    "q_transitions" ->
      """WITH p AS (
        |  SELECT user_id, event_type AS from_type,
        |    lead(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n
        |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
        |      FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |       c.n * 1000000 // t.row_total AS p_ppm
        |FROM c JOIN t USING (from_type)""".stripMargin,

    // per-event contribution floored to an integer BEFORE the sum —
    // the only FP is exp over identical doubles on both engines
    "q_decay_score" ->
      """WITH m AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
        |e AS (SELECT user_id,
        |        CAST(floor(CAST(floor(value * 100) AS BIGINT)
        |          * exp(-CAST(tmax - epoch_us(ts) AS DOUBLE)
        |                / 86400000000.0)) AS BIGINT) AS contrib
        |      FROM events, m)
        |SELECT user_id, count(*) AS n,
        |       CAST(sum(contrib) AS BIGINT) AS score_micro
        |FROM e GROUP BY user_id""".stripMargin,

    // sliding windows replayed by direct assignment: an event at
    // micros t belongs to the two 1 h windows starting at
    // (t // 1800e6)·1800 s and 1800 s earlier (epoch-aligned, the
    // Spark window() convention)
    "q_window_sliding" ->
      """WITH e AS (SELECT event_type, value,
        |             (epoch_us(ts) // 1800000000) * 1800 AS s0
        |           FROM events),
        |x AS (SELECT event_type, value, s0 - k * 1800 AS w_start
        |      FROM e, (VALUES (0), (1)) AS g(k))
        |SELECT w_start, event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM x GROUP BY 1, 2""".stripMargin,

    // conditional aggregation replays the explicit-value pivot; a
    // type with no rows for a user is NULL (sum over empty) on both
    // engines
    "q_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view'
        |      THEN CAST(floor(value * 100) AS BIGINT) END) AS BIGINT) AS view
        |FROM events GROUP BY user_id""".stripMargin,

    // UNION ALL replays the melt portably (no engine UNPIVOT syntax
    // dependence)
    "q_unpivot" ->
      """WITH m AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CAST(floor(l_quantity * 100) AS BIGINT) AS quantity,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS extendedprice,
        |    CAST(floor(l_discount * 100) AS BIGINT) AS discount,
        |    CAST(floor(l_tax * 100) AS BIGINT) AS tax
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       'quantity' AS measure, quantity AS cents FROM m
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       'extendedprice', extendedprice FROM m
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       'discount', discount FROM m
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       'tax', tax FROM m""".stripMargin,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT event_id, user_id,
        |       CAST(sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
        |                     THEN 1 ELSE 0 END) OVER
        |         (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM x""".stripMargin,

    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS cnt,
        |       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q_topk" ->
      """SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS value_cents
        |FROM events ORDER BY value_cents DESC, event_id LIMIT 100""".stripMargin,

    "q_topk_grouped" ->
      """SELECT event_type, event_id, value_cents,
        |       CAST(rn AS BIGINT) AS rank
        |FROM (SELECT event_type, event_id,
        |        CAST(floor(value * 100) AS BIGINT) AS value_cents,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY floor(value * 100) DESC, event_id) AS rn
        |      FROM events)
        |WHERE rn <= 5""".stripMargin,

    "q_distinct" -> "SELECT DISTINCT event_type FROM events",

    "q_cube" ->
      """SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS cnt
        |FROM events GROUP BY CUBE (event_type, month)""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |         AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_range_join" ->
      """WITH iv AS (
        |  SELECT user_id AS iv_user,
        |         CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s
        |  FROM events WHERE user_id % 50 = 0 GROUP BY user_id),
        |pts AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |        FROM events)
        |SELECT p.event_id, i.iv_user, p.ts_s
        |FROM pts p JOIN iv i
        |  ON p.ts_s >= i.start_s AND p.ts_s <= i.start_s + 21600""".stripMargin,

    "q_asof" ->
      """SELECT event_id, user_id,
        |       last_value(CASE WHEN event_type = 'click' THEN event_id END
        |                  IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |         AS prev_click_id
        |FROM events""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        |       CAST(floor(quantile_cont(value, 0.5) * 1000000) AS BIGINT)
        |         AS p50_micro,
        |       CAST(floor(quantile_cont(value, 0.95) * 1000000) AS BIGINT)
        |         AS p95_micro
        |FROM events GROUP BY event_type""".stripMargin,

    // replay of the GK-sketch contract (see the query's comment): at
    // gate group sizes the sketch keeps every sample and query(p)
    // returns the element at rank ceil(p·n) — an exact rank selection
    // here. The selected value is a RAW data double (no arithmetic),
    // so floor-micro is 1-ulp-safe.
    "q_percentile_approx" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value)
        |           AS rnk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type,
        |  CAST(floor(max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
        |      THEN value END) * 1000000) AS BIGINT) AS p50_micro,
        |  CAST(floor(max(CASE WHEN rnk = CAST(ceil(0.95 * n) AS BIGINT)
        |      THEN value END) * 1000000) AS BIGINT) AS p95_micro
        |FROM r GROUP BY event_type""".stripMargin,

    "q_salted_join" ->
      """WITH users AS (
        |  SELECT user_id, count(*) AS user_events FROM events GROUP BY user_id)
        |SELECT e.user_id, u.user_events, count(*) AS n
        |FROM events e JOIN users u ON e.user_id = u.user_id
        |GROUP BY e.user_id, u.user_events""".stripMargin,

    // the plain join — certifying the bloom-prefiltered path is exact
    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS revenue_cents
        |FROM lineitem l
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 490000)
        |GROUP BY l_returnflag""".stripMargin,

    // exact cardinality + the contract bit the sketch must honor
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |       TRUE AS approx_ok
        |FROM events GROUP BY event_type""".stripMargin,

    // exact cardinality + the contract bit the merged shard
    // sketches must honor
    "q_sketch_union" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |       TRUE AS union_ok
        |FROM events GROUP BY event_type""".stripMargin,

    // three chained conditional mins replay the strict-order funnel
    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND us > t1
        |      THEN us END) OVER (PARTITION BY user_id) AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2
        |      THEN us END) OVER (PARTITION BY user_id) AS t3
        |  FROM s2)
        |SELECT user_id, min(t1) AS t1_us, min(t2) AS t2_us,
        |       min(t3) AS t3_us,
        |       CASE WHEN min(t3) IS NOT NULL THEN 3
        |            WHEN min(t2) IS NOT NULL THEN 2
        |            WHEN min(t1) IS NOT NULL THEN 1 ELSE 0 END AS depth
        |FROM s3 GROUP BY user_id""".stripMargin,

    // integer-week retention triangle from epoch micros
    "q_cohort" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |t0 AS (SELECT min(us) AS t0 FROM ev),
        |f AS (SELECT user_id, us,
        |        min(us) OVER (PARTITION BY user_id) AS first_us
        |      FROM ev)
        |SELECT (first_us - t0.t0) // 604800000000 AS cohort_week,
        |       (us - t0.t0) // 604800000000
        |         - (first_us - t0.t0) // 604800000000 AS week_offset,
        |       count(DISTINCT user_id) AS n_users
        |FROM f, t0 GROUP BY 1, 2""".stripMargin,

    // the plain aggregate the salted two-phase split must equal
    "q_salted_agg" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM events GROUP BY user_id""".stripMargin,

    // the naive total-order rank the distributed recipe must equal
    "q_global_rank" ->
      """WITH r AS (
        |  SELECT event_id, epoch_us(ts) AS us,
        |         row_number() OVER (ORDER BY epoch_us(ts), event_id)
        |           AS rank
        |  FROM events)
        |SELECT event_id, us, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank % 97 = 0""".stripMargin,

    // exact rank-k frequencies — what the sized-above-cardinality
    // sketch must reproduce
    "q_approx_topk" ->
      """WITH uc AS (
        |  SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY event_type, user_id),
        |r AS (SELECT event_type, c,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY c DESC) AS rank
        |      FROM uc)
        |SELECT event_type, CAST(rank AS INTEGER) AS rank, c AS n
        |FROM r WHERE rank <= 5""".stripMargin,

    // the staged-JSON round trip must agree with the parquet table
    "q_source_json" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents,
        |       min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events WHERE event_id % 7 = 0
        |GROUP BY event_type""".stripMargin,

    // the loopback-HTTP round trip must agree with the parquet table
    "q_source_http" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents,
        |       min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events WHERE event_id % 7 = 1
        |GROUP BY event_type""".stripMargin,

    // the staged-CSV round trip must agree with the parquet table
    "q_source_csv" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents,
        |       min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events WHERE event_id % 5 = 0
        |GROUP BY event_type""".stripMargin,

    "q_source_orc" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents,
        |       min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events WHERE event_id % 5 = 2
        |GROUP BY event_type""".stripMargin,

    // the Derby round trip of the k%4=2 orders slice must agree with
    // the parquet table row-for-row
    "q_source_jdbc" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
        |       o_orderstatus
        |FROM orders WHERE o_orderkey % 4 = 2""".stripMargin,

    // replays which staged lines were truncated (id ≡ 3 mod 10 within
    // the id ≡ 2 mod 3 slice) — corrupt lines count into the channel,
    // good lines carry the data
    "q_source_corrupt" ->
      """WITH sl AS (SELECT event_id, event_type,
        |              CAST(floor(value * 100) AS BIGINT) AS cents
        |            FROM events WHERE event_id % 3 = 2),
        |m AS (SELECT CASE WHEN event_id % 10 = 3 THEN 1 ELSE 0 END
        |        AS bad, event_id, cents FROM sl)
        |SELECT count(*) AS n_lines,
        |  CAST(sum(bad) AS BIGINT) AS n_corrupt,
        |  CAST(sum(1 - bad) AS BIGINT) AS n_good,
        |  CAST(sum(CASE WHEN bad = 0 THEN cents ELSE 0 END) AS BIGINT)
        |    AS good_cents,
        |  min(CASE WHEN bad = 0 THEN event_id END) AS min_good_id
        |FROM m""".stripMargin,

    // the staged two-generation mergeSchema read must equal this
    // direct replay: legacy rows (id % 3 = 0) carry NULL value_cents
    // — counted in n and n_legacy, excluded from the sum
    "q_source_evolve" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_legacy,
        |       CAST(sum(CASE WHEN event_id % 3 = 1
        |         THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
        |         AS BIGINT) AS cents
        |FROM events WHERE event_id % 3 IN (0, 1)
        |GROUP BY event_type""".stripMargin,

    "q_grouping_sets" ->
      """SELECT event_type, user_mod, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents,
        |       CAST(grouping(event_type) * 2 + grouping(user_mod)
        |         AS BIGINT) AS gid
        |FROM (SELECT event_type, value, user_id % 10 AS user_mod
        |      FROM events)
        |GROUP BY GROUPING SETS ((event_type), (user_mod), ())""".stripMargin,
  )
}
