package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational completeness layer (SURVEY.md §7.2 phase C): aggregation,
  * windowing, rollup/cube, semi/anti joins, set ops, top-k, sessionization.
  * The reference itself has none of these (SURVEY.md §2.1) — they are the
  * charter's "full query engine" surface, all pure Catalyst built-ins.
  *
  * Oracle-stability rule for floating point: every SUM over doubles is
  * computed as an exact DECIMAL sum (order-independent, so Spark's partial
  * aggregation order vs DuckDB's sequential order cannot diverge) and cast
  * to double only at the output boundary.
  */
object RelationalQueries {

  /** Exact decimal sum of a double column, surfaced as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1-style pricing summary: multi-aggregate group-by.
    "q1_pricing_summary" -> ((s, d) => {
      val disc = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(18,2)")
      val charge = disc.cast("decimal(18,4)") *
        (lit(1.0) + col("l_tax")).cast("decimal(18,2)")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(disc).cast("double").as("sum_disc_price"),
          sum(charge).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Top-k with deterministic tiebreak.
    "q_topk_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    // Ranking + lag + running sum over event stream.
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        row_number().over(w).as("rn"),
        lag(col("value"), 1).over(w).cast("decimal(18,4)").cast("double")
          .as("prev_value"),
        sum(col("value").cast("decimal(18,4)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_value"))
        .orderBy("user_id", "rn")
    }),

    // Sliding window frame (moving sum/count over last 3 rows).
    "q_window_frames" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
          .as("moving_sum"),
        count(lit(1)).over(w).as("moving_n"))
        .orderBy("user_id", "event_id")
    }),

    // ROLLUP over the region→nation→customer hierarchy.
    "q_rollup" -> ((s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)),

    // CUBE over order status × priority.
    "q_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Left-semi join (EXISTS).
    "q_semi_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    // Left-anti join (NOT EXISTS): customers without any big order.
    "q_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),

    // Set op: INTERSECT.
    "q_set_intersect" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("key"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("key")))
        .orderBy("key")),

    // Set op: EXCEPT (customer keys that never appear as an event user).
    "q_set_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("key"))
        .except(Tables.events(s, d).select(col("user_id").as("key")))
        .orderBy("key")),

    // UNION ALL with source tagging.
    "q_union_all" -> ((s, d) =>
      Tables.customer(s, d)
        .select(lit("cust").as("src"), col("c_custkey").as("key"))
        .unionByName(Tables.supplier(s, d)
          .select(lit("supp").as("src"), col("s_suppkey").as("key")))
        .orderBy("src", "key")),

    // Exact distinct aggregation per group.
    "q_distinct_agg" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")),

    // 3-table join: revenue per nation (dims broadcast; fact never
    // shuffles until the final small aggregation).
    "q_join3_revenue" -> ((s, d) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(18,2)")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // Event-time bucketing (tumbling 1h window as epoch millis).
    // ts is a nanos-epoch long (Tables.events), so the hour bucket is pure
    // integer arithmetic — identical on both engines.
    "q_time_bucket" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(expr("(ts div 3600000000000) * 3600000").as("bucket_ms"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("bucket_ms", "event_type")),

    // RANGE window frame (value-based, vs q_window_frames' ROWS): the
    // trailing-30-minute sum per user. Tie rows (equal evm) are frame
    // peers in both engines, so the result is deterministic even with
    // duplicate ordering keys.
    "q_window_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("evm"))
        .rangeBetween(-1800000L, 0)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000").as("evm"), col("value"))
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
            .as("trailing_30m"),
          count(lit(1)).over(w).as("n_trailing"))
        .orderBy("user_id", "event_id")
    }),

    // Gap-based sessionization (30-min inactivity) via window functions.
    "q_session_window" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("evm"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000").as("evm"))
        .withColumn("new_session",
          when(col("evm") - lag(col("evm"), 1).over(byUser) > 1800000L, 1)
            .when(lag(col("evm"), 1).over(byUser).isNull, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("new_session"))
            .over(byUser.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("evm")).as("start_ms"), max(col("evm")).as("end_ms"))
        .orderBy("user_id", "session_id")
    }),

    // TIMESTAMP-native twin of q_time_bucket: tumbling 1h via window()
    // on the native timestamp column — the form a Spark user writes
    // first, kept alongside the integer form. Spark's tumbling windows
    // are epoch-aligned; DuckDB's time_bucket origin (2000-01-03 00:00)
    // sits on an hour boundary, so 1h buckets coincide. Output is epoch
    // micros of the window start: integer, hash-stable across engines.
    "q_time_bucket_ts" -> ((s, d) =>
      Tables.eventsTs(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(
          unix_micros(col("window.start").cast("timestamp")).as("bucket_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("bucket_us", "event_type")),

    // TIMESTAMP-native sessionization via session_window(): merge while
    // gap < 30min (strict — a gap of exactly 30min starts a new session,
    // unlike q_session_window's integer form which keeps it; both
    // contracts are pinned by their oracles). end = last event + gap.
    "q_session_window_ts" -> ((s, d) =>
      Tables.eventsTs(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start").cast("timestamp"))
            .as("start_us"),
          unix_micros(col("session_window.end").cast("timestamp"))
            .as("end_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")),

    // TIMESTAMP-native calendar rollup: date_trunc to day — calendar
    // semantics (what BI tools emit), vs the fixed-width arithmetic
    // buckets above. Integer epoch-micros output for the oracle hash.
    "q_date_trunc_ts" -> ((s, d) =>
      Tables.eventsTs(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_micros(col("day_ts").cast("timestamp")).as("day_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("day_us", "event_type")),

    // TIMESTAMP-native twin of q_asof_join: the range predicate and the
    // recency ranking run directly on the native timestamp column (the
    // form a Spark user writes first); only the OUTPUT is projected to
    // epoch micros so the cross-engine hash stays integer. Same
    // composition as the integer form: equi-key on user + range
    // predicate on time, most-recent match kept via a ranking window.
    "q_asof_join_ts" -> ((s, d) => {
      val ev = Tables.eventsTs(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("ts").as("err_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user_id"), col("ts").as("click_ts"))
      val w = Window.partitionBy(col("err_id"))
        .orderBy(col("click_ts").desc, col("click_id").desc)
      errors
        .join(clicks, col("user_id") === col("c_user_id") &&
          col("click_ts") <= col("err_ts"), "left_outer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("err_id"), col("user_id"),
          unix_micros(col("err_ts").cast("timestamp")).as("err_us"),
          col("click_id"),
          unix_micros(col("click_ts").cast("timestamp")).as("click_us"),
          (unix_micros(col("err_ts").cast("timestamp")) -
            unix_micros(col("click_ts").cast("timestamp"))).as("gap_us"))
        .orderBy("err_id")
    }),

    // TIMESTAMP-native twin of q_cohort_retention: calendar-day cohorts
    // via date_trunc + datediff — the BI-tool spelling — vs the integer
    // form's fixed-width hour arithmetic. Both engines day-truncate then
    // count day offsets, so DST/width concerns cannot arise (NTZ, UTC).
    "q_cohort_retention_ts" -> ((s, d) => {
      val ev = Tables.eventsTs(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day_ts"))
      val first = ev.groupBy(col("user_id"))
        .agg(min(col("day_ts")).as("cohort_ts"))
      ev.join(first, "user_id")
        .groupBy(
          unix_micros(col("cohort_ts").cast("timestamp")).as("cohort_us"),
          datediff(col("day_ts").cast("date"), col("cohort_ts").cast("date"))
            .cast("long").as("offset_days"))
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy("cohort_us", "offset_days")
    }),

    // TIMESTAMP-native twin of q_gap_fill: hourly grid densified with
    // sequence() OVER TIMESTAMPS (interval step) instead of integer
    // generate_series — same latest-wins snap + forward fill. The grid
    // explode stays bounded by (users × hours), not events.
    "q_gap_fill_ts" -> ((s, d) => {
      val ev = Tables.eventsTs(s, d).filter(col("user_id") < 20)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hr_ts"),
          col("value"), col("event_id"))
      val wLatest = Window.partitionBy(col("user_id"), col("hr_ts"))
        .orderBy(col("event_id").desc)
      val latest = ev.withColumn("rn", row_number().over(wLatest))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("hr_ts"), col("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(min(col("hr_ts")).as("h0"), max(col("hr_ts")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
            .as("hr_ts"))
      val wFill = Window.partitionBy(col("user_id")).orderBy(col("hr_ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(latest, Seq("user_id", "hr_ts"), "left_outer")
        .withColumn("filled_value", last(col("value"), ignoreNulls = true)
          .over(wFill))
        .select(col("user_id"),
          unix_micros(col("hr_ts").cast("timestamp")).as("hr_us"),
          col("filled_value"))
        .orderBy("user_id", "hr_us")
    }),

    // Time-sliced scan done RIGHT for parquet pruning: the range
    // predicate binds to the PHYSICAL ts column (Tables.eventsRaw), so
    // it reaches parquet row-group min/max stats and prunes whole row
    // groups — a filter on the normalized (derived) ts never can
    // (SCALING.md "Time-sliced scans"). The literal bound is cast to
    // the column's own type (constant-folded), keeping the COLUMN
    // uncast and therefore pushable; the legacy nanos-Long fixture
    // branch compares raw nanos. PlanInvariantsSpec pins PushedFilters
    // on ts. One week of the 30-day fixture.
    "q_time_slice" -> ((s, d) => {
      val raw = Tables.eventsRaw(s, d)
      val sliced = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.filter(col("ts") >= lit(1704672000000000000L) &&
            col("ts") < lit(1705276800000000000L))
        case dt =>
          raw.filter(
            col("ts") >= lit("2024-01-08 00:00:00").cast(dt) &&
              col("ts") < lit("2024-01-15 00:00:00").cast(dt))
      }
      sliced.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
    }),

    // Pivot-style conditional aggregation.
    "q_pivot_counts" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          sum(when(col("event_type") === "signup", 1).otherwise(0)).as("n_signup"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"))
        .orderBy("user_id")),

    // Interpolated percentiles (rounded: the two engines' interpolation
    // formulas differ in final-ulp float ops). Uses the built-in
    // percentile() deliberately: its buffer holds one group's values,
    // fine at dashboard group sizes (measured 3x faster than the
    // distribution method here — one shuffle vs four). When a group can
    // exceed executor memory, swap to Profiling.groupedPercentiles
    // (bounded state, same results — TrainingOpsSpec pins equality).
    "q_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 4).as("p50_qty"),
          round(percentile(col("l_quantity"), lit(0.9)), 4).as("p90_qty"),
          round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50_price"))
        .orderBy("l_returnflag")),

    // Statistical moments from exact decimal sums: mean, variance,
    // stddev, and cross-column correlation computed with explicit
    // formulas over order-independent sums, so any aggregation
    // parallelism matches the oracle bit-for-bit (built-in stddev/corr
    // stream floating-point accumulators and cannot guarantee that).
    "q_stats_moments" -> ((s, d) => {
      def ds(c: Column) = sum(c.cast("decimal(18,4)")).cast("double")
      def ds2(c: Column) =
        sum(c.cast("decimal(18,4)") * c.cast("decimal(18,4)")).cast("double")
      val sxy = sum(col("l_quantity").cast("decimal(18,4)") *
        col("l_extendedprice").cast("decimal(18,4)")).cast("double")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          ds(col("l_quantity")).as("sx"), ds2(col("l_quantity")).as("sxx"),
          ds(col("l_extendedprice")).as("sy"),
          ds2(col("l_extendedprice")).as("syy"), sxy.as("sxy"))
        .select(col("l_returnflag"),
          // mean is a single division of exactly-cast operands — raw is
          // bit-identical across engines, and round(…,6) on an
          // int-ratio CAN land exactly on a half-way decimal (the
          // q_tpch_q2 drift class). The multi-op var/corr keep round:
          // they pass through libm sqrt / long float chains where
          // half-way coincidence is measure-zero but ulp drift is real.
          (col("sx") / col("n")).as("mean_qty"),
          round((col("sxx") - col("sx") * col("sx") / col("n")) /
            (col("n") - 1), 6).as("var_qty"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
            (col("n") - 1)), 6).as("stddev_qty"),
          round((col("sxy") - col("sx") * col("sy") / col("n")) /
            (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
              sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // As-of join (time-series lookup the reference lacks entirely): for
    // each 'error' event, the latest 'click' by the same user at-or-before
    // it. Equi-key on user + range predicate on time, deduplicated to the
    // most recent match via a ranking window — the composition Spark-first
    // design prefers over a custom join operator (SURVEY.md §4).
    "q_asof_join" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000000").as("evm"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("evm").as("err_ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user_id"), col("evm").as("click_ms"))
      val w = Window.partitionBy(col("err_id"))
        .orderBy(col("click_ms").desc, col("click_id").desc)
      errors
        .join(clicks, col("user_id") === col("c_user_id") &&
          col("click_ms") <= col("err_ms"), "left_outer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("err_id"), col("user_id"), col("err_ms"),
          col("click_id"), col("click_ms"),
          (col("err_ms") - col("click_ms")).as("gap_ms"))
        .orderBy("err_id")
    }),

    // Approximate distinct (HLL). Sketch values are engine-specific, so
    // the estimates themselves can't hash-gate; instead the query emits
    // the exact counts (oracle-checkable) plus in-engine booleans
    // asserting the HLL estimate stayed within 5x the default rsd (0.05)
    // of exact — the oracle pins those as TRUE, so a drifting sketch
    // fails the gate. At 100 TB the exact countDistinct columns would be
    // dropped and only the sketch kept; they exist here to make the
    // accuracy contract itself part of the gated surface.
    "q_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_orderkey")).as("ao"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts"))
            <= col("exact_parts") * lit(0.25)).as("parts_in_bound"),
          (abs(col("ao") - col("exact_orders"))
            <= col("exact_orders") * lit(0.25)).as("orders_in_bound"))
        .orderBy("l_returnflag")),

    // Range (band) join: non-equi join of the fact against a tiny band
    // dimension. Broadcast → BroadcastNestedLoopJoin; the fact side
    // never shuffles, so the plan is a single scan at any scale.
    "q_range_join" -> ((s, d) => {
      val bands = Tables.nation(s, d).select(
        col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 2.0).as("lo"),
        (col("n_nationkey") * 2.0 + 2.0).as("hi"))
      Tables.lineitem(s, d)
        .join(broadcast(bands),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("band_id")
    }),

    // GROUPING SETS distinct from rollup/cube: two independent unary
    // groupings plus the grand total in one pass.
    "q_grouping_sets" -> ((s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupingSets(Seq(Seq(col("r_name")), Seq(col("n_name")), Seq()),
          col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)),

    // Ordered-selection aggregates (min_by/max_by): the tie-break lives
    // in the ordering key itself — acctbal is exactly 2-decimal, so
    // round(bal*100)*1e7 + custkey is an integer key, unique (custkey <
    // 1e7) and order-preserving — deterministic under any partitioning.
    "q_minmax_by" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_name"),
          (round(col("c_acctbal") * 100).cast("long") * 10000000L +
            col("c_custkey")).as("k"))
        .groupBy(col("c_mktsegment"))
        .agg(max_by(col("c_name"), col("k")).as("richest"),
          min_by(col("c_name"), col("k")).as("poorest"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")),

    // Generator / table-valued function: posexplode of split words.
    "q_posexplode" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .select(col("p_partkey"), col("pos"), col("col").as("word"))
        .orderBy("p_partkey", "pos")),

    // Date/time scalar functions: extract, day arithmetic, truncation.
    "q_date_arith" -> ((s, d) =>
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          datediff(col("o_orderdate").cast("date"),
            lit("1992-01-01").cast("date")).as("dd"),
          dayofmonth(col("o_orderdate")).as("dom"))
        .groupBy("y", "m")
        .agg(count(lit(1)).as("n"), min(col("dd")).as("min_dd"),
          max(col("dom")).as("max_dom"))
        .orderBy("y", "m")),

    // Collect-to-array aggregation, made deterministic by sorting the
    // collected array (collect_list order is partition-dependent) and
    // serialized to CSV so the compared value is a plain string on both
    // engines (array-type hashing is comparator-specific).
    "q_array_agg" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_acctbal") < -900)
        .groupBy(col("c_nationkey"))
        .agg(array_join(sort_array(collect_list(col("c_custkey"))), ",")
            .as("custkeys"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")),

    // Scalar (uncorrelated) subquery in a filter: the 1-row aggregate is
    // broadcast-cross-joined to the fact — at any scale the fact side
    // streams once with no shuffle before the final small aggregation.
    // The average is computed as exact-decimal sum / count so the filter
    // threshold is bit-identical across engines.
    "q_scalar_subquery" -> ((s, d) => {
      val stats = Tables.orders(s, d).agg(
        (sum(col("o_totalprice").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("avg_price"))
      Tables.orders(s, d)
        .join(broadcast(stats))
        .filter(col("o_totalprice") > col("avg_price"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // Native pivot operator (vs q_pivot_counts' manual conditional
    // aggregation): explicit value list keeps the plan single-pass (no
    // distinct-values pre-query) — required at scale.
    "q_pivot_native" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("user_id")),

    // Unpivot/melt: wide measures → (measure, value) long form.
    "q_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure")),

    // Distribution window functions: ntile / percent_rank / cume_dist
    // over a unique ordering (price, then keys) — deterministic ranks.
    "q_window_dist" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        ntile(4).over(w).as("quartile"),
        // raw: percent_rank/cume_dist are single divisions of exact
        // rank/count ints — bit-identical across engines; round(…,6) on
        // an int-ratio can land exactly half-way (q_tpch_q2 drift class)
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Frame-anchored value window functions: first/last/nth over the
    // whole partition frame.
    "q_window_firstlast" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
        .orderBy("user_id", "event_id")
    }),

    // Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep
    // multiplicities (min / difference), unlike the distinct variants.
    "q_set_intersect_all" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("key"))
        .intersectAll(Tables.events(s, d).select(col("user_id").as("key")))
        .orderBy("key")),

    "q_set_except_all" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("key"))
        .exceptAll(Tables.events(s, d).select(col("user_id").as("key")))
        .orderBy("key")),

    // Full outer join with both-null-side handling: sparse per-nation
    // aggregates from each side so both unmatched directions occur.
    "q_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
      val p = Tables.supplier(s, d).filter(col("s_suppkey") % 7 === 0)
        .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
      c.join(p, col("nk_c") === col("nk_s"), "full_outer")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nk")
    }),

    // Explicit cross join of two tiny inputs (the only safe cartesian).
    "q_cross_join" -> ((s, d) => {
      val r = Tables.region(s, d)
      r.select(col("r_name").as("a"))
        .crossJoin(r.select(col("r_name").as("b")))
        .orderBy("a", "b")
    }),

    // lead (with and without an explicit default) alongside a deep lag.
    "q_window_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        lead(col("event_type"), 2, "NONE").over(w).as("next2_type"),
        lag(col("event_type"), 2).over(w).as("prev2_type"))
        .orderBy("user_id", "event_id")
    }),

    // Array scalar functions over split words (size/contains/slice/
    // distinct/sort), serialized to strings for comparator neutrality.
    "q_array_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), split(col("p_name"), " ").as("w"))
        .select(col("p_partkey"),
          size(col("w")).as("n_words"),
          array_contains(col("w"), "green").as("has_green"),
          array_join(slice(col("w"), 1, 2), " ").as("first_two"),
          array_join(array_sort(array_distinct(col("w"))), ",").as("uniq_sorted"))
        .orderBy("p_partkey")),

    // Map functions over semi-structured JSON props: parse to a map,
    // inspect keys, and extract a typed value.
    "q_map_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)).as("m"))
        .select(col("event_id"),
          size(col("m")).as("n_keys"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
          element_at(col("m"), "k").cast("long").as("k_val"))
        .orderBy("event_id")),

    // Null-handling and comparison scalar functions: nullif, nvl/
    // coalesce, greatest/least, null predicates.
    "q_null_funcs" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("non_open_status"),
        coalesce(nullif(col("o_orderpriority"), lit("5-LOW")), lit("OTHER"))
          .as("prio_or_other"),
        greatest(col("o_totalprice"), lit(100000.0)).as("floor_price"),
        least(col("o_custkey"), col("o_orderkey")).as("min_key"),
        nullif(col("o_orderstatus"), lit("O")).isNull.as("is_open"))
        .orderBy("o_orderkey")),

    // Math scalar functions. Transcendentals (sqrt/ln/exp) are libm
    // doubles on both engines; round(…,6) absorbs any final-ulp drift.
    "q_math_funcs" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25.0).as("abs_dev"),
          // DuckDB sign() yields TINYINT while signum yields DOUBLE; the
          // gate hashes values as strings ("1" vs "1.0"), so emit integers.
          signum(col("l_quantity") - 25.0).cast("long").as("sgn"),
          pmod(col("l_orderkey"), lit(7)).as("mod7"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
          round(log(col("l_quantity") + 1.0), 6).as("ln_q1"),
          round(pow(col("l_discount"), 2), 6).as("disc_sq"),
          floor(col("l_extendedprice") / 1000.0).cast("long").as("price_k"),
          ceil(col("l_quantity") / 7.0).cast("long").as("q_ceil7"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Bitwise scalar functions over integer keys.
    "q_bit_funcs" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("o_orderkey & 255").as("band"),
          expr("o_orderkey | 4096").as("bor"),
          expr("o_orderkey ^ o_custkey").as("bxor"),
          expr("shiftleft(o_custkey, 3)").as("shl"),
          expr("shiftright(o_orderkey, 2)").as("shr"))
        .orderBy("o_orderkey")),

    // Filtered aggregation (count_if / conditional sums per group).
    "q_agg_filter" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count_if(col("o_totalprice") > 200000).as("n_big"),
          count_if(col("o_orderpriority") === "1-URGENT").as("n_urgent"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // Scalar string-function coverage: case, length, substring, padding,
    // replacement, reversal, position.
    "q_string_funcs" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 10).as("sub"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("padded"),
        regexp_replace(col("p_name"), " ", "_").as("joined"),
        reverse(col("p_type")).as("rev"),
        instr(col("p_name"), "a").cast("long").as("pos_a"))
        .orderBy("p_partkey")),

    // TPC-H Q3-style shipping priority: selective dim filter broadcast
    // into a fact-fact shuffle join, then top-10 by aggregated revenue.
    "q_tpch_q3" -> ((s, d) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(18,2)")
      Tables.lineitem(s, d).filter(col("l_shipdate") > "1997-01-01")
        .join(Tables.orders(s, d).filter(col("o_orderdate") < "1997-01-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-style local-supplier volume: the 6-way star join. Region/
    // nation/supplier broadcast; customer co-shuffles with orders on
    // custkey; the extra c_nationkey = s_nationkey condition rides on
    // the join, not a post-filter.
    "q_tpch_q5" -> ((s, d) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(18,2)")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1997-01-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q6-style forecast revenue: pure scan-filter-aggregate — the
    // pushdown showcase (every predicate reaches the parquet scan).
    "q_tpch_q6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01" &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)")).cast("double")
          .as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q10-style returned-item report: top 20 customers by lost
    // revenue in a quarter.
    "q_tpch_q10" -> ((s, d) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(18,2)")
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1996-04-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ntile quartiles per group (deterministic tie-break on key).
    "q_window_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"))
        .orderBy("o_orderkey")
    }),

    // Calendar decomposition: year/quarter/month/day/dow/doy/ISO week
    // (dow normalized to DuckDB's Sunday=0 convention).
    "q_date_parts" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).as("yr"),
        quarter(col("l_shipdate")).as("qtr"),
        month(col("l_shipdate")).as("mon"),
        dayofmonth(col("l_shipdate")).as("dom"),
        (dayofweek(col("l_shipdate")) - 1).as("dow"),
        dayofyear(col("l_shipdate")).as("doy"),
        weekofyear(col("l_shipdate")).as("iso_week"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Cryptographic hash functions (md5 / sha-256), both lowercase hex.
    "q_hash_funcs" -> ((s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        md5(col("p_name").cast("binary")).as("h_md5"),
        sha2(col("p_name").cast("binary"), 256).as("h_sha256"))
        .orderBy("p_partkey")),

    // Z-order (Morton) layout key over two join dimensions, via the
    // codegen'd ZOrder2 expression: range-binning the interleaved key
    // produces buckets whose rows are close in BOTH dimensions (the
    // min/max envelopes per bucket are the proof — and exactly what
    // parquet footer pruning consumes after a zorder-sorted rewrite of
    // a 100 TB table).
    "q_zorder" -> ((s, d) => {
      import graft.functions.functions.zorder2
      val px = pmod(col("l_partkey"), lit(1024)).cast("long")
      val sx = pmod(col("l_suppkey"), lit(1024)).cast("long")
      Tables.lineitem(s, d)
        .select(px.as("px"), sx.as("sx"))
        .withColumn("zkey", zorder2(col("px"), col("sx"), 10))
        .groupBy(shiftright(col("zkey"), 12).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("px")).as("px_min"), max(col("px")).as("px_max"),
          min(col("sx")).as("sx_min"), max(col("sx")).as("sx_max"))
        .orderBy("bucket")
    }),

    // Correlated-subquery semantics ("orders above their customer's
    // average"), decorrelated into a window — the comparison runs on
    // exact decimals (price × count vs decimal sum), so no float-
    // division drift can flip a row's membership.
    "q_above_cust_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
      Tables.orders(s, d)
        .withColumn("n_cust", count(lit(1)).over(w))
        .withColumn("sum_dec",
          sum(col("o_totalprice").cast("decimal(18,4)")).over(w))
        .filter(col("o_totalprice").cast("decimal(18,4)") * col("n_cust") >
          col("sum_dec"))
        .select(col("o_orderkey"), col("o_custkey"), col("n_cust"))
        .orderBy("o_orderkey")
    }),

    // TPC-H Q4-style order-priority check: EXISTS decorrelated into a
    // left-semi join (lineitems shipped after the order date), then a
    // tiny count-by-priority aggregate.
    "q_tpch_q4" -> ((s, d) =>
      Tables.orders(s, d).as("o")
        .join(Tables.lineitem(s, d).as("l"),
          col("l.l_orderkey") === col("o.o_orderkey") &&
            col("l.l_shipdate") > col("o.o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    // TPC-H Q7-style bi-national volume: supplier nation × customer
    // nation revenue matrix for two nations — both nation dims broadcast
    // twice under different aliases; the fact chain shuffles once per
    // fact-fact join.
    "q_tpch_q7" -> ((s, d) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(18,2)")
      val n1 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation")))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("sk"))
        .join(n2, col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_3" &&
            col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" &&
            col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q9-style profit: revenue minus a synthesized part cost
    // (no partsupp table in the testdata), grouped by supplier nation
    // and year — the widest join tree in the suite plus a computed
    // measure in exact decimal.
    "q_tpch_q9" -> ((s, d) => {
      val profit =
        col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(18,2)") -
        (col("p_retailprice") * 0.8).cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(18,2)")
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // TPC-H Q8-style national market share: one supplier nation's
    // revenue share of a customer region's PROMO-part spend, by order
    // year. Every dimension (part filter, both nation legs, supplier,
    // region) broadcasts; the only repartitioning is the lineitem⋈orders
    // fact-fact join, and the part/date filters cut the fact before it.
    "q_tpch_q8" -> ((s, d) => {
      val vol = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(18,2)")
      val suppNation = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation")))
      val asiaNations = broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("n_nationkey").as("ck")))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= "1995-01-01" &&
            col("o_orderdate") < "1997-01-01"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(asiaNations, col("c_nationkey") === col("ck"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("sk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_7", vol).otherwise(lit(0))
            .cast("decimal(24,4)")).cast("double") /
            sum(vol.cast("decimal(24,4)")).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q12-style shipping-priority audit. The testdata carries no
    // shipmode/commitdate/receiptdate columns, so (like q_tpch_q4's
    // EXISTS adaptation) returnflag stands in for the mode and "late"
    // means shipped more than 90 days after the order date; the
    // essential Q12 shape — fact-fact join, date-interval predicate,
    // conditional counts by priority class — is intact.
    "q_tpch_q12" -> ((s, d) => {
      val highPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(highPri, 1).otherwise(0)).as("high_line_count"),
          sum(when(highPri, 0).otherwise(1)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q2-style minimum-cost supplier (no partsupp table, so the
    // per-(part,supplier) cost is the minimum observed unit price in
    // lineitem): for every LARGE part, the European supplier(s) with
    // the lowest cost. Q2's correlated MIN subquery decorrelates into a
    // per-part window minimum computed after the region restriction —
    // exactly the region-scoped minimum the subquery expresses. Cost
    // aggregation shuffles on (part, supplier); the supplier/nation/
    // region and part dims broadcast onto it. The unit cost stays the
    // RAW IEEE quotient: identical bits in both engines, so the
    // min-equality filter and the output hash agree — round(x, 6)
    // drifted on exact half-way quotients (e.g. 8541.05/32 =
    // 266.9078125, caught by the sf0.1 scale check).
    "q_tpch_q2" -> ((s, d) => {
      val cost = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice").cast("double") /
          col("l_quantity").cast("double")).as("unit_cost"))
      val euSuppliers = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_name"), col("n_name")))
      val parts = broadcast(Tables.part(s, d)
        .filter(col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_name")))
      val w = Window.partitionBy(col("p_partkey"))
      cost
        .join(euSuppliers, col("l_suppkey") === col("s_suppkey"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .withColumn("min_cost", min(col("unit_cost")).over(w))
        .filter(col("unit_cost") === col("min_cost"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("unit_cost"))
        .orderBy("p_partkey", "s_suppkey")
    }),

    // TPC-H Q20-style excess-supply scan (no partsupp availqty, so the
    // lead supplier stands in for "excess availability"): for each PROMO
    // part, the supplier who shipped the most of it — Q20's doubly-nested
    // IN/scalar-subquery chain as one aggregate, one window, and a
    // left-semi join back to suppliers. A fixed dominance threshold went
    // vacuous as supplier counts per part grow with scale (0 rows at
    // sf>=0.01); top-per-part is non-empty at every scale. row_number
    // tie-breaks on suppkey so both engines pick the same winner;
    // quantities stay in exact decimal.
    "q_tpch_q20" -> ((s, d) => {
      val qty = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("supp_qty"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("supp_qty").desc, col("l_suppkey"))
      val lead = qty
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_suppkey"))
        .distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(lead, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q11-style important stock: per-part value, kept when above
    // 1.5x the mean part value. A fixed fraction-of-total threshold
    // (Q11's 0.0001/SF) goes vacuous as the part count grows with scale;
    // a mean multiple is scale-invariant. The global scalars come from a
    // 1-row aggregate broadcast back over the per-part table (an
    // unpartitioned window would funnel every part-aggregate into one
    // partition — a serial choke point at 100 TB part counts). The
    // comparison is pure integer/decimal arithmetic (value*2*n >
    // total*3, i.e. value > 1.5*total/n) so no division can drift
    // between engines.
    "q_tpch_q11" -> ((s, d) => {
      val pv = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(18,2)")).as("value_dec"))
      val tot = pv.agg(sum(col("value_dec")).as("total"),
        count(lit(1)).as("nparts"))
      pv.crossJoin(broadcast(tot))
        .filter(col("value_dec") * 2 * col("nparts") > col("total") * 3)
        .select(col("l_partkey"), col("value_dec").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // TPC-H Q14-style promo share: conditional aggregation ratio —
    // 100 · promo revenue / total revenue in one pass, division in
    // double over exact decimal sums.
    "q_tpch_q14" -> ((s, d) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0) - col("l_discount")).cast("decimal(18,2)")
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1996-02-01")
        .agg(
          (lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))
              .cast("decimal(24,4)")).cast("double") /
            sum(rev.cast("decimal(24,4)")).cast("double")).as("promo_share"))
        .select(round(col("promo_share"), 6).as("promo_share"))
    }),

    // Boolean and bitwise aggregates: every/any + bit_and/or/xor per
    // group.
    "q_bool_bit_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          every(col("l_quantity") > 0).as("all_pos"),
          some(col("l_quantity") > 49).as("any_min"),
          bit_and(col("l_linenumber")).as("b_and"),
          bit_or(col("l_linenumber")).as("b_or"),
          bit_xor(col("l_linenumber")).as("b_xor"))
        .orderBy("l_returnflag")),

    // Error-safe scalar functions: try_divide / try_cast return null
    // instead of raising under ANSI mode.
    "q_try_funcs" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        // Raw IEEE double division, no rounding: decimal division scale
        // rules differ between engines, and round(x, 6) itself differs on
        // half-way doubles (Spark rounds the exact binary value via
        // BigDecimal HALF_UP; DuckDB scales in binary FP). The unrounded
        // quotient of two identically-cast doubles is bit-identical.
        try_divide(col("l_extendedprice").cast("double"),
          col("l_quantity").cast("double"))
          .as("unit_price"),
        try_divide(col("l_quantity"), col("l_quantity") - col("l_quantity"))
          .as("div0"),
        try_to_number(col("l_returnflag"), lit("9")).cast("int")
          .as("flag_num"))
        .orderBy("l_orderkey", "l_linenumber")),

    // TPC-H Q13-style customer distribution: two-level aggregation —
    // orders-per-customer (left join keeps zero-order customers), then
    // the histogram of those counts.
    "q_tpch_q13" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // TPC-H Q17-style small-quantity revenue: per-part average rides in
    // via a co-shuffled self-aggregate on l_partkey; the < 0.8·avg
    // comparison runs in exact decimal (qty · n · 10 < 8 · sum) so no
    // float division can flip a row.
    "q_tpch_q17" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("n_part"),
          sum(col("l_quantity").cast("decimal(18,4)")).as("sum_qty"))
      li.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast("decimal(18,4)") * col("n_part") *
          10 < col("sum_qty") * 8)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Co-bucketed storage join (graft.operators.Bucketing): both fact
    // tables land bucketed+sorted on the order key at write time, so
    // the join itself plans with ZERO shuffle exchange — the shuffle
    // is paid once at ingest, not per query, which at 100 TB is the
    // difference between re-shuffling the fact table for every join
    // and never shuffling it again (BucketingSpec pins the
    // SortMergeJoin-without-Exchange plan; ShuffleBudgetSpec holds the
    // served frame at 0). This row gates the bucketed layout's
    // CORRECTNESS: the served rows must equal the plain-join oracle.
    "q_bucketed_join" -> ((s, d) => {
      // External tables at a fresh scratch path: a managed table's
      // warehouse location outlives the in-memory catalog and would
      // collide on the next JVM.
      val scratch = FlowLogQueries.scratchDir("graft_bucketed")
      graft.operators.Bucketing.writeBucketed(Tables.lineitem(s, d),
        "graft_li_bucketed", "l_orderkey", 8, Some(s"$scratch/li"))
      graft.operators.Bucketing.writeBucketed(Tables.orders(s, d),
        "graft_ord_bucketed", "o_orderkey", 8, Some(s"$scratch/ord"))
      graft.operators.Bucketing.bucketedEquiJoin(s,
          "graft_li_bucketed", "graft_ord_bucketed",
          "l_orderkey", "o_orderkey")
        .select(col("o_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("o_totalprice"))
    }),

    // Zero-shuffle AGGREGATION over the bucketed layout: the stored
    // hash distribution on the grouping key already satisfies the
    // aggregate's clustering requirement, so the groupBy plans with
    // no exchange at all (ShuffleBudgetSpec pins 0) — the ingest-once
    // shuffle amortizes over every downstream aggregation, not just
    // joins.
    "q_bucketed_agg" -> ((s, d) => {
      val scratch = FlowLogQueries.scratchDir("graft_bucketed_agg")
      graft.operators.Bucketing.writeBucketed(Tables.lineitem(s, d),
        "graft_li_bucketed_agg", "l_orderkey", 8, Some(s"$scratch/li"))
      s.table("graft_li_bucketed_agg")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q18-style large-volume orders: HAVING over a grouped fact,
    // then joins back to orders/customer for the report columns.
    "q_tpch_q18" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
        .filter(col("sum_qty") > 300)
      big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q19-style disjunctive predicate: equi-join on partkey with
    // an OR-of-ANDs residual — Catalyst extracts the common partkey
    // conjunct so the join stays a (broadcast) hash join, not a
    // nested-loop over the disjunction.
    "q_tpch_q19" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey") &&
            ((col("p_brand") === "Brand#1" &&
              col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
             (col("p_brand") === "Brand#2" &&
              col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 30))))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // Least-squares regression + correlation per group, from exact
    // decimal power sums (same order-independence argument as
    // q_stats_moments): slope/intercept/r² of extendedprice ~ quantity.
    "q_regression" -> ((s, d) => {
      val x = col("l_quantity").cast("decimal(18,4)")
      val y = col("l_extendedprice").cast("decimal(18,4)")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"),
          sum(x * y).cast("double").as("sxy"))
        .select(col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("slope"),
          round((col("sy") - col("sx") *
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
             (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n"), 6)
            .as("intercept"),
          round(pow((col("n") * col("sxy") - col("sx") * col("sy")), 2) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
             (col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("r2"))
        .orderBy("l_returnflag")
    }),

    // JSON path extraction from a string column (the events `props`
    // payload), plus existence and typed-cast variants.
    "q_json_path" -> ((s, d) =>
      Tables.events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        get_json_object(col("props"), "$.missing").as("absent"),
        (get_json_object(col("props"), "$.k").isNotNull).as("has_k"))
        .orderBy("event_id")),

    // Spark 4 VARIANT path: parse_json into the binary variant encoding
    // once, then typed variant_get extraction — the modern engine-native
    // semi-structured read (shreds better than repeated string JSON
    // parsing; the variant stays internal, outputs are plain types so
    // the oracle compares engine-neutrally).
    "q_variant" -> ((s, d) => {
      val v = parse_json(col("props"))
      Tables.events(s, d).select(col("event_id"),
        variant_get(v, "$.k", "int").as("k"),
        variant_get(v, "$.missing", "string").as("absent"),
        is_variant_null(variant_get(v, "$.k", "variant")).as("k_is_null"))
        .orderBy("event_id")
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE): bounded supplier-successor
    // reachability — seeds walk the +1 chain up to depth 5, one
    // iteration = one join against the base table (the UnionLoop
    // iterative plan). Depth-bounded, so the unrolled lineage is fixed.
    "q_recursive_cte" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("v_supplier")
      s.sql(
        """WITH RECURSIVE succ AS (
          |  SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth
          |  FROM v_supplier WHERE s_suppkey % 10 = 1
          |  UNION ALL
          |  SELECT s.s_suppkey, succ.root, succ.depth + 1
          |  FROM succ JOIN v_supplier s ON s.s_suppkey = succ.node + 1
          |  WHERE succ.depth < 5)
          |SELECT root, count(*) AS chain_len, max(depth) AS max_depth
          |FROM succ GROUP BY root ORDER BY root""".stripMargin)
    }),

    // GROUP BY ALL / ORDER BY ALL (Spark 4 SQL sugar): grouping keys
    // inferred from the non-aggregate select list — resolves to the
    // identical Aggregate plan as the explicit form the oracle runs.
    "q_group_by_all" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       count(*) AS n,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(24,4))) AS DOUBLE)
          |         AS total
          |FROM v_orders GROUP BY ALL ORDER BY ALL""".stripMargin)
    }),

    // SQL pipe syntax (Spark 4 `|>` operators): the same logical plan
    // as the plain SELECT the oracle runs — pipe stages are sugar over
    // Project/Filter/Aggregate/Sort, so Catalyst optimizes identically
    // (decimal accumulation idiom shared with q1 for the double sums).
    "q_pipe_syntax" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql(
        """FROM v_lineitem
          ||> WHERE l_quantity < 30
          ||> AGGREGATE
          |     CAST(sum(CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sum_qty,
          |     CAST(sum(CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sum_price,
          |     count(*) AS n_rows
          |   GROUP BY l_returnflag, l_linestatus
          ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
    }),

    // LATERAL correlated subquery (SQL-text surface): per outer row, a
    // dependent top-n subquery with its own window + LIMIT. Catalyst
    // decorrelates this into a ranked join — no per-row re-execution.
    "q_lateral_topn" -> ((s, d) => {
      Tables.region(s, d).createOrReplaceTempView("v_region")
      Tables.nation(s, d).createOrReplaceTempView("v_nation")
      s.sql(
        """SELECT r.r_name, t.n_name, t.rnk
          |FROM v_region r,
          |LATERAL (
          |  SELECT n_name, row_number() OVER (ORDER BY n_name) AS rnk
          |  FROM v_nation WHERE n_regionkey = r.r_regionkey
          |  ORDER BY n_name LIMIT 2
          |) t
          |ORDER BY r.r_name, t.rnk""".stripMargin)
    }),

    // UNION (distinct) across heterogeneous sources — dedup shuffle on
    // the unioned key domain.
    "q_union_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_partkey").as("key"))
        .union(Tables.part(s, d).select(col("p_partkey").as("key")))
        .distinct()
        .orderBy("key")),

    // Skew-salted join as a first-class query: lineitem keyed by a
    // deliberately hot derived key (90% of rows share one value) joined
    // to a small dimension through Joins.saltedJoin — the salt spreads
    // the hot key over `salt` sub-partitions, the dimension replicates
    // salt-ways, and the result equals the plain join (oracle).
    "q_skew_join" -> ((s, d) => {
      val hot = Tables.lineitem(s, d).select(col("l_orderkey"),
        when(col("l_orderkey") % 10 < 9, 0L)
          .otherwise(col("l_orderkey") % 5).as("hk"))
      val dim = Tables.nation(s, d).filter(col("n_nationkey") < 5)
        .select(col("n_nationkey").cast("long").as("hk"),
          col("n_name"))
      graft.operators.Joins.saltedJoin(hot, dim, "hk", 8)
        .groupBy(col("hk"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hk")
    }),

    // Null-safe equality join (<=>): null keys MATCH each other instead
    // of dropping — the join Spark plans with a NullSafeEqual key (still
    // hash-joinable, unlike a general theta join).
    "q_nullsafe_join" -> ((s, d) => {
      val l = Tables.customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_nationkey"))
          .as("nk"))
      val r = Tables.nation(s, d).select(
        when(col("n_nationkey") === 0, lit(null)).otherwise(col("n_nationkey"))
          .as("nk2"),
        col("n_name"))
      l.join(r, col("nk") <=> col("nk2"))
        .select(col("c_custkey"), coalesce(col("nk"), lit(-1)).as("nk_or"),
          col("n_name"))
        .orderBy("c_custkey", "n_name")
    }),

    // Deterministic string aggregation: sort the collected set first so
    // any shuffle/merge order yields the same joined string.
    "q_string_agg" -> ((s, d) =>
      Tables.supplier(s, d)
        .groupBy((col("s_suppkey") % 10).as("grp"))
        .agg(concat_ws(",", array_sort(collect_list(col("s_name"))))
          .as("names"),
          count(lit(1)).as("n"))
        .orderBy("grp")),

    // regexp_extract_all: every number embedded in the brand/size text,
    // joined in match order (brand always carries a digit, so no row
    // produces the empty list — DuckDB's array_to_string maps [] to
    // NULL where Spark's concat_ws gives '').
    "q_regexp_extract_all" -> ((s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        concat_ws(",",
          regexp_extract_all(
            concat(col("p_brand"), lit(" x"), col("p_size").cast("string")),
            lit("[0-9]+"), lit(0))).as("nums"))
        .orderBy("p_partkey")),

    // CDC-style "keep the latest record per key": row_number over the
    // event time (event_id tie-break), rank 1 survives. The canonical
    // log-compaction / upsert-materialization pattern — one shuffle on
    // the key, no self-join.
    "q_latest_per_key" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"))
        .orderBy("user_id")
    }),

    // TPC-H Q21-style waiting-orders: suppliers whose line was late on
    // a multi-supplier order where NO other supplier was late — the
    // fact joined against itself twice, once as a semi (another
    // supplier exists) and once as an anti (no other late supplier).
    // Both self-joins co-shuffle on l_orderkey; the fact never
    // broadcasts.
    "q_tpch_q21" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .as("late"))
      val late = li.filter(col("late"))
      val withOther = late.as("l1")
        .join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_suppkey") =!= col("l2.l_suppkey"), "left_semi")
      val sole = withOther.as("l1")
        .join(late.as("l3"),
          col("l1.l_orderkey") === col("l3.l_orderkey") &&
            col("l1.l_suppkey") =!= col("l3.l_suppkey"), "left_anti")
      sole.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey"))
        .limit(20)
    }),

    // Deterministic mode: most frequent value per group with a
    // smallest-value tie-break (engine mode() functions break ties
    // arbitrarily, so this is the portable formulation).
    "q_mode" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("cnt"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q22-style global-sales-opportunity: customers with
    // above-average positive balance and no orders — a 1-row broadcast
    // threshold (compared in exact decimal, the q_above_cust_avg trick)
    // into an anti join, aggregated by nation.
    // "No orders at all" is vacuous on this testdata (every customer has
    // orders at sf<=0.01), so the anti-join keys on recent orders
    // instead: lapsed customers with no order since 2000-01-01 — the
    // same Q22 shape (broadcast scalar threshold, anti join, group).
    "q_tpch_q22" -> ((s, d) => {
      val thr = Tables.customer(s, d)
        .filter(col("c_acctbal") > 0.0)
        .agg(sum(col("c_acctbal").cast("decimal(18,4)")).as("s_pos"),
          count(lit(1)).as("n_pos"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      Tables.customer(s, d)
        .crossJoin(broadcast(thr))
        .filter(col("c_acctbal").cast("decimal(18,4)") * col("n_pos") >
          col("s_pos"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,4)")).cast("double")
            .as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // SCD Type-2 merge (dimension versioning on plain parquet): updated
    // keys close their current row (valid_to set) and append a new
    // open-ended version; untouched keys pass through. Three branches —
    // semi, anti, and the update set — all co-partitioned on the key,
    // then a union (no MERGE primitive required).
    "q_scd2_merge" -> ((s, d) => {
      val cur = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_acctbal"),
          lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
      val upd = Tables.supplier(s, d)
        .filter(col("s_suppkey") % 3 === 0)
        .select(col("s_suppkey"), (col("s_acctbal") + 100.0).as("s_acctbal"))
      val closed = cur
        .join(upd.select(col("s_suppkey")), Seq("s_suppkey"), "left_semi")
        .withColumn("valid_to", lit(1000L))
      val unchanged = cur
        .join(upd.select(col("s_suppkey")), Seq("s_suppkey"), "left_anti")
      val opened = upd
        .withColumn("valid_from", lit(1000L))
        .withColumn("valid_to", lit(null).cast("long"))
      unchanged.unionByName(closed).unionByName(opened)
        .orderBy(col("s_suppkey"), col("valid_from"))
    }),

    // Per-group z-score standardization from exact decimal power sums
    // over an unpartitioned-within-group window: mean and stddev are
    // order-independent, so the per-row standardization is bit-stable
    // at any parallelism — the feature-engineering normalize pass.
    "q_zscore" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
      val x = col("l_quantity").cast("decimal(24,4)")
      Tables.lineitem(s, d)
        .withColumn("n", count(lit(1)).over(w).cast("double"))
        .withColumn("sx", sum(x).over(w).cast("double"))
        .withColumn("sxx", sum(x * x).over(w).cast("double"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round((col("l_quantity") - col("sx") / col("n")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
              (col("n") - 1)), 6).as("z"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Triangle count over the co-occurrence graph of parts within an
    // order (parts are "connected" when some order contains both):
    // the standard two-hop join formulation with a < b < c orientation
    // so each triangle counts once.
    "q_triangles" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 100 === 0) // bounded co-occur graph
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .distinct()
      edges.as("e1")
        .join(edges.as("e2"), col("e1.b") === col("e2.a"))
        .join(edges.as("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .agg(count(lit(1)).as("n_triangles"))
    }),

    // Bounded-radius BFS: minimum hops from nation-0 customers over the
    // undirected customer—supplier co-order graph (supplier node ids
    // offset by 1e6 to disjoin the key spaces). One frontier⋈edges
    // shuffle per hop — the Pregel shape — against DuckDB's recursive
    // CTE as the oracle.
    "graph_bfs_hops" -> ((s, d) => {
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      val seeds = Tables.customer(s, d).filter(col("c_nationkey") === 0)
        .select(col("c_custkey").as("node"))
      graft.operators.Graph.bfsHops(edges, seeds, maxHops = 3)
        .orderBy("node")
    }),

    // Fixed-iteration PageRank (3 rounds, damping 0.85) over the same
    // customer—supplier order graph as graph_bfs_hops, directed
    // customer→supplier. Pure fixed-point integer arithmetic
    // (micro-ranks ×10^12, integer div) — no floats anywhere, so the
    // ranks are bit-identical across engines and partitionings; the
    // oracle unrolls the identical three rounds as chained CTEs.
    "graph_pagerank" -> ((s, d) => {
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      graft.operators.Graph.pagerank(edges, iterations = 3)
        .orderBy("node")
    }),

    // Mass-conserving PageRank: each round the rank held by dangling
    // nodes (every supplier in this customer→supplier graph — a strong
    // exercise of the path) redistributes equally inside the damping
    // term via a broadcast one-row aggregate. Same fixed-point integer
    // arithmetic; oracle unrolls the identical rounds with a dangling
    // CTE per round.
    "graph_pagerank_dangling" -> ((s, d) => {
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      graft.operators.Graph.pagerankDangling(edges, iterations = 3)
        .orderBy("node")
    }),

    // Synchronous label propagation, 2 unrolled rounds with self-vote
    // and smallest-label tie-break, over the same customer—supplier
    // graph — the community-detection pass next to pagerank's
    // importance one. The contract is "label state after exactly N
    // rounds" (bit-reproducible: integer counts, total tie order),
    // gated against an identically-unrolled oracle.
    "graph_label_prop" -> ((s, d) => {
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      graft.operators.Graph.labelPropagation(edges, iterations = 2)
        .orderBy("node")
    }),

    // Bounded-round k-core peeling (k=5, 3 synchronous rounds) over
    // the part co-occurrence graph (q_triangles' edge set): degrees
    // recount on the surviving subgraph each round, sub-k nodes drop.
    // The corpus converges inside the 3 rounds (round 4 is a fixpoint,
    // spec-pinned), so the output IS the 5-core: each surviving part
    // with its in-core degree. One degree agg + two semi-joins per
    // round, all node-keyed — no pair enumeration.
    "graph_kcore" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        .distinct()
      graft.operators.Graph.kCore(edges, k = 5, rounds = 3)
        .orderBy("node")
    }),

    // kCore's SALTED twin — the documented 100 TB skew adaptation for
    // power-law hubs: every degree count runs two-phase on
    // (u, xxhash64(v) mod 8) partials before merging on u, so a hub
    // node's edge rows spread across 8 aggregation keys instead of
    // one. Integer partial sums merge exactly — the output is
    // BIT-IDENTICAL to graph_kcore (shared oracle; GraphOpsSpec pins
    // the row-for-row parity and the two-phase plan shape).
    "graph_kcore_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        .distinct()
      graft.operators.Graph.kCoreSalted(edges, k = 5, rounds = 3,
        salts = 8)
        .orderBy("node")
    }),

    // Common-neighbor link prediction on the supplier—part bipartite
    // graph: supplier pairs ranked by neighbor-set Jaccard (integer
    // micro-units) — the friends-of-friends self-join keyed on the
    // shared part, with the power-law hub guard (degree-capped right
    // side) that bounds the deg² pair blow-up at scale.
    "graph_common_neighbors" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
      graft.operators.Graph.commonNeighbors(edges, degreeCap = 1000,
        minShared = 2L)
        .orderBy(col("jac_micro").desc, col("a"), col("b"))
        .limit(100)
    }),

    // commonNeighbors' SALTED twin — the same 100 TB hub-skew
    // adaptation as graph_kcore_salted applied to the bipartite degree
    // tables (rdeg gates the hub cap, ldeg feeds the Jaccard
    // denominator): both degree counts run two-phase on a salted
    // partial key before merging. Integer partials merge exactly, so
    // the output is BIT-IDENTICAL to graph_common_neighbors (shared
    // oracle; SketchesSpec pins the parity). The pair join itself is
    // untouched — its skew guard is the degree cap, which is what the
    // (now salt-robust) rdeg table enforces.
    "graph_common_neighbors_salted" -> ((s, d) => {
      val edges = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
      graft.operators.Graph.commonNeighbors(edges, degreeCap = 1000,
        minShared = 2L, salts = 8)
        .orderBy(col("jac_micro").desc, col("a"), col("b"))
        .limit(100)
    }),

    // Robust outlier profile per return flag: median / MAD (both via
    // the bounded-state interpolated-percentile aggregation, not the
    // value-buffering percentile()), outliers at the 3σ-equivalent
    // 4.4478·MAD fence. Prices work in exact integer cents; the two
    // medians interpolate to exact .25-step doubles, so the fence
    // comparison is engine-stable.
    "q_mad_outliers" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100, 0).cast("bigint").as("cents"))
      val med = graft.operators.Profiling
        .groupedPercentiles(li, col("flag"), col("cents"),
          Seq(0.5 -> "med"))
        .withColumnRenamed("k", "flag")
      val dev = li.join(broadcast(med), Seq("flag"))
        .withColumn("dev", abs(col("cents") - col("med")))
      val mad = graft.operators.Profiling
        .groupedPercentiles(dev, col("flag"), col("dev"),
          Seq(0.5 -> "mad"))
        .withColumnRenamed("k", "flag")
      dev.join(broadcast(mad), Seq("flag"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
          round(max(col("med")), 4).as("med"),
          round(max(col("mad")), 4).as("mad"),
          sum(when(col("dev") > lit(4.4478) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("flag")
    }),

    // Weighted median per group: the smallest price (integer cents)
    // whose running quantity-weight reaches half the group's total —
    // the LOWER weighted median, a pure integer rule (2·cumw ≥ tot),
    // no interpolation, no doubles. State is the VALUE DISTRIBUTION
    // (one row per distinct (group, value) after the first aggregate),
    // the same bounded-memory discipline as groupedPercentiles — a
    // naive sort-all-rows-per-group approach would buffer the group.
    "q_weighted_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100, 0).cast("bigint").as("cents"),
        col("l_quantity").cast("long").as("w"))
      val dist = li.groupBy(col("flag"), col("cents"))
        .agg(sum(col("w")).as("cw"))
      val wOrd = Window.partitionBy(col("flag")).orderBy(col("cents"))
      val wAll = Window.partitionBy(col("flag"))
      dist
        .withColumn("cum", sum(col("cw")).over(wOrd))
        .withColumn("tot", sum(col("cw")).over(wAll))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("flag"))
        .agg(min(col("cents")).as("wmedian_cents"),
          max(col("tot")).as("total_weight"))
        .orderBy("flag")
    }),

    // Cohort retention: users bucketed by first-seen hour, activity
    // counted per (cohort, hour offset) — the canonical product-
    // analytics matrix. Two aggregations and one co-partitioned join
    // on user_id.
    "q_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 3600000000000").as("hr"))
      val first = ev.groupBy(col("user_id")).agg(min(col("hr")).as("cohort"))
      ev.join(first, "user_id")
        .groupBy(col("cohort"), (col("hr") - col("cohort")).as("offset"))
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy("cohort", "offset")
    }),

    // Ordered funnel (view → click → purchase): per-user first times of
    // each step in ONE conditional-aggregation pass, then step counts
    // requiring strict event-time order.
    "q_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts")))
            .as("t_purchase"))
        .agg(
          count(col("t_view")).as("step_view"),
          count(when(col("t_click") > col("t_view"), 1)).as("step_click"),
          count(when(col("t_purchase") > col("t_click") &&
            col("t_click") > col("t_view"), 1)).as("step_purchase"))
    }),

    // Time-series resample + forward fill: snap events to an hourly
    // grid (latest event wins within the hour), densify each user's
    // range with sequence+explode, and carry the last observation
    // forward over the gaps — the standard feature-engineering reshape.
    // The grid explode is bounded by (users × hours), not events.
    "q_gap_fill" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id") < 20)
        .select(col("user_id"), expr("ts div 3600000000000").as("hr"),
          col("value"), col("event_id"))
      val wLatest = Window.partitionBy(col("user_id"), col("hr"))
        .orderBy(col("event_id").desc)
      val latest = ev.withColumn("rn", row_number().over(wLatest))
        .filter(col("rn") === 1).select(col("user_id"), col("hr"), col("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"))).as("hr"))
      val wFill = Window.partitionBy(col("user_id")).orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(latest, Seq("user_id", "hr"), "left_outer")
        .withColumn("filled_value", last(col("value"), ignoreNulls = true)
          .over(wFill))
        .select(col("user_id"), col("hr"), col("filled_value"))
        .orderBy("user_id", "hr")
    }),

    // Fixed-width histogram binning: a scan-only aggregation whose bin
    // key is computed per row (no pre-pass for min/max), capped at the
    // last bucket.
    "q_histogram" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(least(floor(col("o_totalprice") / 50000), lit(9))
          .cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(24,4)")).cast("double")
            .as("sum_price"))
        .orderBy("bin")),

    // TPC-H Q15-style top supplier: per-supplier revenue, then keep the
    // max via an unpartitioned window over the ALREADY-AGGREGATED table
    // (~one row per supplier — tiny), so the expensive lineitem
    // aggregation runs once instead of twice. AQE's runtime stage reuse
    // masks most of the difference locally (0.81s → 0.75s at sf0.1);
    // at cluster scale the single-pass form also halves the scan.
    // Exact decimal revenue, so the equality cannot drift.
    "q_tpch_q15" -> ((s, d) => {
      val w = Window.partitionBy()
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(18,2)"))
          .as("total_rev"))
        .withColumn("max_rev", max(col("total_rev")).over(w))
        .filter(col("total_rev") === col("max_rev"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
        .orderBy("s_suppkey")
    }),

    // Top-k per key through the custom TopKPerKeyExec physical operator
    // (graft.plans): bounded per-key heaps instead of a window sort —
    // O(n log k) and O(keys·k) memory where row_number needs a full
    // partition sort. Same oracle shape as a ranking window.
    "q_topk_per_key_native" -> ((s, d) =>
      graft.plans.TopKPerKey(Tables.orders(s, d),
        Seq(col("o_orderstatus")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 5)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderstatus", "o_orderkey")),

    // TPC-H Q16-style supplier-count report: distinct-count per
    // attribute pair after excluding a brand — partial aggregation
    // de-dupes (brand, size, supplier) before the count shuffle.
    "q_tpch_q16" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#5")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size")))
  )

  /** Unrolled 3-round k-core peel replay (k=5 over the part
    * co-occurrence graph): degrees on the survivors, sub-5 nodes
    * drop, both endpoints must survive for an edge to survive; output
    * = degrees inside the round-3 subgraph. Shared by graph_kcore and
    * its salted twin (two-phase integer partials merge to exactly the
    * one-phase degrees). */
  private val kcoreSql: String =
    """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
      |            WHERE l_orderkey % 100 = 0),
      |e0 AS (SELECT DISTINCT CAST(x.l_partkey AS BIGINT) AS a,
      |         CAST(y.l_partkey AS BIGINT) AS b
      |       FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
      |        AND x.l_partkey < y.l_partkey),
      |u0 AS (SELECT a AS u, b AS v FROM e0
      |       UNION ALL SELECT b, a FROM e0),
      |d1 AS (SELECT u, count(*) AS d FROM u0 GROUP BY u),
      |a1 AS (SELECT u FROM d1 WHERE d >= 5),
      |u1 AS (SELECT u, v FROM u0 WHERE u IN (SELECT u FROM a1)
      |         AND v IN (SELECT u FROM a1)),
      |d2 AS (SELECT u, count(*) AS d FROM u1 GROUP BY u),
      |a2 AS (SELECT u FROM d2 WHERE d >= 5),
      |u2 AS (SELECT u, v FROM u1 WHERE u IN (SELECT u FROM a2)
      |         AND v IN (SELECT u FROM a2)),
      |d3 AS (SELECT u, count(*) AS d FROM u2 GROUP BY u),
      |a3 AS (SELECT u FROM d3 WHERE d >= 5),
      |u3 AS (SELECT u, v FROM u2 WHERE u IN (SELECT u FROM a3)
      |         AND v IN (SELECT u FROM a3))
      |SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
      |FROM u3 GROUP BY u ORDER BY node""".stripMargin

  /** Common-neighbor Jaccard replay over the supplier—part bipartite
    * graph (hub cap 1000, minShared 2, integer micro-Jaccard). Shared
    * by graph_common_neighbors and its salted twin: two-phase integer
    * degree partials merge to exactly the one-phase degrees. */
  private val commonNeighborsSql: String =
    """WITH e AS (
      |  SELECT DISTINCT l_suppkey AS l, l_partkey AS r FROM lineitem),
      |rdeg AS (SELECT r, count(*) AS rdeg FROM e GROUP BY r),
      |ldeg AS (SELECT l, count(*) AS ldeg FROM e GROUP BY l),
      |kept AS (SELECT e.l, e.r FROM e JOIN rdeg USING (r)
      |         WHERE rdeg <= 1000),
      |p AS (
      |  SELECT x.l AS a, y.l AS b, count(*) AS shared
      |  FROM kept x JOIN kept y ON x.r = y.r AND x.l < y.l
      |  GROUP BY x.l, y.l HAVING count(*) >= 2)
      |SELECT a, b, shared,
      |       (shared * 1000000) // (da.ldeg + db.ldeg - shared)
      |         AS jac_micro
      |FROM p JOIN ldeg da ON da.l = a JOIN ldeg db ON db.l = b
      |ORDER BY jac_micro DESC, a, b LIMIT 100""".stripMargin

  val oracle: Map[String, String] = Map(
    // The HLL estimates themselves are engine-specific; the gate checks
    // the exact counts and pins the in-engine accuracy booleans to TRUE.
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  TRUE AS parts_in_bound,
        |  TRUE AS orders_in_bound
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(24,4)) * CAST(1.0 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_window_rank" ->
      """SELECT event_id, user_id,
        |  row_number() OVER w AS rn,
        |  CAST(CAST(lag(value, 1) OVER w AS DECIMAL(24,4)) AS DOUBLE) AS prev_value,
        |  CAST(sum(CAST(value AS DECIMAL(24,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin,

    "q_window_frames" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(24,4))) OVER w AS DOUBLE) AS moving_sum,
        |  count(*) OVER w AS moving_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(24,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(24,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_custkey AS key FROM customer WHERE c_acctbal > 0
        |INTERSECT
        |SELECT o_custkey AS key FROM orders
        |ORDER BY key""".stripMargin,

    "q_set_except" ->
      """SELECT c_custkey AS key FROM customer
        |EXCEPT
        |SELECT user_id AS key FROM events
        |ORDER BY key""".stripMargin,

    "q_union_all" ->
      """SELECT 'cust' AS src, c_custkey AS key FROM customer
        |UNION ALL
        |SELECT 'supp' AS src, s_suppkey AS key FROM supplier
        |ORDER BY src, key""".stripMargin,

    "q_distinct_agg" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
        |       count(*) AS n_cust
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join3_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_time_bucket" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600000 AS bucket_ms, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_ms, event_type""".stripMargin,

    "q_window_range" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000 AS evm, value
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(24,4))) OVER w AS DOUBLE) AS trailing_30m,
        |  count(*) OVER w AS n_trailing
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY evm
        |             RANGE BETWEEN 1800000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_session_window" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000 AS evm FROM events),
        |flagged AS (
        |  SELECT *, CASE
        |    WHEN evm - lag(evm, 1) OVER w > 1800000 THEN 1
        |    WHEN lag(evm, 1) OVER w IS NULL THEN 1
        |    ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY evm, event_id)),
        |sessions AS (
        |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY evm, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(evm) AS start_ms, max(evm) AS end_ms
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_time_bucket_ts" ->
      """SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS bucket_us,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin,

    "q_session_window_ts" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS evu FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN lag(evu) OVER w IS NULL
        |    OR evu - lag(evu) OVER w >= 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY evu)),
        |sess AS (
        |  SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY evu
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM flagged)
        |SELECT user_id, min(evu) AS start_us,
        |       max(evu) + 1800000000 AS end_us, count(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,

    "q_date_trunc_ts" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day_us, event_type""".stripMargin,

    "q_time_slice" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_asof_join_ts" ->
      """WITH errors AS (
        |  SELECT event_id AS err_id, user_id, ts AS err_ts
        |  FROM events WHERE event_type = 'error'),
        |clicks AS (
        |  SELECT event_id AS click_id, user_id AS c_user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |joined AS (
        |  SELECT e.*, c.click_id, c.click_ts,
        |         row_number() OVER (PARTITION BY e.err_id
        |           ORDER BY c.click_ts DESC NULLS LAST, c.click_id DESC NULLS LAST) AS rn
        |  FROM errors e LEFT JOIN clicks c
        |    ON e.user_id = c.c_user_id AND c.click_ts <= e.err_ts)
        |SELECT err_id, user_id, epoch_us(err_ts) AS err_us, click_id,
        |       epoch_us(click_ts) AS click_us,
        |       epoch_us(err_ts) - epoch_us(click_ts) AS gap_us
        |FROM joined WHERE rn = 1 ORDER BY err_id""".stripMargin,

    "q_cohort_retention_ts" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('day', ts) AS day_ts FROM events),
        |first AS (SELECT user_id, min(day_ts) AS cohort_ts
        |          FROM ev GROUP BY user_id)
        |SELECT epoch_us(cohort_ts) AS cohort_us,
        |  datediff('day', cohort_ts, day_ts) AS offset_days,
        |  count(DISTINCT user_id) AS users
        |FROM ev JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_us, offset_days""".stripMargin,

    "q_gap_fill_ts" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr_ts, value, event_id
        |  FROM events WHERE user_id < 20),
        |latest AS (
        |  SELECT user_id, hr_ts, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, hr_ts
        |      ORDER BY event_id DESC) AS rn FROM ev)
        |  WHERE rn = 1),
        |bounds AS (SELECT user_id, min(hr_ts) AS h0, max(hr_ts) AS h1
        |           FROM ev GROUP BY user_id),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr_ts
        |         FROM bounds)
        |SELECT user_id, epoch_us(hr_ts) AS hr_us,
        |  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hr_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_value
        |FROM grid LEFT JOIN latest USING (user_id, hr_ts)
        |ORDER BY user_id, hr_us""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_stats_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  sx / n AS mean_qty,
        |  round((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
        |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
        |  round((sxy - sx * sy / n) /
        |        (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000000 AS evm
        |  FROM events),
        |errors AS (
        |  SELECT event_id AS err_id, user_id, evm AS err_ms
        |  FROM ev WHERE event_type = 'error'),
        |clicks AS (
        |  SELECT event_id AS click_id, user_id AS c_user_id, evm AS click_ms
        |  FROM ev WHERE event_type = 'click'),
        |joined AS (
        |  SELECT e.*, c.click_id, c.click_ms,
        |         row_number() OVER (PARTITION BY e.err_id
        |           ORDER BY c.click_ms DESC NULLS LAST, c.click_id DESC NULLS LAST) AS rn
        |  FROM errors e LEFT JOIN clicks c
        |    ON e.user_id = c.c_user_id AND c.click_ms <= e.err_ms)
        |SELECT err_id, user_id, err_ms, click_id, click_ms,
        |       err_ms - click_ms AS gap_ms
        |FROM joined WHERE rn = 1 ORDER BY err_id""".stripMargin,

    "q_pivot_counts" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_range_join" ->
      """SELECT n_nationkey AS band_id, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN nation
        |  ON l_quantity >= n_nationkey * 2.0 AND l_quantity < n_nationkey * 2.0 + 2.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_grouping_sets" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_minmax_by" ->
      """SELECT c_mktsegment,
        |  arg_max(c_name, CAST(round(c_acctbal*100) AS BIGINT)*10000000 + c_custkey) AS richest,
        |  arg_min(c_name, CAST(round(c_acctbal*100) AS BIGINT)*10000000 + c_custkey) AS poorest,
        |  count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_posexplode" ->
      """WITH wrd AS (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part),
        |ix AS (SELECT p_partkey, w,
        |       unnest(generate_series(1, len(w))) AS i FROM wrd)
        |SELECT p_partkey, CAST(i - 1 AS INTEGER) AS pos, w[i] AS word
        |FROM ix ORDER BY p_partkey, pos""".stripMargin,

    "q_date_arith" ->
      """SELECT EXTRACT(year FROM o_orderdate) AS y,
        |  EXTRACT(month FROM o_orderdate) AS m,
        |  count(*) AS n,
        |  min(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))) AS min_dd,
        |  max(EXTRACT(day FROM o_orderdate)) AS max_dom
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_array_agg" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
        |  count(*) AS n
        |FROM customer WHERE c_acctbal < -900
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scalar_subquery" ->
      """WITH s AS (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) /
        |         count(*) AS avg_price
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders, s WHERE o_totalprice > avg_price
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pivot_native" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, m AS measure, v AS val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS m, l_quantity AS v FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "q_window_dist" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_window_firstlast" ->
      """SELECT event_id, user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_set_intersect_all" ->
      """SELECT o_custkey AS key FROM orders
        |INTERSECT ALL
        |SELECT user_id AS key FROM events
        |ORDER BY key""".stripMargin,

    "q_set_except_all" ->
      """SELECT o_custkey AS key FROM orders
        |EXCEPT ALL
        |SELECT user_id AS key FROM events
        |ORDER BY key""".stripMargin,

    "q_full_outer" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nk_c, count(*) AS n_cust
        |  FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
        |p AS (
        |  SELECT s_nationkey AS nk_s, count(*) AS n_supp
        |  FROM supplier WHERE s_suppkey % 7 = 0 GROUP BY 1)
        |SELECT coalesce(nk_c, nk_s) AS nk,
        |       CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
        |       CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
        |FROM c FULL OUTER JOIN p ON nk_c = nk_s ORDER BY nk""".stripMargin,

    "q_cross_join" ->
      """SELECT a.r_name AS a, b.r_name AS b
        |FROM region a CROSS JOIN region b ORDER BY 1, 2""".stripMargin,

    "q_window_lead" ->
      """SELECT event_id, user_id,
        |  lead(event_type, 1) OVER w AS next_type,
        |  lead(event_type, 2, 'NONE') OVER w AS next2_type,
        |  lag(event_type, 2) OVER w AS prev2_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_array_funcs" ->
      """WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
        |SELECT p_partkey,
        |  CAST(len(w) AS INTEGER) AS n_words,
        |  list_contains(w, 'green') AS has_green,
        |  array_to_string(w[1:2], ' ') AS first_two,
        |  array_to_string(list_sort(list_distinct(w)), ',') AS uniq_sorted
        |FROM t ORDER BY p_partkey""".stripMargin,

    "q_map_funcs" ->
      """SELECT event_id,
        |  CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q_null_funcs" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS non_open_status,
        |  coalesce(nullif(o_orderpriority, '5-LOW'), 'OTHER') AS prio_or_other,
        |  greatest(o_totalprice, 100000.0) AS floor_price,
        |  least(o_custkey, o_orderkey) AS min_key,
        |  nullif(o_orderstatus, 'O') IS NULL AS is_open
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS abs_dev,
        |  CAST(sign(l_quantity - 25.0) AS BIGINT) AS sgn,
        |  l_orderkey % 7 AS mod7,
        |  round(sqrt(l_quantity), 6) AS sqrt_q,
        |  round(ln(l_quantity + 1.0), 6) AS ln_q1,
        |  round(pow(l_discount, 2), 6) AS disc_sq,
        |  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS q_ceil7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_bit_funcs" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS bor,
        |  xor(o_orderkey, o_custkey) AS bxor,
        |  o_custkey << 3 AS shl,
        |  o_orderkey >> 2 AS shr
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_agg_filter" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
        |  CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  lower(p_brand) AS lo,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  substr(p_name, 1, 10) AS sub,
        |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded,
        |  replace(p_name, ' ', '_') AS joined,
        |  reverse(p_type) AS rev,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_window_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_date_parts" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(year(l_shipdate) AS INTEGER) AS yr,
        |  CAST(quarter(l_shipdate) AS INTEGER) AS qtr,
        |  CAST(month(l_shipdate) AS INTEGER) AS mon,
        |  CAST(day(l_shipdate) AS INTEGER) AS dom,
        |  CAST(dayofweek(l_shipdate) AS INTEGER) AS dow,
        |  CAST(dayofyear(l_shipdate) AS INTEGER) AS doy,
        |  CAST(weekofyear(l_shipdate) AS INTEGER) AS iso_week
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_hash_funcs" ->
      """SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_zorder" -> {
      // The oracle spells out the 10-bit interleave as 20 shift/mask
      // terms — an independent formulation of ZOrder2's loop.
      val zexpr = (0 until 10).map(i =>
        s"(((px >> $i) & 1) << ${2 * i}) | (((sx >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH b AS (
         |  SELECT l_partkey % 1024 AS px, l_suppkey % 1024 AS sx
         |  FROM lineitem),
         |z AS (SELECT px, sx, ($zexpr) AS zkey FROM b)
         |SELECT zkey >> 12 AS bucket, count(*) AS n,
         |       min(px) AS px_min, max(px) AS px_max,
         |       min(sx) AS sx_min, max(sx) AS sx_max
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "q_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(24,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority, n, total""".stripMargin,

    "q_pipe_syntax" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_rows
        |FROM lineitem WHERE l_quantity < 30
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_recursive_cte" ->
      """WITH RECURSIVE succ AS (
        |  SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth
        |  FROM supplier WHERE s_suppkey % 10 = 1
        |  UNION ALL
        |  SELECT s.s_suppkey, succ.root, succ.depth + 1
        |  FROM succ JOIN supplier s ON s.s_suppkey = succ.node + 1
        |  WHERE succ.depth < 5)
        |SELECT root, count(*) AS chain_len,
        |       CAST(max(depth) AS INTEGER) AS max_depth
        |FROM succ GROUP BY root ORDER BY root""".stripMargin,

    "q_lateral_topn" ->
      """SELECT r.r_name AS r_name, t.n_name AS n_name,
        |       CAST(t.rnk AS INTEGER) AS rnk
        |FROM region r,
        |LATERAL (
        |  SELECT n_name, row_number() OVER (ORDER BY n_name) AS rnk
        |  FROM nation WHERE n_regionkey = r.r_regionkey
        |  ORDER BY n_name LIMIT 2
        |) t
        |ORDER BY r_name, rnk""".stripMargin,

    "q_above_cust_avg" ->
      """WITH w AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    count(*) OVER (PARTITION BY o_custkey) AS n_cust,
        |    sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey) AS sum_dec
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, n_cust FROM w
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) * n_cust > sum_dec
        |ORDER BY o_orderkey""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_tpch_q9" ->
      """SELECT n_name,
        |  CAST(year(l_shipdate) AS INTEGER) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))
        |         - CAST(p_retailprice * 0.8 AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name, o_year ORDER BY n_name, o_year DESC""".stripMargin,

    "q_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(
        |    CAST(sum(CAST(CASE WHEN n1.n_name = 'NATION_7'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))
        |      ELSE 0 END AS DECIMAL(24,4))) AS DOUBLE) /
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(24,4))) AS DOUBLE),
        |    6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_tpch_q2" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)) AS unit_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |eu AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |j AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, n_name, unit_cost,
        |    min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
        |  FROM cost
        |  JOIN eu ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'LARGE')
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, unit_cost
        |FROM j WHERE unit_cost = min_cost
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    "q_tpch_q20" ->
      """WITH qty AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  GROUP BY l_partkey, l_suppkey),
        |lead AS (
        |  SELECT DISTINCT l_suppkey FROM (
        |    SELECT l_suppkey,
        |      row_number() OVER (PARTITION BY l_partkey
        |                         ORDER BY supp_qty DESC, l_suppkey) AS rn
        |    FROM qty)
        |  WHERE rn = 1)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM lead)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q11" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS value_dec
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
        |FROM pv
        |WHERE value_dec * 2 * (SELECT count(*) FROM pv) > (SELECT sum(value_dec) FROM pv) * 3
        |ORDER BY value DESC, l_partkey""".stripMargin,

    "q_tpch_q14" ->
      """SELECT round(100.0 *
        |  CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))
        |    ELSE 0 END AS DECIMAL(24,4))) AS DOUBLE) /
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(24,4))) AS DOUBLE), 6)
        |  AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin,

    "q_bool_bit_agg" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_quantity > 49) AS any_min,
        |  CAST(bit_and(l_linenumber) AS INTEGER) AS b_and,
        |  CAST(bit_or(l_linenumber) AS INTEGER) AS b_or,
        |  CAST(bit_xor(l_linenumber) AS INTEGER) AS b_xor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_try_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE) AS unit_price,
        |  CASE WHEN l_quantity - l_quantity = 0 THEN NULL
        |       ELSE l_quantity / (l_quantity - l_quantity) END AS div0,
        |  TRY_CAST(l_returnflag AS INTEGER) AS flag_num
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q17" ->
      """WITH pp AS (
        |  SELECT l_partkey AS pk, count(*) AS n_part,
        |         sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem JOIN pp ON l_partkey = pk
        |WHERE CAST(l_quantity AS DECIMAL(18,4)) * n_part * 10 < sum_qty * 8""".stripMargin,

    "q_bucketed_join" ->
      """SELECT o_orderkey, l_linenumber, l_quantity, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,

    "q_bucketed_agg" ->
      """SELECT l_orderkey,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 300)
        |SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_tpch_q19" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)""".stripMargin,

    "q_regression" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n, 6) AS intercept,
        |  round(pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q_json_path" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  json_extract_string(props, '$.missing') AS absent,
        |  json_extract_string(props, '$.k') IS NOT NULL AS has_k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  json_extract_string(props, '$.missing') AS absent,
        |  json_extract(props, '$.k') = 'null' AS k_is_null
        |FROM events ORDER BY event_id""".stripMargin,

    "q_union_distinct" ->
      """SELECT l_partkey AS key FROM lineitem
        |UNION
        |SELECT p_partkey AS key FROM part
        |ORDER BY key""".stripMargin,

    "q_skew_join" ->
      """WITH hot AS (
        |  SELECT l_orderkey,
        |    CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_orderkey % 5 END AS hk
        |  FROM lineitem),
        |dim AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS hk, n_name
        |  FROM nation WHERE n_nationkey < 5)
        |SELECT hk, n_name, count(*) AS n
        |FROM hot JOIN dim USING (hk)
        |GROUP BY hk, n_name ORDER BY hk""".stripMargin,

    "q_nullsafe_join" ->
      """WITH l AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk
        |  FROM customer),
        |r AS (
        |  SELECT CASE WHEN n_nationkey = 0 THEN NULL ELSE n_nationkey END AS nk2,
        |         n_name
        |  FROM nation)
        |SELECT c_custkey, coalesce(nk, -1) AS nk_or, n_name
        |FROM l JOIN r ON nk IS NOT DISTINCT FROM nk2
        |ORDER BY c_custkey, n_name""".stripMargin,

    "q_string_agg" ->
      """SELECT s_suppkey % 10 AS grp,
        |  array_to_string(list_sort(list(s_name)), ',') AS names,
        |  count(*) AS n
        |FROM supplier GROUP BY 1 ORDER BY grp""".stripMargin,

    "q_regexp_extract_all" ->
      """SELECT p_partkey,
        |  array_to_string(regexp_extract_all(p_brand || ' x' || CAST(p_size AS VARCHAR), '[0-9]+'), ',') AS nums
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_tpch_q21" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT l_suppkey, count(*) AS numwait
        |FROM li l1
        |WHERE late
        |  AND EXISTS (SELECT 1 FROM li l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM li l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY l_suppkey
        |ORDER BY numwait DESC, l_suppkey LIMIT 20""".stripMargin,

    "q_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty, cnt
        |FROM (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY count(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "q_tpch_q22" ->
      """WITH thr AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS s_pos, count(*) AS n_pos
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM customer, thr
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n_pos > s_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_scd2_merge" ->
      """WITH cur AS (
        |  SELECT s_suppkey, s_acctbal, CAST(0 AS BIGINT) AS valid_from,
        |         CAST(NULL AS BIGINT) AS valid_to
        |  FROM supplier),
        |upd AS (
        |  SELECT s_suppkey, s_acctbal + 100.0 AS s_acctbal
        |  FROM supplier WHERE s_suppkey % 3 = 0)
        |SELECT s_suppkey, s_acctbal, valid_from, valid_to FROM cur
        |WHERE s_suppkey NOT IN (SELECT s_suppkey FROM upd)
        |UNION ALL
        |SELECT s_suppkey, s_acctbal, valid_from, CAST(1000 AS BIGINT) FROM cur
        |WHERE s_suppkey IN (SELECT s_suppkey FROM upd)
        |UNION ALL
        |SELECT s_suppkey, s_acctbal, CAST(1000 AS BIGINT), CAST(NULL AS BIGINT)
        |FROM upd
        |ORDER BY s_suppkey, valid_from""".stripMargin,

    "q_zscore" ->
      """WITH w AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |    CAST(count(*) OVER g AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(24,4))) OVER g AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_quantity AS DECIMAL(24,4))) OVER g AS DOUBLE) AS sxx
        |  FROM lineitem
        |  WINDOW g AS (PARTITION BY l_returnflag))
        |SELECT l_orderkey, l_linenumber, l_returnflag,
        |  round((l_quantity - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS z
        |FROM w ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_triangles" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 100 = 0),
        |edges AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM li x JOIN li y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)
        |SELECT count(*) AS n_triangles
        |FROM edges e1
        |JOIN edges e2 ON e1.b = e2.a
        |JOIN edges e3 ON e1.a = e3.a AND e2.b = e3.b""".stripMargin,

    "graph_bfs_hops" ->
      """WITH RECURSIVE
        |edges AS (
        |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |und AS (SELECT src, dst FROM edges
        |        UNION SELECT dst, src FROM edges),
        |bfs(node, hops) AS (
        |  SELECT CAST(c_custkey AS BIGINT), 0
        |  FROM customer WHERE c_nationkey = 0
        |  UNION
        |  SELECT u.dst, b.hops + 1
        |  FROM bfs b JOIN und u ON b.node = u.src WHERE b.hops < 3)
        |SELECT node, CAST(min(hops) AS INTEGER) AS hops
        |FROM bfs GROUP BY node ORDER BY node""".stripMargin,

    // Unrolled 3-round peel replay: degrees on the survivors, sub-5
    // nodes drop, both endpoints must survive for an edge to survive;
    // output = degrees inside the round-3 subgraph. The salted twin
    // shares it verbatim: two-phase integer partial counts merge to
    // exactly the one-phase degrees.
    "graph_kcore" -> kcoreSql,
    "graph_kcore_salted" -> kcoreSql,

    "graph_label_prop" ->
      """WITH e0 AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS s,
        |         CAST(l_suppkey + 1000000 AS BIGINT) AS t
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |sym AS (SELECT s AS u, t AS v FROM e0
        |        UNION SELECT t, s FROM e0),
        |l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym),
        |v1 AS (SELECT s.u AS node, l.label
        |       FROM sym s JOIN l0 l ON l.node = s.v
        |       UNION ALL SELECT node, label FROM l0),
        |c1 AS (SELECT node, label, count(*) AS cnt
        |       FROM v1 GROUP BY node, label),
        |l1 AS (SELECT node, label FROM (
        |         SELECT node, label, row_number() OVER (PARTITION BY node
        |           ORDER BY cnt DESC, label) AS rn FROM c1)
        |       WHERE rn = 1),
        |v2 AS (SELECT s.u AS node, l.label
        |       FROM sym s JOIN l1 l ON l.node = s.v
        |       UNION ALL SELECT node, label FROM l1),
        |c2 AS (SELECT node, label, count(*) AS cnt
        |       FROM v2 GROUP BY node, label),
        |l2 AS (SELECT node, label FROM (
        |         SELECT node, label, row_number() OVER (PARTITION BY node
        |           ORDER BY cnt DESC, label) AS rn FROM c2)
        |       WHERE rn = 1)
        |SELECT node, label FROM l2 ORDER BY node""".stripMargin,

    "graph_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |         CAST(l_suppkey + 1000000 AS BIGINT) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |outd AS (SELECT src AS node, count(*) AS outd FROM e GROUP BY src),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1000000000000 // n AS rank_micro
        |       FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node, r.rank_micro // o.outd AS contrib
        |       FROM r0 r JOIN outd o ON r.node = o.node JOIN e ON e.src = r.node),
        |s1 AS (SELECT node, CAST(sum(contrib) AS BIGINT) AS s
        |       FROM c1 GROUP BY node),
        |r1 AS (SELECT nodes.node,
        |         150000000000 // n + (85 * coalesce(s, 0)) // 100 AS rank_micro
        |       FROM nodes CROSS JOIN nn LEFT JOIN s1 ON s1.node = nodes.node),
        |c2 AS (SELECT e.dst AS node, r.rank_micro // o.outd AS contrib
        |       FROM r1 r JOIN outd o ON r.node = o.node JOIN e ON e.src = r.node),
        |s2 AS (SELECT node, CAST(sum(contrib) AS BIGINT) AS s
        |       FROM c2 GROUP BY node),
        |r2 AS (SELECT nodes.node,
        |         150000000000 // n + (85 * coalesce(s, 0)) // 100 AS rank_micro
        |       FROM nodes CROSS JOIN nn LEFT JOIN s2 ON s2.node = nodes.node),
        |c3 AS (SELECT e.dst AS node, r.rank_micro // o.outd AS contrib
        |       FROM r2 r JOIN outd o ON r.node = o.node JOIN e ON e.src = r.node),
        |s3 AS (SELECT node, CAST(sum(contrib) AS BIGINT) AS s
        |       FROM c3 GROUP BY node),
        |r3 AS (SELECT nodes.node,
        |         150000000000 // n + (85 * coalesce(s, 0)) // 100 AS rank_micro
        |       FROM nodes CROSS JOIN nn LEFT JOIN s3 ON s3.node = nodes.node)
        |SELECT node, rank_micro FROM r3 ORDER BY node""".stripMargin,

    // Same unrolled rounds as graph_pagerank plus a per-round dangling
    // total d_k (rank mass on nodes with no out-edges), redistributed
    // as dm // n inside the damping term. Integer // throughout.
    "graph_pagerank_dangling" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |         CAST(l_suppkey + 1000000 AS BIGINT) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |outd AS (SELECT src AS node, count(*) AS outd FROM e GROUP BY src),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1000000000000 // n AS rank_micro
        |       FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node, r.rank_micro // o.outd AS contrib
        |       FROM r0 r JOIN outd o ON r.node = o.node JOIN e ON e.src = r.node),
        |s1 AS (SELECT node, CAST(sum(contrib) AS BIGINT) AS s
        |       FROM c1 GROUP BY node),
        |d1 AS (SELECT CAST(coalesce(sum(rank_micro), 0) AS BIGINT) AS dm
        |       FROM r0 WHERE node NOT IN (SELECT node FROM outd)),
        |r1 AS (SELECT nodes.node,
        |         150000000000 // n
        |           + (85 * (coalesce(s, 0) + dm // n)) // 100 AS rank_micro
        |       FROM nodes CROSS JOIN nn CROSS JOIN d1
        |       LEFT JOIN s1 ON s1.node = nodes.node),
        |c2 AS (SELECT e.dst AS node, r.rank_micro // o.outd AS contrib
        |       FROM r1 r JOIN outd o ON r.node = o.node JOIN e ON e.src = r.node),
        |s2 AS (SELECT node, CAST(sum(contrib) AS BIGINT) AS s
        |       FROM c2 GROUP BY node),
        |d2 AS (SELECT CAST(coalesce(sum(rank_micro), 0) AS BIGINT) AS dm
        |       FROM r1 WHERE node NOT IN (SELECT node FROM outd)),
        |r2 AS (SELECT nodes.node,
        |         150000000000 // n
        |           + (85 * (coalesce(s, 0) + dm // n)) // 100 AS rank_micro
        |       FROM nodes CROSS JOIN nn CROSS JOIN d2
        |       LEFT JOIN s2 ON s2.node = nodes.node),
        |c3 AS (SELECT e.dst AS node, r.rank_micro // o.outd AS contrib
        |       FROM r2 r JOIN outd o ON r.node = o.node JOIN e ON e.src = r.node),
        |s3 AS (SELECT node, CAST(sum(contrib) AS BIGINT) AS s
        |       FROM c3 GROUP BY node),
        |d3 AS (SELECT CAST(coalesce(sum(rank_micro), 0) AS BIGINT) AS dm
        |       FROM r2 WHERE node NOT IN (SELECT node FROM outd)),
        |r3 AS (SELECT nodes.node,
        |         150000000000 // n
        |           + (85 * (coalesce(s, 0) + dm // n)) // 100 AS rank_micro
        |       FROM nodes CROSS JOIN nn CROSS JOIN d3
        |       LEFT JOIN s3 ON s3.node = nodes.node)
        |SELECT node, rank_micro FROM r3 ORDER BY node""".stripMargin,

    "q_cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS hr FROM events),
        |first AS (SELECT user_id, min(hr) AS cohort FROM ev GROUP BY user_id)
        |SELECT cohort, hr - cohort AS "offset",
        |  count(DISTINCT user_id) AS users
        |FROM ev JOIN first USING (user_id)
        |GROUP BY cohort, "offset" ORDER BY cohort, "offset"""".stripMargin,

    "q_funnel" ->
      """WITH per AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(t_view) AS step_view,
        |  count(CASE WHEN t_click > t_view THEN 1 END) AS step_click,
        |  count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS step_purchase
        |FROM per""".stripMargin,

    "q_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS hr, value, event_id
        |  FROM events WHERE user_id < 20),
        |latest AS (
        |  SELECT user_id, hr, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, hr
        |      ORDER BY event_id DESC) AS rn FROM ev)
        |  WHERE rn = 1),
        |bounds AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |           FROM ev GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr
        |         FROM bounds)
        |SELECT user_id, hr,
        |  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_value
        |FROM grid LEFT JOIN latest USING (user_id, hr)
        |ORDER BY user_id, hr""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(24,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS total_rev
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_topk_per_key_native" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 5 ORDER BY o_orderstatus, o_orderkey""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "graph_common_neighbors" -> commonNeighborsSql,
    "graph_common_neighbors_salted" -> commonNeighborsSql,

    "q_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |         CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |dist AS (
        |  SELECT flag, cents, CAST(sum(w) AS BIGINT) AS cw
        |  FROM li GROUP BY flag, cents),
        |c AS (
        |  SELECT flag, cents,
        |         CAST(sum(cw) OVER (PARTITION BY flag ORDER BY cents)
        |           AS BIGINT) AS cum,
        |         CAST(sum(cw) OVER (PARTITION BY flag) AS BIGINT) AS tot
        |  FROM dist)
        |SELECT flag, min(cents) AS wmedian_cents,
        |       max(tot) AS total_weight
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY flag ORDER BY flag""".stripMargin,

    "q_mad_outliers" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem),
        |med AS (SELECT flag, quantile_cont(cents, 0.5) AS med
        |        FROM li GROUP BY flag),
        |dev AS (SELECT li.flag, cents, med, abs(cents - med) AS dev
        |        FROM li JOIN med USING (flag)),
        |mad AS (SELECT flag, quantile_cont(dev, 0.5) AS mad
        |        FROM dev GROUP BY flag)
        |SELECT dev.flag, count(*) AS n,
        |       round(max(med), 4) AS med, round(max(mad), 4) AS mad,
        |       CAST(sum(CASE WHEN dev > CAST(4.4478 AS DOUBLE) * mad
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (flag)
        |GROUP BY dev.flag ORDER BY flag""".stripMargin
  )
}
