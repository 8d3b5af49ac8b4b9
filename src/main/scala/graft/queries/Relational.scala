package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Generic relational operator corpus — one named query per operator class in
 * SURVEY.md §2.6–2.8 (aggregations, windows, sorts/limits, set ops, joins,
 * scalar surface). Each query is the Spark-first expression of a pattern from
 * the reference's documented query surface (`docs/CLICKHOUSE.md` in
 * gnosischain/era-parser), run over the driver's TPC-H-ish test tables so the
 * DuckDB oracle can hash-check it.
 *
 * Scale notes (100 TB design intent):
 *  - dimension joins (`nation`, `region`, `customer` at small SF) are
 *    explicitly `broadcast()` so the big fact side never shuffles;
 *  - aggregations are plain `groupBy` — Catalyst plans partial (map-side)
 *    aggregation automatically, so the shuffle carries only group keys;
 *  - windows that need a global ordering (gap analysis W1) are partitioned
 *    by a bucketing key wherever the semantics allow (here: `user_id`),
 *    never `Window.orderBy` with no partition unless the reference query is
 *    inherently global (W2) — those are flagged.
 */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Batch sessionization body (30-min inactivity gap): the classic
    * two-window + aggregate shape, everything keyed on `user_id`. Exposed
    * so `BucketedJoinSpec` can prove the 100 TB story: over an events
    * table BUCKETED by user_id at rest, this entire pipeline — both
    * windows AND the (user_id, session_seq) aggregation, whose
    * ClusteredDistribution a user_id HashPartitioning already satisfies —
    * plans with ZERO Exchange. */
  private[graft] def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .withColumn("is_start",
        when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_start")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("(max(us) - min(us)) div 1000000").as("duration_s"))
  }

  /** All aggregate outputs are rounded/cast identically in the oracle SQL so
    * double accumulation-order differences cannot flip the value hash. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── A: aggregations (SURVEY §2.6) ─────────────────────────────────────
    // A-core: count/sum/avg/min/max over a filtered fact table (CLICKHOUSE.md:384-399 shape).
    "agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= expr("timestamp'1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // J: interval/range join in its SCALABLE form — a big-big interval
    // join can't broadcast and must not plan a nested loop; bin both
    // sides to the month, equi-join on the bin (one hash shuffle), apply
    // the interval predicate as a residual. A window spanning k months
    // explodes to k bin rows (k ≤ 2 here); a fact row has exactly one
    // bin, so no dedup step is needed.
    "join_range_binned" -> ((s, dir) => {
      val wins = t(s, dir, "orders")
        .filter(col("o_orderkey") % 1500 === 0)
        .select(col("o_orderkey").as("win_id"),
          col("o_orderdate").as("win_start"),
          (col("o_orderdate") + expr("interval 30 days")).as("win_end"))
      val winBins = wins.withColumn("bin",
        explode(expr(
          "sequence(date_trunc('month', win_start), date_trunc('month', win_end), interval 1 month)")))
      t(s, dir, "lineitem")
        .select(col("l_shipdate"), col("l_quantity"))
        .withColumn("bin", date_trunc("month", col("l_shipdate")))
        .join(winBins, Seq("bin"))
        .filter(col("l_shipdate") >= col("win_start") &&
          col("l_shipdate") < col("win_end"))
        .groupBy(col("win_id"), col("win_start"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("win_id"))
    }),
    // A: pivot (long → wide reshape) with an EXPLICIT value list — open-
    // ended pivots need a pre-pass to discover values (a collect); pinning
    // the columns keeps it one aggregation pass, and each pivot cell is a
    // conditional partial aggregate (exactly the mirror's CASE form).
    "agg_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id") % 100)
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .withColumnRenamed("(user_id % 100)", "user_bucket")
        .select(col("user_bucket").cast("long").as("user_bucket"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("view"), lit(0L)).as("n_view"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"))
        .orderBy(col("user_bucket"))
    }),
    // A: ROLLUP subtotals — the hierarchy (flag, status) → (flag) → ()
    // in ONE pass: Spark expands grouping sets after the map-side partial
    // aggregation, so the detail and every subtotal level share a single
    // shuffle instead of one aggregation per level.
    "agg_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),
    // A: full-cube margins — the BI cross-tab ROLLUP cannot express (the
    // (null, status) column margins). One shuffle of map-side partials,
    // each input row expanded to its 4 grouping sets pre-aggregation.
    "agg_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),
    // Hot-key diagnosis: the report that decides whether a join/agg key
    // needs salting (feeds agg_salted_skew's remedy). Collapse to per-key
    // counts (one shuffle); the share/ratio denominators are a 1-row
    // scalar aggregate cross-joined broadcast (the era_tx_fee_recipients
    // pattern) — NOT a `sum() over ()` window, which would funnel the full
    // key-cardinality frame through a single partition at real key counts.
    // The global sort is a TakeOrdered top-10, never a full sort.
    "diag_skew" -> ((s, dir) => {
      val perKey = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_rows"))
      val totals = perKey.agg(
        sum(col("n_rows")).as("tot_rows"), count(lit(1)).as("n_keys"))
      perKey.crossJoin(broadcast(totals))
        .withColumn("share",
          round(col("n_rows").cast("double") / col("tot_rows"), 6))
        .withColumn("ratio_to_avg",
          round(col("n_rows").cast("double") * col("n_keys") /
            col("tot_rows"), 4))
        .drop("tot_rows", "n_keys")
        .orderBy(col("n_rows").desc, col("o_custkey"))
        .limit(10)
    }),
    // A: Pearson correlation per group — computed from EXACT integer sums
    // (quantity is integral, price is cents) carried in decimals so no
    // long overflow and no order-dependent double accumulation; the one
    // double formula is written identically in the oracle. Never the
    // engine's own corr(), whose streaming accumulation rounds differently.
    "agg_corr" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("cast(x * x as decimal(38,0))")).as("sxx"),
          sum(expr("cast(y * y as decimal(38,0))")).as("syy"),
          sum(expr("cast(x * y as decimal(38,0))")).as("sxy"))
        .withColumn("den",
          sqrt(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double")))
        // a constant column in a group ⇒ zero variance ⇒ NULL correlation
        // in BOTH engines (DuckDB's raw DOUBLE division yields NaN/Inf)
        .withColumn("corr_qty_price",
          round((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            when(col("den") =!= 0.0, col("den")), 6))
        .select(col("l_returnflag"), col("n"), col("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),
    // A: histogram-sketch quantiles — the scale path for percentiles when
    // a per-group sort (agg_percentile's exact path) is too expensive: a
    // (min, max) pass, a fixed 128-bin count pass, and in-bin linear
    // interpolation at the first cumulative crossing. Two aggregations
    // regardless of corpus size; the exact twin stays beside it to
    // measure the sketch error.
    "agg_histogram_quantile" -> ((s, dir) => {
      val bins = 128
      val base = t(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"), col("o_totalprice").as("v"))
      val stats = base.groupBy(col("grp"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
          count(lit(1)).as("n"))
      val wq = Window.partitionBy(col("grp"), col("q")).orderBy(col("bin"))
      base.join(broadcast(stats), Seq("grp"))
        // constant-group guard: mx = mn would make the bin NaN and the
        // group silently vanish — all values land in bin 0 instead
        .withColumn("bin",
          when(col("mx") === col("mn"), lit(0))
            .otherwise(least(lit(bins - 1),
              floor((col("v") - col("mn")) / (col("mx") - col("mn")) * bins))
              .cast("int")))
        .groupBy(col("grp"), col("bin"))
        .agg(count(lit(1)).as("c"))
        .join(broadcast(stats), Seq("grp"))
        .withColumn("q", explode(typedLit(Seq(0.5, 0.9))))
        .withColumn("cum", sum(col("c")).over(wq))
        .withColumn("target", col("q") * col("n"))
        .filter(col("cum") >= col("target"))
        .withColumn("rk", row_number().over(wq))
        .filter(col("rk") === 1)
        .withColumn("est",
          when(col("mx") === col("mn"), round(col("mn").cast("double"), 4))
            .otherwise(round(col("mn") +
              (col("bin") + (col("target") - (col("cum") - col("c"))) / col("c")) *
                ((col("mx") - col("mn")) / bins), 4)))
        .select(col("grp").as("o_orderpriority"), col("q"), col("est"), col("n"))
        .orderBy(col("o_orderpriority"), col("q"))
    }),
    // A: count(DISTINCT x) (CLICKHOUSE.md:389,456).
    "agg_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),
    // A: countIf → conditional aggregation (CLICKHOUSE.md:907).
    "agg_countif" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          count(lit(1)).as("n_total"))
        .orderBy(col("o_orderpriority"))
    }),
    // A: stddevPop (CLICKHOUSE.md:644).
    "agg_stddev" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(stddev_pop(col("o_totalprice")), 2).as("sd_price"),
          round(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy(col("o_orderpriority"))
    }),
    // A: groupArray → collect_list; rendered as a sorted joined string so the
    // hash is order-independent (CLICKHOUSE.md:737).
    "agg_grouparray" -> ((s, dir) => {
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy(col("n_regionkey"))
    }),
    // A: HAVING (CLICKHOUSE.md:469,743).
    "agg_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_spent"))
        .filter(col("n_orders") >= 5)
        .orderBy(col("o_custkey"))
    }),
    // A: time-bucketed GROUP BY — toStartOfDay (CLICKHOUSE.md:386,411).
    "agg_timebucket_day" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("day"))
    }),
    // A: toHour extraction (CLICKHOUSE.md:424,460).
    "agg_hour" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("hr"))
    }),
    // A1/S3-shape: record counts by type + min/max key (era_reader.py:135-155).
    "agg_stats_by_type" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
        .orderBy(col("event_type"))
    }),

    // ── W: windows (SURVEY §2.7) ──────────────────────────────────────────
    // W1: lag() gap analysis (CLICKHOUSE.md:500-508). Partitioned by user so
    // the sort is distributed; (ts, event_id) is a unique deterministic order.
    "win_lag_gap" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_event_id", lag(col("event_id"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("prev_event_id"))
        .orderBy(col("user_id"), col("event_id"))
    }),
    // W: batch sessionization — the lag + running-sum idiom (the batch
    // twin of the streaming flatMapGroupsWithState sessionizer): a new
    // session starts where the gap to the previous event exceeds 30 min;
    // the session id is the running count of session starts. Both windows
    // share ONE (user_id) shuffle and sort. Summary grain: one row per
    // session with its span and event count.
    "win_sessionize" -> ((s, dir) =>
      sessionize(t(s, dir, "events")).orderBy(col("user_id"), col("session_seq"))),
    // W2: global analytic avg(x) OVER () (CLICKHOUSE.md:529,755). Inherently a
    // single-partition window at any scale — the reference query is global;
    // computed via a scalar cross-join-free windowed aggregate on a tiny
    // grouped input rather than windowing the raw fact table.
    "win_global_avg" -> ((s, dir) => {
      val byPrio = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(avg(col("o_totalprice")).as("prio_avg"))
      byPrio
        .withColumn("global_avg", avg(col("prio_avg")).over(Window.partitionBy()))
        .select(
          col("o_orderpriority"),
          round(col("prio_avg"), 2).as("prio_avg"),
          round(col("global_avg"), 2).as("global_avg"))
        .orderBy(col("o_orderpriority"))
    }),
    // W3: latest-state dedup — ReplacingMergeTree/era_status argmax semantics
    // (002_performance_optimizations_up.sql:20-38) as row_number()=1.
    "win_latest_state" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"))
    }),

    // A: exact interpolated percentiles (median / p90) per group.
    "agg_percentile" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),
    // W: rolling frame — sliding sum over the last 4 events per user
    // (ROWS BETWEEN; beyond the reference surface, standard stream-shape
    // analytics).
    "win_rolling_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      t(s, dir, "events")
        .withColumn("rolling_value", round(sum(col("value")).over(w), 4))
        .select(col("user_id"), col("event_id"), col("rolling_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),
    // W: rolling z-score anomaly detection — per (event_type, day) volume
    // scored against its own trailing 7-day window (the ops-monitoring /
    // crawl-health query). Mean/variance come from exact integer frame
    // sums (n, n², count) so both engines run identical double arithmetic
    // — never the engine's own streaming stddev, whose rounding differs.
    "win_zscore_anomaly" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("cnt_w", count(col("n")).over(w))
        .withColumn("sum_w", sum(col("n")).over(w))
        // n² in DECIMAL: a 1e10-events day would overflow a LONG product
        // under ANSI (the r12 integer-kernel class); DECIMAL(38,0) keeps
        // the frame sum exact and the double formula unchanged
        .withColumn("sum2_w", sum(expr("cast(n as decimal(38,0)) * n")).over(w))
        .filter(col("cnt_w") >= 3)
        .withColumn("mean_w", col("sum_w").cast("double") / col("cnt_w"))
        .withColumn("var_w",
          (col("sum2_w").cast("double") -
            col("sum_w").cast("double") * col("sum_w") / col("cnt_w")) / col("cnt_w"))
        .filter(col("var_w") > 0)
        .withColumn("z", round((col("n") - col("mean_w")) / sqrt(col("var_w")), 4))
        .select(col("event_type"), col("day"), col("n"),
          round(col("mean_w"), 4).as("mean_w"), col("z"))
        .orderBy(col("event_type"), col("day"))
    }),
    // W: ranking family — dense_rank + ntile over order value per segment.
    "win_ranking" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val byPrio = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rnk", dense_rank().over(byPrio).cast("long"))
        .withColumn("quartile", ntile(4).over(byPrio).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("o_orderpriority"), col("rnk"), col("quartile"), col("o_orderkey"))
        .orderBy(col("o_orderpriority"), col("rnk"))
    }),
    // Correlated scalar subquery (TPC-H Q17 shape): parts whose small
    // orders fall under 20% of that part's average quantity — Catalyst
    // decorrelates into an aggregate + join.
    "sub_scalar_corr" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("p_key"))
        .agg((avg(col("l_quantity")) * 0.2).as("threshold"))
      li.join(avgQty, li("l_partkey") === avgQty("p_key"))
        .filter(col("l_quantity") < col("threshold"))
        .agg(
          round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
          count(lit(1)).as("n_small_orders"))
    }),

    // ── O: sorts / top-k (SURVEY §2.7) ────────────────────────────────────
    // O3: ORDER BY … DESC LIMIT k → TakeOrderedAndProject, no global sort
    // materialization (CLICKHOUSE.md:400-413). Unique tiebreak for determinism.
    "topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),
    // O1/S2: filter + project + sort (era_reader.py:129-133 shape).
    "sort_filter_project" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id"))
    }),

    // ── Layout: Z-order clustering profile (the OPTIMIZE ZORDER
    // maintenance op — graft.operators.Layout). Per z-bucket row count +
    // (partkey, suppkey) min/max rectangle: the parquet footer statistics
    // this clustering would give every file, i.e. the two-column pruning
    // evidence. ZorderSpec measures the actual row-group skipping.
    "layout_zorder" -> ((s, dir) => {
      graft.operators.Layout.zorderProfile(
        t(s, dir, "lineitem"), "l_partkey", "l_suppkey")
    }),

    // U: INTERSECT / EXCEPT — absent from the reference (SURVEY §2.7 notes)
    // but part of a complete relational surface: customers who clicked vs
    // purchased.
    "setop_intersect_except" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clickers = ev.filter(col("event_type") === "click").select(col("user_id"))
      val buyers = ev.filter(col("event_type") === "purchase").select(col("user_id"))
      val both = clickers.intersect(buyers)
        .withColumn("cohort", lit("click_and_buy"))
      val onlyClick = clickers.except(buyers)
        .withColumn("cohort", lit("click_only"))
      both.unionByName(onlyClick)
        .groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort"))
    }),

    // ── U: set ops (SURVEY §2.7) ──────────────────────────────────────────
    // U1: UNION ALL across homogeneous tables (CLICKHOUSE.md:432-466).
    "union_all_counts" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey").as("id"), lit("customer").as("kind"))
      val p = t(s, dir, "supplier").select(col("s_suppkey").as("id"), lit("supplier").as("kind"))
      c.unionByName(p)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"))
        .orderBy(col("kind"))
    }),

    // ── J: joins (SURVEY §2.5) ────────────────────────────────────────────
    // J1: inner equi-join fact ⋈ dim (CLICKHOUSE.md:544,790). Dim side
    // broadcast — at 100 TB the orders fact never shuffles for this join.
    "join_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),
    // J2: LEFT JOIN preserving unmatched parents (CLICKHOUSE.md:545,791).
    "join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_custkey")).as("n_customers"),
          count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),
    // J3: FULL OUTER JOIN of sibling aggregates (CLICKHOUSE.md:804-815 — the
    // deposit/withdrawal/consolidation request reconciliation shape).
    "join_full_outer" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_clicks"))
      val buys = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_buys"))
      clicks.join(buys, Seq("user_id"), "full_outer")
        .select(
          col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_buys"), lit(0L)).as("n_buys"))
        .orderBy(col("user_id"))
    }),
    // J4: anti-join — the completed-era resume filter
    // (era_state_manager.py:459-473) as left_anti.
    "join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),
    // As-of (point-in-time) join: each event matched to the user's most
    // recent order at-or-before the event time — the equi+range join the
    // prompt-level operator list calls out, expressed as join + aggregate
    // (deterministic: max date + prior-order count, no ambiguous row pick).
    // Scale: the range predicate rides the equi-join on user_id, so the
    // shuffle is keyed and the range filter is evaluated stream-side.
    "join_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val o = t(s, dir, "orders")
      ev.join(o, ev("user_id") === o("o_custkey") && o("o_orderdate") <= ev("ts"))
        .groupBy(col("event_id"), col("user_id"), col("ts"))
        .agg(
          max(col("o_orderdate")).as("last_order_date"),
          count(lit(1)).as("n_prior_orders"))
        .select(
          col("event_id"), col("user_id"),
          datediff(col("ts"), col("last_order_date")).cast("long").as("days_since_last_order"),
          col("n_prior_orders"))
        .orderBy(col("event_id"))
    }),
    // J5: semi-join (EXISTS) — fixture-pairing check shape (test_validation.py:88-101).
    "join_semi" -> ((s, dir) => {
      val s_ = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 49).select(col("l_suppkey"))
      s_.join(li, s_("s_suppkey") === li("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),
    // Multi-way star join: fact ⋈ 4 broadcast dims, the flagship shape.
    "join_star_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("r_name"))
    }),

    // ── scalar surface (SURVEY §2.8) ──────────────────────────────────────
    // CASE WHEN bucketing (CLICKHOUSE.md:677-682).
    "scalar_case_when" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),
    // round() + arithmetic ratio (CLICKHOUSE.md:540,744).
    "scalar_ratio" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) / sum(col("l_extendedprice")),
          6).as("disc_ratio"))
        .orderBy(col("l_returnflag"))
    }),
    // JSONExtract (CLICKHOUSE.md:705-706) → get_json_object / from_json.
    "scalar_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),
    // now() - INTERVAL / date-range predicate (CLICKHOUSE.md:386 shape, fixed
    // anchor so the oracle is deterministic).
    "scalar_date_range" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= expr("timestamp'1998-01-01 00:00:00' - interval 90 days") &&
                col("o_orderdate") < expr("timestamp'1998-01-01 00:00:00'"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),
    // Skew-resistant aggregation: two-phase salted groupBy. The 5
    // event_type keys are maximally skewed at scale (each key = 1/5 of a
    // 100 TB table on one reducer); salting on a high-cardinality column
    // spreads each hot key over 16 partial groups, then the tiny partial
    // set re-aggregates. Result provably equals the plain groupBy (the
    // oracle IS the plain GROUP BY).
    "agg_salted_skew" -> ((s, dir) => {
      val salted = t(s, dir, "events")
        .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(16)))
        .groupBy(col("event_type"), col("_salt"))
        .agg(count(lit(1)).as("pc"), sum(col("value")).as("ps"))
      salted.groupBy(col("event_type"))
        .agg(sum(col("pc")).as("n_events"), round(sum(col("ps")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    }),
    // GROUPING SETS — the explicit multi-grain form of rollup/cube (Spark 4
    // Dataset.groupingSets): per-(flag,status), per-flag, and grand total in
    // one pass. One shuffle; Catalyst expands grains map-side.
    "agg_grouping_sets" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    // W: distribution family — percent_rank / cume_dist within a partition
    // key (never a global window; the per-segment sort is the semantics).
    "win_distribution" -> ((s, dir) => {
      val bySeg = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
      t(s, dir, "customer")
        .withColumn("pr", round(percent_rank().over(bySeg), 6))
        .withColumn("cd", round(cume_dist().over(bySeg), 6))
        .filter(col("c_acctbal") > 9900)
        .select(col("c_mktsegment"), col("c_custkey"), col("pr"), col("cd"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    }),
    // EXISTS / NOT EXISTS correlated subqueries — planned as leftsemi +
    // leftanti hash joins (never a per-row subquery re-execution): customers
    // with at least one big order and no finished order. The orders side is
    // filtered BEFORE the join so each semi/anti probe carries only the
    // qualifying keys.
    "sub_exists" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val big = o.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
      val fin = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      c.join(big, c("c_custkey") === big("o_custkey"), "leftsemi")
        .join(fin, c("c_custkey") === fin("o_custkey"), "leftanti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),
    // LATERAL top-N-per-group: the 3 highest-balance customers of each
    // nation. SQL's correlated LIMIT subquery; in Spark the scale-correct
    // plan is a nation-partitioned row_number (per-partition heap, no
    // per-group re-scan) + broadcast of the 25-row nation dim.
    "join_lateral_topn" -> ((s, dir) => {
      val byNation =
        Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(byNation))
        .filter(col("rn") <= 3)
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("n_name"), col("c_acctbal").desc, col("c_custkey"))
    }),
    // Deliberately-skewed fact⋈dim shuffle join: a third of orders collapse
    // onto customer 1 (the hot-key shape a real workload shows as one
    // straggler task). The declarative plan is exactly the naive join — the
    // skew cure is AQE's skew-join split at runtime (OptimizeSkewedJoin
    // re-plans the hot partition into parallel splits; AqeSkewSpec asserts
    // `skew=true` appears in the executed plan under SMJ thresholds). No
    // salting in the query itself: at 100 TB the same plan self-heals,
    // which is the point — compare agg_salted_skew for the manual cure.
    "join_skew_aqe" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("ck",
          when(col("o_orderkey") % 3 === 0, lit(1L))
            .otherwise(col("o_custkey")))
      o.join(t(s, dir, "customer"), col("ck") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_nationkey"))
    }),
    // RANGE window frame over event-time (not ROWS): 4-day rolling event
    // count per type keyed on the integer day epoch. The input deliberately
    // has gaps (every 3rd calendar day removed) so RANGE genuinely differs
    // from ROWS — missing days shrink the window instead of reaching further
    // back. Partitioned by event_type; never a global window.
    "win_range_frame" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .filter(dayofmonth(col("day")) % 3 =!= 0)
        .withColumn("epd", datediff(col("day"), lit("2024-01-01").cast("date")))
      val frame = Window.partitionBy(col("event_type")).orderBy(col("epd"))
        .rangeBetween(-3, Window.currentRow)
      daily
        .withColumn("c_4d", sum(col("c")).over(frame))
        .select(col("event_type"), col("day"), col("c"), col("c_4d"))
        .orderBy(col("event_type"), col("day"))
    }),
    // W: gaps-and-islands — longest consecutive-day activity streak per
    // user (the engagement metric every event-log warehouse is asked for;
    // the same islands trick the ExactSubstr span merge uses internally,
    // exposed as a first-class query). Island id = day epoch − row_number
    // (constant within a consecutive run, strictly changing across a gap
    // because distinct days make epd strictly increasing). One user-keyed
    // window + two user-keyed aggregations — a single (user_id) shuffle
    // under AQE partitioning reuse; never a global window.
    "win_streaks" -> ((s, dir) => {
      val days = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .withColumn("epd", datediff(col("day"), lit("2024-01-01").cast("date")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("epd"))
      days
        .withColumn("grp", col("epd") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(sum(col("len")).as("active_days"),
          count(lit(1)).as("n_streaks"),
          max(col("len")).as("longest_streak"))
        .orderBy(col("user_id"))
    }),
    // toUInt64(string) cast ladder (CLICKHOUSE.md:795-798).
    "scalar_cast" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k_str", get_json_object(col("props"), "$.k"))
        .withColumn("k_num", col("k_str").cast("long"))
        .groupBy((col("k_num") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k_mod"))
    })
  )

  /** DuckDB-runnable ANSI oracle for every query above. Aggregate column
    * names, rounding, and casts match the Spark side exactly (the driver
    * sorts columns by name and hashes values). DuckDB SUM(BIGINT) widens to
    * HUGEINT, hence the explicit CAST(... AS BIGINT). */
  val oracleSql: Map[String, String] = Map(
    "agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         ROUND(AVG(l_quantity), 4) AS avg_qty,
         CAST(COUNT(*) AS BIGINT) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "join_range_binned" ->
      """WITH w AS (
         SELECT o_orderkey AS win_id, o_orderdate AS win_start,
                o_orderdate + INTERVAL 30 DAY AS win_end
         FROM orders WHERE o_orderkey % 1500 = 0)
         SELECT w.win_id, w.win_start,
                CAST(COUNT(*) AS BIGINT) AS n_items,
                ROUND(SUM(l.l_quantity), 2) AS sum_qty
         FROM lineitem l
         JOIN w ON l.l_shipdate >= w.win_start AND l.l_shipdate < w.win_end
         GROUP BY w.win_id, w.win_start ORDER BY w.win_id""",
    "agg_pivot" ->
      """SELECT user_id % 100 AS user_bucket,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
         FROM events GROUP BY user_id % 100 ORDER BY user_bucket""",
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "win_zscore_anomaly" ->
      """WITH d AS (
           SELECT event_type, DATE_TRUNC('day', ts) AS day,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT event_type, day, n,
                  COUNT(n) OVER win AS cnt_w,
                  SUM(n) OVER win AS sum_w,
                  SUM(n::DECIMAL(38,0) * n) OVER win AS sum2_w
           FROM d
           WINDOW win AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
         f AS (
           SELECT event_type, day, n,
                  sum_w::DOUBLE / cnt_w AS mean_w,
                  (sum2_w::DOUBLE - sum_w::DOUBLE * sum_w / cnt_w) / cnt_w AS var_w
           FROM w WHERE cnt_w >= 3)
         SELECT event_type, day, n, ROUND(mean_w, 4) AS mean_w,
                ROUND((n - mean_w) / sqrt(var_w), 4) AS z
         FROM f WHERE var_w > 0 ORDER BY event_type, day""",
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "diag_skew" ->
      """WITH c AS (
           SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM orders GROUP BY o_custkey),
         s AS (
           SELECT o_custkey, n_rows,
                  ROUND(n_rows::DOUBLE / SUM(n_rows) OVER (), 6) AS share,
                  ROUND(n_rows::DOUBLE * COUNT(*) OVER () / SUM(n_rows) OVER (), 4) AS ratio_to_avg
           FROM c)
         SELECT o_custkey, n_rows, share, ratio_to_avg FROM s
         ORDER BY n_rows DESC, o_custkey LIMIT 10""",
    "agg_corr" ->
      """WITH b AS (
           SELECT l_returnflag,
                  CAST(l_quantity AS BIGINT) AS x,
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem),
         a AS (
           SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                  SUM(x * x)::DOUBLE AS sxx, SUM(y * y)::DOUBLE AS syy,
                  SUM(x * y)::DOUBLE AS sxy
           FROM b GROUP BY l_returnflag)
         SELECT l_returnflag, n,
                ROUND((n::DOUBLE * sxy - sx::DOUBLE * sy::DOUBLE) /
                      NULLIF(sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx::DOUBLE) *
                             sqrt(n::DOUBLE * syy - sy::DOUBLE * sy::DOUBLE), 0), 6)
                  AS corr_qty_price
         FROM a ORDER BY l_returnflag""",
    "agg_histogram_quantile" ->
      """WITH b AS (SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders),
         st AS (
           SELECT grp, MIN(v) AS mn, MAX(v) AS mx, CAST(COUNT(*) AS BIGINT) AS n
           FROM b GROUP BY grp),
         h AS (
           SELECT b.grp,
                  (CASE WHEN st.mx = st.mn THEN 0
                        ELSE LEAST(127, FLOOR((b.v - st.mn) / (st.mx - st.mn) * 128))::INT
                   END) AS bin,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM b JOIN st USING (grp) GROUP BY 1, 2),
         hq AS (
           SELECT h.grp, h.bin, h.c, st.mn, st.mx, st.n, q.q
           FROM h JOIN st USING (grp), (SELECT unnest([0.5, 0.9]) AS q) q),
         wc AS (
           SELECT grp, bin, c, mn, mx, n, q,
                  SUM(c) OVER (PARTITION BY grp, q ORDER BY bin) AS cum
           FROM hq),
         sel AS (
           SELECT grp, bin, c, mn, mx, n, q, cum,
                  ROW_NUMBER() OVER (PARTITION BY grp, q ORDER BY bin) AS rk
           FROM wc WHERE cum >= q * n)
         SELECT grp AS o_orderpriority, q,
                ROUND(CASE WHEN mx = mn THEN mn
                           ELSE mn + (bin + (q * n - (cum - c)) / c) * ((mx - mn) / 128)
                      END, 4) AS est,
                n
         FROM sel WHERE rk = 1 ORDER BY o_orderpriority, q""",
    "agg_distinct" ->
      """SELECT l_returnflag,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
         CAST(COUNT(*) AS BIGINT) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_countif" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(COUNT(*) AS BIGINT) AS n_total
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_stddev" ->
      """SELECT o_orderpriority,
         ROUND(STDDEV_POP(o_totalprice), 2) AS sd_price,
         ROUND(AVG(o_totalprice), 2) AS avg_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_grouparray" ->
      """SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "agg_having" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS total_spent
         FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5 ORDER BY o_custkey""",
    "agg_timebucket_day" ->
      """SELECT DATE_TRUNC('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(SUM(value), 2) AS sum_value
         FROM events GROUP BY 1 ORDER BY day""",
    "agg_hour" ->
      """SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr, CAST(COUNT(*) AS BIGINT) AS n_events
         FROM events GROUP BY 1 ORDER BY hr""",
    "agg_stats_by_type" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(event_id) AS BIGINT) AS min_id, CAST(MAX(event_id) AS BIGINT) AS max_id
         FROM events GROUP BY event_type ORDER BY event_type""",
    "win_lag_gap" ->
      """SELECT user_id, event_id,
         LAG(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id
         FROM events ORDER BY user_id, event_id""",
    "win_sessionize" ->
      """WITH g AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           FROM events),
         st AS (
           SELECT user_id, event_id, us,
             CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS is_start
           FROM g),
         sq AS (
           SELECT user_id, us,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           FROM st)
         SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_s
         FROM sq GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",
    "win_global_avg" ->
      """WITH byprio AS (
           SELECT o_orderpriority, AVG(o_totalprice) AS prio_avg_raw
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, ROUND(prio_avg_raw, 2) AS prio_avg,
         ROUND(AVG(prio_avg_raw) OVER (), 2) AS global_avg
         FROM byprio ORDER BY o_orderpriority""",
    "win_latest_state" ->
      """SELECT user_id, event_id, event_type FROM (
           SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t WHERE rn = 1 ORDER BY user_id""",
    "agg_percentile" ->
      """SELECT o_orderpriority,
         ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
         ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "win_rolling_sum" ->
      """SELECT user_id, event_id,
         ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS rolling_value
         FROM events ORDER BY user_id, event_id""",
    "win_ranking" ->
      """SELECT o_orderpriority, rnk, quartile, o_orderkey FROM (
           SELECT o_orderpriority, o_orderkey,
             CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
             CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
           FROM orders) t
         WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""",
    "sub_scalar_corr" ->
      """SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
         CAST(COUNT(*) AS BIGINT) AS n_small_orders
         FROM lineitem l
         WHERE l_quantity < (
           SELECT 0.2 * AVG(l_quantity) FROM lineitem i
           WHERE i.l_partkey = l.l_partkey)""",
    "setop_intersect_except" ->
      """SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
           SELECT user_id, 'click_and_buy' AS cohort FROM (
             SELECT user_id FROM events WHERE event_type = 'click'
             INTERSECT
             SELECT user_id FROM events WHERE event_type = 'purchase') a
           UNION ALL
           SELECT user_id, 'click_only' AS cohort FROM (
             SELECT user_id FROM events WHERE event_type = 'click'
             EXCEPT
             SELECT user_id FROM events WHERE event_type = 'purchase') b) u
         GROUP BY cohort ORDER BY cohort""",
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    // mirrors graft.operators.Layout: min-max 16-bit scaling + Morton
    // interleave (32 shift-and-or terms, generated — identical bit math
    // in both engines), bucket = zval // (2^32 / 64)
    "layout_zorder" -> {
      def spread(e: String, off: Int): String =
        (0 until 16).map(i => s"((($e >> $i) & 1) << ${2 * i + off})")
          .mkString(" | ")
      def scale(c: String, mn: String, mx: String): String =
        s"CAST(FLOOR(LEAST(GREATEST(($c - $mn)::DOUBLE * 65535.0 / " +
          s"GREATEST(($mx - $mn)::DOUBLE, 1.0), 0.0), 65535.0)) AS BIGINT)"
      s"""WITH b AS (
         |  SELECT MIN(l_partkey) AS xmn, MAX(l_partkey) AS xmx,
         |         MIN(l_suppkey) AS ymn, MAX(l_suppkey) AS ymx FROM lineitem),
         |s AS (
         |  SELECT l_partkey, l_suppkey,
         |         ${scale("l_partkey", "b.xmn", "b.xmx")} AS xb,
         |         ${scale("l_suppkey", "b.ymn", "b.ymx")} AS yb
         |  FROM lineitem, b),
         |z AS (
         |  SELECT l_partkey, l_suppkey,
         |         (${spread("xb", 0)} | ${spread("yb", 1)}) AS zval
         |  FROM s)
         |SELECT zval // 67108864 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(MIN(l_partkey) AS BIGINT) AS x_min,
         |       CAST(MAX(l_partkey) AS BIGINT) AS x_max,
         |       CAST(MIN(l_suppkey) AS BIGINT) AS y_min,
         |       CAST(MAX(l_suppkey) AS BIGINT) AS y_max
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    "sort_filter_project" ->
      """SELECT event_id, user_id, value FROM events
         WHERE event_type = 'purchase' ORDER BY event_id""",
    "union_all_counts" ->
      """SELECT kind, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(id) AS BIGINT) AS sum_id FROM (
           SELECT c_custkey AS id, 'customer' AS kind FROM customer
           UNION ALL
           SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier) u
         GROUP BY kind ORDER BY kind""",
    "join_inner" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_left" ->
      """SELECT c_mktsegment, CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
         CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_full_outer" ->
      """SELECT COALESCE(c.user_id, b.user_id) AS user_id,
         CAST(COALESCE(n_clicks, 0) AS BIGINT) AS n_clicks,
         CAST(COALESCE(n_buys, 0) AS BIGINT) AS n_buys
         FROM (SELECT user_id, COUNT(*) AS n_clicks FROM events WHERE event_type = 'click' GROUP BY user_id) c
         FULL OUTER JOIN (SELECT user_id, COUNT(*) AS n_buys FROM events WHERE event_type = 'purchase' GROUP BY user_id) b
         ON c.user_id = b.user_id ORDER BY user_id""",
    "join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
         ORDER BY c_custkey""",
    "join_asof" ->
      """SELECT e.event_id, e.user_id,
         CAST(CAST(e.ts AS DATE) - CAST(MAX(o.o_orderdate) AS DATE) AS BIGINT) AS days_since_last_order,
         CAST(COUNT(*) AS BIGINT) AS n_prior_orders
         FROM events e JOIN orders o
           ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
         GROUP BY e.event_id, e.user_id, e.ts
         ORDER BY e.event_id""",
    "join_semi" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
         ORDER BY s_suppkey""",
    "join_star_revenue" ->
      """SELECT r_name,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "join_skew_aqe" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS revenue
         FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1
                           ELSE o_custkey END AS ck, o_totalprice
               FROM orders) o
         JOIN customer ON ck = c_custkey
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "scalar_case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 200000 THEN 'medium'
                     ELSE 'large' END AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "scalar_ratio" ->
      """SELECT l_returnflag,
         ROUND(SUM(l_extendedprice * (1 - l_discount)) / SUM(l_extendedprice), 6) AS disc_ratio
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "scalar_json_extract" ->
      """SELECT event_type,
         CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "scalar_date_range" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders
         WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' - INTERVAL 90 DAY
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_salted_skew" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(SUM(value), 2) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "scalar_cast" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 10 AS k_mod,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY 1 ORDER BY k_mod""",
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "sub_exists" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "join_lateral_topn" ->
      """SELECT n_name, l.c_custkey, l.c_acctbal
         FROM nation, LATERAL (
           SELECT c_custkey, c_acctbal FROM customer
           WHERE c_nationkey = n_nationkey
           ORDER BY c_acctbal DESC, c_custkey LIMIT 3) l
         ORDER BY n_name, c_acctbal DESC, c_custkey""",
    "win_range_frame" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         gapped AS (
           SELECT event_type, day, c,
                  date_diff('day', DATE '2024-01-01', day) AS epd
           FROM daily WHERE dayofmonth(day) % 3 <> 0)
         SELECT event_type, day, c,
                CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY epd
                     RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS c_4d
         FROM gapped ORDER BY event_type, day""",
    "win_streaks" ->
      """WITH d AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         e AS (
           SELECT user_id, date_diff('day', DATE '2024-01-01', day) AS epd FROM d),
         g AS (
           SELECT user_id,
                  epd - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epd) AS grp
           FROM e),
         s AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2)
         SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days,
                CAST(COUNT(*) AS BIGINT) AS n_streaks,
                CAST(MAX(len) AS BIGINT) AS longest_streak
         FROM s GROUP BY user_id ORDER BY user_id""",
    "win_distribution" ->
      """WITH w AS (
           SELECT c_mktsegment, c_custkey, c_acctbal,
                  ROUND(PERCENT_RANK() OVER win, 6) AS pr,
                  ROUND(CUME_DIST() OVER win, 6) AS cd
           FROM customer
           WINDOW win AS (PARTITION BY c_mktsegment ORDER BY c_acctbal))
         SELECT c_mktsegment, c_custkey, pr, cd
         FROM w WHERE c_acctbal > 9900 ORDER BY c_mktsegment, c_custkey"""
  )
}
