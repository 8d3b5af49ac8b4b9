package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Behavioral / sequence / graph analytics — the event-log query family a
 * production analytics engine is asked for beyond plain relational operators
 * (the reference's query surface stops at aggregate dashboards; these are the
 * standard next asks: cohort retention, ordered funnels, Markov transition
 * matrices, rolling active users, co-occurrence graphs, association rules).
 *
 * Scale notes (100 TB design intent):
 *  - every per-user computation shuffles ONCE on `user_id` and reuses that
 *    partitioning across the chained joins/aggregations (cohort join, funnel
 *    step joins) — no global windows anywhere in this module;
 *  - the rolling-active computation avoids a range join by EXPLODING each
 *    user-day into its ≤7 target days (a bounded fan-out) and equi-joining,
 *    so the plan is shuffle-hash all the way down;
 *  - PageRank is the iterative-join formulation (GraphX/GraphFrames shape):
 *    each iteration is one equi-join rank ⋈ edges on `src` + one reduce on
 *    `dst`. Rank mass is carried as integer micro-units with floor division
 *    so partial-aggregation order can never perturb the result — the same
 *    determinism trick the LM/NLL operators in [[graft.operators.TextAnalysis]]
 *    use. On a real cluster the edge frame would be bucketed by `src`
 *    ([[graft.export.Bucketed]]) so iterations reuse one layout;
 *  - association-rule mining bounds the pair space by the per-basket item
 *    count (≤13 parts per order in TPC-H-ish data; the self-join fan-out is
 *    k², not corpus²) — the same candidate-blocking discipline as the dedup
 *    family.
 */
object Behavioral {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cohort retention matrix: users grouped by first-active week; for each
    // (cohort, week-offset) the count of cohort members active that week.
    // Two shuffles total, both on user_id (min-agg, then distinct+join reuse
    // the same hash partitioning under AQE).
    "evt_retention_cohorts" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      ev.distinct()
        .join(cohort, Seq("user_id"))
        .withColumn("week_offset", expr("datediff(week, cohort_week) div 7").cast("long"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),
    // Ordered step funnel view → click → purchase with strict event-time
    // progression (a later step only counts if it happens AFTER the user's
    // first completion of the previous step). Expressed as chained
    // min-aggregate + equi-join on user_id — no window, no global sort; the
    // classic funnel formulation that scales because every step is one
    // user-keyed shuffle.
    "evt_step_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("n_users")).withColumn("step", lit("1_view"))
        .unionByName(c.agg(count(lit(1)).as("n_users")).withColumn("step", lit("2_click")))
        .unionByName(p.agg(count(lit(1)).as("n_users")).withColumn("step", lit("3_purchase")))
        .select(col("step"), col("n_users"))
        .orderBy(col("step"))
    }),
    // First-order Markov chain over each user's event sequence: transition
    // counts + row-normalized probabilities. The lead() window is partitioned
    // by user_id (never global); the probability normalization runs over the
    // collapsed |event_types|² frame (≤25 rows), so its window is benign.
    "evt_markov_chain" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = t(s, dir, "events")
        .withColumn("dst", lead(col("event_type"), 1).over(byUser))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
      val bySrc = Window.partitionBy(col("src"))
      trans
        .withColumn("prob", round(col("n") / sum(col("n")).over(bySrc), 6))
        .select(col("src"), col("dst"), col("n"), col("prob"))
        .orderBy(col("src"), col("dst"))
    }),
    // 7-day rolling distinct active users per day, EXACT — not a range join:
    // each distinct user-day contributes to its next 7 target days via a
    // bounded explode, then one equi-shuffle counts distinct users per target
    // day. Target days are restricted to days that actually occur (tiny
    // dimension → broadcast).
    "evt_rolling_active" -> ((s, dir) => {
      val ud = t(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val days = ud.select(col("day")).distinct()
      ud.withColumn("target_day",
          explode(expr("sequence(day, day + interval 6 days, interval 1 day)")))
        .join(broadcast(days.withColumnRenamed("day", "target_day")), Seq("target_day"))
        .groupBy(col("target_day").as("day"))
        .agg(countDistinct(col("user_id")).as("active_7d"))
        .orderBy(col("day"))
    }),
    // PageRank (3 fixed iterations, damping 0.85) over the part co-purchase
    // graph (parts sharing an order ⇒ symmetric edge). Rank carried as
    // integer micro-units with floor division — bit-identical under any
    // partial-aggregation order. Every node has deg ≥ 1 and (symmetry) at
    // least one in-edge, so no dangling-mass term is needed.
    "graph_pagerank" -> ((s, dir) => {
      val op = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val e = op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val edges = e.join(deg, Seq("src"))
      var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rnk"))
      for (_ <- 1 to 3) {
        ranks = edges.join(ranks, edges("src") === ranks("node"))
          .select(col("dst"), expr("rnk div deg").as("c"))
          .groupBy(col("dst"))
          .agg(sum(col("c")).as("sc"))
          .select(col("dst").as("node"), expr("150000 + (85 * sc) div 100").cast("long").as("rnk"))
      }
      ranks.orderBy(col("rnk").desc, col("node"))
        .limit(20)
        .select(col("node").as("part"), col("rnk").as("rank_micro"))
    }),
    // Degree distribution of the same co-purchase graph — the graph-health
    // diagnostic you run BEFORE an iterative algorithm (hub detection: a
    // power-law tail here predicts skewed join keys in PageRank).
    "graph_degree_stats" -> ((s, dir) => {
      val op = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val e = op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
      e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("deg"))
    }),
    // Association rules (market basket): support / confidence / lift over
    // part pairs co-occurring in an order. Pair space is bounded by the
    // per-order item count (k² per basket, k ≤ 13 here), min-support prunes
    // before the per-item joins, and the corpus total is a 1-row broadcast —
    // the same collapsed-scalar pattern as era_tx_fee_recipients.
    "basket_assoc_rules" -> ((s, dir) => {
      val op = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val cnt = op.groupBy(col("p")).agg(count(lit(1)).as("item_n"))
      val tot = op.agg(countDistinct(col("o")).as("n_orders"))
      val pairs = op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
        .agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 3)
      pairs
        .join(cnt.select(col("p").as("pa"), col("item_n").as("cnt_a")), Seq("pa"))
        .join(cnt.select(col("p").as("pb"), col("item_n").as("cnt_b")), Seq("pb"))
        .crossJoin(broadcast(tot))
        .select(
          col("pa"), col("pb"), col("sup"),
          round(col("sup") / col("cnt_a"), 6).as("conf"),
          round(col("sup") * col("n_orders") / (col("cnt_a") * col("cnt_b")), 6).as("lift"))
        .orderBy(col("pa"), col("pb"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "evt_retention_cohorts" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS week FROM events),
         co AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
         uw AS (SELECT DISTINCT e.user_id, e.week, c.cohort_week
                FROM ev e JOIN co c USING (user_id))
         SELECT cohort_week,
                CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM uw GROUP BY 1, 2 ORDER BY 1, 2""",
    "evt_step_funnel" ->
      """WITH v AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
                    FROM events WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
               FROM events e JOIN v ON e.user_id = v.user_id AND CAST(e.ts AS TIMESTAMP) > v.t1
               WHERE e.event_type = 'click' GROUP BY e.user_id),
         p AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
               FROM events e JOIN c ON e.user_id = c.user_id AND CAST(e.ts AS TIMESTAMP) > c.t2
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
         SELECT '1_view' AS step, CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
         UNION ALL
         SELECT '2_click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
         UNION ALL
         SELECT '3_purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
         ORDER BY step""",
    "evt_markov_chain" ->
      """WITH seq AS (
           SELECT user_id, event_type AS src,
                  LEAD(event_type) OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
           FROM events),
         trans AS (
           SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
           FROM seq WHERE dst IS NOT NULL GROUP BY src, dst)
         SELECT src, dst, n,
                ROUND(n::DOUBLE / SUM(n) OVER (PARTITION BY src), 6) AS prob
         FROM trans ORDER BY src, dst""",
    "evt_rolling_active" ->
      """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
         days AS (SELECT DISTINCT day FROM ud)
         SELECT d.day AS day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_7d
         FROM days d JOIN ud u
           ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
         GROUP BY d.day ORDER BY day""",
    "graph_pagerank" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         e AS (SELECT DISTINCT a.p AS src, b.p AS dst
               FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
         deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
         r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rnk FROM deg),
         c1 AS (SELECT e.dst, SUM(r.rnk // d.deg) AS sc
                FROM e JOIN deg d ON e.src = d.src JOIN r0 r ON e.src = r.node GROUP BY e.dst),
         r1 AS (SELECT dst AS node, CAST(150000 + (85 * sc) // 100 AS BIGINT) AS rnk FROM c1),
         c2 AS (SELECT e.dst, SUM(r.rnk // d.deg) AS sc
                FROM e JOIN deg d ON e.src = d.src JOIN r1 r ON e.src = r.node GROUP BY e.dst),
         r2 AS (SELECT dst AS node, CAST(150000 + (85 * sc) // 100 AS BIGINT) AS rnk FROM c2),
         c3 AS (SELECT e.dst, SUM(r.rnk // d.deg) AS sc
                FROM e JOIN deg d ON e.src = d.src JOIN r2 r ON e.src = r.node GROUP BY e.dst),
         r3 AS (SELECT dst AS node, CAST(150000 + (85 * sc) // 100 AS BIGINT) AS rnk FROM c3)
         SELECT node AS part, rnk AS rank_micro FROM r3
         ORDER BY rank_micro DESC, part LIMIT 20""",
    "graph_degree_stats" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         e AS (SELECT DISTINCT a.p AS src, b.p AS dst
               FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
         deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src)
         SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM deg GROUP BY deg ORDER BY deg""",
    "basket_assoc_rules" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS item_n FROM op GROUP BY p),
         tot AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM op),
         pairs AS (
           SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS sup
           FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
           GROUP BY a.p, b.p HAVING COUNT(*) >= 3)
         SELECT pa, pb, sup,
                ROUND(sup::DOUBLE / ca.item_n, 6) AS conf,
                ROUND(sup::DOUBLE * tot.n_orders / (ca.item_n * cb.item_n), 6) AS lift
         FROM pairs
         JOIN cnt ca ON pairs.pa = ca.p
         JOIN cnt cb ON pairs.pb = cb.p
         CROSS JOIN tot
         ORDER BY pa, pb"""
  )
}
