package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the behavioral / graph / basket query family —
  * properties the DuckDB hash gate can't express (monotonicity, probability
  * normalization, conservation laws). */
class BehavioralSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("retention: offset-0 row of each cohort equals the cohort's size") {
    val rows = run("evt_retention_cohorts").collect()
    val byCohort = rows.groupBy(_.get(0))
    byCohort.foreach { case (_, rs) =>
      val offsets = rs.map(r => (r.getLong(1), r.getLong(2))).toMap
      assert(offsets.contains(0L), "every cohort has a week-0 row")
      // no later week can retain more users than the cohort had at week 0
      offsets.foreach { case (_, n) => assert(n <= offsets(0L)) }
      assert(offsets.keys.forall(_ >= 0L), "offsets are non-negative")
    }
  }

  test("funnel: step counts are monotone non-increasing") {
    val byStep = run("evt_step_funnel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStep.keySet === Set("1_view", "2_click", "3_purchase"))
    assert(byStep("1_view") >= byStep("2_click"))
    assert(byStep("2_click") >= byStep("3_purchase"))
    assert(byStep("1_view") > 0)
  }

  test("markov: outgoing probabilities sum to 1 per source state") {
    val rows = run("evt_markov_chain").collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"src=$src probs sum to $pSum")
      rs.foreach(r => assert(r.getLong(2) > 0))
    }
  }

  test("rolling 7d active >= that day's daily actives, <= total users") {
    import org.apache.spark.sql.functions._
    val ev = graft.queries.Tables.load(spark, sf, "events")
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val total = ev.select(col("user_id")).distinct().count()
    run("evt_rolling_active").collect().foreach { r =>
      val (day, active) = (r.get(0), r.getLong(1))
      assert(active >= daily(day), s"$day: 7d window below the day's own DAU")
      assert(active <= total)
    }
  }

  test("pagerank: ranks bounded below by the damping floor, top-20 emitted") {
    val rows = run("graph_pagerank").collect()
    assert(rows.length === 20)
    rows.foreach(r => assert(r.getLong(1) >= 150000L,
      "rank can never fall below the (1-d) teleport mass"))
    // descending order with part-id tiebreak
    val ranks = rows.map(_.getLong(1)).toSeq
    assert(ranks === ranks.sorted.reverse)
  }

  test("cc label-prop: exact components at the schedule's reach; sizes partition the node set") {
    import spark.implicits._
    import graft.queries.Behavioral
    // a 16-node path (distance 15 from the min-label end — inside the
    // 4-round propagate+jump reach) plus a disjoint pair: exact CC labels
    val pathE = (1L until 16L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val pairE = Seq((100L, 101L), (101L, 100L))
    val edges = (pathE ++ pairE).toDF("src", "dst")
    val labels = Behavioral.ccLabelProp(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 18)
    (1L to 16L).foreach(n => assert(labels(n) === 1L, s"node $n -> ${labels(n)}"))
    assert(labels(100L) === 100L && labels(101L) === 100L)
    // the co-purchase report: component sizes cover ≤ the node count, each
    // component id is a member node id (labels are node ids by construction)
    val rows = run("graph_cc_labelprop").collect()
    assert(rows.nonEmpty)
    val sizes = rows.map(_.getLong(1)).toSeq
    assert(sizes === sizes.sorted.reverse)
    val nNodes = run("graph_degree_stats").collect()
      .map(r => r.getLong(1)).sum
    assert(sizes.sum <= nNodes)
  }

  test("cc convergence flag: active final round reports false, quiet one true") {
    import spark.implicits._
    import graft.queries.Behavioral
    // the reach-boundary path: distance 15 resolves exactly IN round 4, so
    // the schedule is exact but still actively changing labels — a caller
    // must NOT read exactness as convergence
    val pathE = (1L until 16L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val edges = pathE.toDF("src", "dst")
    val (l4, c4) = Behavioral.ccLabelPropRun(edges, rounds = 4)
    assert(!c4, "round 4 still moved labels on the boundary path")
    assert(l4.collect().forall(_.getLong(1) === 1L)) // yet already exact
    // one more sweep is a witnessed no-op
    val (l5, c5) = Behavioral.ccLabelPropRun(edges, rounds = 5)
    assert(c5, "round 5 changed nothing and must witness the fixed point")
    assert(l5.collect().forall(_.getLong(1) === 1L))
  }

  test("cc early exit: the fixpoint stops the schedule, labels identical, one ledger row per executed round") {
    import spark.implicits._
    import graft.queries.Behavioral
    // distance-15 path: exact after round 4; round 5's signature matches
    // round 4's (no label moved) and the loop must stop there instead of
    // paying rounds 6-8's edge-frame joins for provable no-ops
    val pathE = (1L until 16L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val edges = pathE.toDF("src", "dst")
    val led0 = Behavioral.driverCollectRows.get()
    val l8 = Behavioral.ccLabelProp(edges, rounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val executedRounds = Behavioral.driverCollectRows.get() - led0
    assert(executedRounds === 5L,
      s"expected early exit after 5 executed rounds (4 active + 1 quiet), ledger says $executedRounds")
    val l4 = Behavioral.ccLabelProp(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(l8 === l4, "early-exited 8-round labels must equal the exact 4-round labels")
  }

  test("degree stats: handshake lemma — sum(deg*n_nodes) counts each edge twice") {
    import org.apache.spark.sql.functions._
    val rows = run("graph_degree_stats").collect()
    val degSum = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val nEdges = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p"), col("b.p")).distinct().count()
    assert(degSum === 2 * nEdges)
  }

  test("item sim: contiguous ranks, cosine in (0,1], cooc bounded by item supports") {
    val rows = run("rec_item_sim").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks === (1L to ranks.length), "ranks are 1..k contiguous")
      // ranked best-first: cosine non-increasing in rank
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    rows.foreach { r =>
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(3) > 0)
    }
  }

  test("attribution: attributed purchases have a gap within 24h, others not") {
    val rows = run("evt_attribution").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gapMin = if (r.isNullAt(2)) None else Some(r.getLong(2))
      if (r.getBoolean(3)) {
        assert(gapMin.exists(g => g >= 0 && g <= 1440), s"attributed but gap=$gapMin")
      } else {
        assert(gapMin.forall(_ > 1440), "unattributed with a sub-24h click")
      }
    }
  }

  test("interarrival: p50 <= p90, every type with repeat events present") {
    val rows = run("evt_interarrival").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2), "median cannot exceed p90")
      assert(r.getDouble(1) > 0 && r.getLong(3) > 0)
    }
  }

  test("triangles: degree-ordered count equals the naive id-ordered count") {
    import org.apache.spark.sql.functions._
    val r = run("graph_triangles").collect().head
    val (nodes, edges, tri, wedges, gcc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    // independent naive recount: canonical edges u<v, close u<v<w
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct().cache()
    val naive = e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .count()
    assert(tri === naive, "orientation must not change the triangle count")
    assert(edges === e.count() && nodes > 0)
    assert(gcc > 0 && gcc <= 1.0, "clustering coefficient is a ratio")
    assert(3 * tri <= wedges, "every triangle contributes 3 closed wedges")
  }

  test("autocorr: coefficients bounded by 1 in absolute value, both lags present") {
    val rows = run("ts_autocorr").collect()
    val lags = rows.map(_.getLong(1)).toSet
    assert(lags === Set(1L, 7L))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
      assert(r.getLong(2) > 1, "correlation needs >= 2 pairs")
    }
  }

  test("dow seasonality: shares sum to 1 per type over ISO weekdays") {
    val rows = run("ts_dow_seasonality").collect()
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      assert(rs.map(_.getLong(1)).forall(d => d >= 1 && d <= 7))
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$tpe shares sum to $s")
    }
  }

  test("cusum: one change-point per type, relative shift in [0,1]") {
    val rows = run("ts_cusum").collect()
    val types = rows.map(_.getString(0))
    assert(types.distinct.length === types.length, "exactly one row per type")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0)
      val rel = r.getDouble(3)
      assert(rel >= 0 && rel <= 1.0, "|N·prefix − k·S| <= N·S")
    }
  }

  test("association rules: confidence in (0,1], lift positive, support >= floor") {
    val rows = run("basket_assoc_rules").collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 3, "min support")
      val conf = r.getDouble(3)
      assert(conf > 0 && conf <= 1.0)
      assert(r.getDouble(4) > 0, "lift")
      assert(r.getLong(0) < r.getLong(1), "canonical pair order pa < pb")
    }
  }

  test("graph cache lifecycle: a new corpus evicts the old corpus's frames") {
    import graft.queries.Behavioral
    val dirA = sf
    val dirB = "/root/testdata/sf0.01"
    SparkEntry.queries("graph_triangles")(spark, dirA).count()
    val afterA = Behavioral.graphCacheEntries
    assert(afterA.nonEmpty && afterA.forall(_._1._1 == dirA),
      "corpus A's graph frames should be registered after a graph query")
    SparkEntry.queries("graph_triangles")(spark, dirB).count()
    val afterB = Behavioral.graphCacheEntries
    assert(afterB.nonEmpty && afterB.forall(_._1._1 == dirB),
      "corpus A's edge frames must be evicted when corpus B is processed")
    // and the evicted frames are actually out of the cache manager, not
    // just out of the registry: an A-plan lookup finds nothing cached
    import org.apache.spark.sql.functions.col
    val aPlan = graft.queries.Tables.load(spark, dirA, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val cachedHits = aPlan.queryExecution.optimizedPlan.collect {
      case i: org.apache.spark.sql.execution.columnar.InMemoryRelation => i
    }
    assert(cachedHits.isEmpty,
      "corpus A's orderParts frame still occupies the cache manager")
  }

  test("graph cache lifecycle: a different live session rebuilds, never shares") {
    import graft.queries.Behavioral
    SparkEntry.queries("graph_triangles")(spark, sf).count()
    assert(Behavioral.graphCacheEntries.forall(_._2 eq spark))
    // same JVM, same corpus, DIFFERENT session: the registry must not hand
    // session B a frame bound to session A (conf/extensions belong to A)
    val s2 = spark.newSession()
    SparkEntry.queries("graph_triangles")(s2, sf).count()
    val owners = Behavioral.graphCacheEntries
    assert(owners.nonEmpty && owners.forall(_._2 eq s2),
      "cross-session hit must rebuild under the requesting session")
  }
}
