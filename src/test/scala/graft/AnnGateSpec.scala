package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ANN family's two no-regression invariants, machine-gated (r11
  * verdict stretch ask):
  *
  *  1. **No corpus-sized driver collect.** Every `sim_*` entry runs under
  *     a task-result listener; the total bytes serialized back to the
  *     driver must stay bounded (centroid/coarse/stats rows — KBs), on a
  *     corpus inflated far past the bound so a regression to "collect the
  *     vectors" cannot hide inside task overhead. The
  *     `driverCollectRows` ledger is asserted alongside (≤ flat-max +
  *     O(√k) rows per query).
  *  2. **No broadcast above FlatCentroidMax rows.** With auto-broadcast
  *     disabled, the only BroadcastExchanges left are operator-AUTHORED
  *     hints — query sets, centroid artifacts, stats rows — and none may
  *     carry more rows than the flat-centroid regime allows.
  *
  * Both checkers are proven sensitive in-spec: a seeded corpus collect and
  * a seeded `broadcast(corpus)` join must trip them. */
class AnnGateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 32× inflated embeddings+documents (ramp discipline: interleaved ids
    * keep query ids [0,5) and the centroid range populated; shifted text
    * keeps digests distinct). ~16k vectors ≈ 10+ MB if collected — far
    * above the gate bound, so the seed separates cleanly from overhead. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-anngate").toString
    val copies = 32
    val copyDim = broadcast(spark.range(copies.toLong).select(col("id").as("copy")))
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .crossJoin(copyDim)
      .withColumn("embedding", expr(
        "transform(embedding, (x, i) -> cast(x + ((i * 31 + copy) % 7 - 3) * cast(0.01 as double) as float))"))
      .withColumn("vec_id", col("vec_id") * copies + col("copy"))
      .drop("copy")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .crossJoin(copyDim)
      .withColumn("doc_id", col("doc_id") + col("copy") * 100000000L)
      .withColumn("text",
        concat(lit("c"), col("copy").cast("string"), lit(" "), col("text")))
      .drop("copy")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private class ResultBytesListener
      extends org.apache.spark.scheduler.SparkListener {
    @volatile var total = 0L
    def reset(): Unit = total = 0L
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) total += m.resultSize
    }
  }

  /** Gate bound on driver-bound bytes per query. Measured: legit sim_*
    * queries pull ≤ ~300 KB (centroid/stats rows + per-task metric
    * overhead); the seeded corpus collect measures ~2.5 MB on this
    * inflated corpus — and grows with any real corpus while the legit
    * side stays O(k). */
  private val MaxDriverBytes = 1L * 1024 * 1024

  /** Composite queries that run SEVERAL ANN pipelines in one entry carry
    * proportionally more per-task metric overhead; each override is the
    * measured legit cost plus headroom still well under the seed's
    * ≥2.5 MB corpus-collect delta. */
  private val perQueryBytes = Map(
    "sim_recall" -> 3L * 1024 * 1024 // 8 variants + brute force; measured 1.9 MB
  )

  private def broadcastRows(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] =
    p.collectWithSubqueries {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        b.metrics("numOutputRows").value
    }

  /** Run `build` with AQE off (stable plan tree with readable broadcast
    * metrics) and auto-broadcast off (every surviving BroadcastExchange is
    * operator-authored), under the result listener. */
  private def gated(build: => DataFrame): (Long, Seq[Long], Long) = {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val abt = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val listener = new ResultBytesListener
    spark.sparkContext.addSparkListener(listener)
    val ledger0 = graft.operators.Similarity.driverCollectRows.get()
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = build
      // execute the query's OWN plan (df.count() would plan and run a
      // DERIVED aggregation whose metrics live on a different tree);
      // toRdd keeps results distributed so the listener measures only
      // what the operators themselves pull to the driver
      df.queryExecution.toRdd.count()
      org.apache.spark.graftutil.ListenerDrain.drain(spark.sparkContext)
      (listener.total, broadcastRows(df.queryExecution.executedPlan),
        graft.operators.Similarity.driverCollectRows.get() - ledger0)
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  // derived from the registry, never hand-listed: a new sim_* query (or a
  // forgotten one — sim_recall composes every ANN variant and is the most
  // collect-prone entry) must not silently escape the gate
  private val simQueries =
    SparkEntry.queries.keys.filter(_.startsWith("sim_")).toSeq.sorted

  test("every sim_* query stays under the driver-bytes and broadcast-rows gates") {
    val flatMax = graft.operators.Similarity.FlatCentroidMax
    simQueries.foreach { name =>
      spark.sharedState.cacheManager.clearCache()
      val (bytes, bRows, ledger) = gated(SparkEntry.queries(name)(spark, dir))
      info(s"$name: driverBytes=$bytes broadcastRows=${bRows.mkString(",")} ledger=$ledger")
      val bound = perQueryBytes.getOrElse(name, MaxDriverBytes)
      assert(bytes <= bound,
        s"$name pulled $bytes driver-bound bytes (> $bound): " +
          "an ANN operator is collecting corpus-scale data")
      bRows.foreach { r =>
        assert(r <= flatMax,
          s"$name broadcast $r rows (> FlatCentroidMax=$flatMax): an " +
            "operator-authored broadcast outgrew the flat-centroid regime")
      }
      assert(ledger <= flatMax + 4 * math.sqrt(33000).toLong + 64,
        s"$name ledgered $ledger driver rows — past the flat+O(sqrt k) bound")
    }
  }

  test("seeded corpus collect trips the driver-bytes gate") {
    val (bytes, _, _) = gated {
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("vec", col("embedding").cast("array<double>"))
      corpus.collect() // the regression the gate exists to catch
      corpus
    }
    assert(bytes > MaxDriverBytes,
      s"seed measured only $bytes bytes — the gate cannot see a corpus collect")
  }

  test("seeded broadcast(corpus) join trips the broadcast-rows gate") {
    val (_, bRows, _) = gated {
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"))
      corpus.join(broadcast(corpus), Seq("vec_id"))
    }
    assert(bRows.exists(_ > graft.operators.Similarity.FlatCentroidMax),
      s"seed broadcast rows $bRows — the gate cannot see a corpus broadcast")
  }
}
