package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Contamination, Curation, Dedup, Multimodal, Passages, Pii, Similarity, TextAnalysis}

/** Structural invariants for the training-data pipeline operators. Exact
  * value-parity with DuckDB is enforced by the driver's oracle gate (and
  * locally by scripts/check_oracle.py); these tests pin the semantics the
  * oracle can't see — that injected duplicates are actually FOUND, that ANN
  * results are ranked, that the stub decode is byte-deterministic. */
class TrainingDataSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("a NULL-lang/source stratum samples by its computed rate, never NPEs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    // temperatureRatesBp deliberately keeps a NULL-lang stratum; the
    // downstream rate fold used to NPE on the sort and compile the
    // stratum into `=== NULL` (never matches → rate silently 0)
    val withNulls = docs
      .withColumn("lang", when(col("doc_id") % 7 === 0, lit(null: String))
        .otherwise(col("lang")))
      .withColumn("source", when(col("doc_id") % 5 === 0, lit(null: String))
        .otherwise(col("source")))
    val temp = Curation.temperatureSampleSummary(withNulls).collect()
    val nullRow = temp.find(_.isNullAt(0))
    assert(nullRow.isDefined, "the NULL-lang stratum must appear in the summary")
    assert(nullRow.get.getAs[Int]("rate_bp") > 0,
      "the NULL stratum's computed rate must actually apply (<=> match)")
    val ep = Curation.epochsSummary(withNulls).collect()
    assert(ep.exists(_.isNullAt(0)), "NULL-source stratum must survive epochs fold")
  }

  test("weighted sample: deterministic, exactly k, and heavy docs dominate") {
    import spark.implicits._
    val a = Curation.weightedSample(docs).collect().map(_.getLong(0)).toSeq
    val b = Curation.weightedSample(docs).collect().map(_.getLong(0)).toSeq
    assert(a === b) // hash-derived uniforms: replay-stable, no RNG state
    assert(a.length === 50)
    // A-ES weighting: one 5000-word doc among 200 one-word docs must make
    // a k=5 sample with near certainty (u^(1/5000) ≈ 1 ≫ u^(1/1))
    val heavy = (0 until 200).map(i => (i.toLong, s"w$i", "en")) :+
      (999L, (1 to 5000).map(j => s"h$j").mkString(" "), "en")
    val synth = heavy.toDF("doc_id", "text", "lang")
    val picked = Curation.weightedSample(synth, k = 5).collect().map(_.getLong(0))
    assert(picked.contains(999L), picked.mkString(", "))
  }

  test("doremi: weights normalize, and a planted hard domain is tilted above its token share") {
    import spark.implicits._
    val rows = SparkEntry.queries("cur_doremi")(spark, sfDir).collect()
    assert(math.abs(rows.map(_.getAs[Double]("doremi_weight")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Double]("excess_nll") >= 0.0)
      assert(r.getAs[Double]("doremi_weight") > 0.0)
    }
    // synthetic corpus: one domain of common text, one of rare-token soup —
    // the hard domain must be weighted ABOVE its token share, the easy one
    // below (the DoReMi tilt direction)
    val easy = (0 until 60).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog", "en", "easy"))
    val hard = (60 until 90).map(i => (i.toLong, s"zqx$i wvu$i ptr$i mlk$i jhg$i fdc$i bax$i nyo$i", "en", "hard"))
    val synth = (easy ++ hard).toDF("doc_id", "text", "lang", "source")
    val out = graft.operators.Curation.domainReweight(synth)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("token_share"), r.getAs[Double]("doremi_weight"))).toMap
    assert(out("hard")._2 > out("hard")._1, s"hard domain not upweighted: $out")
    assert(out("easy")._2 < out("easy")._1, s"easy domain not downweighted: $out")
  }

  test("ccnet buckets replay the keyed ntile exactly and partition every language") {
    import org.apache.spark.sql.expressions.Window
    // the operator's bin machinery must agree with the naive one-partition
    // ntile on every (lang, bucket) aggregate row
    val fast = TextAnalysis.ccnetBuckets(docs).collect()
    val naive = TextAnalysis.unigramScores(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("key", round(col("avg_nll") * 1e4).cast("long"))
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy(col("lang")).orderBy(col("key"), col("doc_id")))
        .cast("long"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("key")).as("min_nll_e4"), max(col("key")).as("max_nll_e4"),
        round(sum(col("key")).cast("double") / (count(lit(1)) * 1e4), 4)
          .as("avg_nll"))
      .orderBy(col("lang"), col("bucket"))
      .collect()
    assert(fast.map(_.toString).toSeq === naive.map(_.toString).toSeq)
    // per-language bucket sizes differ by at most one (rank-equal thirds)
    fast.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val sizes = rows.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$lang buckets: ${sizes.mkString(",")}")
    }
  }

  test("token entropy: one repeated token scores 0, all-distinct scores 1") {
    import spark.implicits._
    val synth = Seq(
      (1L, ("x " * 64).trim, "en"),                       // one token 64×
      (2L, (1 to 64).map(i => s"w$i").mkString(" "), "en") // 64 distinct
    ).toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.tokenEntropy(synth).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getDouble(3) === 0.0 && rows(1L).getDouble(4) === 0.0)
    assert(rows(2L).getDouble(4) === 1.0) // H = ln n exactly
    assert(math.abs(rows(2L).getDouble(3) - math.log(64)) < 1e-3)
  }

  test("novelty: injected exact copies have zero novel grams") {
    val nov = TextAnalysis.noveltyScores(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // every doc_id % 13 == 0 original got a byte-identical +200000 twin:
    // both members score 0.0 (each of their grams exists in >= 2 docs)
    val copied = nov.keys.filter(id => id >= 200000).toSeq
    assert(copied.nonEmpty)
    copied.foreach { id =>
      assert(nov(id) === 0.0, s"copy $id has novelty ${nov(id)}")
      assert(nov(id - 200000) === 0.0, s"original ${id - 200000} not 0")
    }
    assert(nov.values.exists(_ > 0.5), "no genuinely novel docs found")
  }

  test("length histogram: shares sum to 1 and the cumulative ends at 1") {
    val h = TextAnalysis.lengthHistogram(docs).collect()
    assert(h.map(_.getLong(1)).sum === docs.count())
    assert(h.last.getDouble(5) === 1.0)
    val cums = h.map(_.getDouble(5))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
  }

  test("linear probe: moments solve to a probe that beats the majority class") {
    val d = TextAnalysis.ProbeDims
    val m = TextAnalysis.linearProbeMoments(docs).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2).toDouble).toMap
    def mm(i: Int, j: Int) = m(math.min(i, j) -> math.max(i, j))
    val n = d + 1 // features + intercept
    // normal equations (XᵀX + εI)β = Xᵀy, Gaussian elimination w/ pivot
    val a = Array.tabulate(n, n)((i, j) => mm(i, j) + (if (i == j) 1e-6 else 0.0))
    val b = Array.tabulate(n)(i => mm(i, d + 1))
    for (k <- 0 until n) {
      val p = (k until n).maxBy(r => math.abs(a(r)(k)))
      val (tr, tb) = (a(k), b(k)); a(k) = a(p); a(p) = tr; b(k) = b(p); b(p) = tb
      for (r <- k + 1 until n) {
        val f = a(r)(k) / a(k)(k)
        for (c <- k until n) a(r)(c) -= f * a(k)(c)
        b(r) -= f * b(k)
      }
    }
    val beta = new Array[Double](n)
    for (k <- n - 1 to 0 by -1)
      beta(k) = (b(k) - (k + 1 until n).map(c => a(k)(c) * beta(c)).sum) / a(k)(k)
    val feats = TextAnalysis.probeFeatures(docs)
      .select((0 to d + 1).map(i => col(s"v$i")): _*).collect()
    val preds = feats.map { r =>
      val yhat = (0 to d).map(i => beta(i) * r.getLong(i)).sum
      (if (yhat >= 0.5) 1L else 0L) == r.getLong(d + 1)
    }
    val acc = preds.count(identity).toDouble / preds.length
    val majority = math.max(
      feats.count(_.getLong(d + 1) == 1L), feats.count(_.getLong(d + 1) == 0L))
      .toDouble / preds.length
    assert(acc > majority, s"probe acc $acc <= majority $majority")
  }

  test("corpus drift: disjoint vocabularies hit ln 2, a hash split stays near 0") {
    import spark.implicits._
    // two sides with completely disjoint vocab: js = ln 2, tv = 1
    val disjoint = ((1 to 50).map(i => (s"a$i", 0L)) ++
      (1 to 50).map(i => (s"b$i", 1L))).toDF("tok", "side")
    val d = TextAnalysis.driftOf(disjoint).collect()(0)
    assert(math.abs(d.getDouble(3) - math.log(2)) < 1e-3, s"js ${d.getDouble(3)}")
    assert(d.getDouble(4) === 1.0)
    // the real corpus split by doc hash: same distribution, low drift
    val r = TextAnalysis.corpusDrift(docs).collect()(0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 0.2, s"js ${r.getDouble(3)}")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("threshold sweep: pair counts shrink and similarity grows with the bar") {
    val rows = Dedup.thresholdSweep(docs).collect()
    assert(rows.length === 5)
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, ns.mkString(","))
    val means = rows.map(_.getDouble(2))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b }, means.mkString(","))
    assert(ns.last > 0) // exact copies (J = 1) survive every threshold
  }

  test("table profile: key column is unique and non-null") {
    val p = Curation.tableProfile(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p("doc_id") === ((0L, docs.count())))
    assert(p("text")._2 <= docs.count())
    assert(p.size === 5)
  }

  test("lsh s-curve: exact copies are always caught and theory tops out at 1") {
    val rows = Dedup.lshScurve(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
    // bucket 10 = J exactly 1.0 (the injected exact copies): identical
    // signatures collide in every band and the estimate is 1.0 — the
    // production path can never miss them
    val top = rows.find(_.getLong(0) == 10L).get
    assert(top.getDouble(3) === 1.0 && top.getDouble(4) === 1.0)
  }

  test("grouped split leaks no more than the doc-hash split") {
    val rows = Curation.groupedSplitLeakage(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (nDoc, cDoc, _) = rows("doc_hash")
    val (nSrc, cSrc, _) = rows("source_group")
    assert(nDoc === nSrc) // same pair list scored both ways
    assert(cDoc > 0, "doc-hash split should strand some dup families")
    // every injected dup family (exact + truncated twins) shares its base
    // doc's source, so the grouped split can never separate them — its
    // leakage is at most the genuinely cross-source near-dup pairs
    assert(cSrc < cDoc, s"source-grouped leak $cSrc not below doc-hash $cDoc")
  }

  test("filter agreement: diagonal is exact and rates are probabilities") {
    val rows = TextAnalysis.filterAgreement(docs).collect()
    assert(rows.length === 10) // upper triangle of 4 filters
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
    assert(diag.length === 4)
    diag.foreach(r => assert(r.getDouble(4) === 1.0)) // self-agreement
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(2) <= r.getLong(3) || r.getString(0) != r.getString(1))
    }
    // gopher's diagonal both-keep count IS its keep count
    val gDiag = diag.find(_.getString(0) == "gopher").get
    val gKeep = TextAnalysis.gopherFlags(docs).filter(col("keep")).count()
    assert(gDiag.getLong(2) === gKeep)
  }

  test("dim stats: full spectrum present and effective dimensionality is sane") {
    val rows = Similarity.dimStats(emb).collect()
    assert(rows.length === 64)
    assert(rows.map(_.getLong(1)).distinct.length === 1) // n uniform across dims
    val vars = rows.map(_.getDouble(3))
    assert(vars.forall(_ >= 0.0))
    // effective dimensionality (Σv)²/Σv² from the diagonal spectrum —
    // must exceed 1 (not all variance on one axis) and at most dims
    val eff = math.pow(vars.sum, 2) / vars.map(v => v * v).sum
    assert(eff > 1.0 && eff <= 64.0, s"effective dim $eff out of range")
  }

  test("pair stats: sampled cosine summary is internally consistent") {
    val r = Similarity.pairStats(emb).collect()(0)
    assert(r.getLong(0) > 0)
    val (mean, mn, mx) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
    assert(mn >= -1.0001 && mx <= 1.0001)
    assert(mean >= mn && mean <= mx)
    assert(r.getDouble(2) >= 0.0) // std
  }

  test("lsh eval: hits bounded by both sides and recall catches exact copies") {
    val r = Dedup.lshEval(docs).collect()(0)
    val (nTruth, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTruth > 0 && nCand > 0)
    assert(nHit <= math.min(nTruth, nCand))
    assert(r.getDouble(3) <= 1.0 && r.getDouble(4) <= 1.0)
    // exact copies have identical signatures (est = 1.0) AND Jaccard 1.0:
    // banding can never miss them, so recall is strictly positive and in
    // practice well above the s-curve floor for the fixture's J>=0.8 pairs
    assert(r.getDouble(4) >= 0.5, s"recall ${r.getDouble(4)} suspiciously low")
  }

  test("source scorecard: mirror rows are fully duplicated and rates are sane") {
    val rows = Curation.sourceScorecard(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val m = rows("mirror")
    assert(m.getLong(1) === docs.filter(col("doc_id") % 13 === 0).count())
    assert(m.getDouble(3) === 1.0) // dup_rate: every mirror doc is a copy
    rows.values.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // keep_rate
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // avg_quality
      assert(r.getDouble(6) > 0.0) // avg_words
    }
  }

  test("dup-by-source: the mirror source is fully cross-source duplicated") {
    val rows = Dedup.dupBySource(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (mn, mdup, mcross) = rows("mirror")
    assert(mn === docs.filter(col("doc_id") % 13 === 0).count())
    assert(mdup === mn && mcross === mn) // every mirror doc is a copy
    // and the originals' sources see the same digests back as cross-source
    val crossTotal = rows.filter(_._1 != "mirror").values.map(_._3).sum
    assert(crossTotal === mn)
  }

  test("dedup_exact finds every injected exact copy and nothing else") {
    val nInjected = docs.filter(col("doc_id") % 13 === 0).count()
    val groups = Dedup.exact(docs)
    assert(groups.filter(col("n_copies") === 2).count() === nInjected)
    assert(groups.filter(col("n_copies") > 2).count() === 0)
    // keeper is always the original id, not the +200000 copy
    assert(groups.filter(col("keep_id") >= 200000).count() === 0)
  }

  test("ngram jaccard flags the injected truncated near-dups") {
    val pairs = Dedup.ngramJaccard(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every injected truncated copy must be paired with its source
    // (the corpus also contains organic generator-planted near-dups —
    // e.g. a doc plus trailing "dup" marker tokens — which also surface;
    // that is the operator working, so only subset is asserted)
    val nearIds = docs.filter(col("doc_id") % 7 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    nearIds.foreach { id =>
      val j = pairs.get((id, id + 100000))
      assert(j.isDefined, s"truncated near-dup of $id not found")
      assert(j.get >= 0.6 && j.get <= 1.0)
    }
    pairs.values.foreach(j => assert(j >= 0.6 && j <= 1.0))
  }

  test("ngram blocker: a hot first token does not create a quadratic block") {
    // adversarial corpus: EVERY doc starts with the same token ("the"), so
    // the old (lang, tok0) blocker would put all of them in ONE block and
    // the join would go quadratic. The size-bucket dimension splits it.
    import spark.implicits._
    val n = 256
    val synth = (0 until n).map { i =>
      val len = 4 << (i % 10) // exponential length spread, 4..2048 tokens
      val body = (1 until len).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"the $body", "en")
    }.toDF("doc_id", "text", "lang")
    val nAug = Dedup.augmentedDocs(synth).count()
    val allPairs = nAug * (nAug - 1) / 2.0
    val candidates = Dedup.ngramCandidates(synth, 0.6).count()
    assert(candidates < 0.2 * allPairs,
      s"blocking degenerated: $candidates candidates of ${allPairs.toLong} possible pairs")
    // and the blocker is still lossless: every injected dup survives
    val pairs = Dedup.ngramJaccard(synth)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    (0 until n).filter(_ % 13 == 0).foreach { id =>
      assert(pairs.get((id.toLong, id + 200000L)).contains(1.0),
        s"exact copy of $id lost by blocking")
    }
    (0 until n).filter(_ % 7 == 0).foreach { id =>
      val j = pairs.get((id.toLong, id + 100000L))
      assert(j.isDefined && j.get >= 0.6, s"truncated near-dup of $id lost by blocking")
    }
  }

  test("minhash LSH candidates include all exact copies at est_jaccard 1.0") {
    val pairs = Dedup.minhashLshPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exactIds = docs.filter(col("doc_id") % 13 === 0 && col("doc_id") % 7 =!= 0)
      .select("doc_id").collect().map(_.getLong(0))
    exactIds.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 200000 && p._3 == 1.0),
        s"exact copy of $id not found by LSH")
    }
  }

  test("edit verify: exact copies verify at distance 0; verdicts track edit_sim") {
    val rows = Dedup.editVerify(docs).collect()
    val byPair = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val exactIds = docs.filter(col("doc_id") % 13 === 0 && col("doc_id") % 7 =!= 0)
      .select("doc_id").collect().map(_.getLong(0))
    exactIds.foreach { id =>
      val r = byPair.get((id, id + 200000L))
      assert(r.isDefined, s"exact copy of $id missing from verify stage")
      assert(r.get.getLong(3) === 0L, "exact copy must have edit distance 0")
      assert(r.get.getDouble(4) === 1.0 && r.get.getBoolean(5))
    }
    rows.foreach { r =>
      assert(r.getBoolean(5) === (r.getDouble(4) >= 0.8), "verdict is the threshold")
      assert(r.getLong(3) >= 0 && r.getDouble(4) <= 1.0)
    }
    // LSH estimates and exact edit similarity must broadly agree: every
    // candidate pair the verifier REJECTS sits below perfect est too
    rows.filter(!_.getBoolean(5)).foreach(r => assert(r.getDouble(2) < 1.0))
  }

  test("duplicate clusters: every doc in a pair joins its source's component") {
    val clusters = Dedup.duplicateClusters(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every exact copy clusters with its source; rep = smallest member
    clusters.keys.filter(_ >= 200000).foreach { copyId =>
      assert(clusters.contains(copyId - 200000))
      assert(clusters(copyId) === clusters(copyId - 200000))
      assert(clusters(copyId) <= copyId - 200000)
    }
    // cluster reps are themselves members mapping to themselves
    clusters.values.foreach(rep => assert(clusters(rep) === rep))
  }

  test("distributed pointer-doubling CC produces identical labels to union-find") {
    // force the distributed loop (threshold 0) and compare against the
    // adaptive driver-side union-find path — both must reach the same
    // component-minimum fixed point
    val viaUnionFind = Dedup.duplicateClusters(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val viaLoop = Dedup.duplicateClusters(docs, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(viaLoop === viaUnionFind)
    assert(viaLoop.nonEmpty)
  }

  test("simhash of an exact copy is identical (hamming 0)") {
    val sig = Dedup.simhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sig.keys.filter(_ >= 200000).foreach { copyId =>
      assert(sig(copyId) === sig(copyId - 200000))
    }
  }

  test("simhash cap: a flood of identical docs cannot make a chunk bucket quadratic") {
    // adversarial corpus: 300 byte-identical docs. Every 12-bit chunk
    // bucket of the flood holds all ~320 of them (incl. augmented copies),
    // so WITHOUT the MaxChunkDocFrac cap the self-join would emit
    // ~4 · 320²/2 ≈ 200k pair candidates from one family alone; the cap
    // (5% of corpus, floor 2) drops those buckets wholesale. A small
    // disjoint duplicate family below the cap must still pair.
    import spark.implicits._
    val flood = (0 until 300).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again", "en"))
    val family = Seq(
      (1000L, "an entirely different rare document body here", "en"),
      (1001L, "an entirely different rare document body here", "en"))
    val synth = (flood ++ family).toDF("doc_id", "text", "lang")
    val pairs = Dedup.simhashPairs(synth)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the legit tiny family survives the cap…
    assert(pairs.contains((1000L, 1001L)), pairs.take(20).mkString(", "))
    // …and every surviving pair is from it (1001 is augmented as a
    // truncated near-dup, id 101001) — no flood pair leaks through
    val familyIds = Set(1000L, 1001L, 101001L, 201001L)
    pairs.foreach { case (a, b) =>
      assert(familyIds(a) && familyIds(b), s"flood pair leaked: ($a, $b)")
    }
    assert(pairs.length <= 10, s"pair count blew up: ${pairs.length}")
  }

  test("embedding near-dups are exactly the injected perturbed vectors") {
    val pairs = Dedup.embeddingNearDups(emb).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 100000)
      assert(r.getDouble(2) >= 0.995 && r.getDouble(2) <= 1.0)
    }
    val nInjected = emb.filter(col("vec_id") % 11 === 0).count()
    assert(pairs.length === nInjected)
  }

  test("semdedup drops exactly one member of each injected near-dup pair") {
    val rows = Dedup.semDedup(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    val injected = emb.filter(col("vec_id") % 11 === 0)
      .collect().map(_.getLong(0))
    assert(injected.nonEmpty)
    injected.foreach { origId =>
      val orig = rows(origId)
      val copy = rows(origId + 100000)
      // same cell (the +0.05 perturbation cannot flip the argmax here),
      // and exactly one of the pair survives — the LESS central one
      assert(orig.getLong(1) === copy.getLong(1), s"pair $origId split cells")
      val keptFlags = Seq(orig, copy).map(r => r.getBoolean(r.fieldIndex("kept")))
      assert(keptFlags.count(identity) === 1, s"pair $origId kept=$keptFlags")
      val survivor = if (keptFlags.head) orig else copy
      val dropped = if (keptFlags.head) copy else orig
      assert(survivor.getDouble(2) <= dropped.getDouble(2),
        s"pair $origId kept the more central member")
    }
    // the non-duplicated bulk of the corpus survives
    val kept = rows.values.count(r => r.getBoolean(r.fieldIndex("kept")))
    assert(kept >= rows.size - 2 * injected.length && kept < rows.size)
  }

  test("semdedup worst case: an all-identical corpus collapses to one representative") {
    import spark.implicits._
    // every vector identical — the entire corpus lands in one cell with
    // tied centrality, so the keeper rule must fall through to the vec_id
    // tie-break and keep exactly one row (no quadratic survivor set)
    val vec = Array.fill(64)(1.0f)
    val ident = (0L until 120L).map(i => (i, vec, 0)).toDF("vec_id", "embedding", "label")
    val rows = Dedup.semDedup(ident).collect()
    val kept = rows.filter(r => r.getBoolean(r.fieldIndex("kept")))
    assert(kept.length === 1)
    // the survivor is the LEAST-central member — here the first augmented
    // perturbed copy (cent_cos < 1.0), beating every exact original
    // (cent_cos = 1.0) per the keep-the-extreme rule; ties then fall to
    // the lowest vec_id among the copies
    assert(kept.head.getLong(0) === 100000L)
    assert(kept.head.getDouble(2) < 1.0)
    assert(rows.filter(_.getLong(0) < 100000L).forall(_.getDouble(2) === 1.0))
    assert(rows.map(_.getLong(1)).distinct.length === 1) // one cell
  }

  test("hashed-doc similarity ranks an exact copy first with cosine 1") {
    import spark.implicits._
    val base = Seq(
      (0L, "alpha beta gamma delta epsilon my unique words here", "en"),
      (1L, "totally different content about spark catalyst plans", "en"),
      (2L, "third query document with its own vocabulary set", "en")) ++
      (3L to 9L).map(i => (i, s"filler doc $i with words number$i extra padding", "en")) :+
      (10L, "alpha beta gamma delta epsilon my unique words here", "en") // copy of 0
    val rows = Similarity.hashedDocTopK(base.toDF("doc_id", "text", "lang"))
      .collect()
    val q0 = rows.filter(_.getLong(0) == 0L).sortBy(_.getLong(1))
    assert(q0.head.getLong(2) === 10L && q0.head.getDouble(3) === 1.0)
    // ranked descending, self never returned
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val cos = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(!rs.exists(_.getLong(2) == q))
    }
  }

  test("hybrid RRF fuses the two legs' ranks and orders by the fused score") {
    val rows = Similarity.hybridRrfTopK(docs).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rrfs = rows.map(_.getDouble(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    // a doc lexically AND semantically top-ranked must beat any single-leg doc
    // of the same best rank; structurally: every fused score re-derives from
    // the reported ranks, and ranks stay inside their leg's truncation
    rows.foreach { r =>
      val lex = r.getLong(1); val sem = r.getLong(2)
      assert(lex == -1 || (lex >= 1 && lex <= Similarity.RrfLegK))
      assert(sem == -1 || (sem >= 1 && sem <= Similarity.RrfLegK))
      assert(lex != -1 || sem != -1)
      val expected =
        (if (lex == -1) 0.0 else 1.0 / (Similarity.RrfConst + lex)) +
        (if (sem == -1) 0.0 else 1.0 / (Similarity.RrfConst + sem))
      assert(math.abs(r.getDouble(3) - expected) < 1e-6)
    }
    // determinism under physical layout
    val again = Similarity.hybridRrfTopK(docs.repartition(7)).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("greedy k-center: distinct centers, non-increasing radii, correct first pick") {
    val rows = Similarity.kcenterSelect(emb, k = 6).collect()
    assert(rows.length === 6)
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length === ids.length)
    assert(rows.head.getLong(1) === 0L && rows.head.isNullAt(2))
    val radii = rows.tail.map(_.getDouble(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radii not non-increasing: ${radii.toSeq}")
    // round 1 must pick the vector with max cosine distance from vec 0
    val vs = Similarity.prepared(emb)
      .select(col("vec_id"), col("vec"), col("sq")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    val (_, v0, sq0) = vs.find(_._1 == 0L).get
    val far = vs.map { case (id, v, sq) =>
      (1.0 - v.zip(v0).map { case (a, b) => a * b }.sum / math.sqrt(sq * sq0), id)
    }.maxBy { case (d, id) => (d, -id) }
    assert(rows(1).getLong(1) === far._2)
  }

  test("brute-force top-k is ranked and self-free") {
    val rows = Similarity.bruteForceTopK(emb, k = 10, nQueries = 3).collect()
    assert(rows.length === 30)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === (1L to 10L))
      val cosines = byRank.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(!rs.exists(_.getLong(2) == q))
    }
  }

  test("LSH top-k results are a subset of brute-force candidate space with same scoring") {
    val brute = Similarity.bruteForceTopK(emb, k = 500, nQueries = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = Similarity.lshTopK(emb, k = 10, nQueries = 3).collect()
    assert(lsh.nonEmpty) // buckets of ~500/64 vectors still give neighbors
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.contains(key) && math.abs(brute(key) - r.getDouble(3)) < 1e-9)
    }
  }

  test("IVF top-k scores agree with brute force on shared candidates") {
    val brute = Similarity.bruteForceTopK(emb, k = 500, nQueries = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = Similarity.ivfTopK(emb, k = 10, nQueries = 3).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.contains(key) && math.abs(brute(key) - r.getDouble(3)) < 1e-9)
    }
    // each vector belongs to exactly one cell → no duplicate candidates
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).distinct.length === rs.length)
    }
  }

  test("kmeans cells: full coverage, fixed shape, partitioning-invariant") {
    val cells = Similarity.kmeansCells(emb)
    val rows = cells.collect()
    assert(rows.length === Similarity.IvfCentroids * 64) // one row per (cell, dim)
    // every corpus vector lands in exactly one cell
    val perCell = rows.groupBy(_.getLong(0)).map { case (c, rs) =>
      assert(rs.map(_.getLong(3)).distinct.length === 1); rs.head.getLong(3)
    }
    assert(perCell.sum === emb.count())
    // training is deterministic regardless of input partitioning
    val rows2 = Similarity.kmeansCells(emb.repartition(7)).collect()
    assert(rows2.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
  }

  test("cluster keepers: keeper is a member of its own cluster with maximal quality") {
    val clusters = Dedup.duplicateClusters(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = TextAnalysis.qualityScores(
        Dedup.augmentedDocs(docs).select(col("doc_id"), col("text"), col("lang")))
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val keepers = Curation.clusterKeepers(docs).collect()
    assert(keepers.nonEmpty)
    keepers.foreach { r =>
      val (cluster, n, keepId, keepQ) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val members = clusters.filter(_._2 == cluster).keys.toSeq
      assert(members.size.toLong === n)
      assert(members.contains(keepId), s"keeper $keepId not in cluster $cluster")
      assert(members.forall(m => quality(m) <= keepQ + 1e-9),
        s"cluster $cluster keeper $keepId is not max-quality")
      assert(keepQ === quality(keepId))
    }
  }

  test("train/val split is deterministic, complete, and stratification-stable") {
    val s1 = Curation.withSplit(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Curation.withSplit(docs.repartition(7)).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 === s2) // partitioning-invariant
    assert(s1.size === docs.count())
    val valFrac = s1.values.count(_ == "val").toDouble / s1.size
    assert(valFrac > 0.03 && valFrac < 0.25, s"val fraction $valFrac far from 10%")
    // a different salt reshuffles assignments
    val s3 = Curation.withSplit(docs, salt = "other").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s3 !== s1)
  }

  test("sequence packing: offsets are contiguous per shard and chunks respect the budget") {
    val budget = 512
    val rows = Curation.packSequences(docs, budgetTokens = budget, shards = 4).collect()
    assert(rows.map(_.getLong(0)).distinct.length === rows.length) // every doc once
    rows.groupBy(_.getLong(1)).foreach { case (_, shardRows) =>
      val byId = shardRows.sortBy(_.getLong(0))
      // start offsets are the exclusive running sum of token counts
      var expected = 0L
      byId.foreach { r =>
        assert(r.getLong(3) === expected, s"offset gap at doc ${r.getLong(0)}")
        expected += r.getLong(2)
        assert(r.getLong(4) === r.getLong(3) / budget) // chunk = start / budget
      }
    }
  }

  test("langid confusion matrix covers every document exactly once") {
    val conf = TextAnalysis.langIdConfusion(docs)
    assert(conf.agg(sum("n")).collect()(0).getLong(0) === docs.count())
  }

  test("quality scores are bounded and token counts consistent") {
    val q = TextAnalysis.qualityScores(docs).collect()
    q.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // quality_score
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0) // stop_ratio
    }
    val tc = TextAnalysis.tokenCounts(docs).collect()
    tc.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1))
    }
  }

  test("fingerprint: exact copies share fingerprints; distinct texts differ") {
    val fps = TextAnalysis.fingerprints(Dedup.augmentedDocs(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fps.keys.filter(_ >= 200000).foreach { id =>
      assert(fps(id) === fps(id - 200000))
    }
  }

  test("multimodal decode is deterministic and batch-shaped; image/audio rows carry real decoded stats") {
    val f1 = Multimodal.featuresFlat(docs).collect()
    val f2 = Multimodal.featuresFlat(docs.repartition(7)).collect()
    assert(f1.map(_.toSeq).toSet === f2.map(_.toSeq).toSet) // partitioning-invariant
    f1.foreach { r =>
      if (r.getString(1) == "image") {
        // f0/f1 are the ImageIO-decoded dimensions; n_bytes the raster size
        val w = r.getDouble(3); val h = r.getDouble(4)
        assert(w >= 32.0 && h >= 32.0)
        assert(r.getLong(2) === (w * h * 3).toLong)
        // channel means and luma extrema live on the pixel scale
        (5 until 11).foreach { i =>
          val v = r.getDouble(i)
          assert(v >= 0.0 && v < 256.0)
        }
        assert(r.getDouble(9) <= r.getDouble(10)) // minLuma ≤ maxLuma
      } else if (r.getString(1) == "audio") {
        // f0 = decoded frame count, f1 = decoded sample rate; n_bytes the
        // PCM size — all read back from the real AudioSystem decode
        val id = r.getLong(0)
        assert(r.getDouble(3) === Multimodal.audioSampleCount(id).toDouble)
        assert(r.getDouble(4) === Multimodal.AudioSampleRate.toDouble)
        assert(r.getLong(2) === Multimodal.audioSampleCount(id).toLong * 2)
        assert(r.getDouble(7) >= -32768.0 && r.getDouble(8) <= 32767.0) // min/max on the s16 scale
        assert(r.getDouble(7) <= r.getDouble(8))
        assert(r.getDouble(10) >= 0.0) // rms
      } else {
        (3 until 11).foreach { i =>
          val v = r.getDouble(i)
          assert(v >= 0.0 && v <= 1.0)
        }
      }
    }
  }

  test("WAV round trip: AudioSystem decode recovers the synthetic samples exactly") {
    // lossless-codec ground truth, no Spark in the loop: encode the
    // closed-form track, decode it back, compare every sample
    val id = 43L // 43 % 3 == 1 → an audio row in mediaTable
    val wav = Multimodal.wavBytes(id)
    assert(new String(wav.take(4), "US-ASCII") === "RIFF", "payload is not a real WAV stream")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate === Multimodal.AudioSampleRate)
    val pcm = ais.readAllBytes()
    val n = Multimodal.audioSampleCount(id)
    assert(pcm.length === n * 2)
    for (i <- 0 until n) {
      val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt
      assert(v === Multimodal.audioSampleValue(id, i), s"sample $i")
    }
  }

  test("PNG round trip: ImageIO decode recovers the synthetic raster exactly") {
    // lossless-codec ground truth, no Spark in the loop: encode the
    // closed-form raster, decode it back, compare every pixel
    val (id, w, h) = (42L, 37, 21)
    val png = Multimodal.pngBytes(id, w, h)
    assert(png.take(8).map(_ & 0xff).toSeq === Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "payload is not a real PNG stream")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) === Multimodal.pixelValue(id, 3, 5, x, y))
      assert(((rgb >> 8) & 0xff) === Multimodal.pixelValue(id, 7, 11, x, y))
      assert((rgb & 0xff) === Multimodal.pixelValue(id, 13, 17, x, y))
    }
  }

  test("pii scan finds every planted span kind on its stride and redacts all of them") {
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val scan = Pii.piiScan(docs).collect()
    val byId = scan.map(r => r.getLong(0) -> r).toMap
    ids.filter(_ % 5 == 0).foreach(id => assert(byId(id).getLong(1) >= 1, s"email missing on $id"))
    ids.filter(_ % 7 == 0).foreach(id => assert(byId(id).getLong(2) >= 1, s"phone missing on $id"))
    ids.filter(_ % 11 == 0).foreach(id => assert(byId(id).getLong(3) >= 1, s"ip missing on $id"))
    ids.filter(_ % 13 == 0).foreach(id => assert(byId(id).getLong(4) >= 1, s"ssn missing on $id"))
    // redaction is complete: no pattern matches survive in the redacted text
    val remaining = Pii.augmentPii(docs)
      .select(Pii.redacted(col("text")).as("t"))
      .select(Pii.Kinds.map { case (k, pat, _) =>
        sum(size(regexp_extract_all(col("t"), lit(pat), lit(0)))).as(k)
      }: _*).first()
    Pii.Kinds.indices.foreach(i => assert(remaining.getLong(i) === 0L))
    // and it actually changed the text of every hit doc (fingerprint moves)
    val moved = Pii.augmentPii(docs)
      .select(col("doc_id"),
        call_function("hash64", col("text")).as("raw_fp"),
        call_function("hash64", Pii.redacted(col("text"))).as("red_fp"))
      .filter(col("raw_fp") === col("red_fp"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(scan.map(_.getLong(0)).forall(id => !moved.contains(id)))
  }

  test("pii raw-input API detects and redacts hand-written dirty text") {
    import spark.implicits._
    val dirty = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or call 555-0199 today"),
      (2L, "server 192.168.1.77 rejected ssn 123-45-6789 twice: 123-45-6789"),
      (3L, "perfectly clean text with no identifiers at all"))
      .toDF("doc_id", "text")
    val rows = Pii.scanRaw(dirty).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // clean doc absent
    val r1 = rows(0); val r2 = rows(1)
    assert(r1.getLong(1) === 1L && r1.getLong(2) === 1L) // email + phone
    assert(r2.getLong(3) === 1L && r2.getLong(4) === 2L) // ip + 2 ssn spans
    val summary = Pii.summaryRaw(dirty).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(summary === Map(
      "email" -> (1L, 1L), "phone" -> (1L, 1L), "ip" -> (1L, 1L), "ssn" -> (2L, 1L)))
  }

  test("pii summary doc counts match the planting strides") {
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val s = Pii.piiSummary(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val strides = Map("email" -> 5, "phone" -> 7, "ip" -> 11, "ssn" -> 13)
    strides.foreach { case (kind, m) =>
      val planted = ids.count(_ % m == 0).toLong
      val (nSpans, nDocs) = s(kind)
      assert(nDocs === planted, s"$kind docs: got $nDocs, planted $planted")
      assert(nSpans >= nDocs)
    }
  }

  test("decontamination flags every exact copy of an eval doc at full share") {
    val res = Contamination.contaminatedDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val longEnough = TextAnalysis.withTokens(docs)
      .filter(size(col("toks")) >= Contamination.NgramN)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val evalCopies = longEnough.filter(id =>
      id % Contamination.EvalModulus == 0 && id % 13 == 0)
    assert(evalCopies.nonEmpty, "fixture must contain at least one eval-doc exact copy")
    evalCopies.foreach { id =>
      val hit = res.get(id + 200000)
      assert(hit.isDefined, s"exact eval copy ${id + 200000} not flagged")
      assert(hit.get._3 === 1.0, s"exact copy share must be 1.0, got ${hit.get._3}")
      assert(hit.get._2 >= 1)
    }
    // share is a ratio; never above 1
    res.values.foreach { case (_, _, share) => assert(share > 0.0 && share <= 1.0) }
  }

  test("bm25 ranks the all-terms document first and orders by score") {
    import spark.implicits._
    val synth = ((1 to 50).map(i =>
      (i.toLong, s"filler alpha beta gamma delta w$i common words here", "en")) ++ Seq(
      (998L, "spark appears once in this otherwise plain document body", "en"),
      (999L, "spark join window stream spark join window stream", "en")))
      .toDF("doc_id", "text", "lang")
    val top = TextAnalysis.bm25Scores(synth).collect()
    assert(top.nonEmpty && top.head.getLong(0) === 999L)
    assert(top.map(_.getLong(0)).contains(998L))
    val scores = top.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0.0))
  }

  test("incremental dedup labels exact copies duplicate, truncations new; bloom variant identical") {
    val st = Dedup.incrementalStatus(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st.nonEmpty)
    st.foreach { case (id, status) =>
      if (id >= 200000) assert(status === "duplicate", s"exact copy $id")
      else assert(status === "new", s"truncated near-dup $id")
    }
    val stBloom = Dedup.incrementalStatusBloom(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stBloom === st, "bloom-prefiltered variant must be output-identical")
  }

  test("incremental near-dup gate catches truncated copies the digest gate waves through") {
    val rows = Dedup.incrementalNearDupStatus(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // digest semantics unchanged: every exact copy is still 'duplicate'
    rows.filter(_._1 >= 200000).foreach { case (id, (status, est)) =>
      assert(status === "duplicate", s"exact copy $id")
      assert(est.contains(1.0), s"exact copy $id must best-match at est 1.0")
    }
    // the digest-only gate labels ALL truncations 'new'; the near gate must
    // recover a meaningful share of them as near_duplicate
    val truncs = rows.filter { case (id, _) => id >= 100000 && id < 200000 }
    val nearCaught = truncs.count(_._2._1 == "near_duplicate")
    assert(truncs.nonEmpty && nearCaught > 0,
      s"no truncated copy recovered (of ${truncs.size})")
    truncs.foreach { case (id, (status, est)) =>
      assert(status !== "duplicate", s"truncation $id cannot digest-match")
      if (status == "near_duplicate")
        assert(est.exists(e => e >= 0.5 && e <= 1.0), s"$id est out of range: $est")
      else assert(est.isEmpty || est.exists(_ < 0.5))
    }
    // agreement with the digest gate on everything the digest gate decides
    val digestOnly = Dedup.incrementalStatus(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, (status, _)) =>
      if (digestOnly(id) == "duplicate") assert(status === "duplicate")
      else assert(status === "near_duplicate" || status === "new")
    }
  }

  test("stratified sampling: realized rate tracks the configured mixture; unknown langs drop") {
    val rows = Curation.sampleSummary(docs).collect()
    assert(rows.map(_.getString(0)).toSet === Curation.SampleRatesBp.keySet)
    rows.foreach { r =>
      val (rateBp, nTotal, nKept, realized) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(rateBp === Curation.SampleRatesBp(r.getString(0)))
      assert(nKept <= nTotal)
      assert(math.abs(realized - rateBp / 10000.0) < 0.15,
        s"${r.getString(0)}: realized $realized vs configured ${rateBp / 10000.0}")
    }
    import spark.implicits._
    val unknown = Seq((1L, "foo bar", "xx"), (2L, "baz qux", "xx"))
      .toDF("doc_id", "text", "lang")
    val u = Curation.sampleSummary(unknown).collect()
    assert(u.length === 1 && u(0).getInt(1) === 0 && u(0).getLong(3) === 0L)
  }

  test("frame sampling emits FramesPerVideo frames per video row") {
    val media = Multimodal.mediaTable(docs)
    val nVideos = media.filter(col("kind") === "video").count()
    val frames = Multimodal.frameSamples(docs)
    assert(frames.count() === nVideos * Multimodal.FramesPerVideo)
    assert(frames.groupBy("media_id").count()
      .filter(col("count") =!= Multimodal.FramesPerVideo).count() === 0)
  }

  test("frame dedup reports exactly the recurring sampled digests") {
    val frames = Multimodal.frameSamples(docs).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val expected = frames.groupBy(_._2).filter(_._2.length > 1)
    val dups = Multimodal.frameDuplicates(docs).collect()
    assert(dups.nonEmpty)
    assert(dups.length === expected.size)
    dups.foreach { r =>
      val hits = expected(r.getString(0))
      assert(r.getLong(1) === hits.length.toLong)
      assert(r.getLong(2) === hits.map(_._1).distinct.length.toLong)
      assert(r.getLong(3) === hits.map(_._1).min)
    }
  }

  test("repeated passages: every injected copy (and its base) is 100% repeated; report is cross-document") {
    val top = Passages.topRepeatedPassages(docs).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getLong(2) >= 2, s"'${r.getString(0)}' reaches only ${r.getLong(2)} docs")
      assert(r.getLong(1) >= r.getLong(2)) // occurrences ≥ documents reached
    }
    val share = Passages.docRepeatedShare(docs).collect()
    val byId = share.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // an exact copy's 8-grams ALL exist in its base document (and vice
    // versa), so both ends must score repeated_share == 1.0
    val copies = share.filter(_.getLong(0) >= 200000)
    assert(copies.nonEmpty)
    copies.foreach { r =>
      assert(r.getDouble(3) === 1.0, s"copy ${r.getLong(0)}: ${r.getDouble(3)}")
      assert(byId(r.getLong(0) - 200000) === 1.0)
    }
    // truncated near-dups' grams are a prefix subset of the base's — also 1.0
    share.filter(r => r.getLong(0) >= 100000 && r.getLong(0) < 200000)
      .foreach(r => assert(r.getDouble(3) === 1.0))
  }

  test("duplicated spans: shared prefix yields one maximal span per member; within-doc repeat is cut") {
    import spark.implicits._
    // two docs sharing a 10-word prefix (windows at pos 1..3), distinct tails
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val synth = Seq(
      (1L, s"$shared a1 a2 a3 a4 a5 a6 a7 a8", "en"),
      (2L, s"$shared b1 b2 b3 b4 b5 b6 b7 b8", "en"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12", "en"))
      .toDF("doc_id", "text", "lang")
    val spans = Passages.duplicatedSpansRaw(synth).collect()
    // exactly one span per sharing doc, covering words 1..10; doc 3 clean
    assert(spans.length === 2, spans.mkString("; "))
    spans.foreach { r =>
      assert(Set(1L, 2L).contains(r.getLong(0)))
      assert(r.getLong(1) === 1L, s"span_start ${r.getLong(1)}")
      assert(r.getLong(2) === 10L, s"span_end ${r.getLong(2)}")
      assert(r.getLong(3) === 10L) // span_words
      assert(r.getLong(4) === 3L)  // windows at pos 1,2,3
    }
    // the SAME 8-gram twice inside one document: both occurrences are spans
    // (an excision pass must cut the second copy — cross-doc-only counting
    // would miss it entirely)
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")
    val inner = Seq((9L, s"$rep x1 x2 x3 $rep", "en")).toDF("doc_id", "text", "lang")
    val innerSpans = Passages.duplicatedSpansRaw(inner).collect()
    assert(innerSpans.length === 2, innerSpans.mkString("; "))
    assert(innerSpans.map(_.getLong(1)).toSet === Set(1L, 12L))
    // stats roll-up agrees with the cut list it summarizes
    val st = Passages.duplicatedSpanStatsRaw(synth).collect().head
    assert(st.getLong(0) === 2L) // docs affected
    assert(st.getLong(1) === 2L) // spans
    assert(st.getLong(2) === 20L) // dup words
    val totalWords = 18 + 18 + 12
    assert(math.abs(st.getDouble(3) - 20.0 / totalWords) < 5e-4)
    // the rewrite pass: shared prefix excised from BOTH members, tails kept
    // verbatim; the untouched doc keeps its original digest
    val ex = Passages.excisedRaw(synth).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(ex(1L).getLong(2) === 8L && ex(1L).getLong(3) === 10L)
    assert(ex(2L).getLong(2) === 8L && ex(2L).getLong(3) === 10L)
    assert(ex(3L).getLong(3) === 0L)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(ex(1L).getString(4) === hex("a1 a2 a3 a4 a5 a6 a7 a8"))
    assert(ex(3L).getString(4) === hex("c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"))
    // within-doc repeat: BOTH copies excised (Lee et al. remove all
    // occurrences), only the middle filler survives
    val exInner = Passages.excisedRaw(inner).collect().head
    assert(exInner.getLong(3) === 16L)
    assert(exInner.getString(4) === hex("x1 x2 x3"))
    // tab/newline-headed text: the excision tokenizer must skip ALL leading
    // whitespace like the word_ngrams kernel the span positions come from —
    // split(trim(text)) would keep a leading "" and shift every span one
    // word right, cutting the wrong tokens
    val tabbed = Seq(
      (20L, "\t" + rep + " y1 y2 y3", "en"),
      (21L, "\n " + rep + " z1 z2 z3", "en")).toDF("doc_id", "text", "lang")
    val exTab = Passages.excisedRaw(tabbed).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(exTab(20L).getLong(1) === 11L, "n_words must not count a phantom empty token")
    assert(exTab(20L).getLong(3) === 8L && exTab(20L).getString(4) === hex("y1 y2 y3"))
    assert(exTab(21L).getLong(3) === 8L && exTab(21L).getString(4) === hex("z1 z2 z3"))
  }

  test("corpus shuffle: deterministic, seed-sensitive, shards consistent and balanced") {
    def snap(seed: String) =
      Curation.withShuffleOrder(docs, seed = seed)
        .select(col("doc_id"), col("shuffle_key"), col("shard")).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    val a = snap("shuffle1")
    assert(snap("shuffle1") === a) // re-run identical, no RNG
    a.values.foreach { case (key, shard) =>
      assert(key >= 0L && shard === (key % 16).toInt)
    }
    val b = snap("other-seed")
    assert(a.exists { case (id, (key, _)) => b(id)._1 != key })
    val summary = Curation.shuffleSummary(docs).collect()
    assert(summary.length === 16)
    val counts = summary.map(_.getLong(1))
    assert(counts.sum === docs.count())
    assert(counts.max <= 3 * (counts.sum / 16), // uniform hash ⇒ no hot shard
      s"unbalanced shards: ${counts.mkString(",")}")
  }

  test("unigram perplexity: rare-token soup scores above common-token text; ppl = e^avg_nll") {
    import spark.implicits._
    val common = (1 to 40).map(_ => "the").mkString(" ")
    val soup = (1 to 40).map(i => s"zqx$i").mkString(" ")
    val synth = Seq((1L, common, "en"), (2L, common, "en"), (3L, soup, "en"))
      .toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.unigramScores(synth).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    val (n1, nll1, _) = rows(1L)
    val (_, nll3, ppl3) = rows(3L)
    assert(n1 === 40L)
    assert(nll3 > nll1, s"soup $nll3 should out-score common $nll1")
    assert(rows(1L) === rows(2L)) // identical docs, identical scores
    assert(math.abs(ppl3 - math.exp(nll3)) / ppl3 < 0.01) // ppl tracks e^avg_nll
    // corpus scoring emits one row per document
    assert(TextAnalysis.unigramScores(docs).count() === docs.count())
  }

  test("decontamination raw API flags a train doc embedding an eval n-gram, with explicit eval frame") {
    import spark.implicits._
    val benchLine = "q1 what is the capital of france answer paris obviously"
    val evalSet = Seq((900L, benchLine, "en")).toDF("doc_id", "text", "lang")
    val train = Seq(
      (1L, s"some preamble then $benchLine and a trailer", "en"), // contaminated
      (2L, "a completely unrelated training document about spark plans", "en"))
      .toDF("doc_id", "text", "lang")
    val hits = graft.operators.Contamination.scanRaw(train, evalSet).collect()
    assert(hits.map(_.getLong(0)).toSeq === Seq(1L))
    assert(hits(0).getLong(2) === 1L) // one eval doc hit
    assert(hits(0).getLong(1) >= 1L)
  }

  test("zipf fit recovers slope -1 on an exactly zipfian corpus") {
    import spark.implicits._
    // token tk appears round(2520/k) times (2520 divisible by 1..9) —
    // ln(cnt) = ln(2520) − ln(rank), an exact slope −1 line
    val words = (1 to 9).flatMap(k => Seq.fill(2520 / k)(f"t$k%02d"))
    val synth = Seq((1L, words.mkString(" "), "en")).toDF("doc_id", "text", "lang")
    val fit = graft.operators.TextAnalysis.zipfFit(synth).collect().head
    assert(fit.getLong(0) === 9L)
    assert(math.abs(fit.getDouble(1) - (-1.0)) < 1e-9, s"slope ${fit.getDouble(1)}")
    assert(math.abs(fit.getDouble(2) - math.log(2520.0)) < 1e-3)
    // the flat word-salad corpus must sit far from natural text's −1
    val corpus = graft.operators.TextAnalysis.zipfFit(docs).collect().head
    assert(corpus.getDouble(1) > -0.5)
  }

  test("interpolated LM: λ=1 degenerates to the raw bigram model; smoothing lowers surprise spread") {
    // λ·p_bi + 0·p_uni = p_bi exactly in IEEE arithmetic, so the λ=1
    // scores must be bit-identical to bigramScores
    val raw = graft.operators.TextAnalysis.bigramScores(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val atOne = graft.operators.TextAnalysis.interpolatedScores(docs, lambda = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(atOne === raw)
    // at λ=0.7 every doc still gets a finite positive perplexity
    val interp = graft.operators.TextAnalysis.interpolatedScores(docs).collect()
    assert(interp.length === raw.size)
    interp.foreach(r => assert(r.getDouble(3) > 0 && !r.getDouble(3).isInfinite))
  }

  test("chunking: window/stride arithmetic, short-doc passthrough, digest-equal shared windows") {
    import spark.implicits._
    val hundred = (0 until 100).map(i => s"w$i").mkString(" ")
    val synth = Seq(
      (1L, hundred, "en"),
      (2L, "only five words in here", "en"),
      (3L, hundred, "en")) // identical to doc 1 → identical chunk digests
      .toDF("doc_id", "text", "lang")
    val rows = graft.operators.Curation.chunkDocs(synth).collect()
    val d1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    // 100 words, size 64, stride 48 → chunks at 0 (64 toks) and 48 (52 toks)
    assert(d1.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0L, 0L, 64L), (1L, 48L, 52L)))
    val d2 = rows.filter(_.getLong(0) == 2L)
    assert(d2.map(r => (r.getLong(1), r.getLong(3))).toSeq === Seq((0L, 5L)))
    // chunk-level dedup composes: identical windows hash identically
    val d3 = rows.filter(_.getLong(0) == 3L).sortBy(_.getLong(1))
    assert(d1.map(_.getString(4)).toSeq === d3.map(_.getString(4)).toSeq)
    // corpus sanity: chunking is lossless on coverage — every doc's last
    // chunk reaches its final word
    val corpus = graft.operators.Curation.chunkDocs(docs).collect()
    val nWords = graft.operators.TextAnalysis.withTokens(docs)
      .select(col("doc_id"),
        expr("size(filter(toks, t -> t <> ''))").cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpus.groupBy(_.getLong(0)).foreach { case (id, chunks) =>
      val last = chunks.maxBy(_.getLong(1))
      assert(last.getLong(2) + last.getLong(3) === nWords(id),
        s"doc $id last chunk does not reach the final word")
    }
  }

  test("chunk invariants hold across random word counts and window configs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val synth = (1L to 50L).map { id =>
      val n = 1 + rnd.nextInt(300)
      (id, (0 until n).map(i => s"w$i").mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    val lens = synth.select(col("doc_id"),
        expr("size(filter(split(text, '\\\\s+'), t -> t <> ''))").cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((size, stride) <- Seq((64, 48), (32, 32), (128, 64))) {
      val chunks = graft.operators.Curation.chunkDocs(synth, size, stride)
        .collect().groupBy(_.getLong(0))
      assert(chunks.keySet === lens.keySet)
      chunks.foreach { case (id, cs) =>
        val sorted = cs.sortBy(_.getLong(1))
        // starts advance by exactly stride; first at 0
        assert(sorted.map(_.getLong(2)).toSeq ===
          sorted.indices.map(_.toLong * stride))
        // every chunk is full except possibly the last; the last reaches
        // the final word, and with stride < size never starts past the end
        sorted.init.foreach(r => assert(r.getLong(3) === size.toLong))
        val last = sorted.last
        assert(last.getLong(2) + last.getLong(3) === lens(id))
        assert(last.getLong(3) >= 1)
      }
    }
  }

  test("contamination spans merge touching hits and split separated quotes") {
    import spark.implicits._
    val quote = "w1 w2 w3 w4 w5 w6 w7 w8" // exactly one 8-gram
    val junk10 = (1 to 10).map(i => s"j$i").mkString(" ")
    val junk20 = (1 to 20).map(i => s"k$i").mkString(" ")
    val synth = Seq(
      (0L, quote, "en"), // eval member (id < 100000, id % 50 == 0)
      (1L, s"$junk10 $quote $junk20 $quote tail", "en"), // two separated quotes
      (2L, "nothing shared here at all beyond eight words total", "en"))
      .toDF("doc_id", "text", "lang")
    val rows = graft.operators.Contamination.contaminationSpans(synth).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(2L))
    val d1 = rows(1L)
    assert(d1.getLong(1) === 2L) // two hit positions
    assert(d1.getLong(2) === 10L) // first quote starts after 10 junk words
    assert(d1.getLong(3) === 10L + 8 + 20 + 8 - 1) // last word of second quote
    assert(d1.getLong(4) === 2L) // separated by > n words → two spans
    // the augmented exact copy of the eval doc (id 200000) is one full span
    val copy = rows(200000L)
    assert(copy.getLong(4) === 1L && copy.getLong(2) === 0L)
  }

  test("bpe merge learning follows weighted pair frequency with greedy run handling") {
    import spark.implicits._
    // "aa" ×2, "ab" ×1: round 1 must merge (a,a) (weight 2 beats 1), after
    // which only ("a","b") remains; round 3 finds no pair and stops early
    val synth = Seq((1L, "aa aa ab", "en")).toDF("doc_id", "text", "lang")
    val merges = graft.operators.Bpe.learnMerges(synth, nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(merges.toSeq === Seq((1, "a", "a", "aa", 2L), (2, "a", "b", "ab", 1L)))
    // run semantics: "aaa" under (a,a) yields ["aa","a"], so the second
    // round pairs "aa a", not a double-merge
    val runs = Seq((1L, "aaa aaa", "en")).toDF("doc_id", "text", "lang")
    val m2 = graft.operators.Bpe.learnMerges(runs, nMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m2.toSeq === Seq((1, "a", "a", "aa", 4L), (2, "aa", "a", "aaa", 2L)))
    // corpus run: ranks are 1..n and counts never increase with rank
    val corpus = graft.operators.Bpe.learnMerges(docs, nMerges = 3).collect()
    assert(corpus.map(_.getInt(0)).toSeq === (1 to corpus.length))
    assert(corpus.map(_.getLong(4)).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("gopher rules: each rule kills its designed failure mode independently") {
    import spark.implicits._
    val good = "the quick brown fox is running in the park and the dog is on a mat today yes"
    val synth = Seq(
      (1L, good, "en"),                                      // passes all
      (2L, "too few words here", "en"),                      // r_words
      (3L, ("pseudopseudohypoparathyroidism " * 12) + "the of and in is on a to for word", "en"), // r_mean_len
      (4L, good + " " + ("@#% $!& *^~ " * 6), "en"),         // r_symbol
      (5L, good + " " + ("12345 67890 " * 20), "en"),        // r_alpha
      (6L, "words without any stop hits: alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"))
      .toDF("doc_id", "text", "lang")
    val rows = graft.operators.TextAnalysis.gopherRules(synth).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(rows(1L).fieldIndex("keep")))
    def failsOnly(id: Long, rule: String): Unit = {
      val r = rows(id)
      assert(!r.getBoolean(r.fieldIndex(rule)), s"doc $id should fail $rule")
      assert(!r.getBoolean(r.fieldIndex("keep")))
    }
    failsOnly(2L, "r_words")
    failsOnly(3L, "r_mean_len")
    failsOnly(4L, "r_symbol")
    failsOnly(5L, "r_alpha")
    failsOnly(6L, "r_stop")
    // corpus sanity: the rule set discriminates, not degenerate
    val corpus = graft.operators.TextAnalysis.gopherRules(docs).collect()
    val kept = corpus.count(r => r.getBoolean(r.fieldIndex("keep")))
    assert(kept > 0 && kept < corpus.length)
  }

  test("nb quality survives uniformly-labeled corpora (smoothed priors, no ln(0))") {
    import spark.implicits._
    // every doc under GopherMinWords → the Gopher label is uniformly toss:
    // unsmoothed priors would evaluate ln(0) — NULL scores in Spark, a hard
    // error in the DuckDB oracle
    val tiny = (1L to 6L).map(i => (i, "a b c", "en")).toDF("doc_id", "text", "lang")
    val rows = graft.operators.TextAnalysis.nbQuality(tiny).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("nll_keep")) && !r.isNullAt(r.fieldIndex("nll_toss")))
    }
  }

  test("zipf fit reports null slope on degenerate vocabularies instead of crashing") {
    import spark.implicits._
    val empty = Seq((1L, "", "en")).toDF("doc_id", "text", "lang")
    val r0 = graft.operators.TextAnalysis.zipfFit(empty).collect().head
    assert(r0.getLong(0) === 0L && r0.isNullAt(1) && r0.isNullAt(2))
    val one = Seq((1L, "hello hello hello", "en")).toDF("doc_id", "text", "lang")
    val r1 = graft.operators.TextAnalysis.zipfFit(one).collect().head
    assert(r1.getLong(0) === 1L && r1.isNullAt(1))
  }

  test("naive-bayes quality classifier learns the gopher signal") {
    val rows = graft.operators.TextAnalysis.nbQuality(docs).collect()
    assert(rows.length === docs.count())
    // pred is derived from the integer scores, exactly
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("pred")) ===
        (r.getLong(r.fieldIndex("nll_keep")) <= r.getLong(r.fieldIndex("nll_toss"))))
    }
    // non-degenerate: both classes appear in the predictions, and the
    // classifier substantially agrees with the labels it trained on
    val preds = rows.map(r => r.getBoolean(r.fieldIndex("pred")))
    assert(preds.exists(identity) && preds.exists(!_))
    val agree = rows.count(r =>
      r.getBoolean(r.fieldIndex("label")) == r.getBoolean(r.fieldIndex("pred")))
    assert(agree.toDouble / rows.length > 0.75, s"agreement $agree/${rows.length}")
  }

  test("count-min heavy hitters: estimates dominate truth and sketches merge cell-wise") {
    val report = graft.operators.TextAnalysis.heavyHitters(docs).collect()
    assert(report.length === 20)
    // CMS never underestimates (counters only collide upward)
    report.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
    // mergeability — the property that makes the sketch a per-partition /
    // per-batch summary at scale: sketch(a ∪ b) = sketch(a) + sketch(b)
    def toks(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.withTokens(d)
        .select(explode(col("toks")).as("tok")).filter(col("tok") =!= "")
    def cells(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.cmsSketch(toks(d)).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = cells(docs.filter(col("doc_id") % 2 === 0))
    val b = cells(docs.filter(col("doc_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === cells(docs))
  }

  test("bpe merges adjacent occurrences of the learned pair (banana/abab)") {
    import spark.implicits._
    // 'banana' under (a,n): both adjacent occurrences must merge in one
    // round → [b,an,an,a] = 4 symbols. (The old single-boundary encoding
    // skipped the second occurrence — [b,an,a,n,a] = 5.) Pair counts in
    // "banana": an×2, na×2, ba×1 → argmax tie-break picks "a n".
    val banana = Seq((1L, "banana", "en")).toDF("doc_id", "text", "lang")
    val m = graft.operators.Bpe.learnMerges(banana, nMerges = 1).collect()
    assert((m(0).getString(1), m(0).getString(2)) === (("a", "n")))
    val row = graft.operators.Bpe.tokenizeSummary(banana, nMerges = 1).collect()(0)
    assert((row.getLong(1), row.getLong(2)) === ((6L, 4L)))
    // 'abab' under (a,b) → [ab,ab] = 2 symbols, and round 2 can then learn
    // (ab,ab) — the leftover un-merged pair can no longer resurface as a
    // duplicate (a,b) rule in a later round
    val abab = Seq((1L, "abab", "en")).toDF("doc_id", "text", "lang")
    val m2 = graft.operators.Bpe.learnMerges(abab, nMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(m2.toSeq === Seq(("a", "b"), ("ab", "ab")))
    val row2 = graft.operators.Bpe.tokenizeSummary(abab, nMerges = 1).collect()(0)
    assert((row2.getLong(1), row2.getLong(2)) === ((4L, 2L)))
  }

  test("bpe merge-round lineage stays constant-depth past the checkpoint cadence") {
    // 32 rounds = 2 × CheckpointEvery: without the periodic localCheckpoint
    // the final symbol table's plan would chain 32 replace projections (one
    // per round, linear in nMerges); with it, at most one checkpoint window
    // of projections sits above a materialized scan, independent of nMerges.
    val (merges, syms) = graft.operators.Bpe.learnMergesAndSyms(docs, nMerges = 32)
    assert(merges.count() === 32L) // the corpus supports all 32 rounds
    val planLines = syms.queryExecution.analyzed.treeString.linesIterator.size
    assert(planLines <= 3 * graft.operators.Bpe.CheckpointEvery,
      s"plan depth $planLines suggests lineage is growing with nMerges")
  }

  test("bpe tokenization compresses and never splits beyond characters") {
    import spark.implicits._
    // after merges (a,a)->aa then (a,b)->ab: "aa"=1 sym, "ab"=1 sym, so the
    // doc "aa aa ab" covers 6 chars with 3 tokens — compression 2.0
    val synth = Seq((1L, "aa aa ab", "en")).toDF("doc_id", "text", "lang")
    val row = graft.operators.Bpe.tokenizeSummary(synth, nMerges = 3).collect()(0)
    assert((row.getLong(1), row.getLong(2), row.getDouble(3)) === ((6L, 3L, 2.0)))
    // corpus-wide: every doc has 1 <= n_bpe_syms <= n_base_syms
    val all = graft.operators.Bpe.tokenizeSummary(docs).collect()
    assert(all.nonEmpty)
    all.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 1.0)
    }
  }

  test("kmeans update bounds per-cell membership with a deterministic sample") {
    import spark.implicits._
    // determinism: two runs with the same cap pick the same hash-rank
    // sample and train identical centroids
    val c1 = Similarity.kmeansCentroids(emb, iters = 1, maxMembersPerCell = 4)
    val c2 = Similarity.kmeansCentroids(emb, iters = 1, maxMembersPerCell = 4)
    assert(c1.map(t => (t._1, t._2)).toSeq === c2.map(t => (t._1, t._2)).toSeq)
    // the cap is actually enforced: a 4-member sample must train different
    // centroids than the default 256-member sample (cells hold ~500 here)
    val cDefault = Similarity.kmeansCentroids(emb, iters = 1)
    assert(c1.map(_._2).toSeq !== cDefault.map(_._2).toSeq)
    // hot cell: every vector in ONE cell (identical corpus) — the update
    // still aggregates only maxMembersPerCell members instead of one
    // array holding the whole corpus
    val hot = (0L until 600L).map(i => (i, "x", Array.fill(64)(0.5f)))
      .toDF("vec_id", "label", "embedding")
    val cHot = Similarity.kmeansCentroids(hot, iters = 1, maxMembersPerCell = 8)
    assert(cHot.length === 16)
    assert(cHot.forall(_._2.forall(v => !v.isNaN)))
  }

  test("sq8 quantized ranking reproduces the exact top-10 on this corpus") {
    // int8 scalar quantization perturbs cosines by ~1/254 per element —
    // far below this corpus's neighbor gaps, so recall@10 is exactly 1.0
    // (the measured sim_recall number; pinned here as a regression gate,
    // and the contrast with PQ's 4-code recall is the compression ladder)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pairs(Similarity.sq8TopK(emb)) === pairs(Similarity.bruteForceTopK(emb)))
  }

  test("pq codes are exact on the codebook sample; topk ranks by asymmetric distance") {
    val prep = Similarity.prepared(emb)
    // a codebook vector's nearest codeword in every subspace is itself
    val codes = Similarity.withPqCodes(prep)
      .filter(col("vec_id") >= 100 && col("vec_id") < 100 + Similarity.PqK).collect()
    assert(codes.length === Similarity.PqK)
    codes.foreach { r =>
      val j = (r.getLong(0) - 100).toInt
      (0 until Similarity.PqM).foreach { m =>
        assert(r.getAs[Int](s"code_$m") === j, s"vec ${r.getLong(0)} subspace $m")
      }
    }
    val rows = Similarity.pqTopK(emb).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { qr =>
      assert(qr.map(_.getLong(1)).sorted.toSeq === (1L to 10L))
      val dists = qr.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(dists.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
      assert(!qr.exists(_.getLong(2) === qr.head.getLong(0))) // never self
    }
  }

  test("ivf+pq: candidates come only from probed cells; scores match the pure-pq table") {
    val prep = Similarity.prepared(emb)
    val rows = Similarity.ivfPqTopK(emb).collect()
    assert(rows.nonEmpty)
    // every (query, candidate, adist) must also appear in the pure-PQ scoring
    // of the full corpus (IVF only prunes candidates, never rescores)
    val pq = Similarity.pqTopK(emb, k = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(pq.contains(key), s"$key missing from full PQ scoring")
      assert(pq(key) === r.getDouble(3), s"$key rescored differently")
    }
    rows.groupBy(_.getLong(0)).values.foreach { qr =>
      assert(qr.map(_.getLong(1)).sorted.toSeq === (1L to qr.length))
    }
  }

  test("curation funnel: monotone stage survivors anchored to the dedup operators") {
    val rows = Curation.funnel(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(t => (t._1, t._2)).toSeq === Seq(
      (1, "ingest"), (2, "exact_dedup"), (3, "near_dedup"), (4, "quality"), (5, "sample")))
    val counts = rows.map(_._3)
    assert(counts.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      s"funnel not monotone: ${counts.mkString(",")}")
    // anchors: stage 1 = augmented corpus size; stage 2 = exact-dedup groups
    assert(counts(0) === Dedup.augmentedDocs(docs).count())
    assert(counts(1) === Dedup.exact(docs).count())
    assert(counts(4) > 0L && counts(4) < counts(0))
  }

  test("per-doc language prediction tags marker-bearing text; unmarked text is 'und'") {
    import spark.implicits._
    val synth = Seq(
      (1L, "der hund und die katze", "xx"),  // German markers
      (2L, "qqq www eee rrr", "xx"))         // no markers at all
      .toDF("doc_id", "text", "lang")
    val tagged = TextAnalysis.withPredictedLang(synth).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(tagged(1L) === "de")
    // zero marker hits in EVERY language carries no signal: the prediction
    // is 'und', not the alphabetically-first code (best always equals some
    // score, so the ladder needs — and has — an explicit all-zero guard)
    assert(tagged(2L) === "und")
  }

  test("feature hashing embeds identical texts identically and respects token multiplicity") {
    import spark.implicits._
    val synth = Seq(
      (1L, "alpha beta alpha", "en"),
      (2L, "alpha beta alpha", "en"),   // identical text → identical vector
      (3L, "alpha beta", "en"))         // one fewer alpha
    .toDF("doc_id", "text", "lang")
    val vecs = TextAnalysis.featureHash(synth).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    assert(vecs(1L) === vecs(2L))
    assert(vecs(1L) !== vecs(3L)) // multiplicity matters
    // each doc's total |val| mass is bounded by its token count
    val counts = Map(1L -> 3, 2L -> 3, 3L -> 2)
    vecs.foreach { case (id, v) =>
      assert(v.values.map(math.abs).sum <= counts(id))
      v.keys.foreach(d => assert(d >= 0 && d < 16))
    }
    assert(TextAnalysis.featureHash(docs).groupBy("doc_id").count().count() === docs.count())
  }

  test("kmv sketch estimates vocabulary within sketch error; small vocab is exact") {
    import spark.implicits._
    // corpus vocab (31 tokens at this sf) sits below k → exact passthrough
    val row = TextAnalysis.vocabKmv(docs).collect()(0)
    assert(row.getDouble(2) === row.getLong(1).toDouble && row.getDouble(3) === 0.0)
    // true sketch path: 5000 distinct synthetic tokens ≫ k = 256
    val wide = (0 until 10).map { d =>
      (d.toLong, (0 until 500).map(i => s"tok_${d}_$i").mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    val w = TextAnalysis.vocabKmv(wide).collect()(0)
    val (exact, est, err) = (w.getLong(1), w.getDouble(2), w.getDouble(3))
    assert(exact === 5000L)
    // KMV standard error ~1/sqrt(k-1) ≈ 6.3% at k=256; allow 4 sigma
    assert(err < 0.25, s"estimate $est vs exact $exact: err $err")
    val tiny = Seq((1L, "a b c a b", "en")).toDF("doc_id", "text", "lang")
    val t = TextAnalysis.vocabKmv(tiny).collect()(0)
    assert(t.getLong(1) === 3L && t.getDouble(2) === 3.0 && t.getDouble(3) === 0.0)
  }

  test("bigram perplexity penalizes shuffled word order that unigrams cannot see") {
    import spark.implicits._
    val fluent = "the cat sat on the mat " * 5
    val salad = "mat the on sat the cat " * 5 // same unigram counts, novel order
    val synth = Seq((1L, fluent.trim, "en"), (2L, fluent.trim, "en"), (3L, salad.trim, "en"))
      .toDF("doc_id", "text", "lang")
    val uni = TextAnalysis.unigramScores(synth).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = TextAnalysis.bigramScores(synth).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(uni(1L) - uni(3L)) < 0.05, "unigram LM sees identical vocabulary")
    assert(bi(3L) > bi(1L) + 0.2, s"bigram must penalize salad: ${bi(3L)} vs ${bi(1L)}")
    // docs under 2 tokens are absent by contract
    val tiny = Seq((9L, "one", "en")).toDF("doc_id", "text", "lang")
    assert(TextAnalysis.bigramScores(tiny).count() === 0)
  }

  test("temperature sampling damps head languages and boosts the tail toward the target share") {
    val rates = Curation.temperatureRatesBp(docs)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (head, tail) = (counts.maxBy(_._2)._1, counts.minBy(_._2)._1)
    assert(rates(head) < rates(tail),
      s"head $head ${rates(head)}bp should sample below tail $tail ${rates(tail)}bp")
    val rows = Curation.temperatureSampleSummary(docs).collect()
    val kept = rows.map(_.getLong(3)).sum.toDouble
    val total = rows.map(_.getLong(2)).sum.toDouble
    assert(math.abs(kept / total - 0.5) < 0.1, s"realized share ${kept / total} vs target 0.5")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) - r.getInt(1) / 10000.0) < 0.15)
    }
  }

  test("rp retrieve-rerank keeps true near-duplicates at rank 1; noise recall stays bounded") {
    // the corpus is near-orthogonal random vectors — exact top-10 ranks are
    // noise-ordered, the adversarial case for ANY coarse stage. The load-
    // bearing property is that STRONG similarity survives projection: the
    // injected near-identical copy (cos ≈ 0.999) must come back at rank 1.
    val augmented = Dedup.augmentedEmbeddings(emb)
      .select(col("vec_id"), lit("x").as("label"),
        col("vec").cast("array<float>").as("embedding"))
    val rr = Similarity.rpRerankTopK(augmented).collect()
    val rank1 = rr.filter(_.getLong(1) === 1L)
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val withCopy = rank1.keys.filter(_ % 11 == 0)
    assert(withCopy.nonEmpty)
    withCopy.foreach { q =>
      val (hit, cos) = rank1(q)
      assert(hit === q + 100000, s"query $q: near-copy not at rank 1 (got $hit)")
      assert(cos > 0.99)
    }
    // and on the raw corpus, noise-ranked recall still clears a floor
    val exact = Similarity.bruteForceTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rrRaw = Similarity.rpRerankTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(rrRaw).size.toDouble / exact.size
    assert(recall >= 0.4, s"coarse-stage noise recall collapsed: $recall")
  }

  test("random projection preserves the injected near-identical pairs' cosine") {
    val proj = Similarity.rpProject(Dedup.augmentedEmbeddings(emb)
      .select(col("vec_id"), lit("x").as("label"), col("vec").cast("array<float>").as("embedding")))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val nearIds = proj.keys.filter(id => id >= 100000 && proj.contains(id - 100000))
    assert(nearIds.nonEmpty)
    nearIds.foreach { id =>
      val c = cos(proj(id), proj(id - 100000))
      assert(c > 0.8, s"projected cosine of near-identical pair $id: $c")
    }
  }

  test("multi-probe lsh recall is a superset of single-probe at identical scores") {
    val single = Similarity.lshTopK(emb, k = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val multi = Similarity.lshMultiProbeTopK(emb, k = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(single.keySet.subsetOf(multi.keySet))
    assert(multi.size > single.size, "1-bit probes recovered no extra candidates")
    single.foreach { case (k, cos) => assert(multi(k) === cos) } // never rescored
  }

  test("winnowing guarantees shared runs are caught and density approaches 2/(w+1)") {
    import spark.implicits._
    // two docs sharing an 8-word run (= W+K-1) must share ≥1 fingerprint
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val synth = Seq(
      (1L, s"one two three $shared four five six", "en"),
      (2L, s"$shared completely different tail words here now", "en"),
      (3L, "nothing in common with the others at all whatsoever truly", "en"))
      .toDF("doc_id", "text", "lang")
    val pairs = graft.operators.Winnow.overlapPairs(synth, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"guaranteed shared run not detected: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // corpus: injected exact copies share ALL fingerprints; density sane
    val fp = graft.operators.Winnow.fingerprintSummary(docs).collect()
    assert(fp.nonEmpty)
    fp.filter(_.getLong(1) > 100).foreach { r =>
      val d = r.getDouble(3)
      assert(d > 0.1 && d < 0.9, s"doc ${r.getLong(0)} density $d")
    }
    val corpusPairs = graft.operators.Winnow.overlapPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val copyIds = docs.filter(col("doc_id") % 13 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    val nFps = fp.map(r => r.getLong(0) -> r.getLong(2)).toMap
    copyIds.filter(id => nFps.getOrElse(id, 0L) >= 3L).foreach { id =>
      assert(corpusPairs.contains((id, id + 200000)), s"exact copy pair $id missing")
    }
    // exact copies contain each other fully: both containments 1.0
    val full = graft.operators.Winnow.overlapPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(3), r.getDouble(4))).toMap
    copyIds.filter(id => nFps.getOrElse(id, 0L) >= 3L).headOption.foreach { id =>
      assert(full((id, id + 200000)) === ((1.0, 1.0)))
    }
  }

  test("winnow frequency cap: universal boilerplate must not blow up the pair count") {
    import spark.implicits._
    // every doc opens with the same 16-word boilerplate (site chrome) —
    // enough grams to clear minShared on its own, so WITHOUT the frequency
    // cap every one of the n·(n−1)/2 doc pairs would surface. Unique tails
    // share nothing. Ids avoid the %7/%13 harness-augmentation residues so
    // no synthetic copies join the corpus.
    val boiler = "this website and all of its content are provided under " +
      "the standard terms of service"
    val ids = (1 to 60).filter(i => i % 7 != 0 && i % 13 != 0).take(30)
    val boilerDocs = ids.map(i =>
      (i.toLong, s"$boiler unique$i tail$i alpha$i beta$i gamma$i delta$i", "en"))
    // one genuine duplicated passage between exactly two docs — must survive
    val passage = "the quick brown fox jumps over the lazy dog while " +
      "seventeen astronauts watch from orbit tonight"
    val withDup = boilerDocs ++ Seq(
      (61L, s"$passage plus some closing words here", "en"),
      (62L, s"opening words first $passage", "en"))
    val pairs = graft.operators.Winnow.overlapPairs(withDup.toDF("doc_id", "text", "lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((61L, 62L)),
      s"boilerplate fingerprints leaked into the pair join: ${pairs.size} pairs")
  }

  test("snapshot diff is content-addressed: a removed doc with a surviving copy stays common") {
    import spark.implicits._
    val v1 = Seq((1L, "kept doc"), (2L, "removed doc"), (3L, "dup doc")).toDF("doc_id", "text")
    val v2 = Seq((1L, "kept doc"), (4L, "dup doc"), (5L, "brand new doc")).toDF("doc_id", "text")
    val byStatus = Dedup.snapshotDiffRaw(v1, v2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "dup doc" was removed as id 3 but re-added as id 4 — same content,
    // so it is common; only "removed doc"'s content left the corpus
    assert(byStatus === Map("added" -> 1L, "removed" -> 1L, "common" -> 2L))
    // harness twin surfaces all three statuses on the corpus
    val h = Dedup.snapshotDiff(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h.keySet === Set("added", "removed", "common"))
    assert(h.values.forall(_ > 0L))
  }

  test("null text is tolerated by the raw production entry points") {
    import spark.implicits._
    val dirty = Seq((1L, null.asInstanceOf[String], "en"), (2L, "a real doc", "en"))
      .toDF("doc_id", "text", "lang")
    val q = TextAnalysis.qualityScores(dirty).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q(1L) === 1L && q(2L) === 3L) // null → "" → one empty token, never -1
    assert(Pii.scanRaw(dirty.select(col("doc_id"), col("text"))).count() === 0)
    assert(TextAnalysis.withPredictedLang(dirty).count() === 2)
    assert(graft.operators.Passages.docRepeatedShareRaw(dirty).count() === 0)
  }

  test("source mix: totals match the corpus and token shares sum to one") {
    val rows = Curation.sourceMix(docs).collect()
    assert(rows.map(_.getLong(1)).sum === docs.count())
    rows.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 0.01)
  }

  test("source cap keeps exactly min(cap, n_docs) per source and the bar is the kept minimum") {
    val capped = Curation.sourceCapSummary(docs, cap = 5).collect()
    capped.foreach { r =>
      assert(r.getLong(2) === math.min(5L, r.getLong(1)))
      assert(r.getBoolean(3) === (r.getLong(1) > 5L))
    }
    // a cap larger than any source never bites and keeps everything
    val uncapped = Curation.sourceCapSummary(docs, cap = 1000000).collect()
    uncapped.foreach { r =>
      assert(r.getLong(2) === r.getLong(1))
      assert(!r.getBoolean(3))
    }
    // the admission bar for a bitten source is at least as strict as the
    // uncapped one (dropping docs can only raise the minimum kept quality)
    val unc = uncapped.map(r => r.getString(0) -> r.getDouble(4)).toMap
    capped.filter(_.getBoolean(3)).foreach { r =>
      assert(r.getDouble(4) >= unc(r.getString(0)))
    }
  }

  test("split leakage surfaces cross-split near-dup pairs and conserves the pair total") {
    val m = Curation.splitLeakage(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cross = m.getOrElse(("train", "val"), 0L) + m.getOrElse(("val", "train"), 0L)
    assert(cross > 0, s"no cross-split pairs in $m")
    assert(m.values.sum === Dedup.minhashLshPairs(docs).count())
  }

  test("pmi surfaces a planted collocation above frequency-matched independent words") {
    import spark.implicits._
    // 'hong kong' always co-occur; 'red' and 'blue' are equally frequent
    // but independent of each other
    val synth = (0 until 40).map { i =>
      val filler = Seq("red", "blue", "green", "car", "sky")(i % 5)
      (i.toLong, s"hong kong visit $filler ${Seq("red", "blue")(i % 2)} trip", "en")
    }.toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.pmiCollocations(synth, minCount = 5, topK = 30).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rows.contains("hong kong"))
    val hk = rows("hong kong")
    rows.filterNot(_._1 == "hong kong").values.foreach { pmi =>
      assert(hk >= pmi, s"'hong kong' ($hk) must top the collocation list")
    }
  }

  test("histogram quantile lands within one bin width of the exact percentile") {
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority").as("grp"), col("o_totalprice").as("v"))
    val exact = base.groupBy("grp")
      .agg(expr("percentile(v, 0.5)").as("p50"), expr("percentile(v, 0.9)").as("p90"),
        (max(col("v")) - min(col("v"))).as("range"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val est = SparkEntry.queries("agg_histogram_quantile")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    exact.foreach { case (g, (p50, p90, range)) =>
      val bw = range / 128
      assert(math.abs(est((g, 0.5)) - p50) <= 2 * bw, s"$g p50: ${est((g, 0.5))} vs $p50")
      assert(math.abs(est((g, 0.9)) - p90) <= 2 * bw, s"$g p90: ${est((g, 0.9))} vs $p90")
    }
  }

  test("dsir ranks target-vocabulary documents first and never selects the target itself") {
    import spark.implicits._
    val synth = Seq(
      (0L, "alpha beta gamma alpha beta", "en"),   // target (0 % 50 == 0)
      (50L, "alpha gamma beta gamma", "en"),        // target
      (7L, "alpha beta gamma beta", "en"),          // speaks the target's language
      (8L, "xray yankee zulu xray", "en"),          // off-domain
      (9L, "other words entirely here", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Curation.dsirSelect(synth, topK = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(!out.map(_._1).exists(id => id % 50 == 0), "target docs must not be selected")
    assert(out.head._1 === 7L, s"most target-like doc should lead: ${out.toSeq}")
    val w = out.toMap
    assert(w(7L) > w(8L) && w(7L) > w(9L))
  }

  test("bpe eval: train-split-learned merges compress both splits; splits partition the corpus") {
    val rows = graft.operators.Bpe.tokenizeEval(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    assert(rows.keySet === Set("heldout", "train"))
    assert(rows.values.map(_._1).sum === docs.count())
    // merges only ever shrink symbol counts, so compression >= 1 everywhere
    rows.values.foreach { case (_, c) => assert(c >= 1.0, s"compression $c < 1") }
  }

  test("chunk retrieval finds a verbatim passage buried inside another document at rank 1") {
    import spark.implicits._
    val passage = (1 to 32).map(i => s"p$i").mkString(" ")
    val filler = (1 to 32).map(i => s"f$i").mkString(" ")
    val synth = Seq(
      (0L, passage, "en"),                 // query doc = the passage itself
      (1L, (1 to 8).map(i => s"q1x$i").mkString(" "), "en"),
      (2L, (1 to 8).map(i => s"q2x$i").mkString(" "), "en"),
      (5L, s"$filler $passage", "en"),     // passage hidden at chunk 1
      (6L, (1 to 40).map(i => s"n$i").mkString(" "), "en")
    ).toDF("doc_id", "text", "lang")
    val top = Similarity.chunkTopK(synth).collect()
      .filter(_.getLong(0) == 0L).minBy(_.getLong(1))
    assert(top.getLong(2) === 5L, "top chunk must come from doc 5")
    assert(top.getLong(3) === 1L, "the buried passage is chunk 1")
    assert(top.getDouble(4) === 1.0, "verbatim passage => cosine 1.0")
  }

  test("hard negatives pair each vector with its most similar different-label cellmate") {
    val rows = Similarity.hardNegatives(emb).collect()
    assert(rows.nonEmpty)
    val byVec = rows.groupBy(_.getLong(0))
    assert(byVec.values.forall(_.length == 1), "one hardest negative per vector")
    rows.foreach { r =>
      assert(r.getInt(1) !== r.getInt(4), "negative must carry a different label")
      assert(r.getDouble(5) <= 1.0 + 1e-9 && r.getDouble(5) >= -1.0 - 1e-9)
    }
  }

  test("epochs plan: sqrt damping repeats small sources more; emission respects floor/ceil") {
    val rows = Curation.epochsSummary(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._3).sum === docs.count())
    // epochs ∝ 1/sqrt(tokens): fewer-token sources must repeat at least as much
    rows.sortBy(_._4).sliding(2).foreach {
      case Array((_, e1, _, t1, _), (_, e2, _, t2, _)) if t1 < t2 =>
        assert(e1 >= e2, s"source with $t1 tokens repeats less than one with $t2")
      case _ =>
    }
    // stochastic rounding: emitted count per source within [floor, ceil] per doc
    rows.foreach { case (src, micro, nDocs, _, emitted) =>
      assert(emitted >= (micro / 1000000L) * nDocs, src)
      assert(emitted <= (micro / 1000000L + 1) * nDocs, src)
    }
  }

  test("ivf cell stats cover the corpus and balance averages to one") {
    val rows = Similarity.ivfCellStats(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._2).sum === emb.count())
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "shares must sum to 1")
    val meanBalance = rows.map(_._4).sum / rows.length
    assert(math.abs(meanBalance - 1.0) < 0.05, s"mean balance $meanBalance")
  }

  test("boilerplate rewrite cuts exactly the shared chunks and rebuilds the remainder in order") {
    import spark.implicits._
    // three docs: A and B share an aligned 8-word banner chunk; C is clean.
    val banner = (1 to 8).map(i => s"cookie$i").mkString(" ")
    val aTail = (1 to 8).map(i => s"atail$i").mkString(" ")
    val bTail = (1 to 5).map(i => s"btail$i").mkString(" ") // short last chunk
    val synth = Seq(
      (1L, s"$banner $aTail", "en"),
      (2L, s"$banner $bTail", "en"),
      (3L, (1 to 16).map(i => s"c$i").mkString(" "), "en")
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.Cleaning.rewriteRaw(synth).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(out(1L) === ((2L, 1L, 8L,
      java.security.MessageDigest.getInstance("MD5").digest(aTail.getBytes)
        .map("%02x".format(_)).mkString)))
    assert(out(2L)._1 === 2L && out(2L)._2 === 1L && out(2L)._3 === 5L)
    assert(out(3L)._2 === 0L, "clean doc lost a chunk")
    // a doc that is ALL boilerplate rewrites to the empty text
    val dup = Seq((1L, banner, "en"), (2L, banner, "en")).toDF("doc_id", "text", "lang")
    val gone = graft.operators.Cleaning.rewriteRaw(dup).collect()
    gone.foreach { r =>
      assert(r.getLong(3) === 0L)
      assert(r.getString(4) === "d41d8cd98f00b204e9800998ecf8427e") // md5("")
    }
  }

  test("fuzzy decontamination catches the exact AND truncated eval copies the id carve plants") {
    val hits = Contamination.fuzzyContaminatedDocs(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // eval docs: base ids %50==0. Their +200000 exact copies (ids %13==0 too)
    // and +100000 truncated copies (ids %7==0 too) sit in the train side.
    val evalIds = docs.filter(col("doc_id") % 50 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exactCopies = evalIds.filter(_ % 13 == 0).map(_ + 200000)
    val nearCopies = evalIds.filter(_ % 7 == 0).map(_ + 100000)
    exactCopies.foreach { id =>
      assert(hits.get(id).contains(1.0), s"exact eval copy $id not flagged at 1.0")
    }
    nearCopies.foreach { id =>
      assert(hits.contains(id) && hits(id) >= 0.5, s"truncated eval copy $id not flagged")
    }
  }

  test("tf-idf zeroes ubiquitous tokens and ranks a doc's rare tokens first") {
    import spark.implicits._
    val synth = Seq(
      (1L, "shared shared rare1 rare1 rare1 solo", "en"),
      (2L, "shared rare2 filler", "en"),
      (3L, "shared filler filler", "en")
    ).toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.tfidfTop(synth, topK = 10).collect()
      .map(r => (r.getLong(0), r.getString(2)) -> (r.getLong(1), r.getLong(5))).toMap
    // 'shared' is in every doc: idf = ln(4/4) = 0 -> score exactly 0
    assert(rows((1L, "shared"))._2 === 0L)
    // doc 1's top term is the tripled rare1, not the higher-df shared
    assert(rows((1L, "rare1"))._1 === 1L)
    assert(rows((1L, "rare1"))._2 > rows((1L, "solo"))._2)
  }

  test("nb calibration deciles partition the corpus and score-order tracks the label") {
    val rows = TextAnalysis.nbCalibration(docs).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
    assert(rows.map(_.getLong(1)).sum === docs.count())
    // the top margin decile must be at least as keep-heavy as the bottom —
    // a flat or inverted calibration means the score carries no signal
    val byDecile = rows.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(byDecile(1L) > byDecile(10L),
      s"calibration flat/inverted: top=${byDecile(1L)} bottom=${byDecile(10L)}")
  }
}
