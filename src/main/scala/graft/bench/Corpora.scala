package graft.bench

import org.apache.spark.sql.SparkSession

/** The bench's synthetic corpus builders — skew soak and self-scaled
  * ramp — extracted from `graft.Bench` (VERDICT r15 #6) so the
  * adjudication layer, the corpus layer, and the measurement families
  * are separately reviewable. */
object Corpora {

  /** Build the adversarially-skewed soak corpus: `copies`× self-union of
    * `documents` where every copy appends the same boilerplate line (hot
    * chunk digests + hot SimHash buckets; each doc gains copies−1
    * byte-identical twins) and collapses onto one language, and `orders`
    * copies collapse onto one hot custkey. Returns the temp dir. */
  def soakCorpus(spark: SparkSession, sfDir: String,
      copies: Int): String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val hot = "all rights reserved subscribe to our newsletter for more updates terms of service apply to every visitor"
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until copies).map { i =>
      val c = docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
      if (i == 0) c
      else c.withColumn("text", concat(col("text"), lit(" " + hot)))
        .withColumn("lang", lit("en"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val orders0 = spark.read.parquet(s"$sfDir/orders.parquet")
    (0 until copies).map { i =>
      if (i == 0) orders0 else orders0.withColumn("o_custkey", lit(1L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** Self-scaled ramp corpus: `copies`× union of a deterministic 1/8
    * subsample of the input corpus, with DISTINCT ids and SHIFTED content —
    * the opposite of [[soakCorpus]]'s hot twins: every copy prepends a
    * copy-unique token to `text` (fresh shingles, MinHash/SimHash digests
    * and chunk hashes, so the dedup families do real work instead of
    * collapsing onto byte-twins) and nudges every embedding dimension by a
    * copy-dependent epsilon (fresh cosine structure, so cells/buckets
    * spread instead of stacking). Embedding ids are renumbered contiguously
    * after the subsample, then INTERLEAVED across copies (vec_id·copies +
    * copy), so the query (`vec_id < nQueries`) and centroid
    * (`[100, 100+k)`) id ranges are FULLY populated at every scale —
    * including deep rungs where k = centroidCount(copies·B) outgrows the
    * base subsample size B. Base is 1/8
    * of the bench corpus so the 64× rung lands at 8× the LARGEST
    * driver-provided corpus — measured scale evidence past sf0.1, not
    * plan-shape prose. */
  def rampCorpus(spark: SparkSession, sfDir: String,
      copies: Int): String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ramp$copies").toString
    // copies are fanned out through ONE broadcast crossJoin against a
    // copies-row dimension, never an N-way union: a 512-way union is
    // itself the wrong plan shape (512 scan branches, megabyte task
    // binaries, minutes of planning) — the corpus builder has to obey the
    // same scale discipline the queries do
    val copyDim = broadcast(
      spark.range(copies.toLong).select(col("id").as("copy")))
    // r16: every ramp table is written with cluster-width fan-out. The
    // base tables arrive as ONE parquet file, and a broadcast crossJoin
    // preserves the scan's partitioning — so deep rungs used to be 1–4
    // files and every downstream rung's NARROW work (shingle MD5,
    // signatures) ran on 1–4 of 32 cores: the 512× pair rungs measured
    // file-layout starvation, not operator scaling. A real corpus at this
    // size is many files; the builder must hand the rungs the same
    // fan-out a real archive would.
    val par = math.max(spark.sparkContext.defaultParallelism, 8)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 8 === 0)
    docs0.crossJoin(copyDim)
      .withColumn("doc_id", col("doc_id") + col("copy") * 100000000L)
      .withColumn("text",
        concat(lit("c"), col("copy").cast("string"), lit(" "), col("text")))
      .drop("copy")
      .repartition(par)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    val embAll = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // the ANN kernels draw queries from vec_id < 5 and centroids from
    // [100, 100+k): the renumbered 1/8 subsample only keeps that range
    // populated when the base is big enough — below it, ramp from the full
    // corpus (only reachable on tiny local runs; the sf0.1 bench samples)
    val emb0 =
      if (embAll.count() >= 1600)
        embAll.filter(col("vec_id") % 8 === 0)
          .withColumn("vec_id", row_number().over(w).cast("long") - 1)
      else embAll
    // ids are INTERLEAVED (vec_id·copies + copy), not copy-shifted: the
    // id space stays contiguous [0, copies·B), so the centroid range
    // [100, 100+k) is genuinely populated at EVERY rung even when
    // k = centroidCount(copies·B) outgrows the base subsample size B —
    // under the old copy-shift only copy 0's B ids sat below the shift,
    // so deep rungs silently measured min(k, B−100) real centroids
    emb0.crossJoin(copyDim)
      .withColumn("embedding", expr(
        "transform(embedding, (x, d) -> cast(x + ((d * 31 + copy) % 7 - 3) * cast(0.01 as double) as float))"))
      .withColumn("vec_id", col("vec_id") * copies + col("copy"))
      .drop("copy")
      .repartition(par)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // events: whole USERS sampled (sessions/attribution windows must see a
    // user's complete stream), copies disjoint in user and event ids —
    // behavioral output scales exactly linearly, so the gate is strict
    graft.queries.Tables.load(spark, sfDir, "events")
      .filter(col("user_id") % 8 === 0)
      .crossJoin(copyDim)
      .withColumn("user_id", col("user_id") + col("copy") * 100000000L)
      .withColumn("event_id", col("event_id") + col("copy") * 100000000L)
      .drop("copy")
      .repartition(par)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // lineitem: whole ORDERS sampled (baskets must stay intact), copies
    // disjoint in order AND part space — each copy is an isolated
    // co-purchase graph, so triangle work scales linearly too
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 8 === 0)
      .crossJoin(copyDim)
      .withColumn("l_orderkey", col("l_orderkey") + col("copy") * 1000000000L)
      .withColumn("l_partkey", col("l_partkey") + col("copy") * 100000000L)
      .drop("copy")
      .repartition(par)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

}
