package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Flat-vs-tree assignment crossover measurement on a FULLY-POPULATED
  * centroid range (the corrected interleaved-id ramp corpus — the r10
  * bracket behind `FlatCentroidMax` was measured before the ADVICE r10 #1
  * fix, when deep rungs silently carried min(k, B−100) real centroids;
  * r16 re-pointed the hierarchical arm at the log-tree that replaced the
  * two-level plan). For each `copies` rung: build the ramp corpus, assign
  * every vector to its nearest centroid with BOTH plans (flat broadcast
  * argmax over the collected k-row table vs the exact log-tree
  * quantizer), report wall seconds and verify the assignments agree (the
  * exactness property, double-checked here because the probe exists to
  * re-price the constant).
  *
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.CrossoverProbe 32 128 256 512"`
  */
object CrossoverProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val copiesList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(64, 256, 512)
    copiesList.foreach { copies =>
      val dir = graft.bench.Corpora.rampCorpus(spark, sfDir, copies)
      try {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val prep = graft.operators.Similarity.prepared(emb)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = prep.count() // also materializes the persist
        val k = graft.operators.Similarity.centroidCount(n)
        def best2(body: => Long): (Double, Long) =
          (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            val c = body
            ((System.nanoTime() - t0) / 1e9, c)
          }.minBy(_._1)
        val cdf = graft.operators.Similarity.centroidFrame(prep, k)
        val cents = cdf.collect().map(r =>
          (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).sortBy(_._1)
        val (flatSec, cFlat) = best2 {
          graft.operators.Similarity
            .bestCentroid(prep, cents, literal = false).count()
        }
        val (twoSec, cTwo) = best2 {
          graft.operators.Similarity.bestCentroidTree(prep, cdf, k).count()
        }
        // exactness spot-check: identical per-vector argmax on a sample
        val f = graft.operators.Similarity.bestCentroid(prep, cents, literal = false)
          .select(col("vec_id"), (-col("best.ncid")).as("cell"))
          .filter(col("vec_id") % 997 === 0)
        val t = graft.operators.Similarity.bestCentroidTree(prep, cdf, k)
          .filter(col("vec_id") % 997 === 0)
          .select(col("vec_id"), (-col("best.ncid")).as("cell"))
        val mismatches = f.as("f").join(t.as("t"), Seq("vec_id"))
          .filter(col("f.cell") =!= col("t.cell")).count()
        println(f"CROSSOVER copies=$copies n=$n k=$k " +
          f"flat=$flatSec%.2f s tree=$twoSec%.2f s rows=$cFlat/$cTwo mismatch=$mismatches")
        prep.unpersist()
      } finally graft.Bench.deleteRecursively(dir)
    }
    spark.stop()
  }
}
