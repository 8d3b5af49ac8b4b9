package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object NgramBisect {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(label: String)(body: => Long): Unit = {
      body
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-40s $r%10d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val aug = graft.operators.Dedup.augmentedDocs(docs)
    time("aug count") { aug.count() }
    val sh = aug.filter(size(col("toks")) >= 3)
      .withColumn("sh", expr(
        """array_distinct(transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))""".stripMargin))
    time("shingles count") { sh.count() }
    val shl = sh.withColumn("shl", expr("array_sort(array_distinct(transform(sh, s -> hash64(s))))"))
    time("hashed shingles count") { shl.count() }
    time("hashed shingles forced") { shl.select(sum(size(col("shl")))).collect()(0).getLong(0) }
    val withKeys = shl.select(col("doc_id"), col("lang"),
      element_at(col("toks"), 1).as("tok0"), col("shl"))
      .withColumn("nsh", size(col("shl")))
    val a = withKeys.as("a"); val b = withKeys.as("b")
    val joined = a.join(b, col("a.lang") === col("b.lang") &&
      col("a.tok0") === col("b.tok0") && col("a.doc_id") < col("b.doc_id"))
    time("join count (no kernel)") { joined.count() }
    time("join + sorted_overlap") {
      joined.withColumn("common", call_function("sorted_overlap", col("a.shl"), col("b.shl")))
        .select(sum(col("common"))).collect()(0).getLong(0)
    }
    time("full query") { graft.operators.Dedup.ngramJaccard(docs).count() }
    spark.stop()
  }
}
// appended experiment
object NgramBarrier {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def run(): Long = {
      val sh = graft.operators.Dedup.augmentedDocs(docs)
        .filter(size(col("toks")) >= 3)
        .withColumn("sh", expr(
          """array_distinct(transform(sequence(0, size(toks) - 3),
            |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))""".stripMargin))
        .select(col("doc_id"), col("lang"), element_at(col("toks"), 1).as("tok0"),
          expr("array_sort(array_distinct(transform(sh, s -> hash64(s))))").as("shl"))
        .withColumn("nsh", size(col("shl")))
      val a = sh.as("a"); val b = sh.as("b")
      a.join(b, col("a.lang") === col("b.lang") &&
          col("a.tok0") === col("b.tok0") && col("a.doc_id") < col("b.doc_id"))
        .withColumn("common", call_function("sorted_overlap", col("a.shl"), col("b.shl")))
        .withColumn("_b", monotonically_increasing_id()) // pushdown barrier
        .withColumn("jaccard", col("common").cast("double") / (col("a.nsh") + col("b.nsh") - col("common")))
        .filter(col("jaccard") >= 0.6)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .count()
    }
    run()
    val t0 = System.nanoTime()
    val n = run()
    println(f"barrier version: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
