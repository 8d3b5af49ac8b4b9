package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config.Networks
import graft.decode.BlockDecoder

/** Where does era decode wall-time go in the Spark path? Separates scan,
  * raw decode (no result encoding), and full Dataset[DecodedBlock]. */
object SparkDecodeProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (dir, n) = graft.testkit.BenchEras.ensureGenerated()
    val records = spark.read.format("era").load(dir)

    def time(label: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $r%10d rows  $dt%8.3f s  ${r / dt}%10.0f rows/s")
    }

    // per-fork split on the same deep corpus as the bench headline: for
    // each fork, scan-only vs decode-no-encode vs full encode — names the
    // layer (scan / parse kernel / row encode) a slow fork is losing in
    if (args.contains("forks")) {
      val (deepDir, _) = graft.testkit.BenchEras.ensureGenerated(
        dir = "target/bench-eras-deep", filesPerFork = 32, blocksPerFile = 512)
      val forkEras = Seq("phase0" -> 0L, "altair" -> 11L, "bellatrix" -> 756L,
        "capella" -> 1267L, "deneb" -> 1999L, "electra" -> 2613L)
      forkEras.foreach { case (fork, era) =>
        val f = spark.read.format("era").load(f"$deepDir/gnosis-$era%05d-*.era")
        println(s"── $fork ──")
        time("  scan only (count)") { f.count() }
        time("  scan+decode, no encode") {
          f.filter(col("record_type") === "block")
            .select("slot", "data", "network", "era_number", "source_file")
            .as[(Long, Array[Byte], String, Long, String)]
            .mapPartitions { it =>
              var c = 0L
              it.foreach { case (slot, data, net, eraN, file) =>
                BlockDecoder.decode(data, slot, Networks(net), eraN, file).foreach(_ => c += 1)
              }
              Iterator.single(c)
            }.reduce(_ + _)
        }
        time("  full decodeBlocks") {
          graft.operators.Normalizer.decodeBlocks(f).count()
        }
      }
      spark.stop()
      return
    }

    time("scan only (count)") { records.count() }
    time("scan + decode, no encode") {
      records.filter(col("record_type") === "block")
        .select("slot", "data", "network", "era_number", "source_file")
        .as[(Long, Array[Byte], String, Long, String)]
        .mapPartitions { it =>
          var c = 0L
          it.foreach { case (slot, data, net, era, file) =>
            BlockDecoder.decode(data, slot, Networks(net), era, file).foreach(_ => c += 1)
          }
          Iterator.single(c)
        }.reduce(_ + _)
    }
    time("full decodeBlocks (encode)") {
      graft.operators.Normalizer.decodeBlocks(records).count()
    }
    spark.stop()
  }
}
