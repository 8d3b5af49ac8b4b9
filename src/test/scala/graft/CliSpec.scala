package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.EraFixtures

/** CLI verb surface (cli.py:8-54 shape). Each test drives Cli.main
  * end-to-end; Cli owns (and stops) its SparkSession. */
class CliSpec extends AnyFunSuite {

  private lazy val eraDir = EraFixtures.ensureGenerated()

  private def captureOut(body: => Unit): String = {
    val bos = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(bos)) {
      val old = System.out
      System.setOut(new PrintStream(bos))
      try body finally System.setOut(old)
    }
    bos.toString("UTF-8")
  }

  test("block verb prints beacon-API JSON for the requested slot") {
    val out = captureOut {
      Cli.main(Array(eraDir, "block", "98300"))
    }
    assert(out.contains("\"slot\":\"98300\""))
    assert(out.contains("\"sync_aggregate\"")) // altair body present
  }

  test("all-blocks --separate fans out the datasets with reference naming") {
    val dir = Files.createTempDirectory("cli-out").toString
    val out = captureOut {
      Cli.main(Array(eraDir, "all-blocks", s"$dir/out.parquet", "--separate"))
    }
    assert(out.contains("blocks: 8 records")) // 8 fixture eras, 1 block each
    assert(Files.exists(Paths.get(s"$dir/out_blocks.parquet")))
    assert(Files.exists(Paths.get(s"$dir/out_attestations.parquet")))
    assert(Files.exists(Paths.get(s"$dir/out_SUMMARY.txt")))
  }

  test("--export-jdbc routes a dataset into a JDBC table (S15 path)") {
    val db = Files.createTempDirectory("cli-derby").toString + "/db"
    val out = captureOut {
      Cli.main(Array(eraDir, "attestations", "--export-jdbc", s"jdbc:derby:$db;create=true"))
    }
    assert(out.contains("attestations: exported to jdbc"))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val n = spark.read.jdbc(s"jdbc:derby:$db", "attestations", new java.util.Properties()).count()
    assert(n > 0)
  }

  test("value-taking flags may precede positionals without shifting them") {
    val db = Files.createTempDirectory("cli-derby2").toString + "/db"
    val out = captureOut {
      Cli.main(Array("--export-jdbc", s"jdbc:derby:$db;create=true", eraDir, "attestations"))
    }
    assert(out.contains("attestations: exported to jdbc"))
  }

  test("dataset verb writes a single dataset") {
    val dir = Files.createTempDirectory("cli-out2").toString
    val out = captureOut {
      Cli.main(Array(eraDir, "attestations", s"$dir/att.csv"))
    }
    assert(out.contains("attestations:"))
    assert(Files.exists(Paths.get(s"$dir/att.csv")))
  }

  test("--strict-decode routes the single-table verb through the full parse, value-identical on clean input") {
    // the ADVICE r13 parity flag: pruned (default) and strict extract the
    // same rows on well-formed blocks; strict additionally restores the
    // reference's drop-on-corruption semantics (SectionPruningSpec pins
    // the divergent-corruption case at the decoder level)
    val dir = Files.createTempDirectory("cli-strict").toString
    captureOut {
      Cli.main(Array(eraDir, "attestations", s"$dir/pruned.csv"))
      Cli.main(Array(eraDir, "attestations", s"$dir/strict.csv", "--strict-decode"))
    }
    def lines(p: String): Seq[String] = {
      val f = new java.io.File(p)
      val files = if (f.isDirectory) f.listFiles().toSeq else Seq(f)
      files.filter(_.getName.endsWith(".csv"))
        .flatMap(x => scala.io.Source.fromFile(x).getLines().toSeq)
    }
    assert(lines(s"$dir/pruned.csv").sorted === lines(s"$dir/strict.csv").sorted)
  }

  test("query verb lists the surface, prints a result, and writes through the sink layer") {
    val listed = captureOut { Cli.main(Array("query", "list")) }
    assert(listed.linesIterator.contains("dedup_exact"))
    assert(listed.linesIterator.contains("cur_funnel"))
    val shown = captureOut {
      Cli.main(Array("query", "cur_source_mix", "/root/testdata/sf0.001"))
    }
    assert(shown.contains("token_share"))
    val dir = Files.createTempDirectory("cli-q").toString
    val out = captureOut {
      Cli.main(Array("query", "text_quality", "/root/testdata/sf0.001", s"$dir/q.csv"))
    }
    assert(out.contains("text_quality: 500 records"))
    assert(Files.exists(Paths.get(s"$dir/q.csv")))
  }
}
