package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.export.{EraStateManager, IncrementalExporter, Sinks}
import graft.testkit.EraFixtures

/** End-to-end crash–resume over the incremental multi-era export (the
  * reference's atomic per-era protocol, clickhouse_exporter.py:37-82):
  * a run hard-killed mid-sequence — AFTER some eras completed, WHILE one
  * era is mid-flight with a torn partial output — must, on re-run against
  * the same state dir, process exactly the non-completed eras and land
  * byte-equal table contents to a run that was never interrupted. */
class CrashResumeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** An Error (NOT an Exception): the per-era failure handler must not
    * catch it, so it kills the whole run like a JVM death would. */
  private class SimulatedCrash extends Error("simulated mid-run death")

  private def listPartFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  private def tableRows(path: String): Seq[String] =
    spark.read.parquet(path).collect().toSeq
      .map(_.toSeq.mkString("|")).sorted

  test("hard kill after era k resumes to exactly the uninterrupted run's tables") {
    val eraDir = EraFixtures.ensureGenerated()
    val files: Map[Long, String] = new java.io.File(eraDir).listFiles().toSeq
      .filter(_.getName.endsWith(".era"))
      .map(f => f.getName.split("-")(1).toLong -> f.getAbsolutePath).toMap
    val eras = files.keys.toSeq.sorted
    assert(eras.size >= 5, "need a multi-era corpus to interrupt meaningfully")
    def loadEra(era: Long) = spark.read.format("era").load(files(era))

    // ── reference: one uninterrupted run ───────────────────────────────
    val outA = Files.createTempDirectory("graft-crash-a").toString
    val stateA = new EraStateManager(spark,
      Files.createTempDirectory("graft-crash-state-a").toString)
    val procA = IncrementalExporter.run(
      spark, stateA, "gnosis", eras, s"$outA/out.parquet")(loadEra)
    assert(procA === eras)

    // ── the crashing run: dies loading era k (eras 0..k-1 completed) ───
    val outB = Files.createTempDirectory("graft-crash-b").toString
    val stateDirB = Files.createTempDirectory("graft-crash-state-b").toString
    val k = 3
    val survivors = eras.take(k).toSet
    intercept[SimulatedCrash] {
      IncrementalExporter.run(spark, new EraStateManager(spark, stateDirB),
          "gnosis", eras, s"$outB/out.parquet") { era =>
        if (!survivors.contains(era)) throw new SimulatedCrash
        loadEra(era)
      }
    }
    // the dying era started but never completed — its latest state is
    // `processing`, which the resume's anti-join treats as to-do
    val crashedState = new EraStateManager(spark, stateDirB)
    val statusAtCrash = crashedState.eraStatus
      .filter(org.apache.spark.sql.functions.col("era_number") === eras(k))
      .select("status").collect().map(_.getString(0)).toSeq
    assert(statusAtCrash === Seq("processing"))

    // simulate the torn write a kill can leave: garbage parquet at the
    // dying era's blocks output path (resume must clobber it — overwrite
    // mode + era-scoped names are the idempotence mechanism)
    val tornPath = Sinks.datasetFilename(
      Sinks.eraOutputFilename(s"$outB/out.parquet", eras(k).toInt), "blocks")
    spark.range(5).toDF("garbage").write.mode("overwrite").parquet(tornPath)

    // fingerprint a COMPLETED era's output to prove resume never re-runs it
    val doneBlocksDir = Sinks.datasetFilename(
      Sinks.eraOutputFilename(s"$outB/out.parquet", eras.head.toInt), "blocks")
    val doneMtimes = listPartFiles(doneBlocksDir)
      .map(f => f.getName -> f.lastModified()).toMap
    assert(doneMtimes.nonEmpty)

    // ── resume: a FRESH manager over the same state dir ────────────────
    val procResume = IncrementalExporter.run(
      spark, new EraStateManager(spark, stateDirB),
      "gnosis", eras, s"$outB/out.parquet")(loadEra)
    assert(procResume === eras.drop(k),
      "resume must process exactly the non-completed eras, in order")

    // exactly-once per era: the completed era's files were not rewritten
    val after = listPartFiles(doneBlocksDir)
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after === doneMtimes, "resume re-ran an already-completed era")

    // ── equality: interrupted+resumed ≡ uninterrupted, file for file ───
    val tablesA = new java.io.File(outA).listFiles().toSeq.map(_.getName).sorted
    val tablesB = new java.io.File(outB).listFiles().toSeq.map(_.getName).sorted
    assert(tablesA === tablesB)
    tablesA.foreach { name =>
      if (name.endsWith(".parquet"))
        assert(tableRows(s"$outA/$name") === tableRows(s"$outB/$name"),
          s"$name contents differ after crash-resume")
      else if (name.endsWith("_SUMMARY.txt"))
        assert(
          new String(Files.readAllBytes(java.nio.file.Paths.get(s"$outA/$name")), "UTF-8")
            === new String(Files.readAllBytes(java.nio.file.Paths.get(s"$outB/$name")), "UTF-8"),
          s"$name differs after crash-resume")
    }
    // both state logs agree on the terminal view: every era completed
    Seq(stateA, new EraStateManager(spark, stateDirB)).foreach { st =>
      val done = st.completedEras("gnosis").collect().map(_.getLong(0)).sorted.toSeq
      assert(done === eras)
    }
  }
}
