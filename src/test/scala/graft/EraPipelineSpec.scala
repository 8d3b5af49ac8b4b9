package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Normalizer
import graft.testkit.EraFixtures

/**
 * End-to-end era pipeline: e2store files on disk → format("era") scan →
 * decode → the 15 normalized tables. Golden row counts come from the RPC
 * fixtures' child-array sizes (FIXTURES.md §2).
 */
class EraPipelineSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val eraDir = EraFixtures.ensureGenerated()
  private lazy val records = spark.read.format("era").load(eraDir)
  private lazy val blocks = Normalizer.decodeBlocks(records).cache()
  private val mapper = new ObjectMapper()

  private val nFixtures = EraFixtures.fixtures.size // 5 reference + 2 synthetic forks

  test("era scan reads all records with type dispatch (S1)") {
    val byType = records.groupBy("record_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("block") == nFixtures)
    assert(byType("state") == nFixtures)
    // two per file since r13: block SlotIndex + state SlotIndex (the
    // real e2store group shape, with offsets the fast path seeks through)
    assert(byType("index") == 2 * nFixtures)
  }

  test("era scan derives filename metadata (S5)") {
    val eras = records.select("era_number", "network").distinct().collect()
    assert(eras.forall(_.getString(1) == "gnosis"))
    assert(eras.map(_.getLong(0)).sorted.toSeq ==
      EraFixtures.fixtures.map(_._2 / 8192).distinct.sorted)
  }

  test("file-level pruning on era_number skips files (P3)") {
    val deneb = 16383000L / 8192 // era 1999
    val onlyOne = spark.read.format("era").load(eraDir)
      .filter(col("era_number") === deneb)
    assert(onlyOne.select("slot").filter(col("record_type") === "block")
      .collect().map(_.getLong(0)).toSeq == Seq(16383000L))
  }

  test("decode produces one block per fixture with correct forks") {
    val got = blocks.select("slot", "version").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == EraFixtures.fixtures.map(f => f._2 -> f._3).toMap)
  }

  test("the 15 normalized tables have fixture-derived row counts") {
    // golden counts come from the AUGMENTED fixture JSON (the era files'
    // source of truth), so injected deposits/exits/slashings/blobs/requests
    // must all survive the full scan → decode → flatten pipeline
    val expected = EraFixtures.fixtures.map { case (name, slot, _) =>
      val body = EraFixtures.fixtureJson(name).get("message").get("body")
      def n(f: String) = Option(body.get(f)).map(_.size()).getOrElse(0)
      def nReq(f: String) = Option(body.get("execution_requests"))
        .map(er => Option(er.get(f)).map(_.size()).getOrElse(0)).getOrElse(0)
      slot -> Map(
        "attestations" -> n("attestations"),
        "deposits" -> n("deposits"),
        "voluntary_exits" -> n("voluntary_exits"),
        "proposer_slashings" -> n("proposer_slashings"),
        "attester_slashings" -> n("attester_slashings"),
        "bls_changes" -> n("bls_to_execution_changes"),
        "blob_commitments" -> n("blob_kzg_commitments"),
        "transactions" -> Option(body.get("execution_payload"))
          .map(p => Option(p.get("transactions")).map(_.size()).getOrElse(0)).getOrElse(0),
        "withdrawals" -> Option(body.get("execution_payload"))
          .flatMap(p => Option(p.get("withdrawals")).map(_.size())).getOrElse(0),
        "sync_aggregates" -> Option(body.get("sync_aggregate")).map(_ => 1).getOrElse(0),
        "execution_payloads" -> Option(body.get("execution_payload")).map(_ => 1).getOrElse(0),
        "deposit_requests" -> nReq("deposits"),
        "withdrawal_requests" -> nReq("withdrawals"),
        "consolidation_requests" -> nReq("consolidations"))
    }.toMap

    assert(Normalizer.blocksTable(blocks).count() == nFixtures)
    expected.foreach { case (slot, tables) =>
      tables.foreach { case (tableName, n) =>
        val got = Normalizer.dataset(blocks, tableName)
          .filter(col("slot") === slot).count()
        assert(got == n, s"$tableName@$slot: got $got, fixture has $n")
      }
    }
    // the rare families must be non-empty SOMEWHERE now — guard against the
    // injection silently regressing to empty corpora
    Seq("deposits", "voluntary_exits", "proposer_slashings", "attester_slashings",
      "blob_commitments", "deposit_requests", "withdrawal_requests",
      "consolidation_requests").foreach { t =>
      assert(Normalizer.dataset(blocks, t).count() > 0, s"$t should be non-empty")
    }
  }

  test("attester slashing flatten computes the distinct-union slashed count (A3)") {
    val rows = Normalizer.attesterSlashings(blocks)
      .filter(col("slot") === 98300L).collect()
    assert(rows.length == 1)
    val r = rows.head
    // injected overlap: [0,1,2] vs [1,2,3] → distinct union 4, naive sum 6
    assert(r.getAs[Long]("att_1_validator_count") == 3)
    assert(r.getAs[Long]("att_2_validator_count") == 3)
    assert(r.getAs[Long]("total_slashed_validators") == 4)
    assert(r.getAs[String]("att_1_attesting_indices") == "[0,1,2]")
  }

  test("attestations table values match the fixture (spot check)") {
    val rpc = mapper.readTree(new java.io.File(s"${EraFixtures.fixtureDir}/gnosis_98300_rpc.json"))
    val att0 = rpc.get("data").get("message").get("body").get("attestations").get(0)
    val row = Normalizer.attestations(blocks)
      .filter(col("slot") === 98300L && col("attestation_index") === 0)
      .collect().head
    assert(row.getAs[Long]("attestation_slot") == att0.get("data").get("slot").asText().toLong)
    assert(row.getAs[String]("beacon_block_root") == att0.get("data").get("beacon_block_root").asText())
    assert(row.getAs[String]("aggregation_bits") == att0.get("aggregation_bits").asText())
    assert(row.getAs[Long]("source_epoch") == att0.get("data").get("source").get("epoch").asText().toLong)
  }

  test("sync_aggregates computes the popcount the reference never did") {
    val rpc = mapper.readTree(new java.io.File(s"${EraFixtures.fixtureDir}/gnosis_98300_rpc.json"))
    val bits = rpc.get("data").get("message").get("body").get("sync_aggregate")
      .get("sync_committee_bits").asText()
    val expected = graft.functions.HexPopcount.count(bits)
    val row = Normalizer.syncAggregates(blocks)
      .filter(col("slot") === 98300L).collect().head
    assert(row.getAs[Long]("participating_validators") == expected)
    assert(expected > 0)
  }

  test("execution_payloads keeps base_fee_per_gas as exact decimal string") {
    val rpc = mapper.readTree(new java.io.File(s"${EraFixtures.fixtureDir}/gnosis_16383000_rpc.json"))
    val exp = rpc.get("data").get("message").get("body").get("execution_payload")
      .get("base_fee_per_gas").asText()
    val row = Normalizer.executionPayloads(blocks)
      .filter(col("slot") === 16383000L).collect().head
    assert(row.getAs[String]("base_fee_per_gas") == exp)
    assert(row.getAs[Long]("blob_gas_used") >= 0) // deneb fields present
  }

  test("wide-blocks flatten has the reference's 49-column shape") {
    // export/base.py:84-150 emits exactly 49 keys
    val wide = Normalizer.wideBlocks(blocks)
    assert(wide.columns.length == 49, s"got ${wide.columns.length}: ${wide.columns.mkString(",")}")
    val row = wide.filter(col("slot") === 16383000L).collect().head
    assert(row.getAs[Long]("attestation_count") > 0)
    assert(row.getAs[Long]("transaction_count") ==
      Normalizer.transactions(blocks).filter(col("slot") === 16383000L).count())
  }

  test("single-block point lookup via slot filter (P1)") {
    val one = Normalizer.blocksTable(blocks).filter(col("slot") === 300L).collect()
    assert(one.length == 1)
    assert(one.head.getAs[String]("version") == "phase0")
  }

  test("slot pruning plans only the matching file; era_point_lookup exercises it") {
    import graft.sources.{EraFilePruning, EraFileInfo}
    val all = spark.read.format("era").load(eraDir)
      .queryExecution.executedPlan.toString
    val pruned = spark.read.format("era").load(eraDir)
      .filter(col("slot") === 98300L)
    // the source-level scan keeps exactly the era-11 file (+ none others)
    val rdd = pruned.queryExecution.toRdd
    assert(rdd.getNumPartitions === 1,
      s"slot predicate should prune to 1 era file, planned ${rdd.getNumPartitions}")
    assert(all.contains("EraScan"))
    // the registered P1 query goes through the same source-level path
    val rows = SparkEntry.queries("era_point_lookup")(spark, "unused").collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("slot") === 98300L)
  }

  test("a narrow slot RANGE prunes to its era's file; era_slot_range exercises it") {
    // r14: two AND-ed comparison bounds must file-prune exactly like an
    // equality — only the era-11 fixture file survives the [98299, 98301]
    // window — and the registered query answers through that plan
    val pruned = spark.read.format("era").load(eraDir)
      .filter(col("slot") >= 98299L && col("slot") <= 98301L)
    assert(pruned.queryExecution.toRdd.getNumPartitions === 1,
      "range bounds should prune to 1 era file")
    val rows = SparkEntry.queries("era_slot_range")(spark, "unused").collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("slot") === 98300L)
  }

  test("a multi-group era file runs the FULL pipeline: decode → 15 tables → warehouse loop, group-sum-identical") {
    // era := group+ (docs/ERA_FILE_FORMAT.md:31-38): SlotIndexSpec covers
    // multi-group POINT LOOKUP, but nothing drove a two-group file through
    // decodeBlocks → the 15-table fan-out → the warehouse loop (VERDICT
    // r14 #6). The sequential walk must treat the second group's leading
    // Version record as a separator, not a truncation — pinned by every
    // table count equaling the sum of the two groups written as
    // single-group twin files.
    import java.io.{BufferedOutputStream, FileOutputStream}
    import graft.sources.EraFileWriter
    import graft.ssz.{SnappyFramed, Ssz}
    import graft.testkit.SszEncoder

    val era = 11L
    val startSlot = era * 8192
    val half = 4096
    val ssz = SszEncoder.encodeSignedBlock(
      EraFixtures.fixtureJson("gnosis_98300"), "altair")
    val msgOff = Ssz.readUint32(ssz, 0).toInt
    def blockAt(slot: Long): (Long, Array[Byte]) = {
      val b = ssz.clone()
      var j = 0
      while (j < 8) { b(msgOff + j) = ((slot >>> (8 * j)) & 0xff).toByte; j += 1 }
      slot -> SnappyFramed.compress(b)
    }
    val g1 = EraFileWriter.EraGroup((0 until 64).map(i => blockAt(startSlot + 2L * i)),
      Some((startSlot + half, Array[Byte](7, 7))), startSlot, half)
    val g2 = EraFileWriter.EraGroup((0 until 64).map(i => blockAt(startSlot + half + 2L * i)),
      Some((startSlot + 8192L, Array[Byte](8, 8))), startSlot + half, half)
    def writeEra(dir: java.nio.file.Path, name: String, gs: Seq[EraFileWriter.EraGroup]): String = {
      val f = new java.io.File(dir.toFile, name)
      val out = new BufferedOutputStream(new FileOutputStream(f), 1 << 20)
      try EraFileWriter.writeGroups(out, gs) finally out.close()
      f.getAbsolutePath
    }
    val dir = java.nio.file.Files.createTempDirectory("mg-pipeline")
    val multiPath = writeEra(dir, f"gnosis-$era%05d-3c3c3c3c.era", Seq(g1, g2))
    val twinDir = java.nio.file.Files.createTempDirectory("mg-pipeline-twins")
    writeEra(twinDir, f"gnosis-$era%05d-01010101.era", Seq(g1))
    val twinDir2 = java.nio.file.Files.createTempDirectory("mg-pipeline-twins2")
    writeEra(twinDir2, f"gnosis-$era%05d-02020202.era", Seq(g2))

    def decoded(path: String) =
      Normalizer.decodeBlocks(spark.read.format("era").load(path))
    val multi = decoded(multiPath).cache()
    val t1 = decoded(twinDir.toString)
    val t2 = decoded(twinDir2.toString)
    assert(multi.count() === 128L, "decode must see every block across both groups")

    // every normalized table: multi-group count == sum of the twin files'
    Normalizer.datasetNames.foreach { t =>
      val m = Normalizer.dataset(multi, t).count()
      val s = Normalizer.dataset(t1, t).count() + Normalizer.dataset(t2, t).count()
      assert(m === s, s"$t: multi-group $m rows vs twin-sum $s")
    }
    assert(Normalizer.wideBlocks(multi).count() === 128L)

    // …and through the WAREHOUSE loop: the production contract end to end
    val root = java.nio.file.Files.createTempDirectory("mg-wh").toString
    val state = java.nio.file.Files.createTempDirectory("mg-whstate").toString
    val done = graft.export.IncrementalExporter.runWarehouse(spark,
      new graft.export.EraStateManager(spark, state), "gnosis",
      Seq(era), root) { _ => spark.read.format("era").load(multiPath) }
    assert(done === Seq(era))
    val whBlocks = spark.read.parquet(s"$root/gnosis/blocks")
    assert(whBlocks.count() === 128L,
      "warehouse blocks table must carry both groups' rows")
    assert(whBlocks.select(col("era_number").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(era))
    val whAtt = spark.read.parquet(s"$root/gnosis/attestations").count()
    assert(whAtt === Normalizer.dataset(multi, "attestations").count())
    multi.unpersist()
  }

  test("a non-convention filename never drives slot pruning (unsound-prune guard)") {
    import graft.sources.{EraFilePruning, EraFileInfo}
    val weird = EraFileInfo.fromPath("/data/snapshot.era")
    assert(!weird.eraKnown)
    // filename implies era 0 → slots [0, 8191]; a slot=98300 filter would
    // have pruned the file under the old arithmetic and silently dropped
    // the payload rows that DO match
    val f: org.apache.spark.sql.sources.Filter =
      org.apache.spark.sql.sources.EqualTo("slot", 98300L)
    assert(EraFilePruning.keepFile(weird, Array(f)),
      "slot predicates must not prune files whose era is guessed")
    // a parsed filename still prunes
    val known = EraFileInfo.fromPath(s"/data/gnosis-00000-abcd1234.era")
    assert(known.eraKnown)
    assert(!EraFilePruning.keepFile(known, Array(f)))
    // era_number predicates stay prunable either way (rows inherit the
    // filename-derived value, so the comparison is consistent)
    val e: org.apache.spark.sql.sources.Filter =
      org.apache.spark.sql.sources.EqualTo("era_number", 5L)
    assert(!EraFilePruning.keepFile(weird, Array(e)))

    // r14 overflow guard: an era number past Long.MaxValue/8192 would wrap
    // startSlot/endSlot (era·8192) and poison slot pruning with wrapped
    // bounds — such names must be treated as UNKNOWN (no slot pruning)
    val huge = EraFileInfo.fromPath("/data/gnosis-1200000000000000000-ab.era")
    assert(!huge.eraKnown, "overflowing era number must not be trusted")
    assert(EraFilePruning.keepFile(huge, Array(f)),
      "wrapped slot bounds must never prune a file")
    // the cap boundary itself stays sane and known
    val capped = EraFileInfo.fromPath(s"/data/gnosis-${(1L << 40) - 1}-ab.era")
    assert(capped.eraKnown && capped.startSlot > 0 &&
      capped.endSlot > capped.startSlot)
  }
}
