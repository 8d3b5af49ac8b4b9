package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ForkSchedule, Networks}
import graft.operators.Normalizer
import graft.queries.EraQueries

/** End-to-end decode on the SECOND network config
  * ([[graft.testkit.MainnetEraFixture]]): filename → mainnet detection →
  * mainnet fork ladder → mainnet genesis timestamp — the non-default branch
  * of every network-parameterized constant, golden-count checked. */
class MainnetEraSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val blocks = EraQueries.mainnetBlocks(spark)

  test("both mainnet fixtures decode with network detected from the filename") {
    val rows = blocks.collect().sortBy(_.slot)
    assert(rows.length === 2)
    assert(rows.forall(_.network === "mainnet"))
    assert(rows.map(_.slot).toSeq === Seq(2400000L, 6300000L))
    assert(rows.map(_.era_number).toSeq === Seq(2400000L / 8192, 6300000L / 8192))
  }

  test("fork classification uses the MAINNET epoch ladder, which diverges from gnosis") {
    val bySlot = blocks.collect().map(b => b.slot -> b.version).toMap
    assert(bySlot(2400000L) === "altair")
    assert(bySlot(6300000L) === "capella")
    // the same slot under the gnosis ladder is a DIFFERENT fork — the
    // property that makes this fixture a real second-network test
    assert(ForkSchedule.forkAt(6300000L, Networks.gnosis) === "bellatrix")
    assert(ForkSchedule.forkAt(6300000L, Networks.mainnet) === "capella")
  }

  test("altair timestamp comes from the mainnet genesis ladder (no payload)") {
    val altair = blocks.filter(col("slot") === 2400000L).collect()(0)
    assert(altair.timestamp_utc.getTime / 1000 === 1606824023L + 2400000L * 12)
    // gnosis arithmetic on the same slot lands ~3 years away; a silent
    // network fallback cannot pass this
    assert(altair.timestamp_utc.getTime / 1000 !== 1638993340L + 2400000L * 5)
  }

  test("capella timestamp passes through the execution payload time") {
    val payloadTs = blocks.toDF()
      .filter(col("slot") === 6300000L)
      .select(col("body.execution_payload.timestamp"))
      .collect()(0).getLong(0)
    val capella = blocks.filter(col("slot") === 6300000L).collect()(0)
    assert(payloadTs > 0)
    assert(capella.timestamp_utc.getTime / 1000 === payloadTs)
  }

  test("augmented child tables carry rows on the mainnet corpus (golden counts)") {
    // altair augment: 2 voluntary exits + 1 attester slashing; capella
    // augment: 1 deposit + 1 proposer slashing; capella fixture body: >0
    // withdrawals (real RPC data)
    assert(Normalizer.dataset(blocks, "voluntary_exits").count() === 2)
    assert(Normalizer.dataset(blocks, "attester_slashings").count() === 1)
    assert(Normalizer.dataset(blocks, "deposits").count() === 1)
    assert(Normalizer.dataset(blocks, "proposer_slashings").count() === 1)
    assert(Normalizer.dataset(blocks, "withdrawals").count() > 0)
  }

  test("era_mainnet_ladder query emits the oracle-checked shape") {
    val rows = SparkEntry.queries("era_mainnet_ladder")(spark, "unused")
      .collect()
    assert(rows.length === 2)
    val altair = rows(0)
    assert(altair.getAs[String]("fork") === "altair")
    assert(altair.getAs[Long]("epoch") === 75000L)
    assert(altair.getAs[Long]("ts_epoch") === 1606824023L + 2400000L * 12)
    assert(SparkEntry.oracleSql.contains("era_mainnet_ladder"))
  }
}
