package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Model
import graft.ops.{BlockOps, EngineOps, FollowerConfig}

/** The verify-task lifecycle on fixtures: a clean pipeline run verifies;
  * induced corruption is detected. Uses BOTH fixture families together for
  * the sidechain->mainnet cross-check. */
class VerifyJobsSpec extends SparkSpec {

  private val cfg = FollowerConfig(chain = "hive")
  private def blocks = spark.read.schema(Model.blockSchema).json(resource("blocks.jsonl"))
  private def vops = spark.read.schema(Model.vopSchema).json(resource("vops.jsonl"))
  private def keyed = BlockOps.keyedOps(BlockOps.allOps(blocks, vops, cfg), cfg)

  test("clean pipeline output verifies: empty mismatch frame") {
    assert(VerifyJobs.verifyBlockTrxs(keyed.select("key"), blocks).count() === 0)
  }

  test("checkpoint and control keys in a real sweep are not flagged as corruption") {
    import spark.implicits._
    val sweep = keyed.select("key").unionByName(Seq(
      "hive:meeseeker:last_block_num",
      "hive:graft:pending_summary:3").toDF("key"))
    assert(VerifyJobs.verifyBlockTrxs(sweep, blocks).count() === 0)
  }

  test("phantom sentinel/zero-op keys cannot pass the spot check") {
    import spark.implicits._
    // block 101 has no vops; t3zzz is the zero-op trx — neither is authoritative
    val phantoms = Seq(
      s"hive:101:${"0" * 40}:0:fake", // excluded from sample by sentinel shape
      "hive:103:t3zzz:0:vote").toDF("key")
    val res = VerifyJobs.sampledMembership(phantoms, blocks, k = 10, seed = 1L).collect()
    assert(res.length === 1) // sentinel key dropped from the sample by shape
    assert(!res(0).getAs[Boolean]("found")) // zero-op trx key flagged
  }

  test("a missing and an extra key are both detected") {
    import spark.implicits._
    val corrupted = keyed.select("key")
      .filter(col("key") =!= "hive:100:t1bbb:0:transfer") // drop one trx's only op
      .unionByName(Seq("hive:101:badbeef:0:vote").toDF("key")) // inject a phantom
    val diff = VerifyJobs.verifyBlockTrxs(corrupted, blocks)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(diff === Set(("t1bbb", "missing"), ("badbeef", "extra")))
  }

  test("engine ref blocks all exist on mainnet; a bad ref is flagged") {
    val engineBlocks = spark.read.schema(Model.engineBlockSchema)
      .json(resource("engine_blocks.jsonl"))
    val trxs = EngineOps.explodeEngineTrxs(engineBlocks)
    assert(VerifyJobs.verifyEngineRefBlocks(trxs, blocks).count() === 0)
    val badTrxs = trxs.withColumn("refHiveBlockNumber",
      when(col("transactionId") === "e2ccc", lit(999999L))
        .otherwise(col("refHiveBlockNumber")))
    val bad = VerifyJobs.verifyEngineRefBlocks(badTrxs, blocks).collect()
    assert(bad.length === 1)
    assert(bad(0).getAs[Long]("ref_block") === 999999L)
  }

  test("sampled membership spot check: all sampled data keys found (fixed seed)") {
    val res = VerifyJobs.sampledMembership(keyed.select("key"), blocks, k = 5, seed = 42L)
      .collect()
    // sentinel keys in the sample are skipped by shape (like the reference
    // test), so up to k data keys come back — every one must be found
    assert(res.length >= 1 && res.length <= 5)
    assert(res.forall(_.getAs[Boolean]("found")))
  }
}
