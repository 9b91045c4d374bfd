package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.ConsumerOps

/** The reference's `verify:*` batch analytics (SURVEY §3.4, Rakefile:128-651):
  * re-derive authoritative expectations and set-compare them against the
  * materialized keyspace. Every check returns a mismatch frame — EMPTY means
  * verified (the Rakefile exits non-zero on any row; callers do the same).
  * All set algebra is distributed (except/left_anti) — nothing collects.
  */
object VerifyJobs {

  /** Mainnet trx-set verification (Rakefile:247-264): per block, the trx ids
    * recovered from keys must equal the block's transaction_ids. Virtual
    * sentinel keys are excluded exactly like the reference (Rakefile:234). */
  def verifyBlockTrxs(keyed: DataFrame, blocks: DataFrame): DataFrame = {
    // a real `{chain}:*` sweep picks up the checkpoint and pending-summary
    // control keys: those decompose to a null block segment and must not
    // surface as "extra" corruption (the reference excludes them by shape,
    // meeseeker_test.rb:36)
    val actual = ConsumerOps.splitKeys(keyed)
      .filter(col("block_num_k").isNotNull &&
        col("trx_index_k").isNotNull &&
        col("trx_id_k") =!= graft.model.Model.VirtualTrxId)
      .select(col("block_num_k").as("block_num"), col("trx_id_k").as("trx_id"))
    // only op-producing transactions materialize keys (a zero-op trx never
    // yields in the reference either) — zip ids with their transactions and
    // keep those with operations
    val expected = blocks
      .select(col("block_num"),
        explode(arrays_zip(col("transaction_ids"), col("transactions"))).as("z"))
      .filter(size(col("z.transactions.operations")) > 0)
      .select(col("block_num"), col("z.transaction_ids").as("trx_id"))
    ConsumerOps.verifyTrxSets(actual, expected)
  }

  /** Sidechain -> mainnet cross-check (Rakefile:419-493): every engine
    * transaction's ref block must exist on the mainnet side. Output: engine
    * trxs whose ref block is missing (empty == verified). */
  def verifyEngineRefBlocks(engineTrxs: DataFrame, mainnetBlocks: DataFrame): DataFrame =
    engineTrxs
      .withColumn("ref_block",
        coalesce(col("refHiveBlockNumber"), col("refSteemBlockNumber")))
      .join(
        mainnetBlocks.select(col("block_num").as("ref_block")),
        Seq("ref_block"), "left_anti")
      .select("ref_block", "transactionId", "contract", "action")

  /** The reference's sampled spot check (meeseeker_test.rb:43-59): k random
    * keys (fixed seed), each data key's (block, trx) pair must exist
    * authoritatively. Virtual-sentinel and control keys are excluded from
    * the sample by shape (as the reference's test does) — the authoritative
    * set contains only OP-PRODUCING transaction ids, so a phantom sentinel
    * or zero-op-trx key cannot pass. Output: sampled data keys with a
    * `found` flag; all-true == verified. */
  def sampledMembership(keyed: DataFrame, blocks: DataFrame, k: Int, seed: Long): DataFrame = {
    val sample = ConsumerOps.splitKeys(ConsumerOps.sampleKeys(keyed, k, seed))
      .filter(col("block_num_k").isNotNull &&
        col("trx_index_k").isNotNull &&
        col("trx_id_k") =!= graft.model.Model.VirtualTrxId)
      .select(col("block_num_k").as("block_num"), col("trx_id_k").as("trx_id"))
    val authoritative = blocks
      .select(col("block_num"),
        explode(arrays_zip(col("transaction_ids"), col("transactions"))).as("z"))
      .filter(size(col("z.transactions.operations")) > 0)
      .select(col("block_num"), col("z.transaction_ids").as("trx_id"))
    ConsumerOps.membership(sample, authoritative)
  }
}
