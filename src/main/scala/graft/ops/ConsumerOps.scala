package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sink.KvBackend

/** Consumer-side read surface (SURVEY §2.G, §3.4): the find/reset rake tasks
  * (Rakefile:81-126) and the verify tasks' set-algebra checks
  * (Rakefile:128-651) over a keyed DataFrame or a KV backend.
  */
object ConsumerOps {

  /** `rake find:block` — all keys of one block (README.md:302). */
  def findBlock(keyed: DataFrame, chain: String, blockNum: Long): DataFrame =
    Glob.filterKeys(keyed, s"$chain:$blockNum:*")

  /** `rake find:trx` — all ops of one transaction (README.md:308). */
  def findTrx(keyed: DataFrame, chain: String, trxId: String): DataFrame =
    Glob.filterKeys(keyed, s"$chain:*:$trxId:*")

  /** `rake reset` — B5 bulk delete by prefix sweep (Rakefile:101-126). */
  def reset(backend: KvBackend, chainPrefix: String): Int =
    backend.del(backend.keys(s"$chainPrefix:*"))

  /** F2 seeded random sample-k (the reference's `keys.sample(10)` spot
    * check, meeseeker_test.rb:43): pseudo-random order from a hash of
    * (key, seed) — a pure function of the DATA, so the sample is identical
    * under any partition layout (rand(seed) is per-partition-seeded and
    * would not be). TakeOrdered — no collect of the full keyspace. */
  def sampleKeys(keyed: DataFrame, k: Int, seed: Long, keyCol: String = "key"): DataFrame =
    keyed.orderBy(md5(concat(col(keyCol), lit(seed.toString)))).limit(k)

  /** Decompose composite keys into typed columns (C14): works for both the
    * 5-part mainnet and 6-part sidechain grammars. */
  def splitKeys(keyed: DataFrame, keyCol: String = "key"): DataFrame = {
    // try_element_at + try_cast: short or non-data keys (the checkpoint and
    // control keys swept up by a `{prefix}:*` glob) yield nulls instead of
    // ANSI index/cast errors. The key column is aliased to a fixed name
    // first so arbitrary caller column names never reach SQL text.
    def part(i: Int) = s"try_element_at(split(__graft_key, ':'), $i)"
    keyed
      .withColumn("__graft_key", col(keyCol))
      .withColumn("chain", expr(part(1)))
      .withColumn("block_num_k", expr(s"try_cast(${part(2)} AS BIGINT)"))
      .withColumn("trx_id_k", expr(part(3)))
      .withColumn("trx_index_k", expr(s"try_cast(${part(4)} AS INT)"))
      .withColumn("op_type_k", expr(part(5)))
      .withColumn("action_k", expr(part(6)))
      .drop("__graft_key")
  }

  /** The verify-task oracle pattern (E1/E2, Rakefile:247-264): per-block
    * symmetric difference of actual vs expected trx-id sets. Empty result ==
    * verified. Output: (block_num, trx_id, status in missing|extra). */
  def verifyTrxSets(actual: DataFrame, expected: DataFrame): DataFrame = {
    val a = actual.select("block_num", "trx_id").distinct()
    val e = expected.select("block_num", "trx_id").distinct()
    e.except(a).withColumn("status", lit("missing"))
      .unionByName(a.except(e).withColumn("status", lit("extra")))
  }

  /** Sampled membership check (E3, meeseeker_test.rb:43-59): which sampled
    * (block_num, trx_id) pairs exist in the authoritative set. left_semi /
    * left_anti — never a collect. */
  def membership(sample: DataFrame, authoritative: DataFrame): DataFrame = {
    val in = sample.join(authoritative, Seq("block_num", "trx_id"), "left_semi")
      .withColumn("found", lit(true))
    val out = sample.join(authoritative, Seq("block_num", "trx_id"), "left_anti")
      .withColumn("found", lit(false))
    in.unionByName(out)
  }
}
