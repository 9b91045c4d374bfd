package graft.model

import org.apache.spark.sql.types._

/** Schemas for the chain-follower data model (SURVEY.md §1).
  *
  * Typed where the reference is typed (the envelopes the code actually
  * touches), dynamic where it is dynamic: op/payload bodies stay raw JSON
  * strings (`value`, `payload`), parsed on demand with get_json_object —
  * mirroring the reference's schemaless `op["value"]` access
  * (block_follower_job.rb:87) without freezing an open union into a schema.
  */
object Model {

  /** 40-zero sentinel transaction id for virtual ops (meeseeker.rb:23). */
  val VirtualTrxId: String = "0" * 40

  /** Checkpoint key suffix (meeseeker.rb:20). */
  val LastBlockNumKeySuffix = ":meeseeker:last_block_num"

  /** Mainnet block as streamed (block_follower_job.rb:158-167; header shape
    * README.md:157). `operations[i].value` is the open part — raw JSON. */
  val blockSchema: StructType = StructType(Seq(
    StructField("block_num", LongType, nullable = false),
    StructField("previous", StringType),
    StructField("timestamp", StringType),
    StructField("witness", StringType),
    StructField("transaction_merkle_root", StringType),
    StructField("extensions", ArrayType(StringType)),
    StructField("transaction_ids", ArrayType(StringType)),
    StructField("transactions", ArrayType(StructType(Seq(
      StructField("operations", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("value", StringType), // raw JSON (open union)
      )))),
    )))),
  ))

  /** Virtual-op lookup result (block_follower_job.rb:185-222): tuple-form op
    * [type, value] read as array<string> so value survives as raw JSON;
    * `virtual_op` is the node's per-block virtual-op counter (gives arrival
    * order a stable column). */
  val vopSchema: StructType = StructType(Seq(
    StructField("block", LongType, nullable = false),
    StructField("trx_id", StringType),
    StructField("timestamp", StringType),
    StructField("virtual_op", LongType),
    StructField("op", ArrayType(StringType)),
  ))

  /** Sidechain block (steem_engine/follower_job.rb:148-185, agent.rb:47-67).
    * Engine transactions are regular enough for a struct; the dynamic part
    * is `payload` (a JSON-encoded string field already in the source). */
  val engineTrxSchema: StructType = StructType(Seq(
    StructField("transactionId", StringType),
    StructField("refSteemBlockNumber", LongType),
    StructField("refHiveBlockNumber", LongType),
    StructField("sender", StringType),
    StructField("contract", StringType),
    StructField("action", StringType),
    StructField("payload", StringType),
  ))

  val engineBlockSchema: StructType = StructType(Seq(
    StructField("blockNumber", LongType, nullable = false),
    StructField("timestamp", StringType),
    StructField("transactions", ArrayType(engineTrxSchema)),
    StructField("virtualTransactions", ArrayType(engineTrxSchema)),
  ))

  /** Witness schedule (witness_schedule_job.rb:18-24; full example
    * README.md:233). Kept to the fields the pipeline touches plus the nested
    * median_props envelope; big integers ride as strings (SURVEY §1.2). */
  val witnessScheduleSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("current_virtual_time", StringType), // > int64, keep string
    StructField("next_shuffle_block_num", LongType, nullable = false),
    StructField("current_shuffled_witnesses", ArrayType(StringType)),
    StructField("num_scheduled_witnesses", IntegerType),
    StructField("majority_version", StringType),
    StructField("median_props", StructType(Seq(
      StructField("account_creation_fee", StructType(Seq(
        StructField("amount", StringType),
        StructField("precision", IntegerType),
        StructField("nai", StringType),
      ))),
      StructField("maximum_block_size", LongType),
      StructField("hbd_interest_rate", LongType),
    ))),
  ))
}
