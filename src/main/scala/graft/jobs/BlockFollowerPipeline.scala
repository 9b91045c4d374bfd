package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Model
import graft.ops.{BlockOps, FollowerConfig}
import graft.sink.KvPubSubSink

/** The `meeseeker sync` lifecycle (SURVEY §3.1) on Spark: source -> explode
  * -> normalize -> key -> [summaries] -> sink, as one declarative plan per
  * micro-batch. Batch and streaming share the exact same transform chain —
  * the streaming entry just wraps it in foreachBatch.
  */
object BlockFollowerPipeline {

  /** Parse raw JSONL block lines (from the replay source or files). */
  def parseBlocks(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), Model.blockSchema).as("b")).select("b.*")

  def parseVops(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), Model.vopSchema).as("v")).select("v.*")

  /** Control key holding the batch-final summary awaiting its successor. */
  def pendingSummaryKey(cfg: FollowerConfig): String =
    s"${cfg.chain}:graft:pending_summary"

  /** Run the whole pipeline over one (batch or micro-batch) block frame.
    *
    * With `carrySummaries` (the streaming path), the summary of the
    * batch-final trx prefix — which strict parity suppresses within the
    * batch — is parked in a KV control key and published at the head of the
    * next non-empty batch, so an N-micro-batch replay produces the exact
    * publish sequence of a single continuous run. */
  def processBatch(
      blocks: DataFrame,
      vops: DataFrame,
      cfg: FollowerConfig,
      backendName: String,
      carrySummaries: Boolean = false): Unit = {
    val ops = BlockOps.allOps(blocks, vops, cfg)
    val keyed = BlockOps.keyedOps(ops, cfg)
    KvPubSubSink.writeKv(keyed, backendName, cfg.ttlSeconds)
    KvPubSubSink.writeCheckpoints(BlockOps.checkpointUpdates(ops, cfg), backendName)

    val backend = graft.sink.KvBackends(backendName)
    val pendingKey = pendingSummaryKey(cfg)
    val batchHasOps = !ops.isEmpty
    if (carrySummaries && batchHasOps) {
      // the carried summary precedes every publish of this batch (it is the
      // "previous prefix" transition fired by this batch's first record)
      backend.get(pendingKey).foreach(p => backend.publish(s"${cfg.chain}:transaction", p))
    }
    KvPubSubSink.publishOrdered(
      BlockOps.channelMessages(blocks, vops, cfg), backendName,
      Seq("o_block", "o_virt", "o_otrx", "o_oidx", "o_rank", "channel"))
    if (carrySummaries && batchHasOps) {
      BlockOps.tailSummary(ops, cfg).foreach(t => backend.set(pendingKey, t))
    }
  }

  /** Streaming entry: replay-source (or any (idx, value) JSONL stream) of
    * blocks, optional static vops lookup frame, foreachBatch sink.
    *
    * Virtual-op late arrival (§4.3): in production the vops frame is the
    * bounded re-poll of get_ops_in_block unioned per micro-batch; the
    * reference's 3-retry give-up maps to the source's retry budget, and
    * strict ordering within a batch is restored by the sink sort.
    */
  def runStream(
      spark: SparkSession,
      blocksJsonl: String,
      vopsJsonl: Option[String],
      cfg: FollowerConfig,
      backendName: String,
      checkpointDir: String,
      linesPerTrigger: Long = 2L): StreamingQuery = {

    val rawBlocks = spark.readStream
      .format("graft.streaming.JsonlReplaySource")
      .option("path", blocksJsonl)
      .option("linesPerTrigger", linesPerTrigger.toString)
      .load()

    // Static side of the union: fixture vops, filtered per batch to the
    // blocks present in that batch (the per-micro-batch enrichment of A2).
    val allVops = vopsJsonl match {
      case Some(p) =>
        parseVops(spark.read.text(p).withColumnRenamed("value", "value"))
      case None => emptyVops(spark)
    }

    rawBlocks.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val blocks = parseBlocks(batch).cache()
        try {
          val batchVops = allVops.join(
            blocks.select(col("block_num").as("b_bn")),
            col("block") === col("b_bn"), "left_semi")
          processBatch(blocks, batchVops, cfg, backendName, carrySummaries = true)
        } finally blocks.unpersist()
        ()
      }
      .start()
  }

  def emptyVops(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Model.vopSchema)
}
