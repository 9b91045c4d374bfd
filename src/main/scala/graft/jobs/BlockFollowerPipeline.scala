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

  /** Control key parking batch `batchId`'s final summary for its successor.
    * Keyed per batch so a foreachBatch RETRY of batch i still finds batch
    * i-1's summary intact (a single mutable key would already have been
    * overwritten by the failed attempt — content loss, not a benign
    * duplicate). Writes are deterministic recomputations => idempotent. */
  def pendingSummaryKey(cfg: FollowerConfig, batchId: Long): String =
    s"${cfg.chain}:graft:pending_summary:$batchId"

  /** Run the whole pipeline over one (batch or micro-batch) block frame.
    *
    * With `carrySummaries` (the streaming path), the summary of the
    * batch-final trx prefix — which strict parity suppresses within the
    * batch — is parked under a per-batch KV control key and published at the
    * head of the next non-empty batch, so an N-micro-batch replay produces
    * the exact publish sequence of a single continuous run; empty batches
    * carry the pending summary forward. */
  def processBatch(
      blocks: DataFrame,
      vops: DataFrame,
      cfg: FollowerConfig,
      backendName: String,
      carrySummaries: Boolean = false,
      batchId: Long = 0L,
      publishMode: graft.sink.PublishMode = graft.sink.PublishMode.Strict): Unit = {
    // the explode/window chain feeds kv writes, checkpoints, messages, and
    // the tail summary — one cache instead of ~5 re-derivations per batch
    val ops = BlockOps.allOps(blocks, vops, cfg).cache()
    try {
      val keyed = BlockOps.keyedOps(ops, cfg)
      KvPubSubSink.writeKv(keyed, backendName, cfg.ttlSeconds)
      KvPubSubSink.writeCheckpoints(BlockOps.checkpointUpdates(ops, cfg), backendName)

      val messages = BlockOps.channelMessagesFrom(blocks, ops, keyed, cfg)
      if (!carrySummaries) {
        KvPubSubSink.publish(messages, backendName, BlockOps.messageSortCols, publishMode)
      } else {
        val backend = graft.sink.KvBackends(backendName)
        val prev = backend.get(pendingSummaryKey(cfg, batchId - 1))
        val batchHasOps = !ops.isEmpty
        if (batchHasOps) {
          // carried summary first: it is the "previous prefix" transition
          // fired by this batch's first record
          prev.foreach { p =>
            backend.publish(s"${cfg.chain}:transaction", p)
            // flush NOW: this driver-thread publish must reach the backend
            // before the executor tasks' publishes (pipelined backends
            // buffer per thread)
            backend.flush()
          }
          KvPubSubSink.publish(messages, backendName, BlockOps.messageSortCols, publishMode)
        }
        val tail = if (batchHasOps) BlockOps.tailSummary(ops, cfg) else prev
        tail.foreach(t => backend.set(pendingSummaryKey(cfg, batchId), t))
        backend.del(Seq(pendingSummaryKey(cfg, batchId - 2)))
        // explicit durability barrier: the pending-summary SET must be on
        // the wire before this micro-batch commits. (The del above happens
        // to round-trip on pipelined backends, but that is incidental —
        // making it conditional would silently lose the summary on crash.)
        backend.flush()
      }
    } finally ops.unpersist()
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
    runStreamFrom(spark, rawBlocks, vopsJsonl, cfg, backendName, checkpointDir)
  }

  /** Stream entry over ANY raw (idx, value) block stream — the replay
    * source or the production [[graft.streaming.JsonRpcBlockSource]]. */
  def runStreamFrom(
      spark: SparkSession,
      rawBlocks: DataFrame,
      vopsJsonl: Option[String],
      cfg: FollowerConfig,
      backendName: String,
      checkpointDir: String,
      publishMode: graft.sink.PublishMode = graft.sink.PublishMode.Strict,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {

    // Static side of the union: fixture vops, filtered per batch to the
    // blocks present in that batch (the per-micro-batch enrichment of A2).
    val allVops = vopsJsonl match {
      case Some(p) => parseVops(spark.read.text(p))
      case None => emptyVops(spark)
    }

    rawBlocks.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val blocks = parseBlocks(batch).cache()
        try {
          val batchVops = allVops.join(
            blocks.select(col("block_num").as("b_bn")),
            col("block") === col("b_bn"), "left_semi")
          processBatch(blocks, batchVops, cfg, backendName,
            carrySummaries = true, batchId = batchId, publishMode = publishMode)
        } finally blocks.unpersist()
        ()
      }
      .start()
  }

  def emptyVops(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Model.vopSchema)
}
