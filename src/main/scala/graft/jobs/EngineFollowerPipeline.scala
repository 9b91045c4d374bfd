package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Model
import graft.ops.{EngineConfig, EngineOps}
import graft.sink.KvPubSubSink

/** Sidechain `meeseeker sync hive_engine` lifecycle (SURVEY §3.2). */
object EngineFollowerPipeline {

  def parseEngineBlocks(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), Model.engineBlockSchema).as("b")).select("b.*")

  /** Per-batch pending key — see BlockFollowerPipeline.pendingSummaryKey
    * for the retry-idempotence rationale. */
  def pendingSummaryKey(cfg: EngineConfig, batchId: Long): String =
    s"${cfg.chainKeyPrefix}:graft:pending_summary:$batchId"

  def processBatch(
      blocks: DataFrame,
      cfg: EngineConfig,
      backendName: String,
      carrySummaries: Boolean = false,
      batchId: Long = 0L,
      publishMode: graft.sink.PublishMode = graft.sink.PublishMode.Strict): Unit = {
    val trxs = EngineOps.explodeEngineTrxs(blocks).cache()
    try {
      val keyed = EngineOps.keyedTrxs(trxs, cfg)
      KvPubSubSink.writeKv(keyed, backendName, cfg.ttlSeconds)
      KvPubSubSink.writeCheckpoints(EngineOps.checkpointUpdates(trxs, cfg), backendName)

      val messages = EngineOps.channelMessagesFrom(trxs, keyed, cfg)
      if (!carrySummaries) {
        KvPubSubSink.publish(messages, backendName, EngineOps.messageSortCols, publishMode,
          blockCol = "o_block")
      } else {
        val backend = graft.sink.KvBackends(backendName)
        val prev = backend.get(pendingSummaryKey(cfg, batchId - 1))
        val firstVirt = EngineOps.firstRecordVirtual(trxs)
        firstVirt.foreach { virt =>
          // carried summary: channel keyed off THIS batch's first record
          // (the triggering record), per follower_job.rb:44-50
          val channel =
            if (virt) s"${cfg.chainKeyPrefix}:virtual_transaction"
            else s"${cfg.chainKeyPrefix}:transaction"
          prev.foreach { p =>
            backend.publish(channel, p)
            // flush NOW: must precede the executor tasks' publishes on a
            // per-thread-pipelined backend
            backend.flush()
          }
          KvPubSubSink.publish(messages, backendName, EngineOps.messageSortCols, publishMode)
        }
        val tail =
          if (firstVirt.isDefined) EngineOps.tailSummary(trxs, cfg) else prev
        tail.foreach(t => backend.set(pendingSummaryKey(cfg, batchId), t))
        backend.del(Seq(pendingSummaryKey(cfg, batchId - 2)))
        // explicit durability barrier — see BlockFollowerPipeline: the
        // pending-summary SET must not rely on the del's incidental
        // round-trip to reach the wire before batch commit
        backend.flush()
      }
    } finally trxs.unpersist()
  }

  def runStream(
      spark: SparkSession,
      blocksJsonl: String,
      cfg: EngineConfig,
      backendName: String,
      checkpointDir: String,
      linesPerTrigger: Long = 2L): StreamingQuery =
    spark.readStream
      .format("graft.streaming.JsonlReplaySource")
      .option("path", blocksJsonl)
      .option("linesPerTrigger", linesPerTrigger.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(parseEngineBlocks(batch), cfg, backendName,
          carrySummaries = true, batchId = batchId)
        ()
      }
      .start()
}
