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

  def pendingSummaryKey(cfg: EngineConfig): String =
    s"${cfg.chainKeyPrefix}:graft:pending_summary"

  def processBatch(
      blocks: DataFrame,
      cfg: EngineConfig,
      backendName: String,
      carrySummaries: Boolean = false): Unit = {
    val trxs = EngineOps.explodeEngineTrxs(blocks)
    val keyed = EngineOps.keyedTrxs(trxs, cfg)
    KvPubSubSink.writeKv(keyed, backendName, cfg.ttlSeconds)
    KvPubSubSink.writeCheckpoints(EngineOps.checkpointUpdates(trxs, cfg), backendName)

    val backend = graft.sink.KvBackends(backendName)
    val pendingKey = pendingSummaryKey(cfg)
    val firstVirt = if (carrySummaries) EngineOps.firstRecordVirtual(trxs) else None
    firstVirt.foreach { virt =>
      // carried summary: channel keyed off THIS batch's first record
      // (the triggering record), per follower_job.rb:44-50
      val channel =
        if (virt) s"${cfg.chainKeyPrefix}:virtual_transaction"
        else s"${cfg.chainKeyPrefix}:transaction"
      backend.get(pendingKey).foreach(p => backend.publish(channel, p))
    }
    KvPubSubSink.publishOrdered(
      EngineOps.channelMessages(blocks, cfg), backendName,
      Seq("o_block", "o_ord", "o_rank", "channel"))
    if (carrySummaries && firstVirt.isDefined) {
      EngineOps.tailSummary(trxs, cfg).foreach(t => backend.set(pendingKey, t))
    }
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(parseEngineBlocks(batch), cfg, backendName, carrySummaries = true)
        ()
      }
      .start()
}
