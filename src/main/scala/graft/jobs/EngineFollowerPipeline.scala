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

  def processBatch(blocks: DataFrame, cfg: EngineConfig, backendName: String): Unit = {
    val trxs = EngineOps.explodeEngineTrxs(blocks)
    val keyed = EngineOps.keyedTrxs(trxs, cfg)
    KvPubSubSink.writeKv(keyed, backendName, cfg.ttlSeconds)
    KvPubSubSink.writeCheckpoints(EngineOps.checkpointUpdates(trxs, cfg), backendName)
    KvPubSubSink.publishOrdered(
      EngineOps.channelMessages(blocks, cfg), backendName,
      Seq("o_block", "o_ord", "o_rank", "channel"))
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
        processBatch(parseEngineBlocks(batch), cfg, backendName)
        ()
      }
      .start()
}
