package graft.sink

import graft.SparkSpec
import graft.model.Model
import graft.ops.{BlockOps, FollowerConfig}

/** Relaxed publish mode: control messages keep the strict total order;
  * per-op notifications keep per-block order under parallel fan-out; the
  * message multiset is identical to strict mode. Strict mode itself is
  * byte-covered by PipelineSpec's goldens.
  */
class PublishModeSpec extends SparkSpec {

  private def fixtureMessages = {
    val blocks = spark.read.schema(Model.blockSchema).json(resource("blocks.jsonl"))
    val vops = spark.read.schema(Model.vopSchema).json(resource("vops.jsonl"))
    val cfg = FollowerConfig()
    val ops = BlockOps.allOps(blocks, vops, cfg)
    BlockOps.channelMessagesFrom(blocks, ops, BlockOps.keyedOps(ops, cfg), cfg)
  }

  /** block number of a rank>=2 op-notify payload: {"key":"chain:block:..."} */
  private def blockOf(payload: String): String =
    payload.split(':')(1)

  test("RelaxedPerBlock: same multiset; strict control order; per-block op order") {
    val messages = fixtureMessages

    val strictB = new InMemoryKvBackend
    KvBackends.register("pm-strict", strictB)
    KvPubSubSink.publish(messages, "pm-strict", BlockOps.messageSortCols, PublishMode.Strict)
    val strictLog = strictB.publishLog

    val relaxedB = new InMemoryKvBackend
    KvBackends.register("pm-relaxed", relaxedB)
    KvPubSubSink.publish(messages, "pm-relaxed", BlockOps.messageSortCols, PublishMode.RelaxedPerBlock)
    val relaxedLog = relaxedB.publishLog

    assert(strictLog.nonEmpty)
    // 1. nothing lost or invented
    assert(relaxedLog.groupBy(identity).view.mapValues(_.size).toMap ===
      strictLog.groupBy(identity).view.mapValues(_.size).toMap)

    // 2. control messages (summaries + block headers = channels without a
    // second ':'-segment beyond "op") keep the exact strict relative order
    def isControl(m: (String, String)): Boolean = !m._1.contains(":op:")
    assert(relaxedLog.filter(isControl) === strictLog.filter(isControl))

    // 3. within every block, rank>=2 notifications keep the strict relative
    // order (cross-block interleaving is free)
    val strictOps = strictLog.filterNot(isControl)
    val relaxedOps = relaxedLog.filterNot(isControl)
    assert(strictOps.nonEmpty)
    strictOps.map(m => blockOf(m._2)).distinct.foreach { blk =>
      assert(
        relaxedOps.filter(m => blockOf(m._2) == blk) ===
          strictOps.filter(m => blockOf(m._2) == blk),
        s"block $blk op-notify order diverged")
    }
  }
}
