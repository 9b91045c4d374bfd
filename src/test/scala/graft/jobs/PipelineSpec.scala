package graft.jobs

import java.nio.file.Files

import graft.SparkSpec
import graft.model.Model
import graft.ops.{EngineConfig, FollowerConfig}
import graft.sink.{InMemoryKvBackend, KvBackends}

/** End-to-end pipeline tests: batch and streaming (custom replay source +
  * foreachBatch sink) must materialize the identical KV state, checkpoint,
  * and per-batch-ordered publish stream.
  */
class PipelineSpec extends SparkSpec {

  private val cfg = FollowerConfig(chain = "hive", publishOpCustomId = true)

  private def freshBackend(name: String): InMemoryKvBackend = {
    val b = new InMemoryKvBackend
    KvBackends.register(name, b)
    b
  }

  test("batch pipeline materializes keys, TTLs, checkpoint, ordered publishes") {
    val backend = freshBackend("batch-test")
    val blocks = spark.read.schema(Model.blockSchema).json(resource("blocks.jsonl"))
    val vops = spark.read.schema(Model.vopSchema).json(resource("vops.jsonl"))
    BlockFollowerPipeline.processBatch(blocks, vops, cfg, "batch-test")

    assert(backend.size === 10) // 9 op keys + checkpoint
    assert(backend.get("hive:meeseeker:last_block_num") === Some("103"))
    assert(backend.ttlOf("hive:100:t0aaa:0:vote") === Some(86400L))
    // checkpoint key carries no TTL
    assert(backend.ttlOf("hive:meeseeker:last_block_num") === None)
    val log = backend.publishLog
    assert(log.size === 19)
    assert(log.head._1 === "hive:block")
    assert(log.count(_._1 == "hive:transaction") === 5)
  }

  test("ttl=-1 skips expiry (B1)") {
    val backend = freshBackend("ttl-test")
    val blocks = spark.read.schema(Model.blockSchema).json(resource("blocks.jsonl"))
    val vops = spark.read.schema(Model.vopSchema).json(resource("vops.jsonl"))
    BlockFollowerPipeline.processBatch(blocks, vops, cfg.copy(ttlSeconds = -1L), "ttl-test")
    assert(backend.ttlOf("hive:100:t0aaa:0:vote") === None)
  }

  test("streaming replay in one micro-batch equals batch output exactly") {
    val backend = freshBackend("stream-one")
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    val q = BlockFollowerPipeline.runStream(
      spark, resource("blocks.jsonl"), Some(resource("vops.jsonl")),
      cfg, "stream-one", ckpt, linesPerTrigger = 1000L)
    q.awaitTermination(60000)

    val batchBackend = freshBackend("stream-one-ref")
    val blocks = spark.read.schema(Model.blockSchema).json(resource("blocks.jsonl"))
    val vops = spark.read.schema(Model.vopSchema).json(resource("vops.jsonl"))
    BlockFollowerPipeline.processBatch(blocks, vops, cfg, "stream-one-ref")

    assert(backend.get("hive:meeseeker:last_block_num") === Some("103"))
    assert(backend.size === batchBackend.size)
    assert(backend.publishLog === batchBackend.publishLog)
  }

  test("streaming with small micro-batches: same KV state; summaries cut at batch edges") {
    val backend = freshBackend("stream-chunked")
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    val q = BlockFollowerPipeline.runStream(
      spark, resource("blocks.jsonl"), Some(resource("vops.jsonl")),
      cfg, "stream-chunked", ckpt, linesPerTrigger = 2L)
    q.awaitTermination(60000)

    // KV materialization is batch-size-invariant (idempotent by key)
    assert(backend.size === 10)
    assert(backend.get("hive:meeseeker:last_block_num") === Some("103"))
    assert(backend.get("hive:100:t0aaa:0:vote").get.contains("\"vote_operation\""))
    // publish stream: per-batch ordering holds; block/op messages identical,
    // only cross-batch summaries are deferred (documented parity bound)
    val channels = backend.publishLog.map(_._1)
    assert(channels.count(_ == "hive:block") === 4)
    assert(channels.count(_.startsWith("hive:op:")) === 10)
  }

  test("engine batch pipeline end-to-end") {
    val backend = freshBackend("engine-test")
    val blocks = spark.read.schema(Model.engineBlockSchema).json(resource("engine_blocks.jsonl"))
    EngineFollowerPipeline.processBatch(blocks, EngineConfig(), "engine-test")
    assert(backend.size === 6) // 5 trx keys + checkpoint
    assert(backend.get("hive_engine:meeseeker:last_block_num") === Some("18001"))
    assert(backend.publishLog.size === 15)
  }

  test("engine streaming replay equals batch") {
    val backend = freshBackend("engine-stream")
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    val q = EngineFollowerPipeline.runStream(
      spark, resource("engine_blocks.jsonl"), EngineConfig(), "engine-stream",
      ckpt, linesPerTrigger = 1000L)
    q.awaitTermination(60000)
    assert(backend.size === 6)
    assert(backend.publishLog.size === 15)
  }
}
