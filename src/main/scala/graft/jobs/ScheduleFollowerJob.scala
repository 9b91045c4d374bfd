package graft.jobs

import com.fasterxml.jackson.databind.JsonNode

import graft.streaming.{RpcClient, RpcConfig}

/** Live leg of the witness-schedule poll (A5) — witness_schedule_job.rb:3-70
  * re-expressed over the production JSON-RPC client: fetch
  * `get_witness_schedule`, wait out the blocks until the next shuffle, then
  * publish the schedule JSON to `{chain}:witness:schedule` exactly once per
  * `next_shuffle_block_num` (D3 publish-once), through the same KvBackend
  * family as the follower pipelines.
  *
  * The batch/streaming twins over pre-fetched schedule frames live in
  * [[graft.ops.ScheduleOps]]; this is the driver-side poller that produces
  * them in production. It is deliberately NOT a Spark job: the poll is one
  * tiny RPC per round returning one row — there is no cluster leg to
  * distribute, and the reference runs the identical single-threaded loop.
  * Node failover + backoff come from [[RpcClient.withRetry]] (A7/A3).
  */
object ScheduleFollowerJob {

  final case class ScheduleConfig(
      endpoints: Seq[String],
      chain: String = "hive",
      mode: String = "irreversible", // A4: head | irreversible
      untilBlockNum: Option[Long] = None, // bounded runs (tests, audits)
      maxRetries: Int = 3,
      retryBaseSec: Double = 0.1,
      scheduleMethod: String = "condenser_api.get_witness_schedule",
      dgpoMethod: String = "condenser_api.get_dynamic_global_properties",
      // injectable so specs advance a stub chain instead of wall-clock waits
      sleep: Double => Unit = s => Thread.sleep(math.max(1L, (s * 1000).toLong)))

  private def rpcConfig(cfg: ScheduleConfig) = RpcConfig(
    endpoints = cfg.endpoints, mode = cfg.mode,
    startBlock = None, endBlock = None,
    blocksPerTrigger = Long.MaxValue, numPartitions = 1,
    maxRetries = cfg.maxRetries, retryBaseSec = cfg.retryBaseSec,
    rpcMethod = "", dgpoMethod = cfg.dgpoMethod)

  /** Poll until `untilBlockNum` (or forever when None). Returns the number
    * of schedules published. */
  def run(cfg: ScheduleConfig, backendName: String): Long = {
    val rpc = rpcConfig(cfg)
    val backend = graft.sink.KvBackends(backendName)
    var lastShuffle = -1L
    var published = 0L
    var schedule: JsonNode = null
    var done = false
    while (!done) {
      // hammer assignment (rb:15-24): a new schedule is fetched only after
      // the current one has been published
      if (schedule == null)
        schedule = RpcClient.withRetry(rpc, seed = 2L) { ep =>
          Some(RpcClient.rpcCall(ep, cfg.scheduleMethod, "[]").getOrElse(
            // null result is retryable (bad node) — fail over, don't abort
            throw new java.io.IOException(s"null schedule from $ep")))
        }.get
      val nextShuffle = schedule.get("next_shuffle_block_num").asLong()
      val blockNum = RpcClient.headFor(rpc)
      // better to publish a little late than miss a schedule: the 1.5-block
      // early bias and the 3 s/block pacing are the reference's (rb:38-52)
      val remaining = math.max(nextShuffle - blockNum - 1.5, 0.0)
      if (remaining > 0) {
        cfg.sleep(math.max(remaining * 3.0, 0.25))
      } else {
        if (nextShuffle != lastShuffle) {
          backend.publish(s"${cfg.chain}:witness:schedule", schedule.toString)
          backend.flush() // on the wire before the next poll round
          lastShuffle = nextShuffle
          published += 1
        }
        schedule = null // re-enable hammer assignment
        done = cfg.untilBlockNum.exists(blockNum >= _)
      }
    }
    published
  }
}
