package graft.streaming

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Policies

/** Production JSON-RPC polling source — the live leg of A1/A3 that
  * [[JsonlReplaySource]] replays from fixtures. The reference's ingest loop
  * (block_follower_job.rb:141-167 stream, steem_engine/agent.rb:47-67 poll)
  * re-expressed in the DataSource V2 offset model:
  *
  *  - OFFSETS ARE BLOCK HEIGHTS: `latestOffset` polls
  *    get_dynamic_global_properties and exposes head or last-irreversible
  *    (option `mode`, A4) as the available end — the driver-side poll is one
  *    tiny RPC per trigger;
  *  - `planInputPartitions` fans the height range out as contiguous fetch
  *    ranges (`numPartitions`), so executors pull `get_block` IN PARALLEL —
  *    the ordered-sink sort restores publish order downstream, which is how
  *    the 0.33 blocks/s sequential reference loop becomes cluster-rate;
  *  - each partition reader retries per-height with the engine backoff curve
  *    (Policies.engineBackoff, A3) and fails over across endpoints with the
  *    seeded NodePool (A7); a height whose block is still null after
  *    retries (lagging node) fails the task — Spark retries the partition,
  *    the offset range is immutable, so delivery stays exactly-once into
  *    the micro-batch;
  *  - admission control (`blocksPerTrigger`, B4) bounds catch-up batches;
  *    with Trigger.AvailableNow the end is frozen at start, giving bounded
  *    backfill runs.
  *
  * Output schema matches the replay source: (idx = block height, value =
  * the raw `result` JSON of the block) — `BlockFollowerPipeline.parseBlocks`
  * consumes either interchangeably.
  *
  * Options: endpoints (comma-separated, required), mode
  * (irreversible|head), startBlock, endBlock (batch mode), blocksPerTrigger,
  * numPartitions, maxRetries, retryBaseSec, rpcMethod, dgpoMethod.
  */
class JsonRpcBlockSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonlReplaySource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val endpoints = opts.get("endpoints")
    require(endpoints != null, "json-rpc source requires an 'endpoints' option")
    new RpcTable(RpcConfig(
      endpoints = endpoints.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
      mode = opts.getOrDefault("mode", "irreversible"),
      startBlock = Option(opts.get("startBlock")).map(_.toLong),
      endBlock = Option(opts.get("endBlock")).map(_.toLong),
      blocksPerTrigger = opts.getLong("blocksPerTrigger", Long.MaxValue),
      numPartitions = opts.getInt("numPartitions", 4),
      maxRetries = opts.getInt("maxRetries", 3),
      retryBaseSec = Option(opts.get("retryBaseSec")).map(_.toDouble).getOrElse(0.1),
      rpcMethod = opts.getOrDefault("rpcMethod", "condenser_api.get_block"),
      dgpoMethod = opts.getOrDefault("dgpoMethod", "condenser_api.get_dynamic_global_properties"),
    ))
  }
}

private[graft] final case class RpcConfig(
    endpoints: Seq[String],
    mode: String,
    startBlock: Option[Long],
    endBlock: Option[Long],
    blocksPerTrigger: Long,
    numPartitions: Int,
    maxRetries: Int,
    retryBaseSec: Double,
    rpcMethod: String,
    dgpoMethod: String)

private[streaming] class RpcTable(cfg: RpcConfig) extends Table with SupportsRead {
  override def name(): String = s"json-rpc(${cfg.endpoints.mkString(",")})"
  override def schema(): StructType = JsonlReplaySource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = JsonlReplaySource.schema

        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new RpcMicroBatchStream(cfg)

        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            val start = cfg.startBlock.getOrElse(
              sys.error("batch read requires 'startBlock'"))
            val end = cfg.endBlock.getOrElse(RpcClient.headFor(cfg) + 1)
            RpcMicroBatchStream.splitHeights(cfg, start, end)
          }
          override def createReaderFactory(): PartitionReaderFactory =
            RpcClient.readerFactory
        }
      }
    }
}

/** Offset = next block height to fetch (exclusive end of what's consumed). */
private[streaming] case class BlockHeightOffset(next: Long) extends Offset {
  override def json(): String = next.toString
}

private[streaming] object RpcMicroBatchStream {
  def splitHeights(cfg: RpcConfig, from: Long, until: Long): Array[InputPartition] = {
    val count = until - from
    if (count <= 0) Array.empty
    else {
      val per = math.max(1L, math.ceil(count.toDouble / cfg.numPartitions).toLong)
      (from until until by per)
        .map(s => HeightRangePartition(cfg, s, math.min(s + per, until)): InputPartition)
        .toArray
    }
  }
}

private[streaming] class RpcMicroBatchStream(cfg: RpcConfig)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  @volatile private var availableNowTarget: Option[Long] = None

  /** Exclusive end of the currently fetchable range per A4 mode. */
  private def availableEnd(): Long = RpcClient.headFor(cfg) + 1

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(availableEnd())

  override def initialOffset(): Offset =
    BlockHeightOffset(cfg.startBlock.getOrElse(availableEnd() - 1))

  override def deserializeOffset(json: String): Offset = BlockHeightOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    if (cfg.blocksPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(cfg.blocksPerTrigger)

  override def latestOffset(): Offset = BlockHeightOffset(availableEnd())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BlockHeightOffset].next
    val end = availableNowTarget.getOrElse(availableEnd())
    limit match {
      case rows: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        BlockHeightOffset(math.max(s, math.min(s + rows.maxRows(), end)))
      case _ => BlockHeightOffset(math.max(s, end))
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    RpcMicroBatchStream.splitHeights(
      cfg,
      start.asInstanceOf[BlockHeightOffset].next,
      end.asInstanceOf[BlockHeightOffset].next)

  override def createReaderFactory(): PartitionReaderFactory = RpcClient.readerFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[streaming] case class HeightRangePartition(cfg: RpcConfig, from: Long, until: Long)
    extends InputPartition

/** Driver- and executor-side JSON-RPC plumbing. Uses the JDK HTTP stack and
  * Spark's bundled Jackson — no extra dependencies. */
private[graft] object RpcClient {

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

  private val mapper = new ObjectMapper()

  /** One POST, returning the parsed `result` node (null result => None). */
  def rpcCall(endpoint: String, method: String, params: String): Option[JsonNode] = {
    val url = java.net.URI.create(endpoint).toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    val body = s"""{"jsonrpc":"2.0","id":1,"method":"$method","params":$params}"""
    try {
      val os = conn.getOutputStream
      os.write(body.getBytes("UTF-8")); os.close()
      val code = conn.getResponseCode
      if (code != 200) throw new java.io.IOException(s"HTTP $code from $endpoint")
      val root = mapper.readTree(conn.getInputStream)
      val err = root.get("error")
      if (err != null && !err.isNull) throw new java.io.IOException(s"rpc error: $err")
      Option(root.get("result")).filterNot(_.isNull)
    } finally conn.disconnect()
  }

  /** Retry `call` across the node pool with the A3 backoff curve. A failing
    * endpoint is blacklisted so the next attempt prefers a different node
    * (A7); when every endpoint is blacklisted the pool resets and the same
    * nodes are retried after backoff — the reference never gives up on its
    * whole node list, only on the retry budget. */
  def withRetry[T](cfg: RpcConfig, seed: Long)(call: String => Option[T]): Option[T] = {
    var pool = new Policies.NodePool(cfg.endpoints, seed)
    var attempt = 0
    var last: Throwable = null
    while (attempt <= cfg.maxRetries) {
      val ep = pool.pick().getOrElse {
        pool = new Policies.NodePool(cfg.endpoints, seed + attempt)
        pool.pick().get // endpoints is non-empty by construction
      }
      try return call(ep)
      catch {
        case e: java.io.IOException =>
          last = e
          pool.markProblem(ep)
          attempt += 1
          if (attempt <= cfg.maxRetries)
            Thread.sleep(math.max(1L,
              (Policies.engineBackoff(attempt, maxIntervalSec = 18.0)
                * cfg.retryBaseSec / 0.2 * 1000).toLong))
      }
    }
    throw new java.io.IOException(s"rpc failed after ${cfg.maxRetries} retries", last)
  }

  /** Current fetchable height per `cfg.mode` (A4): head or last-irreversible
    * from get_dynamic_global_properties. */
  def headFor(cfg: RpcConfig): Long =
    withRetry(cfg, seed = 1L) { ep =>
      val dgpo = rpcCall(ep, cfg.dgpoMethod, "[]").getOrElse(
        // null result is RETRYABLE (bad node) — thrown inside the lambda so
        // the pool fails over instead of killing the stream on first touch
        throw new java.io.IOException(s"null dgpo result from $ep"))
      val field =
        if (cfg.mode == "head") "head_block_number"
        else "last_irreversible_block_num"
      val n = dgpo.get(field)
      if (n == null) throw new java.io.IOException(s"dgpo from $ep missing $field")
      Some(n.asLong())
    }.get

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[HeightRangePartition]
      new PartitionReader[InternalRow] {
        private var height = p.from - 1
        private var current: String = _
        override def next(): Boolean = {
          height += 1
          if (height >= p.until) return false
          // A null result (lagging node whose head is behind the offset
          // range) is RETRYABLE — thrown inside the retry lambda so the
          // backoff/failover loop gets another node or a later poll, rather
          // than failing the task on the first lag. Only an exhausted retry
          // budget fails the task (partition retry re-fetches the immutable
          // range, so delivery stays exactly-once into the batch).
          current = withRetry(p.cfg, seed = height) { ep =>
            val r = rpcCall(ep, p.cfg.rpcMethod, s"[$height]")
            if (r.isEmpty) throw new java.io.IOException(
              s"block $height not yet available on $ep")
            r.map(_.toString)
          }.get
          true
        }
        override def get(): InternalRow =
          InternalRow(height, UTF8String.fromString(current))
        override def close(): Unit = ()
      }
    }
  }
}
