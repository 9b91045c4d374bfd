package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The materialization + notify sink (B1/B2/B3), designed per SURVEY §4.2:
  *
  *  - KV writes (SET + EXPIRE) run fully parallel via foreachPartition —
  *    they are idempotent by key, so order and replay don't matter;
  *  - channel publishes are tiny (a few rows per block) but order-sensitive,
  *    so the message frame is sorted on the reference's publish order and
  *    drained by a single executor-side writer (coalesce(1)), never
  *    collected to the driver;
  *  - the checkpoint key is written after the batch's KV writes, ascending,
  *    so its final value is the batch's max block.
  *
  * `backendName` indirection keeps the backend out of task closures; each
  * task resolves it from [[KvBackends]] (local/tests) — a cluster deployment
  * resolves a connection pool instead.
  */
/** How a batch's channel messages are sequenced onto the backend. */
sealed trait PublishMode
object PublishMode {
  /** Reference parity: EVERY message drains through one ordered writer —
    * the exact total publish order of the reference's sequential loop.
    * O(messages) through one task; fine up to moderate scale, the bench
    * parity mode, and the default. */
  case object Strict extends PublishMode

  /** Scale mode: control messages (rank <= 1 — trx summaries + block
    * headers) keep the strict single-writer total order, while the
    * much-larger rank >= 2 per-op notification stream fans out across
    * block-hash partitions. The guarantee is PER-BLOCK RELATIVE ORDER: one
    * block's notifications are published in reference order by a single
    * task, but tasks run concurrently, so messages of DIFFERENT blocks may
    * interleave on the backend — a subscriber must key off the block id in
    * the payload, not off contiguity. At-least-once, like every publish
    * path. */
  case object RelaxedPerBlock extends PublishMode
}

object KvPubSubSink {

  /** Write one batch of keyed records: (key, kv_value) + TTL policy. */
  def writeKv(keyed: DataFrame, backendName: String, ttlSeconds: Long): Unit = {
    val ttl = ttlSeconds
    keyed.select("key", "kv_value").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val backend = KvBackends(backendName)
        rows.foreach { r =>
          val key = r.getString(0)
          backend.set(key, r.getString(1))
          if (ttl != -1L) backend.expire(key, ttl)
        }
        backend.flush()
    }
  }

  /** Publish one batch of (channel, payload) messages in exact order. The
    * input must carry its sort columns; volume per batch is O(messages), not
    * O(data), so the single ordered partition is not a scale bottleneck. */
  def publishOrdered(messages: DataFrame, backendName: String, sortCols: Seq[String]): Unit =
    messages
      .orderBy(sortCols.map(col): _*)
      .select("channel", "payload")
      .coalesce(1)
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val backend = KvBackends(backendName)
        rows.foreach(r => backend.publish(r.getString(0), r.getString(1)))
        backend.flush()
      }

  /** Per-block-ordered parallel publish: messages are hash-partitioned by
    * `blockCol` and sorted within each partition on the full publish order,
    * so one block's messages are published in order by the task owning the
    * block — no single-writer drain. Messages of different blocks may
    * interleave across concurrent tasks (see
    * [[PublishMode.RelaxedPerBlock]]). */
  def publishPerBlock(
      messages: DataFrame, backendName: String,
      sortCols: Seq[String], blockCol: String): Unit =
    messages
      .repartition(col(blockCol))
      .sortWithinPartitions(sortCols.map(col): _*)
      .select("channel", "payload")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val backend = KvBackends(backendName)
        rows.foreach(r => backend.publish(r.getString(0), r.getString(1)))
        backend.flush()
      }

  /** Mode-dispatching publish entry (see [[PublishMode]]). Message frames
    * carry rank 0/1 for control messages (summaries, block headers) and
    * rank >= 2 for per-op notifications in both follower chains. */
  def publish(
      messages: DataFrame, backendName: String, sortCols: Seq[String],
      mode: PublishMode, rankCol: String = "o_rank", blockCol: String = "o_block"): Unit =
    mode match {
      case PublishMode.Strict =>
        publishOrdered(messages, backendName, sortCols)
      case PublishMode.RelaxedPerBlock =>
        publishOrdered(messages.filter(col(rankCol) <= 1), backendName, sortCols)
        publishPerBlock(messages.filter(col(rankCol) >= 2), backendName, sortCols, blockCol)
    }

  /** Write checkpoint keys ascending so the last write is the max block. */
  def writeCheckpoints(checkpoints: DataFrame, backendName: String): Unit =
    checkpoints
      .orderBy("block_num")
      .select("key", "kv_value")
      .coalesce(1)
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val backend = KvBackends(backendName)
        rows.foreach(r => backend.set(r.getString(0), r.getString(1)))
        backend.flush()
      }
}
