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
      }
}
