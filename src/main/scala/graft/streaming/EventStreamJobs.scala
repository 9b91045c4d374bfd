package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over the `events` stream shape (F6/F7): watermarked
  * tumbling/session windows and streaming dedup — the Structured Streaming
  * twins of the batch queries Q14/Q15/Q5 and the schedule dedup D3.
  *
  * All state here is watermark-bounded: at 100 TB the same plans run with
  * the RocksDB state store and scale by key partitioning (window x type,
  * user_id, next_shuffle_block_num respectively); late data beyond the
  * watermark is dropped exactly like the reference's bounded vop retry
  * gives up after its horizon (block_follower_job.rb:197-207).
  */
object EventStreamJobs {

  /** Production state-store posture for the stateful jobs below (the 100 TB
    * leg of F6/F7): RocksDB-backed state with changelog checkpointing (per
    * commit, upload the delta instead of a full snapshot) and bounded
    * off-heap memory, so window/session/dedup state scales with disk, not
    * executor heap. Apply with [[withRocksDbState]] before starting queries;
    * the HDFS-backed default remains correct for small state (every spec
    * runs both, see EventStreamJobsSpec). */
  val rocksDbStateStoreConf: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
  )

  def withRocksDbState(spark: org.apache.spark.sql.SparkSession): Unit =
    rocksDbStateStoreConf.foreach { case (k, v) => spark.conf.set(k, v) }

  /** Watermarked tumbling-window rollup (Q14's streaming form). Late events
    * beyond `watermark` are dropped; output mode `update`/`append` both
    * work downstream. */
  def windowedEventCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("day"), col("event_type"), col("n_events"))

  /** Watermarked session windows per user (Q15's streaming form). */
  def sessionizedCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Streaming publish-once dedup (the witness-schedule D3 semantics):
    * first row per next_shuffle_block_num within the watermark horizon. */
  def dedupSchedules(schedules: DataFrame, watermark: String): DataFrame =
    schedules
      .withWatermark("fetched_at", watermark)
      .dropDuplicates("next_shuffle_block_num")
}
