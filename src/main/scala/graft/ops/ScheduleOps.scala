package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Witness-schedule stream (witness_schedule_job.rb:3-70): a low-frequency
  * poll whose publishes are deduped on `next_shuffle_block_num` (publish
  * exactly once per 21-block round, :56-62). D3.
  */
object ScheduleOps {

  /** Polled schedule rows -> one `{chain}:witness:schedule` message per
    * distinct next_shuffle_block_num (first poll wins), payload = the full
    * schedule JSON. Streaming twin: dropDuplicates + watermark. */
  def schedulePublishes(schedules: DataFrame, chain: String): DataFrame =
    schedules
      .dropDuplicates("next_shuffle_block_num")
      .select(
        lit(s"$chain:witness:schedule").as("channel"),
        to_json(struct(schedules.columns.map(col): _*)).as("payload"),
        col("next_shuffle_block_num").as("o_block"))
      .orderBy("o_block")

  /** Verify helper (Rakefile:577-637): scheduled vs actual producers over a
    * round — missing = scheduled EXCEPT actual, extra = actual EXCEPT
    * scheduled (E2 set differences, last-wins D6 for actual). */
  def witnessRoundAudit(scheduled: DataFrame, headers: DataFrame): DataFrame = {
    val actual = headers.groupBy("witness").agg(max("block_num").as("last_block"))
    val missing = scheduled.select(col("witness"))
      .except(actual.select(col("witness")))
      .withColumn("status", lit("missing"))
    val extra = actual.select(col("witness"))
      .except(scheduled.select(col("witness")))
      .withColumn("status", lit("extra"))
    missing.unionByName(extra)
  }
}
