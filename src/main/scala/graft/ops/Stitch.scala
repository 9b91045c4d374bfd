package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe `lead(1)` over a GLOBAL row order.
  *
  * An unpartitioned `Window.orderBy(...)` funnels every row through ONE task
  * (Spark even logs a WindowExec warning) — the round-1 plan for summary
  * placement did exactly that over all transaction prefixes. This helper
  * computes the same lead hierarchically:
  *
  *   1. lead() WITHIN coarse buckets of the order's leading column —
  *      parallel, O(rows/bucket) per task;
  *   2. bucket-final rows (lead = null) are stitched with the next non-empty
  *      bucket's FIRST row, found via a lead over the one-row-per-bucket
  *      heads frame — the only global window left, over rows/1024 rows.
  *
  * Exactness requires `bucket` to be monotone in the global order (rows of
  * bucket k all precede rows of bucket k+1), which floor(block_num / range)
  * is for any order led by block_num. The stream-final row keeps a null
  * lead, exactly like the flat formulation.
  */
object Stitch {

  /** Default bucket width in leading-order-column units: 1024 blocks per
    * bucket keeps bucket partitions small while the heads frame is 1/1024th
    * of the input — a ~100M-block backfill leaves ~100k rows for the single
    * stitching task, with a 3-column payload. */
  val DefaultRange = 1024L

  /** Adds `nxtName` = lead(payload, 1) over the global (orderCols) order.
    * `bucket` MUST be monotone in that order. */
  def leadStitched(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      payload: Column,
      nxtName: String): DataFrame = {
    val b = df.withColumn("__bucket", bucket)
    val wLocal = Window.partitionBy("__bucket").orderBy(orderCols: _*)
    val withLocal = b
      .withColumn("__nxt", lead(payload, 1).over(wLocal))
      .withColumn("__rn", row_number().over(wLocal))
    // one row per non-empty bucket: its first payload in stream order
    val heads = withLocal.filter(col("__rn") === 1)
      .select(col("__bucket"), payload.as("__head"))
    val nextHeads = heads
      .withColumn("__nexthead", lead(col("__head"), 1).over(Window.orderBy("__bucket")))
      .select(col("__bucket"), col("__nexthead"))
    withLocal
      .join(nextHeads, Seq("__bucket"), "left")
      .withColumn(nxtName, coalesce(col("__nxt"), col("__nexthead")))
      .drop("__bucket", "__nxt", "__rn", "__nexthead")
  }
}
