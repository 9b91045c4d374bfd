package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: attach to each left row the LATEST right
  * row at or before its timestamp, within a join key — the lookup every
  * time-series/feature-store pipeline needs (latest price for a trade,
  * latest error before a click, feature value as of a label's timestamp).
  *
  * Spark has no ASOF JOIN operator; the naive range-join
  * (`l.ts >= r.ts`, then max per left row) explodes to O(|L| x |R|) pairs
  * per key before aggregating. This implementation is the scale-safe
  * union form instead:
  *
  *   1. union both sides, tagged (right rows sort BEFORE left rows at
  *      equal timestamps, so "at or before" includes ties);
  *   2. one window per key ordered by (ts, side, tie):
  *      `last(right_payload, ignoreNulls)` over UNBOUNDED PRECEDING..CURRENT
  *      carries the latest right payload forward;
  *   3. keep left rows, flatten the payload.
  *
  * Cost: ONE shuffle of |L| + |R| rows partitioned by the join key and a
  * per-key sort — the same shape as any keyed window; no pair explosion,
  * no skew beyond what the key distribution already has. Deterministic:
  * ties among right rows at one timestamp resolve to the greatest
  * `tie` column value (the last in window order).
  */
object AsOfJoin {

  /** For each `left` row, the latest `right` row with `right.ts <= left.ts`
    * and equal `by` key.
    *
    * @param by      equi-join key columns (present on both sides)
    * @param ts      timestamp column name (both sides)
    * @param tie     right-side tie-break column: among right rows sharing
    *                (by, ts), the greatest `tie` wins
    * @param payload right-side columns to attach
    * @param prefix  prefix for the attached columns — pick one that cannot
    *                collide with a left column name; left rows with no
    *                matching right row get nulls
    *
    * Right rows with a null timestamp are DROPPED (as-of against an
    * unknown time is undefined — and in window order nulls sort first, so
    * such a row would otherwise masquerade as "before everything"). Left
    * rows with a null timestamp come through with null payload.
    */
  def lastAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      ts: String,
      tie: String,
      payload: Seq[String],
      prefix: String): DataFrame = {
    val keyCols = by :+ ts
    val p = struct(payload.map(right(_)): _*)
    val pType = right.select(p).schema.head.dataType
    val tieType = right.select(right(tie)).schema.head.dataType
    val l = left.select(
      struct(left.columns.map(left(_)).toSeq: _*).as("__l") +:
        lit(1).as("__side") +:
        // left rows never tie-break against each other (each computes its
        // own window value), so no left-side tie column is required
        lit(null).cast(tieType).as("__tie") +:
        lit(null).cast(pType).as("__p") +:
        keyCols.map(left(_)): _*)
    val r = right.filter(right(ts).isNotNull).select(
      lit(null).cast(l.schema.head.dataType).as("__l") +:
        lit(0).as("__side") +:
        right(tie).as("__tie") +:
        p.as("__p") +:
        keyCols.map(right(_)): _*)
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payload.map(f => col(s"__m.$f").as(s"$prefix$f")): _*)
  }

  /** Skew-safe twin of [[lastAtOrBefore]] for HOT join keys: the flat form
    * funnels every row of one key through a single window task, so a key
    * holding a large fraction of the data becomes a straggler. This form
    * bounds the per-task row count by TIME RANGE instead (the same
    * bucket-and-stitch discipline as [[Stitch.leadStitched]]):
    *
    *   1. the carry-forward window runs per (key, bucket) — parallel, each
    *      task sees one time slice of one key;
    *   2. each bucket's FINAL right payload (one row per key x bucket) is
    *      propagated across buckets by a window over that tiny heads
    *      frame — the only per-key-partitioned work left, O(buckets);
    *   3. left rows whose slice-local lookback found nothing take their
    *      bucket's carry-in.
    *
    * Result is IDENTICAL to the flat form (spec-pinned on random data).
    * `bucketMicros` is the slice width over a TimestampType `ts`. */
  def lastAtOrBeforeBucketed(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      ts: String,
      tie: String,
      payload: Seq[String],
      prefix: String,
      bucketMicros: Long = 3600L * 1000000L): DataFrame = {
    val keyCols = by :+ ts
    val p = struct(payload.map(right(_)): _*)
    val pType = right.select(p).schema.head.dataType
    val tieType = right.select(right(tie)).schema.head.dataType
    val l = left.select(
      struct(left.columns.map(left(_)).toSeq: _*).as("__l") +:
        lit(1).as("__side") +:
        lit(null).cast(tieType).as("__tie") +:
        lit(null).cast(pType).as("__p") +:
        keyCols.map(left(_)): _*)
    val r = right.filter(right(ts).isNotNull).select(
      lit(null).cast(l.schema.head.dataType).as("__l") +:
        lit(0).as("__side") +:
        right(tie).as("__tie") +:
        p.as("__p") +:
        keyCols.map(right(_)): _*)
    val u = r.unionByName(l)
      .withColumn("__bucket", (unix_micros(col(ts)) / bucketMicros).cast("long"))

    // 1. slice-local carry-forward: window keyed by (by..., bucket)
    val wSlice = Window.partitionBy((by :+ "__bucket").map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sliced = u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(wSlice))

    // 2. per-(key, bucket) final right payload -> cross-bucket carry-in.
    //    heads is one row per key x OCCUPIED bucket (buckets with no right
    //    rows carry a null final and inherit through the same window).
    val finals = u.filter(col("__side") === 0)
      .groupBy((by :+ "__bucket").map(col): _*)
      .agg(max_by(col("__p"), struct(col(ts), col("__tie"))).as("__final"))
    val buckets = u.select((by :+ "__bucket").map(col): _*).distinct()
      .join(finals, by :+ "__bucket", "left")
    val wCarry = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = buckets.withColumn("__carry", last(col("__final"), ignoreNulls = true).over(wCarry))
      .select((by :+ "__bucket").map(col) :+ col("__carry"): _*)

    // 3. resolve: slice-local hit wins, else the bucket's carry-in
    sliced
      .filter(col("__side") === 1)
      .join(carry, by :+ "__bucket", "left")
      .withColumn("__r", coalesce(col("__m"), col("__carry")))
      .select(col("__l.*") +: payload.map(f => col(s"__r.$f").as(s"$prefix$f")): _*)
  }
}
