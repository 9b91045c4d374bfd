package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (the sample-packing pass before training): per-source
  * contiguous packing of docs into fixed token-budget bins. Deterministic:
  * docs in doc_id order, bin = floor(tokens-before / budget), position =
  * index within bin. Exact GREEDY bin-packing is inherently sequential;
  * contiguous-order packing is what large-scale pipelines actually run
  * (stable, single pass, deterministic shards), with docs straddling a
  * boundary split or padded downstream.
  *
  * The running token sum is computed HIERARCHICALLY (the
  * [[graft.ops.Stitch]] two-level prefix-sum shape), never as a flat
  * `Window.partitionBy(source)` — with a handful of sources that window
  * funnels the whole corpus through #sources tasks:
  *
  *   1. a running sum WITHIN coarse doc_id-range buckets — parallel,
  *      O(rows/bucket) per task, keyed by (source, bucket);
  *   2. per-bucket totals (one row per non-empty bucket, 1/`bucketWidth`th
  *      of the input) get a per-source running sum — the only
  *      source-sequential step left, over the tiny heads frame;
  *   3. tok_before = bucket-prefix + within-bucket prefix.
  *
  * Exact because floor(doc_id / bucketWidth) is monotone in the per-source
  * doc_id order. The bucket-prefix join is keyed by (source, bucket) —
  * the same partitioning step 1's window just produced, so only the tiny
  * totals frame moves. The trailing pos_in_bin window partitions by
  * (source, bin): bins hold ~budget tokens, so that key is fine-grained at
  * any corpus size. */
object Packing {

  /** Bucket width in doc_id units — 8192 ids per bucket keeps bucket
    * partitions small while the heads frame is ~1/8192nd of the corpus. */
  val DefaultBucketWidth = 8192L

  /** Input: (doc_id, source, n_tokens) (+ passthrough columns). Output:
    * input columns + tok_before, bin, pos_in_bin. */
  def packSequences(
      df: DataFrame,
      budget: Long,
      bucketWidth: Long = DefaultBucketWidth): DataFrame = {
    val b = df.withColumn("__bkt", (col("doc_id") / bucketWidth).cast("long"))
    val wLocal = Window.partitionBy("source", "__bkt").orderBy("doc_id")
    val local = b.withColumn("__local_before",
      coalesce(
        sum(col("n_tokens")).over(wLocal.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    // one row per non-empty (source, bucket): its token total
    val totals = b.groupBy("source", "__bkt").agg(sum("n_tokens").as("__bsum"))
    val wBuckets = Window.partitionBy("source").orderBy("__bkt")
    val prefix = totals.withColumn("__bucket_before",
      coalesce(
        sum(col("__bsum")).over(wBuckets.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("source"), col("__bkt"), col("__bucket_before"))
    local.join(prefix, Seq("source", "__bkt"))
      .withColumn("tok_before", col("__bucket_before") + col("__local_before"))
      .withColumn("bin", (col("tok_before") / budget).cast("long"))
      .withColumn("pos_in_bin",
        (row_number().over(Window.partitionBy("source", "bin").orderBy("doc_id")) - 1)
          .cast("int"))
      .drop("__bkt", "__local_before", "__bucket_before")
  }

  /** Export packed rows as deterministic training shards: shard id =
    * `bin DIV binsPerShard` per source, laid out as
    * `path/source=<s>/shard=<k>/...parquet` with rows sorted by
    * (bin, pos_in_bin) inside each file — the byte layout a data loader
    * streams sequentially.
    *
    * `binsPerShard` is the file-size knob at scale: a shard holds
    * ~`binsPerShard * packBudget` tokens, so pick it to land shards at
    * your target object size (e.g. 64 bins x 2048 tokens ~ 128k tokens
    * per shard file). The repartition is BY (source, shard) — each shard
    * is assembled by one task and lands as one file, so shard count (not
    * corpus size) bounds the writer's parallelism; downstream loaders get
    * whole shards, never partial files. Deterministic: shard membership
    * is pure arithmetic on `bin`, row order inside a file is the sort —
    * a re-run writes byte-identical shards.
    *
    * `shuffleSeed`: training loaders want pseudo-random SAMPLE order, not
    * corpus order (sequential doc_id order correlates adjacent training
    * batches). With a seed, bins inside each shard file are laid out in a
    * seeded md5 permutation — each bin's rows stay contiguous (a bin IS
    * one training sample), only the bin ORDER shuffles; combine with
    * loader-side shard-order shuffling for a cheap two-level global
    * shuffle, the standard WebDataset-style recipe. Still deterministic:
    * same seed, same bytes. */
  def writeShards(
      packed: DataFrame,
      path: String,
      binsPerShard: Long = 64L,
      shuffleSeed: Option[Long] = None): Unit = {
    require(binsPerShard > 0, "binsPerShard must be positive")
    val order: Seq[Column] = shuffleSeed match {
      case Some(seed) =>
        Seq(col("source"), col("shard"),
          md5(concat_ws("#", col("bin"), lit(seed))), col("bin"), col("pos_in_bin"))
      case None =>
        Seq(col("source"), col("shard"), col("bin"), col("pos_in_bin"))
    }
    packed
      .withColumn("shard", expr(s"bin DIV $binsPerShard"))
      .repartition(col("source"), col("shard"))
      .sortWithinPartitions(order: _*)
      .write.mode("overwrite")
      .partitionBy("source", "shard")
      .parquet(path)
  }
}
