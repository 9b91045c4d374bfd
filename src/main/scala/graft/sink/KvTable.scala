package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Glob

/** In-engine KV materialization (the B1 alternative to an external Redis):
  * a parquet table partitioned by `(chain, block_bucket)` with keys sorted
  * within files.
  *
  * Layout rationale for 100 TB:
  *  - `chain` partitioning makes `{prefix}:*` sweeps (reset/verify, G6)
  *    touch exactly one partition subtree;
  *  - `block_bucket = block_num / bucketSize` keeps each partition a
  *    bounded, time-ordered slice — point lookups and per-block queries
  *    (G3/G7) prune to one bucket via partition filters, and TTL retention
  *    (the reference's 24h EXPIRE) becomes a cheap partition DROP instead
  *    of per-key deletes;
  *  - `sortWithinPartitions(key)` gives parquet min/max key stats, so
  *    key-range predicates (the literal prefix of a glob) skip row groups.
  */
object KvTable {

  val DefaultBucketSize = 100000L

  /** Write (append) keyed records. Input needs (key, kv_value, block_num)
    * and a chain literal.
    *
    * NOTE on idempotence: parquet append is NOT idempotent by key — a
    * retried micro-batch duplicates its rows. Callers replaying batches
    * must either overwrite the affected (chain, block_bucket) partitions
    * (dynamic partition overwrite of a batch's buckets is idempotent, since
    * buckets are block-aligned) or dedup on read with last-write-wins. The
    * KvBackend SET path keeps true per-key idempotence; this table is the
    * scan-side materialization. */
  def write(
      keyed: DataFrame,
      chain: String,
      path: String,
      bucketSize: Long = DefaultBucketSize): Unit =
    keyed
      .select(
        col("key"), col("kv_value"), col("block_num"),
        lit(chain).as("chain"),
        (col("block_num") / bucketSize).cast("long").as("block_bucket"))
      .repartition(col("chain"), col("block_bucket"))
      .sortWithinPartitions("key")
      .write.mode("append")
      .partitionBy("chain", "block_bucket")
      .parquet(path)

  /** Idempotent write for replayable batches: dynamic partition overwrite
    * rewrites exactly the (chain, block_bucket) partitions present in this
    * frame — a retried batch lands byte-identically instead of duplicating.
    * Requires batches aligned to bucket boundaries (a bucket is written by
    * one batch), which block-ordered ingestion gives for free when
    * bucketSize is a multiple of the blocks-per-trigger. */
  def overwriteBuckets(
      keyed: DataFrame,
      chain: String,
      path: String,
      bucketSize: Long = DefaultBucketSize): Unit =
    keyed
      .select(
        col("key"), col("kv_value"), col("block_num"),
        lit(chain).as("chain"),
        (col("block_num") / bucketSize).cast("long").as("block_bucket"))
      .repartition(col("chain"), col("block_bucket"))
      .sortWithinPartitions("key")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("chain", "block_bucket")
      .parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** G7 point GET: equality on key plus derived partition predicates so the
    * scan prunes to a single (chain, bucket) partition. */
  /** ASCII-digit check: `Character.isDigit` accepts Unicode digits that
    * `toLong` then rejects, and is vacuously true on "". */
  private def isAsciiNumeric(s: String): Boolean =
    s.nonEmpty && s.forall(c => c >= '0' && c <= '9')

  def pointGet(
      table: DataFrame,
      key: String,
      bucketSize: Long = DefaultBucketSize): DataFrame = {
    val parts = key.split(':')
    val base = table.filter(col("key") === key)
    if (parts.length >= 2 && isAsciiNumeric(parts(1)))
      base.filter(col("chain") === parts(0) &&
        col("block_bucket") === parts(1).toLong / bucketSize)
    else if (parts.nonEmpty) base.filter(col("chain") === parts(0))
    else base
  }

  /** G1–G6 glob query with partition-pruning assists: a literal chain
    * segment prunes the chain partition; a literal block segment prunes to
    * its bucket; everything else falls back to the compiled glob predicate
    * (which itself carries a startsWith for row-group skipping). */
  def globQuery(
      table: DataFrame,
      pattern: String,
      bucketSize: Long = DefaultBucketSize): DataFrame = {
    val segs = pattern.split(':')
    def isLiteral(s: String): Boolean = !s.exists(c => c == '*' || c == '?' || c == '[' || c == '\\')
    val chainLiteral = segs.nonEmpty && isLiteral(segs(0))
    var df = table
    if (chainLiteral)
      df = df.filter(col("chain") === segs(0))
    // the block-bucket prune is only sound when the FIRST segment is also
    // literal: a wildcard there crosses colons (Redis semantics), so the
    // pattern's second segment need not align with the key's block segment
    if (chainLiteral && segs.length >= 2 && isLiteral(segs(1)) && isAsciiNumeric(segs(1)))
      df = df.filter(col("block_bucket") === segs(1).toLong / bucketSize)
    df.filter(Glob.matches(col("key"), pattern))
  }

  /** TTL retention as partition drop (the 24h EXPIRE at scale): delete every
    * (chain, bucket) partition whose bucket is strictly below the horizon
    * bucket. Metadata-only work — no row rewrite, no per-key deletes. */
  def expireBelow(
      spark: SparkSession,
      path: String,
      chain: String,
      horizonBlockNum: Long,
      bucketSize: Long = DefaultBucketSize): Seq[String] = {
    val horizonBucket = horizonBlockNum / bucketSize
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val chainDir = new Path(path, s"chain=$chain")
    if (!fs.exists(chainDir)) Seq.empty
    else fs.listStatus(chainDir).toSeq
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("block_bucket=") &&
          p.getName.stripPrefix("block_bucket=").toLong < horizonBucket
      }
      .map { p => fs.delete(p, true); p.getName }
  }
}
