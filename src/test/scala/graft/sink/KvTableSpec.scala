package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import graft.model.Model
import graft.ops.{BlockOps, FollowerConfig}

/** The parquet-backed KV table: write layout, point/glob reads with
  * partition pruning visible in the plan, and TTL-as-partition-drop. */
class KvTableSpec extends SparkSpec {

  private val cfg = FollowerConfig(chain = "hive")

  private def keyed = {
    val blocks = spark.read.schema(Model.blockSchema).json(resource("blocks.jsonl"))
    val vops = spark.read.schema(Model.vopSchema).json(resource("vops.jsonl"))
    BlockOps.keyedOps(BlockOps.allOps(blocks, vops, cfg), cfg)
  }

  test("write/read round-trip with point get and glob queries") {
    val dir = Files.createTempDirectory("kvtable-").toString
    KvTable.write(keyed, "hive", dir, bucketSize = 2L)
    val table = KvTable.load(spark, dir)
    assert(table.count() === 9)

    val got = KvTable.pointGet(table, "hive:100:t0aaa:0:vote", bucketSize = 2L).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("kv_value").contains("\"vote_operation\""))

    assert(KvTable.globQuery(table, "hive:*:vote", bucketSize = 2L).count() === 1)
    assert(KvTable.globQuery(table, "hive:102:*", bucketSize = 2L).count() === 2)
    assert(KvTable.globQuery(table, "steem:*", bucketSize = 2L).count() === 0)
  }

  test("point get and literal-block glob prune to one partition") {
    val dir = Files.createTempDirectory("kvtable-").toString
    KvTable.write(keyed, "hive", dir, bucketSize = 2L)
    val table = KvTable.load(spark, dir)
    val plan = KvTable.pointGet(table, "hive:100:t0aaa:0:vote", bucketSize = 2L)
      .queryExecution.executedPlan.toString
    // partition filters on both partition columns -> single-bucket scan
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("chain"), plan)
    assert(plan.contains("block_bucket"), plan)
    val globPlan = KvTable.globQuery(table, "hive:102:*", bucketSize = 2L)
      .queryExecution.executedPlan.toString
    assert(globPlan.contains("block_bucket"), globPlan)
  }

  test("glob bucket-prune disabled when a leading wildcard can cross colons") {
    val dir = Files.createTempDirectory("kvtable-").toString
    KvTable.write(keyed, "hive", dir, bucketSize = 2L)
    val table = KvTable.load(spark, dir)
    // '*:0:*' : the star crosses ':' so '0' is NOT necessarily the block
    // segment — here it matches the trx_index segment. A naive bucket prune
    // on 0/2 would return 0 rows (no block lives in bucket 0).
    val n = KvTable.globQuery(table, "*:0:*", bucketSize = 2L).count()
    assert(n === 6) // the six keys whose trx_index segment is 0
  }

  test("pointGet with malformed keys returns empty, never throws") {
    val dir = Files.createTempDirectory("kvtable-").toString
    KvTable.write(keyed, "hive", dir, bucketSize = 2L)
    val table = KvTable.load(spark, dir)
    assert(KvTable.pointGet(table, "hive::whatever", 2L).count() === 0)
    assert(KvTable.pointGet(table, "hive:٣:x", 2L).count() === 0) // Unicode digit
    assert(KvTable.pointGet(table, "nosuchchain:1:t:0:vote", 2L).count() === 0)
  }

  test("overwriteBuckets is idempotent under batch replay") {
    val dir = Files.createTempDirectory("kvtable-").toString
    KvTable.overwriteBuckets(keyed, "hive", dir, bucketSize = 2L)
    assert(KvTable.load(spark, dir).count() === 9)
    // replay the same batch (foreachBatch retry): byte-identical, no dupes
    KvTable.overwriteBuckets(keyed, "hive", dir, bucketSize = 2L)
    assert(KvTable.load(spark, dir).count() === 9)
    assert(KvTable.pointGet(KvTable.load(spark, dir), "hive:100:t0aaa:0:vote", 2L).count() === 1)
  }

  test("overwriteBuckets REFUSES a misaligned batch that would delete rows") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("kvtable-").toString
    // bucketSize 2, blocks 100..103 -> buckets 50,51. First batch writes
    // blocks 100-101 (all of bucket 50); second batch only block 102 —
    // bucket 51 is fine. Third batch replays block 101 ALONE: bucket 50
    // already holds block 100, which the overwrite would wipe.
    val k = keyed.cache()
    KvTable.overwriteBuckets(k.filter(col("block_num") <= 101), "hive", dir, 2L)
    KvTable.overwriteBuckets(k.filter(col("block_num") === 102), "hive", dir, 2L)
    val boom = intercept[IllegalStateException] {
      KvTable.overwriteBuckets(k.filter(col("block_num") === 101), "hive", dir, 2L)
    }
    assert(boom.getMessage.contains("writeVersioned"))
    // the aligned replay of the SAME aligned batch still succeeds
    KvTable.overwriteBuckets(k.filter(col("block_num") <= 101), "hive", dir, 2L)
    k.unpersist()
  }

  test("overwriteBuckets REFUSES an interior-gap batch spanning the same range") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("kvtable-").toString
    // one bucket holds blocks 100..103; the replay carries 100 AND 103 —
    // the [lo,hi] envelope matches the existing rows exactly, but interior
    // blocks 101/102 are absent and the dynamic overwrite would wipe them.
    // (A min/max range heuristic passes this batch; the block-set
    // anti-join must not.)
    val k = keyed.cache()
    KvTable.overwriteBuckets(k.filter(col("block_num") <= 103), "hive", dir, 4L)
    val before = KvTable.load(spark, dir).count()
    val boom = intercept[IllegalStateException] {
      KvTable.overwriteBuckets(
        k.filter(col("block_num") === 100 || col("block_num") === 103), "hive", dir, 4L)
    }
    assert(boom.getMessage.contains("writeVersioned"))
    assert(KvTable.load(spark, dir).count() === before) // nothing deleted
    k.unpersist()
  }

  test("writeVersioned + loadLatest: misaligned replayed batches land exactly once") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("kvtable-").toString
    val k = keyed.cache()
    // batches deliberately NOT bucket-aligned (bucketSize 2, batches split
    // at 101/102 boundary mid-bucket... blocks 100|101,102|103)
    KvTable.writeVersioned(k.filter(col("block_num") === 100), "hive", dir, version = 1L, 2L)
    KvTable.writeVersioned(k.filter(col("block_num").between(101, 102)), "hive", dir, version = 2L, 2L)
    // foreachBatch retry: batch 2 replays, then batch 3 arrives
    KvTable.writeVersioned(k.filter(col("block_num").between(101, 102)), "hive", dir, version = 2L, 2L)
    KvTable.writeVersioned(k.filter(col("block_num") === 103), "hive", dir, version = 3L, 2L)

    val latest = KvTable.loadLatest(spark, dir)
    assert(latest.count() === 9) // exactly-once keys despite the replay
    assert(latest.select("key").distinct().count() === 9)
    // raw table carries the duplicates until compaction
    assert(KvTable.load(spark, dir).count() > 9)

    // point lookup still correct through the deduped view
    val got = KvTable.pointGet(latest, "hive:100:t0aaa:0:vote", 2L).collect()
    assert(got.length === 1 && got(0).getAs[String]("kv_value").contains("vote_operation"))

    // compact closed buckets: physical rows collapse to unique keys
    val compacted = KvTable.compact(spark, dir, "hive", upToBucket = 51L)
    assert(compacted === Seq(50L, 51L))
    assert(KvTable.load(spark, dir).count() === 9)
    assert(KvTable.loadLatest(spark, dir).count() === 9)
    // idempotent: compacting again is a no-op rewrite
    KvTable.compact(spark, dir, "hive", upToBucket = 51L)
    assert(KvTable.load(spark, dir).count() === 9)
    k.unpersist()
  }

  test("TTL retention drops whole buckets below the horizon") {
    val dir = Files.createTempDirectory("kvtable-").toString
    KvTable.write(keyed, "hive", dir, bucketSize = 2L)
    // blocks 100-103, bucketSize 2 => buckets 50 (100,101) and 51 (102,103)
    val dropped = KvTable.expireBelow(spark, dir, "hive", horizonBlockNum = 102L, bucketSize = 2L)
    assert(dropped === Seq("block_bucket=50"))
    val remaining = KvTable.load(spark, dir)
    assert(remaining.count() === 4) // only blocks 102-103 keys survive
    assert(KvTable.globQuery(remaining, "hive:100:*", bucketSize = 2L).count() === 0)
    // horizon below all buckets: nothing to drop
    assert(KvTable.expireBelow(spark, dir, "hive", 0L, 2L) === Seq.empty)
    // unknown chain: no-op
    assert(KvTable.expireBelow(spark, dir, "steem", 1000L, 2L) === Seq.empty)
  }
}
