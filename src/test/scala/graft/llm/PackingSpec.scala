package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential test: the two-level hierarchical prefix sum must be
  * row-for-row identical to the flat per-source running-sum window it
  * replaced (the flat form is the obviously-correct spec; the two-level
  * form is the scale-safe implementation). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def flatPack(df: org.apache.spark.sql.DataFrame, budget: Long) = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    val wBin = Window.partitionBy("source", "bin").orderBy("doc_id")
    df.withColumn("tok_before",
        coalesce(sum($"n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", ($"tok_before" / budget).cast("long"))
      .withColumn("pos_in_bin", (row_number().over(wBin) - 1).cast("int"))
  }

  test("two-level packing == flat window: multi-source, gappy ids, tiny buckets") {
    // gappy, non-contiguous doc_ids across 3 sources; bucketWidth=64 forces
    // many buckets so the stitch path is genuinely exercised
    val docs = (0 until 500)
      .map(i => (i * 3L + (i % 7), s"src${i % 3}", (i % 13 + 1).toLong))
      .toDF("doc_id", "source", "n_tokens")
    val cols = Seq("doc_id", "source", "n_tokens", "tok_before", "bin", "pos_in_bin")
    val two = Packing.packSequences(docs, budget = 50, bucketWidth = 64)
      .selectExpr(cols: _*)
    val flat = flatPack(docs, budget = 50).selectExpr(cols: _*)
    assert(two.exceptAll(flat).isEmpty && flat.exceptAll(two).isEmpty)
  }

  test("two-level packing == flat window: one source (the funnel case)") {
    val docs = (0 until 300).map(i => (i.toLong, "only", (i % 5 + 1).toLong))
      .toDF("doc_id", "source", "n_tokens")
    val cols = Seq("doc_id", "source", "n_tokens", "tok_before", "bin", "pos_in_bin")
    val two = Packing.packSequences(docs, budget = 17, bucketWidth = 32)
      .selectExpr(cols: _*)
    val flat = flatPack(docs, budget = 17).selectExpr(cols: _*)
    assert(two.exceptAll(flat).isEmpty && flat.exceptAll(two).isEmpty)
    // sanity on absolute values: first row starts a bin at position 0
    val first = two.orderBy("doc_id").limit(1).collect()(0)
    assert(first.getAs[Long]("tok_before") === 0L)
    assert(first.getAs[Long]("bin") === 0L)
    assert(first.getAs[Int]("pos_in_bin") === 0)
  }

  test("writeShards: lossless round trip, arithmetic shard ids, one file per shard") {
    val docs = (0 until 400)
      .map(i => (i.toLong, s"src${i % 2}", (i % 9 + 1).toLong))
      .toDF("doc_id", "source", "n_tokens")
    val packed = Packing.packSequences(docs, budget = 40, bucketWidth = 64)
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Packing.writeShards(packed, dir, binsPerShard = 4)
    val back = spark.read.parquet(dir)
    // lossless: every packed row comes back exactly once (shard is derived)
    val cols = Seq("doc_id", "source", "n_tokens", "bin", "pos_in_bin")
    val a = packed.selectExpr(cols: _*)
    val b = back.selectExpr(cols: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // shard membership is pure arithmetic on bin
    assert(back.filter(col("shard") =!= expr("bin DIV 4")).isEmpty)
    // one parquet file per (source, shard) directory — whole-shard loads
    val shardDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles().filter(_.isDirectory))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName}: expected 1 file, got ${files.length}")
    }
    // rows inside a shard file are sorted by (bin, pos_in_bin): a
    // sequential reader streams samples in training order
    import spark.implicits._
    shardDirs.foreach { d =>
      val rows = spark.read.parquet(d.getAbsolutePath)
        .select("bin", "pos_in_bin").as[(Long, Int)].collect().toSeq
      assert(rows === rows.sortBy(identity), s"${d.getName} not sorted")
    }
  }

  test("writeShards with shuffleSeed: bins permute, stay contiguous, deterministic") {
    import spark.implicits._
    val docs = (0 until 400)
      .map(i => (i.toLong, "only", (i % 9 + 1).toLong))
      .toDF("doc_id", "source", "n_tokens")
    val packed = Packing.packSequences(docs, budget = 20, bucketWidth = 64)
    def fileBins(dir: String): Seq[Seq[Long]] = {
      val shardDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles().filter(_.isDirectory)).sortBy(_.getName)
      shardDirs.toSeq.map { d =>
        spark.read.parquet(d.getAbsolutePath).select("bin").as[Long].collect().toSeq
      }
    }
    val d1 = java.nio.file.Files.createTempDirectory("sh1").toString
    val d2 = java.nio.file.Files.createTempDirectory("sh2").toString
    val d3 = java.nio.file.Files.createTempDirectory("sh3").toString
    Packing.writeShards(packed, d1, binsPerShard = 16, shuffleSeed = Some(7L))
    Packing.writeShards(packed, d2, binsPerShard = 16, shuffleSeed = Some(7L))
    Packing.writeShards(packed, d3, binsPerShard = 16)
    val (a, b, plain) = (fileBins(d1), fileBins(d2), fileBins(d3))
    // deterministic: same seed -> identical layout
    assert(a === b)
    // same bin MEMBERSHIP per shard file, different ORDER than sorted
    assert(a.map(_.sorted) === plain.map(_.sorted))
    assert(a.exists(f => f != f.sorted), "seeded layout identical to sorted order")
    // each bin's rows stay contiguous (one run per bin)
    a.foreach { f =>
      val runs = f.foldLeft(Vector.empty[Long]) {
        case (acc, bin) if acc.lastOption.contains(bin) => acc
        case (acc, bin) => acc :+ bin
      }
      assert(runs.distinct.size === runs.size, "a bin appears in two runs (split sample)")
    }
  }
}
