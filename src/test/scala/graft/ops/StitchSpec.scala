package graft.ops

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stitch.leadStitched must equal a flat global-order lead() exactly —
  * including at bucket boundaries and for the stream-final row — while
  * keeping full-width unpartitioned windows out of the pipeline plans.
  */
class StitchSpec extends SparkSpec {

  import spark.implicits._

  test("stitched lead equals flat global lead across bucket boundaries") {
    // block numbers straddling several width-4 buckets, with gaps (empty
    // buckets) and multiple rows per block
    val rows = for {
      b <- Seq(1L, 2L, 3L, 7L, 8L, 15L, 31L, 32L, 33L)
      t <- 0 until 3
    } yield (b, t)
    val df = rows.toDF("block_num", "t")
    val flat = df
      .withColumn("nxt",
        lead(struct(col("block_num").as("b"), col("t")), 1)
          .over(Window.orderBy("block_num", "t")))
      .select(col("block_num"), col("t"), col("nxt.b").as("nb"), col("nxt.t").as("nt"))
      .as[(Long, Int, Option[Long], Option[Int])].collect().toSet
    val stitched = Stitch.leadStitched(
        df,
        floor(col("block_num") / 4),
        Seq(col("block_num"), col("t")),
        struct(col("block_num").as("b"), col("t")),
        "nxt")
      .select(col("block_num"), col("t"), col("nxt.b").as("nb"), col("nxt.t").as("nt"))
      .as[(Long, Int, Option[Long], Option[Int])].collect().toSet
    assert(stitched === flat)
    // stream-final row keeps a null lead
    assert(stitched.exists(r => r._1 == 33L && r._2 == 2 && r._3.isEmpty))
  }

  test("pipeline plans have no full-width unpartitioned window") {
    import graft.model.Model
    val blocks = spark.read.schema(Model.blockSchema)
      .json(getClass.getResource("/blocks.jsonl").getPath)
    val vops = spark.read.schema(Model.vopSchema)
      .json(getClass.getResource("/vops.jsonl").getPath)
    val plan = BlockOps.channelMessages(blocks, vops, FollowerConfig())
      .queryExecution.executedPlan
    val unpartitioned = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    // the ONLY unpartitioned window permitted is Stitch's bucket-heads lead,
    // which runs over one row per 1024-block bucket, never the full stream —
    // recognizable by its __bucket ordering key
    assert(unpartitioned.forall(_.orderSpec.exists(_.child.toString.contains("__bucket"))),
      s"full-width global window found:\n${unpartitioned.mkString("\n")}")
  }
}
