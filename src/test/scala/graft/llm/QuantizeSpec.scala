package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("quantize/dequantize round-trip error is bounded by qscale/2") {
    val emb = Tables.embeddings(spark, dir)
    val q = Quantize.quantize(emb)
    val recon = Quantize.dequantize(q)
      .select(col("vec_id"), col("embedding").as("recon"))
    val joined = emb.select(col("vec_id"), col("embedding")).join(recon, "vec_id")
      .withColumn("maxerr", expr(
        """aggregate(zip_with(embedding, recon, (a, b) -> abs(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
          |          CAST(0.0 AS DOUBLE), (acc, v) -> greatest(acc, v))""".stripMargin))
      .join(q.select(col("vec_id"), col("qscale")), "vec_id")
    val bad = joined.filter(col("maxerr") > col("qscale") / 2 + lit(1e-9)).count()
    assert(bad === 0L)
    // quantized payload really is int8: every component within [-127, 127]
    val oob = q.filter(expr("exists(qembedding, v -> v > 127 OR v < -127)")).count()
    assert(oob === 0L)
  }

  test("zero vectors survive exactly; quantized cosine needs no scales") {
    val emb = Seq(
      (1L, Array.fill(8)(0.0f)),
      (2L, Array.tabulate(8)(i => (i - 4).toFloat)),
    ).toDF("vec_id", "embedding").withColumn("label", lit(0L))
    val rt = Quantize.dequantize(Quantize.quantize(emb))
      .orderBy("vec_id").select("embedding").as[Array[Float]].collect()
    assert(rt(0).toSeq === Seq.fill(8)(0.0f))
    // a zero-norm query never outranks real candidates (NaN guard)
    val topk = Quantize.bruteForceTopKQuantized(
      Quantize.quantize(emb), Quantize.quantize(emb), k = 1).collect()
    assert(topk.forall(r => !r.getAs[Double]("cos").isNaN))
  }

  test("float rankers survive zero-norm vectors and rank them last") {
    // ANSI mode throws DIVIDE_BY_ZERO on a 0-divisor even for doubles —
    // the guard must short-circuit before the division, not nanvl after
    val emb = Seq(
      (1L, Array.fill(8)(0.0f)),                       // zero norm
      (2L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (3L, Array.tabulate(8)(i => (i + 2).toFloat)),
    ).toDF("vec_id", "embedding").withColumn("label", lit(0L))
    val topk = VectorOps.bruteForceTopK(emb.filter(col("vec_id") === 2), emb, k = 2)
      .orderBy("rnk").collect()
    // the real vector outranks the zero vector; zero scores -2, never NaN
    assert(topk.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(3L, 1L))
    assert(topk(1).getAs[Double]("cos") === -2.0)
    // pair paths: zero-norm vectors never verify as near-dups, no error
    val pairs = VectorOps.cosineNearDupPairs(emb, sampleMod = 1, tau = 0.5).collect()
    assert(pairs.forall(r => r.getAs[Long]("vec_a") != 1L && r.getAs[Long]("vec_b") != 1L))
    val lsh = Dedup.dedupByEmbeddingLsh(emb, tau = 0.5, nPlanes = 0)
      .select("vec_id").as[Long].collect().toSet
    assert(lsh.contains(1L), "zero vector must survive dedup, not crash it")
  }

  test("quantized brute-force recall@3 >= 0.8 vs the float path") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val float = VectorOps.bruteForceTopK(queries, emb, k = 3)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val qemb = Quantize.quantize(emb)
    val quant = Quantize.bruteForceTopKQuantized(
      qemb.filter(col("vec_id") < 10), qemb, k = 3)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (float & quant).size.toDouble / float.size
    assert(recall >= 0.8, s"recall@3 = $recall")
    // deterministic across runs
    val again = Quantize.bruteForceTopKQuantized(
      qemb.filter(col("vec_id") < 10), qemb, k = 3)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(again === quant)
  }
}
