package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the standard 4x
  * memory/IO reduction for the CANDIDATE side of similarity search at
  * 100 TB (the float corpus is what dominates scan bytes; queries stay
  * float). Symmetric per-vector scheme: scale = max(|x|)/127, q_i =
  * round(x_i / scale) in [-127, 127], x_i ~ q_i * scale.
  *
  * Everything is built-ins inside codegen (transform/aggregate on
  * tinyint arrays); per-component error is bounded by scale/2 and the
  * spec pins both the round-trip bound and brute-force recall@k of the
  * quantized path against the float path on the real embeddings table.
  * Zero vectors keep scale 0 and quantize to all-zeros (dequantize
  * returns them exactly; ranking treats them via the same zero-norm
  * NaN guard as the float path). */
object Quantize {

  /** (vec_id, embedding: array<float>, ...) ->
    * (vec_id, qembedding: array<tinyint>, qscale: double, +passthrough). */
  def quantize(emb: DataFrame): DataFrame =
    emb
      .withColumn("qscale",
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))")
          / lit(127.0))
      .withColumn("qembedding",
        expr("""transform(embedding,
               |  x -> CAST(CASE WHEN qscale = 0.0 THEN 0.0
               |                 ELSE round(CAST(x AS DOUBLE) / qscale) END AS TINYINT))""".stripMargin))
      .drop("embedding")

  /** Inverse: reconstruct array<float> (lossy, |err_i| <= qscale/2). */
  def dequantize(q: DataFrame): DataFrame =
    q.withColumn("embedding",
        expr("transform(qembedding, v -> CAST(CAST(v AS DOUBLE) * qscale AS FLOAT))"))
      .drop("qembedding", "qscale")

  /** Brute-force cosine top-k over QUANTIZED candidates: the integer dot
    * is exact (sums of products of ints <= 127^2 * dim — no fp error until
    * the final scale multiply), so cos(q_a, q_b) = dot_int * sa * sb /
    * (|a| * |b|) where the scales cancel in the cosine — cosine over
    * quantized vectors needs NO dequantize and NO scale at all. Same
    * output shape as [[VectorOps.bruteForceTopK]]. */
  def bruteForceTopKQuantized(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def idot(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS LONG) * CAST(y AS LONG)), CAST(0 AS LONG), (acc, v) -> acc + v)"
    def inorm(a: String) =
      s"sqrt(CAST(${idot(a, a)} AS DOUBLE))"
    val q = broadcast(queries
      .select(col("vec_id").as("qid"), col("qembedding").as("qe"))
      .withColumn("qn", expr(inorm("qe"))))
    val c = candidates
      .select(col("vec_id").as("nid"), col("qembedding").as("ne"))
      .withColumn("nn", expr(inorm("ne")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    c.join(q, col("qid") =!= col("nid"))
      .withColumn("cos", // zero-norm guard (ANSI throws on 0-divisor): see bruteForceTopK
        when(col("qn") * col("nn") === 0, lit(-2.0))
          .otherwise(expr(idot("qe", "ne")).cast("double") / (col("qn") * col("nn"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid").as("vec_id"), col("nid").as("neighbor_id"), col("rnk"), col("cos"))
  }
}
