package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing corpus deduplication: each operator takes the `documents`
  * shape (doc_id, text, ...) or `embeddings` shape (vec_id, embedding, ...)
  * and returns the SURVIVING rows — the API a training-data pipeline calls,
  * built on the pair/candidate machinery in [[TextOps]]/[[VectorOps]].
  *
  * Survivor policy is greedy-by-id: the lowest doc_id of a duplicate group
  * survives; any row that is a (near-)duplicate of a lower-id row is
  * dropped (drop set = right side of verified pairs). Deterministic, one
  * anti-join, no iterative connected components — the standard large-corpus
  * policy; transitive chains collapse to their minimum id.
  */
object Dedup {

  /** Exact dedup on a column (default `text`): keep the min-doc_id row per
    * identical value. Hash-partitioned by the value — one shuffle. */
  def exact(docs: DataFrame, on: String = "text"): DataFrame = {
    val w = Window.partitionBy(on).orderBy("doc_id")
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Near-dup pairs via MinHash LSH banding + exact-Jaccard verification
    * (the 100 TB path: candidate generation is an equi-join on bands). */
  def nearDuplicatePairs(
      docs: DataFrame,
      tau: Double,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bandRows: Int = 2): DataFrame = {
    val sh = TextOps.shingleRows(docs, shingleSize).cache()
    val sigs = TextOps.minhashSignatures(sh, numHashes)
    val cand = TextOps.lshCandidates(sigs, numHashes, bandRows)
    TextOps.verifyCandidates(cand, sh).filter(col("jaccard") >= tau)
  }

  /** Near-dedup the corpus: drop every doc that is a verified near-dup of a
    * lower-id doc. */
  def dedupNearLsh(
      docs: DataFrame,
      tau: Double,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bandRows: Int = 2): DataFrame = {
    val drop = nearDuplicatePairs(docs, tau, shingleSize, numHashes, bandRows)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Embedding-space near-dedup: drop vectors whose cosine to a lower-id
    * vector meets tau. Exact pairwise within the frame — use with an
    * LSH-bucketed candidate frame (VectorOps.hyperplaneBuckets) at scale. */
  def dedupByEmbedding(emb: DataFrame, tau: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("va"), col("embedding").as("qe"))
      .withColumn("na", expr(
        "sqrt(aggregate(transform(qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc,v)->acc+v))"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").as("ne"))
      .withColumn("nb", expr(
        "sqrt(aggregate(transform(ne, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc,v)->acc+v))"))
    val drop = a.join(b, col("va") < col("vb"))
      .withColumn("cos",
        expr("aggregate(zip_with(qe, ne, (x, y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
          / (col("na") * col("nb")))
      .filter(col("cos") >= tau)
      .select(col("vb").as("vec_id")).distinct()
    emb.join(drop, Seq("vec_id"), "left_anti")
  }
}
