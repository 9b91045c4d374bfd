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
    * (the 100 TB path: candidate generation is an equi-join on bands).
    * Returns a lazy frame over an UNCACHED shingle expansion — callers that
    * consume it more than once (or downstream of multiple joins) should
    * cache the shingles themselves, as [[dedupNearLsh]] does with a bounded
    * lifetime. */
  def nearDuplicatePairs(
      docs: DataFrame,
      tau: Double,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bandRows: Int = 2,
      shingles: Option[DataFrame] = None): DataFrame = {
    val sh = shingles.getOrElse(TextOps.shingleRows(docs, shingleSize))
    val sigs = TextOps.minhashSignatures(sh, numHashes)
    val cand = TextOps.lshCandidates(sigs, numHashes, bandRows)
    TextOps.verifyCandidates(cand, sh).filter(col("jaccard") >= tau)
  }

  /** Near-dedup the corpus: drop every doc that is a verified near-dup of a
    * lower-id doc — on the FUSED LSH pipeline (one shuffle over shingle
    * rows, skew-capped buckets). The drop set is eagerly materialized with
    * severed lineage (localCheckpoint) and never collected to the driver
    * (it can be a large fraction of the corpus). */
  def dedupNearLsh(
      docs: DataFrame,
      tau: Double,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bandRows: Int = 2): DataFrame = {
    val drop = TextOps.lshNearDupPairs(docs, shingleSize, numHashes, bandRows)
      .filter(col("jaccard") >= tau)
      .select(col("doc_b").as("doc_id")).distinct()
      .localCheckpoint(true)
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Embedding-space near-dedup: drop vectors whose cosine to a lower-id
    * vector meets tau — [[VectorOps.cosineNearDupPairs]] over the full frame
    * (sampleMod=1). Exact pairwise; use an LSH-bucketed candidate frame
    * (VectorOps.hyperplaneBuckets) as the pre-filter at scale. */
  def dedupByEmbedding(emb: DataFrame, tau: Double): DataFrame = {
    val drop = VectorOps.cosineNearDupPairs(emb, sampleMod = 1, tau)
      .select(col("vec_b").as("vec_id")).distinct()
    emb.join(drop, Seq("vec_id"), "left_anti")
  }
}
