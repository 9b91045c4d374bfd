package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Streaming training-corpus intake — the Structured Streaming twin of
  * [[graft.llm.CorpusPipeline.prepare]]'s front half, for the "documents
  * arrive continuously" deployment (crawl ingest, API firehose):
  *
  *   1. QUALITY GATE — [[TextOps.gopherGate]] (per-row filter; the
  *      semi-join form would be an unsupported stream-stream join)
  *   2. PII SCRUB    — [[TextOps.redactPii]] (per-row rewrite of `text`)
  *   3. DEDUP        — [[EventStreamJobs.streamingExactDedup]] or the
  *      near-exact minhash-signature form, watermark-bounded state
  *
  * Stages 1-2 are stateless whole-stage-codegen projections — they add
  * ZERO streaming state and run at scan parallelism on any cluster. The
  * only stateful operator is the final dedup, whose state is one entry
  * per recent distinct key, expired by the event-time watermark (RocksDB
  * posture via [[EventStreamJobs.withRocksDbState]] at scale).
  *
  * Scrub precedes dedup for the same reason as the batch pipeline: the
  * redacted text is what gets fingerprinted, so two docs differing only
  * in PII ARE duplicates (spec-pinned). The shuffling back-half stages
  * (pair-level near-dup, decontamination, mixing, packing) are corpus-
  * global by nature and stay batch — run them periodically over the
  * accumulated intake output, exactly how production pipelines split
  * online intake from offline corpus prep.
  */
object CorpusIntakeJob {

  /** docs stream (tsCol, doc_id, text, +passthrough) -> gated, scrubbed,
    * deduplicated stream. `nearExact = true` dedups on the k-token minhash
    * signature (collapses trivially-perturbed re-crawls); `false` dedups
    * on exact redacted text. */
  def intake(
      docs: DataFrame,
      tsCol: String,
      watermark: String,
      nearExact: Boolean = true,
      minWords: Int = 20,
      maxWords: Int = 100000): DataFrame = {
    val gated = TextOps.gopherGate(docs, minWords = minWords, maxWords = maxWords)
    val scrubbed = TextOps.redactPii(gated, "text")
      .drop("text", "n_email", "n_ipv4", "n_phone")
      .withColumnRenamed("redacted", "text")
    if (nearExact)
      EventStreamJobs.streamingNearExactDedup(scrubbed, tsCol, watermark)
    else
      EventStreamJobs.streamingExactDedup(scrubbed, tsCol, watermark)
  }
}
