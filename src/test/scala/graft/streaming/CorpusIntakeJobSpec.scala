package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The composed streaming intake: quality gate -> PII scrub -> watermarked
  * dedup, driven through MemoryStream micro-batches. Pins the composition
  * properties (gate drops junk, scrub rewrites text BEFORE fingerprinting,
  * cross-batch duplicates suppressed) rather than the per-op semantics the
  * individual specs already cover. */
class CorpusIntakeJobSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // 25 words, 3 distinct stopwords, top term 'the' x2 (frac 0.08)
  private val goodText =
    "the quick brown fox jumps over a lazy dog while many other animals " +
      "watch from distant hills and rivers flowing gently toward the open sea"
  private val otherText =
    "a careful reader finds the hidden meaning inside every long paragraph " +
      "because patient study of context and structure rewards attention with " +
      "clear understanding today"
  // base for the PII pair — fully distinct from goodText so only the email
  // difference decides whether docs 3 and 4 collapse
  private val piiBase =
    "please send the final report and a signed copy of those documents " +
      "before friday evening so our remote team can review budget numbers " +
      "during monday planning contact"

  test("intake: gate drops junk, scrub precedes dedup, cross-batch dups suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val out = CorpusIntakeJob.intake(in.toDF(), "ts", watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("intake")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        StreamDoc(ts("2024-01-01 10:00:00"), 1, goodText),
        StreamDoc(ts("2024-01-01 10:00:01"), 2, "too short"), // gate drops
        StreamDoc(ts("2024-01-01 10:00:02"), 3,
          piiBase + " bob@example.com for details"), // PII doc: scrubbed, survives
        // differs from doc 3 ONLY in the email: after scrub the texts are
        // identical, so dedup MUST collapse it (scrub-before-dedup)
        StreamDoc(ts("2024-01-01 10:00:03"), 4,
          piiBase + " eve@other.org for details"))
      q.processAllAvailable()
      in.addData(
        StreamDoc(ts("2024-01-01 10:30:00"), 5, goodText), // cross-batch exact dup
        StreamDoc(ts("2024-01-01 10:30:01"), 6, otherText)) // genuinely new: survives
      q.processAllAvailable()
      val rows = spark.table("intake")
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      assert(rows.keySet === Set(1L, 3L, 6L))
      assert(rows(3L).contains("<EMAIL>") && !rows(3L).contains("bob@"))
      assert(rows(1L) === goodText)
    } finally q.stop()
  }

  test("intake: exact mode dedups on redacted text; distinct texts all pass") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val out = CorpusIntakeJob.intake(in.toDF(), "ts", watermark = "1 hour",
      nearExact = false)
    val q = out.writeStream.format("memory").queryName("intake_exact")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        StreamDoc(ts("2024-01-01 10:00:00"), 1, goodText),
        StreamDoc(ts("2024-01-01 10:00:01"), 2, otherText))
      q.processAllAvailable()
      in.addData(StreamDoc(ts("2024-01-01 10:10:00"), 3, goodText))
      q.processAllAvailable()
      val ids = spark.table("intake_exact").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L))
    } finally q.stop()
  }
}
