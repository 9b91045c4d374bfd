package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Control-plane policies of the reference, as pure (driver-side) logic: the
  * retry/backoff schedules, node failover, and chain-id detection that sit
  * around the data plane. These run on the driver of a custom source — they
  * are deliberately not DataFrame ops (SURVEY §2.A A4-A7, §2.C C16).
  */
object Policies {

  /** Virtual-op lookup retry (A2, block_follower_job.rb:3,197-203): up to 3
    * retries with linear backoff 3s/6s/9s, then give up; `head` mode never
    * waits (block_follower_job.rb:191). Returns the sleep schedule. */
  def vopRetrySchedule(mode: String, blockIntervalSec: Int = 3, maxRetry: Int = 3): Seq[Double] =
    if (mode == "head") Seq.empty
    else (1 to maxRetry).map(r => (blockIntervalSec * r).toDouble)

  /** Sidechain RPC backoff (A3, steem_engine/follower_job.rb:2,100-105):
    * exponential x2 from 0.2s, capped at 18s. */
  def engineBackoff(attempt: Int, maxIntervalSec: Double = 18.0): Double = {
    require(attempt >= 1)
    math.min(0.1 * math.pow(2.0, attempt.toDouble), maxIntervalSec)
  }

  /** CLI crash-restart backoff (bin/meeseeker:25-33): backoff = min(b,30)*2
    * starting at 1 — effective cap 60s. */
  def cliRestartBackoff(attempt: Int): Double = {
    var b = 1.0
    var i = 1
    while (i < attempt) { b = math.min(b, 30.0) * 2.0; i += 1 }
    math.min(b, 60.0)
  }

  /** Resume-vs-restart decision (block_follower_job.rb:125-138): explicit
    * start wins; TTL=-1 fast-forwards to head; a gap beyond TTL/3 forces a
    * fresh sync; otherwise resume from checkpoint+1. */
  sealed trait Resume
  final case class StartAt(blockNum: Long) extends Resume
  final case class FreshSync(head: Long) extends Resume
  final case class ResumeFrom(blockNum: Long, behindSec: Double) extends Resume

  def resolveResume(
      explicitStart: Option[Long],
      checkpoint: Option[Long],
      head: Long,
      expireKeysSec: Long,
      blockIntervalSec: Int = 3): Resume =
    explicitStart match {
      case Some(n) => StartAt(n)
      case None =>
        // no checkpoint reads as 0 in the reference (redis nil.to_i) and
        // still gets the +1 (block_follower_job.rb:111) -> resume point 1
        val next = checkpoint.getOrElse(0L) + 1
        if (expireKeysSec == -1L) StartAt(math.max(next, head))
        else if (head - next > expireKeysSec / 3) FreshSync(head)
        else ResumeFrom(next, (head - next) * blockIntervalSec.toDouble)
    }

  /** Chain-id detection (A6, meeseeker.rb:53-76): known ids map to their
    * prefix; otherwise guess from the first `*_CHAIN_ID` config key. */
  val HiveChainId = "beeab0de00000000000000000000000000000000000000000000000000000000"
  val LegacyChainId = "0" * 64

  def detectChainKeyPrefix(config: Map[String, String]): Option[String] =
    config.get("HIVE_CHAIN_ID") match {
      case Some(HiveChainId) | Some(LegacyChainId) => Some("hive")
      case _ =>
        config.get("STEEM_CHAIN_ID") match {
          case Some(LegacyChainId) => Some("steem")
          case _ =>
            config.keys.find(_.endsWith("_CHAIN_ID"))
              .map(_.split('_').head.toLowerCase)
        }
    }

  /** Node shuffle/failover (A7, meeseeker.rb:108-197): healthy = reported
    * minus blacklisted; pick pseudo-randomly (seeded => deterministic in
    * tests); the blacklist resets with probability 1/1000 per call in the
    * reference — surfaced here as an explicit decision for the caller. */
  final class NodePool(allUrls: Seq[String], seed: Long) {
    private val rng = new scala.util.Random(seed)
    private var problems = Set.empty[String]

    def markProblem(url: String): Unit = problems += url
    def healthy: Seq[String] = allUrls.filterNot(problems)
    def shouldResetBlacklist(): Boolean = rng.nextInt(1000) == 13
    def pick(): Option[String] = {
      if (shouldResetBlacklist()) problems = Set.empty
      val h = healthy
      if (h.isEmpty) None else Some(h(rng.nextInt(h.length)))
    }
  }

  /** Witness round block range (F3, Rakefile:559-564): the 21-block window
    * `next_shuffle - n + 1 .. next_shuffle + n - 1` as a DataFrame —
    * sequence+explode, never a driver loop. */
  def witnessRoundBlocks(spark: SparkSession, nextShuffleBlockNum: Long, numWitnesses: Int): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        lit(nextShuffleBlockNum - numWitnesses + 1),
        lit(nextShuffleBlockNum + numWitnesses - 1))).as("block_num"))
}
