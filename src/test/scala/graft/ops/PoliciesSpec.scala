package graft.ops

import graft.SparkSpec

class PoliciesSpec extends SparkSpec {

  test("vop retry: linear 3/6/9s backoff, none in head mode (A2)") {
    assert(Policies.vopRetrySchedule("irreversible") === Seq(3.0, 6.0, 9.0))
    assert(Policies.vopRetrySchedule("head") === Seq.empty)
  }

  test("engine backoff: exponential x2 capped at 18s (A3)") {
    assert(Policies.engineBackoff(1) === 0.2)
    assert(Policies.engineBackoff(2) === 0.4)
    assert(Policies.engineBackoff(8) === 18.0)
    assert(Policies.engineBackoff(20) === 18.0)
  }

  test("cli restart backoff caps at 60s") {
    assert(Policies.cliRestartBackoff(1) === 1.0)
    assert(Policies.cliRestartBackoff(2) === 2.0)
    assert(Policies.cliRestartBackoff(3) === 4.0)
    assert(Policies.cliRestartBackoff(10) === 60.0)
  }

  test("resume resolution mirrors block_follower_job.rb:125-138") {
    import Policies._
    assert(resolveResume(Some(42L), Some(10L), 100L, 86400L) === StartAt(42L))
    // ttl = -1: fast-forward to max(checkpoint+1, head)
    assert(resolveResume(None, Some(10L), 100L, -1L) === StartAt(100L))
    assert(resolveResume(None, Some(200L), 100L, -1L) === StartAt(201L))
    // big gap (> ttl/3 blocks) => fresh sync
    assert(resolveResume(None, Some(0L), 100000L, 86400L) === FreshSync(100000L))
    // small gap => resume with behind seconds
    assert(resolveResume(None, Some(90L), 100L, 86400L) === ResumeFrom(91L, 27.0))
    // no checkpoint reads as 0 + 1 (nil.to_i + 1), never block 0
    assert(resolveResume(None, None, 100L, 86400L) === ResumeFrom(1L, 297.0))
  }

  test("chain-id detection incl. the guess fallback (A6)") {
    import Policies._
    assert(detectChainKeyPrefix(Map("HIVE_CHAIN_ID" -> HiveChainId)) === Some("hive"))
    assert(detectChainKeyPrefix(Map("HIVE_CHAIN_ID" -> LegacyChainId)) === Some("hive"))
    assert(detectChainKeyPrefix(Map("STEEM_CHAIN_ID" -> LegacyChainId)) === Some("steem"))
    assert(detectChainKeyPrefix(Map("WEIRD_CHAIN_ID" -> "ff")) === Some("weird"))
    assert(detectChainKeyPrefix(Map.empty) === None)
  }

  test("node pool failover skips blacklisted, deterministic under seed (A7)") {
    val pool = new Policies.NodePool(Seq("a", "b", "c"), seed = 7L)
    pool.markProblem("b")
    val picks = (1 to 50).flatMap(_ => pool.pick())
    assert(picks.nonEmpty)
    assert(!picks.contains("b") || picks.indexOf("b") > 0) // only after a reset
    val pool2 = new Policies.NodePool(Seq("a", "b", "c"), seed = 7L)
    pool2.markProblem("b")
    assert(picks === (1 to 50).flatMap(_ => pool2.pick()))
  }

  test("witness round window is the 2n-1 block range (F3)") {
    val blocks = Policies.witnessRoundBlocks(spark, 1000L, 21)
      .collect().map(_.getLong(0))
    assert(blocks.length === 41)
    assert(blocks.head === 980L)
    assert(blocks.last === 1020L)
  }
}
