package graft.ops

import graft.SparkSpec
import graft.sink.InMemoryKvBackend

class ConsumerOpsSpec extends SparkSpec {

  import spark.implicits._

  private def keyed = Seq(
    "hive:100:t0aaa:0:vote",
    "hive:100:t0aaa:1:custom_json",
    "hive:100:t1bbb:0:transfer",
    "hive:101:t2ccc:0:vote",
    "hive_engine:18000:e0aaa:0:tokens:transfer",
  ).toDF("key")

  test("find:block and find:trx (G3/G4)") {
    assert(ConsumerOps.findBlock(keyed, "hive", 100).count() === 3)
    assert(ConsumerOps.findTrx(keyed, "hive", "t0aaa").count() === 2)
  }

  test("splitKeys tolerates short/non-data keys under ANSI (checkpoint, control)") {
    val sweep = Seq("hive:meeseeker:last_block_num", "hive:graft:pending_summary:3").toDF("key")
    val rows = ConsumerOps.splitKeys(sweep).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Any]("block_num_k") == null))
    assert(rows.forall(_.getAs[Any]("op_type_k") == null))
  }

  test("splitKeys decomposes both key grammars (C14)") {
    val rows = ConsumerOps.splitKeys(keyed).collect()
    val vote = rows.find(_.getAs[String]("key") == "hive:100:t0aaa:0:vote").get
    assert(vote.getAs[String]("chain") === "hive")
    assert(vote.getAs[Long]("block_num_k") === 100L)
    assert(vote.getAs[String]("op_type_k") === "vote")
    assert(vote.getAs[String]("action_k") === null)
    val eng = rows.find(_.getAs[String]("key").startsWith("hive_engine")).get
    assert(eng.getAs[String]("op_type_k") === "tokens")
    assert(eng.getAs[String]("action_k") === "transfer")
  }

  test("verifyTrxSets: empty symmetric difference == verified (E1/E2)") {
    val actual = Seq((100L, "a"), (100L, "b"), (101L, "c")).toDF("block_num", "trx_id")
    val expected = Seq((100L, "a"), (100L, "b"), (101L, "c")).toDF("block_num", "trx_id")
    assert(ConsumerOps.verifyTrxSets(actual, expected).count() === 0)
    val broken = Seq((100L, "a"), (101L, "x")).toDF("block_num", "trx_id")
    val diff = ConsumerOps.verifyTrxSets(broken, expected).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(diff === Set(("b", "missing"), ("c", "missing"), ("x", "extra")))
  }

  test("membership semi/anti join (E3)") {
    val sample = Seq((100L, "a"), (100L, "zzz")).toDF("block_num", "trx_id")
    val auth = Seq((100L, "a"), (100L, "b")).toDF("block_num", "trx_id")
    val res = ConsumerOps.membership(sample, auth).collect()
      .map(r => (r.getString(1), r.getBoolean(2))).toMap
    assert(res === Map("a" -> true, "zzz" -> false))
  }

  test("sampleKeys is deterministic under a fixed seed (F2)") {
    val s1 = ConsumerOps.sampleKeys(keyed, 2, 42L).collect().map(_.getString(0)).toSeq
    val s2 = ConsumerOps.sampleKeys(keyed, 2, 42L).collect().map(_.getString(0)).toSeq
    assert(s1 === s2)
    assert(s1.length === 2)
  }

  test("chainName prettify (C12)") {
    assert(EngineOps.chainName("hive_engine") === "Hive Engine")
    assert(EngineOps.chainName("steem_engine") === "Steem Engine")
    assert(EngineOps.chainName("hive") === "Hive")
  }

  test("reset deletes by prefix sweep only (B5)") {
    val b = new InMemoryKvBackend
    b.set("hive:1:t:0:vote", "x")
    b.set("hive:meeseeker:last_block_num", "1")
    b.set("steem:1:t:0:vote", "x")
    assert(ConsumerOps.reset(b, "hive") === 2)
    assert(b.get("steem:1:t:0:vote").isDefined)
  }
}
