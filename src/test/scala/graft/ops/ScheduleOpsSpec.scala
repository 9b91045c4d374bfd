package graft.ops

import graft.SparkSpec
import graft.model.Model

class ScheduleOpsSpec extends SparkSpec {

  test("publish-once per next_shuffle_block_num (D3)") {
    val schedules = spark.read.schema(Model.witnessScheduleSchema)
      .json(resource("witness_schedule.jsonl"))
    val pubs = ScheduleOps.schedulePublishes(schedules, "hive").collect()
    assert(pubs.length === 2)
    assert(pubs.forall(_.getString(0) == "hive:witness:schedule"))
    assert(pubs.map(_.getLong(2)).toSeq === Seq(63L, 84L))
    assert(pubs.head.getString(1).contains("\"current_shuffled_witnesses\":[\"w1\",\"w2\",\"w3\"]"))
  }

  test("witness round audit: scheduled vs actual producers (Rakefile:577-637)") {
    import spark.implicits._
    val scheduled = Seq("w1", "w2", "w3").toDF("witness")
    val headers = Seq(("w1", 100L), ("w2", 101L), ("w4", 102L)).toDF("witness", "block_num")
    val audit = ScheduleOps.witnessRoundAudit(scheduled, headers).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(audit === Set(("w3", "missing"), ("w4", "extra")))
  }
}
