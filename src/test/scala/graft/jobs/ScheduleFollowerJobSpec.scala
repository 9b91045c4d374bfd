package graft.jobs

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{InMemoryKvBackend, KvBackends}

/** Stub chain node for the live witness-schedule poll: serves
  * get_witness_schedule (next shuffle = next multiple of 21 past head) and
  * get_dynamic_global_properties (head auto-advances +3 per poll — the
  * chain moves while we sleep). First `failFirst` schedule requests return
  * HTTP 500 to exercise the retry path. */
private class StubScheduleNode(startHead: Long, failFirst: Int = 0) {
  private val mapper = new ObjectMapper()
  @volatile var head: Long = startHead
  val scheduleFetches = new AtomicInteger(0)
  private val failuresLeft = new AtomicInteger(failFirst)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => {
    val req = mapper.readTree(ex.getRequestBody)
    val method = req.get("method").asText()
    def reply(status: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    method match {
      case m if m.endsWith("get_witness_schedule") =>
        if (failuresLeft.getAndDecrement() > 0) reply(500, "transient")
        else {
          scheduleFetches.incrementAndGet()
          val nsbn = (head / 21 + 1) * 21
          reply(200,
            s"""{"jsonrpc":"2.0","id":1,"result":{"next_shuffle_block_num":$nsbn,"current_shuffled_witnesses":["w1","w2","w3"]}}""")
        }
      case m if m.endsWith("get_dynamic_global_properties") =>
        val h = head
        head = h + 3
        reply(200,
          s"""{"jsonrpc":"2.0","id":1,"result":{"head_block_number":$h,"last_irreversible_block_num":$h}}""")
      case other =>
        reply(200, s"""{"jsonrpc":"2.0","id":1,"error":"unknown method $other"}""")
    }
  })
  server.start()
  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}/"
  def close(): Unit = server.stop(0)
}

class ScheduleFollowerJobSpec extends AnyFunSuite {

  test("live poll publishes once per next_shuffle_block_num, survives a 500") {
    val node = new StubScheduleNode(startHead = 100, failFirst = 1)
    try {
      val backend = new InMemoryKvBackend
      KvBackends.register("sched-test", backend)
      var sleeps = 0
      val published = ScheduleFollowerJob.run(
        ScheduleFollowerJob.ScheduleConfig(
          endpoints = Seq(node.endpoint),
          chain = "hive",
          untilBlockNum = Some(127),
          retryBaseSec = 0.001,
          sleep = _ => sleeps += 1),
        "sched-test")
      // head walks 100 -> 127: shuffle boundaries 105 and 126, each
      // published EXACTLY once even though the loop re-reaches them on
      // multiple rounds (publish-once dedup on next_shuffle_block_num)
      assert(published === 2L)
      val log = backend.publishLog
      assert(log.map(_._1).distinct === Seq("hive:witness:schedule"))
      val mapper = new ObjectMapper()
      assert(log.map(p => mapper.readTree(p._2).get("next_shuffle_block_num").asLong())
        === Seq(105L, 126L))
      // payload carries the full schedule, witnesses included (rb:58-60)
      assert(mapper.readTree(log.head._2).get("current_shuffled_witnesses").size() === 3)
      // hammer assignment: one schedule fetch per published round, no
      // refetch while waiting out the gap
      assert(node.scheduleFetches.get() === 2)
      // the gap rounds actually waited (paced, not a hot poll loop)
      assert(sleeps >= 5)
    } finally node.close()
  }
}
