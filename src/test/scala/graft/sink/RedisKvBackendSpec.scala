package graft.sink

import java.net.ServerSocket
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.model.Model
import graft.ops.{BlockOps, FollowerConfig}
import graft.jobs.BlockFollowerPipeline

/** In-process RESP server: parses inbound command arrays with the shared
  * [[Resp]] codec, applies Redis semantics to a local map, replies per
  * protocol. Each connection gets a handler thread (executor tasks in local
  * mode share one backend connection, but tests may open several).
  */
class StubRedisServer {
  val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
  val ttls = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  val published = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  @volatile var commandCount = 0

  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    try while (true) {
      val sock = server.accept()
      new Thread(() => {
        val in = new java.io.BufferedInputStream(sock.getInputStream)
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        try {
          var cmd = Resp.readCommand(in)
          while (cmd.isDefined) {
            val c = cmd.get
            commandCount += 1
            val reply: Array[Byte] = c.head.toUpperCase match {
              case "SET" => store.put(c(1), c(2)); "+OK\r\n".getBytes
              case "EXPIRE" => ttls.put(c(1), c(2).toLong); ":1\r\n".getBytes
              case "PUBLISH" => published.add((c(1), c(2))); ":0\r\n".getBytes
              case "GET" =>
                Option(store.get(c(1))) match {
                  case Some(v) => s"$$${v.getBytes.length}\r\n$v\r\n".getBytes
                  case None => "$-1\r\n".getBytes
                }
              case "KEYS" =>
                val re = graft.ops.Glob.toRegex(c(1)).r
                val ks = store.keySet().asScala.filter(re.matches(_)).toSeq
                (s"*${ks.size}\r\n" + ks.map(k => s"$$${k.getBytes.length}\r\n$k\r\n").mkString).getBytes
              case "DEL" =>
                val n = c.tail.count(k => store.remove(k) != null)
                s":$n\r\n".getBytes
              case other => s"-ERR unknown command '$other'\r\n".getBytes
            }
            out.write(reply)
            out.flush()
            cmd = Resp.readCommand(in)
          }
        } catch { case _: java.io.IOException => () } finally sock.close()
      }).start()
    } catch { case _: java.io.IOException => () } // server closed
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = server.close()
}

class RedisKvBackendSpec extends SparkSpec {

  test("RESP codec round-trips commands and all five reply kinds") {
    val enc = Resp.encode(Seq("SET", "k", "v1"))
    assert(new String(enc) === "*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$2\r\nv1\r\n")
    val in = new java.io.ByteArrayInputStream(
      "+OK\r\n-ERR boom\r\n:42\r\n$5\r\nhello\r\n$-1\r\n*2\r\n$1\r\na\r\n:7\r\n".getBytes)
    assert(Resp.readReply(in) === Resp.Simple("OK"))
    assert(Resp.readReply(in) === Resp.Err("ERR boom"))
    assert(Resp.readReply(in) === Resp.IntReply(42))
    assert(Resp.readReply(in) === Resp.Bulk(Some("hello")))
    assert(Resp.readReply(in) === Resp.Bulk(None))
    assert(Resp.readReply(in) === Resp.Arr(Seq(Resp.Bulk(Some("a")), Resp.IntReply(7))))
    // multi-byte payloads survive length-prefixed encoding
    val utf = Resp.encode(Seq("SET", "k", "héllo"))
    val cmd = Resp.readCommand(new java.io.ByteArrayInputStream(utf))
    assert(cmd === Some(Seq("SET", "k", "héllo")))
  }

  test("backend ops against a stub server: set/expire/get/keys/del/publish") {
    val srv = new StubRedisServer
    val b = new RedisKvBackend("127.0.0.1", srv.port)
    try {
      // pipelined writes become visible after flush / any read
      (1 to 500).foreach(i => { b.set(s"hive:$i:t:0:vote", s"v$i"); b.expire(s"hive:$i:t:0:vote", 100) })
      assert(b.get("hive:7:t:0:vote") === Some("v7")) // read drains the pipeline
      assert(srv.store.size === 500)
      assert(srv.ttls.get("hive:7:t:0:vote") === 100L)
      assert(b.get("missing") === None)
      assert(b.keys("hive:1?:t:0:vote").size === 10) // 10..19
      assert(b.del(Seq("hive:1:t:0:vote", "missing")) === 1)
      b.publish("hive:block", "{\"block_num\":1}")
      b.publish("hive:op:vote", "{\"key\":\"k\"}")
      b.flush()
      assert(srv.published.asScala.toSeq ===
        Seq(("hive:block", "{\"block_num\":1}"), ("hive:op:vote", "{\"key\":\"k\"}")))
    } finally { b.close(); srv.close() }
  }

  test("per-thread connections: parallel writers don't serialize or lose writes") {
    val srv = new StubRedisServer
    val b = new RedisKvBackend("127.0.0.1", srv.port)
    try {
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          (0 until 200).foreach(i => b.set(s"t$t:k$i", s"v$i"))
          b.flush() // flushes THIS thread's pipeline, like the sink does
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(srv.store.size === 8 * 200)
      assert(b.get("t3:k77") === Some("v77"))
    } finally { b.close(); srv.close() }
  }

  test("follower pipeline over the RESP backend matches the in-memory run") {
    val srv = new StubRedisServer
    val redis = new RedisKvBackend("127.0.0.1", srv.port)
    val mem = new InMemoryKvBackend
    KvBackends.register("redis-pipe", redis)
    KvBackends.register("mem-pipe", mem)
    try {
      val blocks = spark.read.schema(Model.blockSchema).json(resource("blocks.jsonl"))
      val vops = spark.read.schema(Model.vopSchema).json(resource("vops.jsonl"))
      val cfg = FollowerConfig()
      BlockFollowerPipeline.processBatch(blocks, vops, cfg, "mem-pipe")
      BlockFollowerPipeline.processBatch(blocks, vops, cfg, "redis-pipe")
      redis.flush()
      // identical materialized KV state...
      val memKeys = mem.keys("*").sorted
      assert(srv.store.keySet().asScala.toSeq.sorted === memKeys)
      memKeys.foreach(k => assert(Option(srv.store.get(k)) === mem.get(k), s"value mismatch at $k"))
      // ...and the byte-exact strict publish sequence
      assert(srv.published.asScala.toSeq === mem.publishLog)
      assert(srv.published.asScala.nonEmpty)
    } finally { redis.close(); srv.close() }
  }
}
