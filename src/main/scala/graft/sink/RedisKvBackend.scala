package graft.sink

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal RESP (REdis Serialization Protocol) codec — encoding of command
  * arrays and decoding of the five reply kinds. Protocol per the public
  * Redis protocol spec; no client library (zero-egress build).
  */
object Resp {

  sealed trait Reply
  final case class Simple(s: String) extends Reply
  final case class Err(msg: String) extends Reply
  final case class IntReply(n: Long) extends Reply
  final case class Bulk(v: Option[String]) extends Reply
  final case class Arr(items: Seq[Reply]) extends Reply

  /** `*N\r\n` then `$len\r\n<bytes>\r\n` per argument. */
  def encode(cmd: Seq[String]): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    sb.write(s"*${cmd.size}\r\n".getBytes(UTF_8))
    cmd.foreach { a =>
      val b = a.getBytes(UTF_8)
      sb.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      sb.write(b)
      sb.write('\r'); sb.write('\n')
    }
    sb.toByteArray
  }

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c == -1) throw new EOFException("RESP stream closed mid-line")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new EOFException("RESP line missing LF")
    sb.toString
  }

  def readReply(in: InputStream): Reply = in.read() match {
    case '+' => Simple(readLine(in))
    case '-' => Err(readLine(in))
    case ':' => IntReply(readLine(in).toLong)
    case '$' =>
      val len = readLine(in).toInt
      if (len < 0) Bulk(None)
      else {
        val buf = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val n = in.read(buf, off, len - off)
          if (n < 0) throw new EOFException("RESP stream closed mid-bulk")
          off += n
        }
        readLine(in) // trailing CRLF
        Bulk(Some(new String(buf, UTF_8)))
      }
    case '*' =>
      val n = readLine(in).toInt
      if (n < 0) Arr(Nil)
      else Arr((0 until n).map(_ => readReply(in)))
    case -1 => throw new EOFException("RESP stream closed")
    case c => throw new IllegalStateException(s"unknown RESP type byte '${c.toChar}'")
  }

  /** Read a full inbound COMMAND (always a flat array of bulk strings) —
    * the server side of the protocol, used by the stub server in tests. */
  def readCommand(in: InputStream): Option[Seq[String]] = {
    val first = in.read()
    if (first == -1) return None
    require(first == '*', s"command must be a RESP array, got '${first.toChar}'")
    val n = readLine(in).toInt
    Some((0 until n).map { _ =>
      require(in.read() == '$', "command args must be bulk strings")
      val len = readLine(in).toInt
      val buf = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val r = in.read(buf, off, len - off)
        if (r < 0) throw new EOFException("closed mid-arg")
        off += r
      }
      readLine(in)
      new String(buf, UTF_8)
    })
  }
}

/** Redis-protocol [[KvBackend]] — the production twin of the reference's
  * actual sink (the reference IS Redis: block_follower_job.rb:55-56,79-93).
  *
  * Wire behavior:
  *  - SET/EXPIRE are PIPELINED: commands buffer on the socket and replies
  *    are drained every `pipelineDepth` commands and on [[flush]] — one
  *    round-trip per batch instead of per key (the per-partition write path
  *    calls flush() once at partition end);
  *  - PUBLISH rides the calling thread's connection in call order — the
  *    strict publish path is one ordered task = one thread = one
  *    connection, so the strict sequence maps 1:1 onto the wire;
  *  - reads (GET/KEYS/DEL) drain the caller's pipeline first, so a task
  *    always reads its own writes.
  *
  * CONNECTION-PER-THREAD: each executor task thread lazily opens its own
  * socket, so 32 parallel writer partitions pump 32 pipelined connections
  * instead of serializing on one lock (the round-2 review's named
  * bottleneck). Connection state is transient and per-thread; a broken
  * socket is invalidated so the next op on that thread reconnects fresh.
  */
class RedisKvBackend(host: String, port: Int, pipelineDepth: Int = 256)
    extends KvBackend {

  /** One thread's connection: pipeline counter + reply stream. */
  private final class Conn {
    var socket: Socket = _
    var out: OutputStream = _
    var in: InputStream = _
    var pending: Int = 0

    def ensureConnected(): Unit =
      if (socket == null || socket.isClosed || !socket.isConnected) {
        val s = new Socket()
        s.connect(new InetSocketAddress(host, port), 5000)
        s.setTcpNoDelay(true)
        socket = s
        out = new BufferedOutputStream(s.getOutputStream, 64 * 1024)
        in = new BufferedInputStream(s.getInputStream, 64 * 1024)
        pending = 0
      }

    /** Tear down so the next op reconnects fresh: after an I/O failure the
      * peer may have reset the socket (local state still reads "connected")
      * and the reply stream position is unknown. */
    def invalidate(): Unit = {
      if (socket != null) { try socket.close() catch { case _: java.io.IOException => () } }
      socket = null; out = null; in = null; pending = 0
    }

    def drain(): Unit = {
      if (out == null) return // nothing ever sent (e.g. flush on an empty partition)
      out.flush()
      // decrement BEFORE surfacing an error reply: the command executed and
      // its reply was consumed, so the stream stays in sync — only the
      // failure is reported. (Decrementing after the check would leave
      // `pending` stale by one and desync every later reply.)
      while (pending > 0) {
        val r = Resp.readReply(in)
        pending -= 1
        r match {
          case Resp.Err(m) => throw new IllegalStateException(s"redis error: $m")
          case _ => ()
        }
      }
    }

    def close(): Unit =
      if (socket != null) {
        try drain()
        finally { try socket.close() catch { case _: java.io.IOException => () }; socket = null }
      }
  }

  @transient private lazy val allConns =
    new java.util.concurrent.ConcurrentLinkedQueue[Conn]()
  @transient private lazy val conn: ThreadLocal[Conn] =
    ThreadLocal.withInitial(() => { val c = new Conn; allConns.add(c); c })

  private def withConn[T](body: Conn => T): T = {
    val c = conn.get()
    try { c.ensureConnected(); body(c) }
    catch { case e: java.io.IOException => c.invalidate(); throw e }
  }

  private def fail(r: Resp.Reply): Resp.Reply = r match {
    case Resp.Err(m) => throw new IllegalStateException(s"redis error: $m")
    case ok => ok
  }

  /** Fire-and-collect-later (pipelined) command on this thread's conn. */
  private def send(cmd: String*): Unit = withConn { c =>
    c.out.write(Resp.encode(cmd))
    c.pending += 1
    if (c.pending >= pipelineDepth) c.drain()
  }

  /** Round-trip command: drains this thread's pipeline, reads its reply. */
  private def call(cmd: String*): Resp.Reply = withConn { c =>
    c.drain()
    c.out.write(Resp.encode(cmd))
    c.out.flush()
    fail(Resp.readReply(c.in))
  }

  override def set(key: String, value: String): Unit = send("SET", key, value)
  override def expire(key: String, ttlSeconds: Long): Unit =
    send("EXPIRE", key, ttlSeconds.toString)
  override def publish(channel: String, payload: String): Unit =
    send("PUBLISH", channel, payload)

  override def flush(): Unit = {
    // no ensureConnected: flushing an idle thread must not open a socket
    val c = conn.get()
    try c.drain()
    catch { case e: java.io.IOException => c.invalidate(); throw e }
  }

  override def get(key: String): Option[String] =
    call("GET", key) match {
      case Resp.Bulk(v) => v
      case other => throw new IllegalStateException(s"GET: unexpected $other")
    }

  override def keys(glob: String): Seq[String] =
    call("KEYS", glob) match {
      case Resp.Arr(items) => items.collect { case Resp.Bulk(Some(k)) => k }
      case other => throw new IllegalStateException(s"KEYS: unexpected $other")
    }

  override def del(ks: Seq[String]): Int =
    if (ks.isEmpty) 0
    else call("DEL" +: ks: _*) match {
      case Resp.IntReply(n) => n.toInt
      case other => throw new IllegalStateException(s"DEL: unexpected $other")
    }

  /** Close EVERY thread's connection (driver-side teardown). */
  def close(): Unit = {
    var c = allConns.poll()
    while (c != null) { c.close(); c = allConns.poll() }
  }
}
