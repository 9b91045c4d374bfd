package graft.sink

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import scala.jdk.CollectionConverters._

/** Redis-shaped KV + pub/sub backend surface (the reference's sink:
  * SET/EXPIRE/PUBLISH/GET/KEYS/DEL — block_follower_job.rb:55-93,
  * Rakefile:81-126). Implementations must make `set` idempotent by key so
  * micro-batch replay on recovery yields exactly-once materialization
  * (SURVEY §4.3); `publish` is at-least-once.
  */
trait KvBackend extends Serializable {
  def set(key: String, value: String): Unit
  def expire(key: String, ttlSeconds: Long): Unit
  def publish(channel: String, payload: String): Unit
  def get(key: String): Option[String]
  def keys(glob: String): Seq[String]
  def del(ks: Seq[String]): Int

  /** Barrier for pipelined implementations: returns once every previously
    * issued command is acknowledged. The per-partition sink paths call this
    * at partition end; in-memory backends are synchronous and keep the
    * no-op default. */
  def flush(): Unit = ()
}

/** JVM-local backend for tests and local runs: concurrent maps + an ordered
  * publish log. A production deployment swaps in a Redis-protocol
  * implementation behind the same trait (pipelined SET/EXPIRE per
  * partition, single-connection ordered PUBLISH).
  */
class InMemoryKvBackend extends KvBackend {
  private val store = new ConcurrentHashMap[String, String]()
  private val ttls = new ConcurrentHashMap[String, Long]()
  private val published = new ConcurrentLinkedQueue[(String, String)]()

  override def set(key: String, value: String): Unit = store.put(key, value)
  override def expire(key: String, ttlSeconds: Long): Unit = ttls.put(key, ttlSeconds)
  override def publish(channel: String, payload: String): Unit =
    published.add((channel, payload))
  override def get(key: String): Option[String] = Option(store.get(key))
  override def keys(glob: String): Seq[String] = {
    val re = graft.ops.Glob.toRegex(glob).r
    store.keySet().asScala.filter(k => re.matches(k)).toSeq
  }
  override def del(ks: Seq[String]): Int =
    ks.count(k => store.remove(k) != null)

  def size: Int = store.size
  def ttlOf(key: String): Option[Long] = Option(ttls.get(key))
  def publishLog: Seq[(String, String)] = published.asScala.toSeq
  def clear(): Unit = { store.clear(); ttls.clear(); published.clear() }
}

/** Named registry so executor-side tasks in local mode (and tests) can reach
  * a shared backend instance without serializing it into closures. */
object KvBackends {
  private val registry = new ConcurrentHashMap[String, KvBackend]()
  def register(name: String, backend: KvBackend): Unit = registry.put(name, backend)
  def apply(name: String): KvBackend = {
    val b = registry.get(name)
    require(b != null, s"no KvBackend registered under '$name'")
    b
  }
}
