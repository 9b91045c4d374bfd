package graft.llm

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{Path => HPath}

import graft.SparkSpec

/** The shared swap/lock utility ([[AtomicSwap]]) and the weight-table
  * protocol built on it — the round-17 asks: ONE implementation of the
  * two-rename swap, an ATOMIC local-FS lock acquire, an atomic
  * (rename-to-tombstone) stale-lock break, and the rotation-vs-swap
  * race pinned end to end (every concurrent load returns fully-old or
  * fully-new weights; a reader heal landing in the writer's rename
  * window degrades to a retried rename, not a failed re-train). */
class AtomicSwapSpec extends SparkSpec {

  private def fs = new HPath("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("atomicCreate: exactly one of N concurrent creators wins") {
    val dir = tmp("aswap_create_")
    val lock = new HPath(s"$dir/t__lock")
    val threads = 8
    val rounds = 25
    (1 to rounds).foreach { _ =>
      val start = new CountDownLatch(1)
      val wins = new AtomicInteger(0)
      val pool = (1 to threads).map { i =>
        val t = new Thread(() => {
          start.await()
          if (AtomicSwap.atomicCreate(fs, lock, s"owner$i")) wins.incrementAndGet()
        })
        t.start(); t
      }
      start.countDown()
      pool.foreach(_.join(10000))
      assert(wins.get() === 1, "exactly one creator must win per round")
      fs.delete(lock, false)
    }
  }

  test("atomicCreate: first-ever create in a not-yet-existing directory tree succeeds") {
    // a first writeWeights into a fresh path must not fail on the lock
    // create just because the parent dirs don't exist yet (Hadoop
    // fs.create auto-creates parents; the java.io.File branch must too)
    val dir = tmp("aswap_fresh_")
    val lock = new HPath(s"$dir/a/b/c/t__lock")
    assert(AtomicSwap.atomicCreate(fs, lock, "owner"))
    assert(fs.exists(lock))
    assert(!AtomicSwap.atomicCreate(fs, lock, "second"), "second create must lose")
  }

  test("breakByRename: exactly one of N concurrent breakers wins, and the lock is gone") {
    val dir = tmp("aswap_break_")
    val lock = new HPath(s"$dir/t__lock")
    (1 to 25).foreach { _ =>
      assert(AtomicSwap.atomicCreate(fs, lock, "stale-holder"))
      val start = new CountDownLatch(1)
      val wins = new AtomicInteger(0)
      val pool = (1 to 8).map { i =>
        val t = new Thread(() => {
          start.await()
          if (AtomicSwap.breakByRename(fs, lock, s"tok$i")) wins.incrementAndGet()
        })
        t.start(); t
      }
      start.countDown()
      pool.foreach(_.join(10000))
      assert(wins.get() === 1, "exactly one breaker must win")
      assert(!fs.exists(lock), "the broken lock must be gone")
      // no tombstone litter: every winner deletes its own tombstone and
      // losers never created one
      val litter = fs.globStatus(new HPath(s"$dir/t__lock__tomb_*"))
      assert(litter == null || litter.isEmpty, "tombstones must not leak")
    }
  }

  test("two racing writeWeights: exactly one wins per collision, table never torn") {
    val path = tmp("aswap_ww_") + "/w"
    val wA = Array.tabulate(17)(i => 1000L + i) // m = 16
    val wB = Array.tabulate(17)(i => 2000L + i)
    QualityLr.writeWeights(spark, wA, path) // seed
    val held = new AtomicInteger(0)
    val rounds = 12
    (1 to rounds).foreach { r =>
      val start = new CountDownLatch(1)
      def writer(w: Array[Long]) = new Thread(() => {
        start.await()
        try QualityLr.writeWeights(spark, w, path)
        catch {
          case e: java.io.IOException
              if e.getMessage.contains("held by a concurrent writer") =>
            held.incrementAndGet()
        }
      })
      val t1 = writer(wA); val t2 = writer(wB)
      t1.start(); t2.start(); start.countDown()
      t1.join(30000); t2.join(30000)
      // whoever won (one or both, serialized), the table is never torn:
      // the load's own guards verify one m regime and dense coverage
      val (w, m) = QualityLr.loadWeights(spark, path)
      assert(m === 16)
      assert(w.toSeq == wA.toSeq || w.toSeq == wB.toSeq,
        "table must be fully one writer's vector")
    }
    // the loser path is exercised in SOME round on a 2-thread race box,
    // but timing is not guaranteed — only assert it never exceeds one
    // loser per round
    assert(held.get() <= rounds)
  }

  test("rotation-vs-swap race: every concurrent load is fully-old or fully-new, no load ever fails") {
    val path = tmp("aswap_race_") + "/w"
    val wA = Array.tabulate(9)(i => 100L + i) // m = 8
    val wB = Array.tabulate(9)(i => 900L + i)
    QualityLr.writeWeights(spark, wA, path)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val loadFailure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val torn = new AtomicInteger(0)
    val loads = new AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val (w, m) = QualityLr.loadWeights(spark, path)
          loads.incrementAndGet()
          if (!(m == 8 && (w.toSeq == wA.toSeq || w.toSeq == wB.toSeq)))
            torn.incrementAndGet()
        } catch { case t: Throwable => loadFailure.set(t); stop.set(true) }
      }
    })
    reader.start()
    // writer: alternate A/B swaps while the reader hammers loads — the
    // reader's heal can land inside the writer's two-rename window; the
    // writer's retry-once and the reader's readWithHeal retries must
    // absorb every interleaving
    val writeFailure =
      try {
        (1 to 30).foreach { i =>
          QualityLr.writeWeights(spark, if (i % 2 == 0) wA else wB, path)
        }
        None
      } catch { case t: Throwable => Some(t) } finally stop.set(true)
    reader.join(60000)
    assert(writeFailure.isEmpty, s"a writer swap failed: $writeFailure")
    assert(loadFailure.get() == null,
      s"a concurrent load failed: ${loadFailure.get()}")
    assert(torn.get() === 0, "a load observed a torn table")
    assert(loads.get() > 0, "the reader must have actually loaded")
    // quiesced table is valid and the lock is released
    val (w, m) = QualityLr.loadWeights(spark, path)
    assert(m === 8 && (w.toSeq == wA.toSeq || w.toSeq == wB.toSeq))
    assert(!fs.exists(new HPath(path + "__lock")))
  }

  test("commitStaged under an adversarial concurrent healer: swaps never fail, table always complete") {
    // the raw tolerance: a heal with NO lock discipline at all racing the
    // two-rename window — strictly harsher than readWithHeal's guarded
    // heal. commitStaged's re-retire-and-retry-once must absorb it.
    val dir = tmp("aswap_heal_")
    val live = new HPath(s"$dir/t")
    def writeDir(p: HPath, tag: String): Unit = {
      fs.mkdirs(p)
      val out = fs.create(new HPath(p, "data"), true)
      try out.write(tag.getBytes("UTF-8")) finally out.close()
    }
    def readTag(p: HPath): String = {
      val in = fs.open(new HPath(p, "data"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    writeDir(live, "v0")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val healer = new Thread(() => {
      // tiny sleep: commitStaged documents tolerance for exactly ONE heal
      // interference per commit; an unthrottled spin could land two heals
      // inside one retry window, which the contract is explicit it does
      // NOT absorb (that shape means a genuinely concurrent writer)
      while (!stop.get()) { AtomicSwap.heal(fs, live); Thread.sleep(1) }
    })
    healer.start()
    try {
      (1 to 50).foreach { i =>
        val staged = new HPath(s"$dir/t__staged")
        writeDir(staged, s"v$i")
        // must not throw for <=1 interference; retry once on the
        // documented double-interference IOException (outside contract)
        try AtomicSwap.commitStaged(fs, live, staged, "spec")
        catch {
          case _: java.io.IOException if fs.exists(staged) =>
            AtomicSwap.heal(fs, live)
            AtomicSwap.commitStaged(fs, live, staged, "spec")
        }
        assert(readTag(live) === s"v$i",
          "table must carry this commit's bytes (tolerance bound: one " +
            "heal interference per commit is absorbed; a double hit is " +
            "retried by the spec, not the primitive)")
      }
    } finally { stop.set(true); healer.join(10000) }
  }

  test("heal: crashed two-rename window (live missing, retired present) recovers on load") {
    val path = tmp("aswap_crash_") + "/w"
    val w = Array.tabulate(5)(i => 10L + i) // m = 4
    QualityLr.writeWeights(spark, w, path)
    // simulate the crash: live renamed away to __retired, nothing live
    assert(fs.rename(new HPath(path), new HPath(path + "__retired")))
    val (got, m) = QualityLr.loadWeights(spark, path) // heals, then reads
    assert(m === 4 && got.toSeq == w.toSeq)
    assert(fs.exists(new HPath(path)) && !fs.exists(new HPath(path + "__retired")))
  }
}
