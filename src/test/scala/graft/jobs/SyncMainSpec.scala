package graft.jobs

import graft.SparkSpec
import graft.sink.KvBackends
import graft.streaming.StubRpcServer

/** End-to-end CLI lifecycle: arg parsing, a full --once sync from the stub
  * RPC node into the in-memory backend, and the crash-restart backoff loop.
  */
class SyncMainSpec extends SparkSpec {

  test("parseArgs covers the full surface") {
    val a = SyncMain.parseArgs(Array(
      "--endpoints=http://n1/,http://n2/", "--backend=redis://h:7000",
      "--chain=steem", "--blocksPerTrigger=7", "--mode=head",
      "--startBlock=5", "--relaxedPublish", "--once", "--maxRestarts=2",
      "--job=schedule", "--untilBlock=99"))
    assert(a.endpoints === Some("http://n1/,http://n2/"))
    assert(a.backend === "redis://h:7000" && a.chain === "steem")
    assert(a.blocksPerTrigger === 7L && a.mode === "head")
    assert(a.startBlock === Some(5L) && a.relaxedPublish && a.once)
    assert(a.maxRestarts === 2)
    assert(a.job === "schedule" && a.untilBlock === Some(99L))
    val b = SyncMain.parseArgs(Array(
      "--job=intake", "--docs=/data/docs", "--keyPrefix=c:doc",
      "--verifyTau=0.9", "--horizonMs=120000", "--ttl=600",
      "--notify=c:admitted"))
    assert(b.job === "intake" && b.docs === Some("/data/docs"))
    assert(b.keyPrefix === "c:doc" && b.verifyTau === Some(0.9))
    assert(b.horizonMs === 120000L && b.ttlSeconds === 600L)
    assert(b.notifyChannel === Some("c:admitted"))
    val c = SyncMain.parseArgs(Array(
      "--job=intakeState", "--docs=/d", "--state=/s", "--corpus=/c",
      "--tau=0.6", "--retention=ts < timestamp'2024-01-01'",
      "--retentionEvery=12"))
    assert(c.retention === Some("ts < timestamp'2024-01-01'"))
    assert(c.retentionEvery === 12L && c.tau === 0.6)
    val d = SyncMain.parseArgs(Array(
      "--job=intakeState", "--docs=/d", "--state=/s", "--corpus=/c",
      "--qualityWeights=/q.parquet",
      "--qualityMinScore=499000", "--langModels=/l.parquet",
      "--keepLangs=en,fr", "--gateReloadEvery=600"))
    assert(d.qualityWeights === Some("/q.parquet"))
    assert(d.qualityMinScore === Some(499000L))
    assert(d.langModels === Some("/l.parquet"))
    assert(d.keepLangs === Some("en,fr"))
    assert(d.gateReloadEvery === 600L)
    // misplaced / half-specified flags fail loudly (the --retention rule)
    intercept[IllegalArgumentException](
      SyncMain.parseArgs(Array("--qualityWeights=/q")))
    intercept[IllegalArgumentException](
      SyncMain.parseArgs(Array(
        "--job=intakeState", "--docs=/d", "--keepLangs=en")))
    intercept[IllegalArgumentException](
      SyncMain.parseArgs(Array(
        "--job=intakeState", "--docs=/d", "--langModels=/l"))) // no --keepLangs
    // --qualityM/--langM are GONE (m derives from the table's regime
    // stamp): a stale script passing them must fail as unknown, not
    // silently steer a derived value
    val eM = intercept[RuntimeException](
      SyncMain.parseArgs(Array(
        "--job=intakeState", "--docs=/d", "--qualityM=1024")))
    assert(eM.getMessage.contains("unknown argument"))
    val eL = intercept[RuntimeException](
      SyncMain.parseArgs(Array(
        "--job=intakeState", "--docs=/d", "--langM=256")))
    assert(eL.getMessage.contains("unknown argument"))
    intercept[IllegalArgumentException](
      SyncMain.parseArgs(Array(
        "--job=intakeState", "--docs=/d", "--qualityMinScore=600000")))
    intercept[IllegalArgumentException](
      SyncMain.parseArgs(Array( // reload cadence without a weight table
        "--job=intakeState", "--docs=/d", "--gateReloadEvery=600")))
    intercept[IllegalArgumentException](
      SyncMain.parseArgs(Array(
        "--job=intakeState", "--docs=/d", "--retentionEvery=5")))
  }

  test("programmatic Args: langModels without keepLangs fails with the pairing message, not a bare get") {
    // parseArgs enforces the pairing, but Args is a public case class —
    // a direct construction must hit the same loud require, not a
    // NoSuchElementException from an Option.get
    val dir = java.nio.file.Files.createTempDirectory("orphan_docs_").toString
    val e = intercept[RuntimeException](SyncMain.runOnce(spark, SyncMain.Args(
      job = "intakeState", docs = Some(dir), state = Some("/nope-state"),
      corpus = Some("/nope-corpus"), once = true,
      langModels = Some("/nope-models"))))
    assert(e.getMessage.contains("--langModels needs --keepLangs"),
      s"got: ${e.getMessage}")
    // a reload cadence with no weight-table source must hit TrainedGates'
    // own loud require, not be silently zeroed
    val e2 = intercept[IllegalArgumentException](
      SyncMain.runOnce(spark, SyncMain.Args(
        job = "intakeState", docs = Some(dir), state = Some("/nope-state"),
        corpus = Some("/nope-corpus"), once = true, gateReloadEvery = 600L)))
    assert(e2.getMessage.contains("reloadEvery needs a weight-table source"),
      s"got: ${e2.getMessage}")
  }

  test("--job=intakeState with trained-gate flags: weights load from parquet and gate the stream") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    def words(i: Int): String =
      "the tale of and to in " + (1 to 18).map(j => s"sg${i}x$j").mkString(" ")
    val goodMark = (1 to 6).map(_ => " sqgoodmark").mkString
    val badMark = (1 to 6).map(_ => " sqbadmark").mkString
    val trainQ = (1 to 8).map { i =>
      (100L + i, words(i) + (if (i % 2 == 1) goodMark else badMark),
        if (i % 2 == 1) 1 else 0)
    }.toDF("doc_id", "text", "label")
    val qw = graft.llm.QualityLr.trainQualityLr(trainQ, m = 64, steps = 2, lr = 0.5)
    val byY = graft.llm.QualityLr.scoreQualityLr(trainQ, qw, m = 64)
      .join(trainQ.select("doc_id", "label"), "doc_id")
      .groupBy("label")
      .agg(org.apache.spark.sql.functions.sum("score_micros").as("s"),
        org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("s"), r.getAs[Long]("n")))).toMap
    val qThr = math.floor(
      (byY(1)._1.toDouble / byY(1)._2 + byY(0)._1.toDouble / byY(0)._2) / 2.0).toLong
    val trainL = (1 to 8).map { i =>
      (200L + i, words(40 + i) + (if (i % 2 == 1) " szenmark" else " szdemark") * 6,
        if (i % 2 == 1) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val models = graft.llm.QualityLr.trainOneVsRestLr(
      trainL, "lang", Seq("de", "en"), m = 64, steps = 2, lr = 0.5)
    // the ops handoff: weights persist as parquet and round-trip exactly,
    // with m DERIVED from the table's own regime stamp
    val qwPath = java.nio.file.Files.createTempDirectory("sg_qw_").toString + "/w"
    graft.llm.QualityLr.writeWeights(spark, qw, qwPath)
    val (qwBack, qwM) = graft.llm.QualityLr.loadWeights(spark, qwPath)
    assert(qwBack.toSeq === qw.toSeq && qwM === 64)
    val lmPath = java.nio.file.Files.createTempDirectory("sg_lm_").toString + "/m"
    graft.llm.QualityLr.writeOneVsRestModels(spark, models, lmPath)
    val (modelsBack, lmM) = graft.llm.QualityLr.loadOneVsRestModels(spark, lmPath)
    assert(modelsBack.map { case (c, w) => (c, w.toSeq) } ===
      models.map { case (c, w) => (c, w.toSeq) } && lmM === 64)
    // standing corpus + state, then the CLI stream with both gates on
    val corpusDir = java.nio.file.Files.createTempDirectory("sg_corpus_").toString
    Seq((1L, words(90))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(corpusDir)
    val statePath = java.nio.file.Files.createTempDirectory("sg_state_").toString
    graft.llm.StandingState.write(spark.read.parquet(corpusDir), statePath)
    def rec(ts: String, id: Long, text: String): String =
      s"""{"ts":"$ts","doc_id":$id,"text":"$text"}"""
    val dir = java.nio.file.Files.createTempDirectory("sg_docs_")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      Seq(
        rec("2024-01-01T10:00:00Z", 10, words(50) + goodMark + " szenmark" * 4),
        rec("2024-01-01T10:00:01Z", 11, words(51) + badMark + " szenmark" * 4),
        rec("2024-01-01T10:00:02Z", 12, words(52) + goodMark + " szdemark" * 4))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val ck = java.nio.file.Files.createTempDirectory("sg_ck_").toString
    SyncMain.runOnce(spark, SyncMain.Args(
      job = "intakeState", docs = Some(dir.toString),
      state = Some(statePath), corpus = Some(corpusDir),
      checkpoint = ck, tau = 0.5, once = true,
      qualityWeights = Some(qwPath),
      qualityMinScore = Some(qThr),
      langModels = Some(lmPath), keepLangs = Some("en")))
    assert(spark.read.parquet(corpusDir).select("doc_id").as[Long].collect().toSet
      === Set(1L, 10L),
      "10 passes both gates; 11 drops at 1b; 12 drops at 1c")
  }

  test("--job=intake --once: JSONL docs dir -> near-dup intake -> KV backend") {
    // 25-word texts that pass the gopher gate; doc 3 is a near-dup of doc 1
    val good =
      "the quick brown fox jumps over a lazy dog while many other animals " +
        "watch from distant hills and rivers flowing gently toward the open sea"
    val other =
      "a careful reader finds the hidden meaning inside every long paragraph " +
        "because patient study of context and structure rewards attention " +
        "with clear understanding today"
    def rec(ts: String, id: Long, text: String): String =
      s"""{"ts":"$ts","doc_id":$id,"text":"$text"}"""
    val dir = java.nio.file.Files.createTempDirectory("intake-docs")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      Seq(
        rec("2024-01-01T10:00:00Z", 1, good),
        rec("2024-01-01T10:00:01Z", 2, "too short"),
        rec("2024-01-01T10:05:00Z", 3, good + " appended"),
        rec("2024-01-01T10:05:01Z", 4, other))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val ck = java.nio.file.Files.createTempDirectory("intake-sync-ck").toString
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      SyncMain.runOnce(spark, SyncMain.Args(
        job = "intake", docs = Some(dir.toString), backend = "memory",
        checkpoint = ck, keyPrefix = "c:doc", once = true))
      val backend = KvBackends("sync-backend").asInstanceOf[graft.sink.InMemoryKvBackend]
      // gate dropped 2, banding dropped the near-dup 3; 1 and 4 admitted
      assert(backend.keys("c:doc:*").sorted === Seq("c:doc:1", "c:doc:4"))
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage")
    }
  }

  test("--job=intakeState --once: JSONL docs -> state-fed intake -> corpus + state appended") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val good =
      "the quick brown fox jumps over a lazy dog while many other animals " +
        "watch from distant hills and rivers flowing gently toward the open sea"
    val other =
      "a careful reader finds the hidden meaning inside every long paragraph " +
        "because patient study of context and structure rewards attention " +
        "with clear understanding today"
    // day-0 standing corpus + persisted state
    val corpusDir = java.nio.file.Files.createTempDirectory("intake-state-corpus").toString
    Seq((1L, good)).toDF("doc_id", "text").write.mode("overwrite").parquet(corpusDir)
    val statePath = java.nio.file.Files.createTempDirectory("intake-state-state").toString
    graft.llm.StandingState.write(spark.read.parquet(corpusDir), statePath)
    def rec(ts: String, id: Long, text: String): String =
      s"""{"ts":"$ts","doc_id":$id,"text":"$text"}"""
    val dir = java.nio.file.Files.createTempDirectory("intake-state-docs")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      Seq(
        rec("2024-01-01T10:00:00Z", 10, good),             // standing replica -> dropped
        rec("2024-01-01T10:00:01Z", 11, good + " appended"), // near-dup of standing -> dropped
        rec("2024-01-01T10:00:02Z", 12, other))            // novel -> admitted + appended
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val ck = java.nio.file.Files.createTempDirectory("intake-state-ck").toString
    SyncMain.runOnce(spark, SyncMain.Args(
      job = "intakeState", docs = Some(dir.toString),
      state = Some(statePath), corpus = Some(corpusDir),
      checkpoint = ck, tau = 0.5, once = true))
    assert(spark.read.parquet(corpusDir).select("doc_id").as[Long].collect().toSet
      === Set(1L, 12L))
    // the state grew by the admitted doc's artifacts: a later batch-side
    // replica of doc 12 drops against the appended digests
    assert(graft.llm.Dedup.exactIncrementalVsDigests(
      Seq((50L, other)).toDF("doc_id", "text"),
      graft.llm.StandingState.load(spark, statePath).digests)
      .filter(col("doc_id") === 50L).isEmpty)
  }

  test("--once syncs the stub chain end-to-end into the backend") {
    val srv = new StubRpcServer(resource("blocks.jsonl"))
    try {
      val ck = java.nio.file.Files.createTempDirectory("sync-ck").toString
      SyncMain.runOnce(spark, SyncMain.Args(
        endpoints = Some(srv.endpoint),
        vops = Some(resource("vops.jsonl")),
        backend = "memory", checkpoint = ck,
        startBlock = Some(srv.blocks.keys.min),
        blocksPerTrigger = 3L, once = true))
      val backend = KvBackends("sync-backend").asInstanceOf[graft.sink.InMemoryKvBackend]
      // all blocks materialized + checkpoint key advanced to the head
      assert(backend.get("hive:meeseeker:last_block_num") ===
        Some(srv.blocks.keys.max.toString))
      assert(backend.keys("hive:*:*:*:*").nonEmpty)
      assert(backend.publishLog.nonEmpty)
    } finally srv.close()
  }

  test("full production path: RPC source -> pipeline -> Redis-protocol backend") {
    // all three production legs composed: the JSON-RPC polling source reads
    // a stub chain node, the follower pipeline transforms, and the RESP
    // backend materializes over a real socket — then the result is compared
    // byte-for-byte against the same sync into the in-memory backend.
    val rpc = new StubRpcServer(resource("blocks.jsonl"))
    val redis = new graft.sink.StubRedisServer
    try {
      val ckA = java.nio.file.Files.createTempDirectory("sync-prod-a").toString
      SyncMain.runOnce(spark, SyncMain.Args(
        endpoints = Some(rpc.endpoint),
        vops = Some(resource("vops.jsonl")),
        backend = s"redis://127.0.0.1:${redis.port}", checkpoint = ckA,
        startBlock = Some(rpc.blocks.keys.min),
        blocksPerTrigger = 2L, once = true))
      KvBackends("sync-backend").asInstanceOf[graft.sink.RedisKvBackend].close()

      val ckB = java.nio.file.Files.createTempDirectory("sync-prod-b").toString
      SyncMain.runOnce(spark, SyncMain.Args(
        endpoints = Some(rpc.endpoint),
        vops = Some(resource("vops.jsonl")),
        backend = "memory", checkpoint = ckB,
        startBlock = Some(rpc.blocks.keys.min),
        blocksPerTrigger = 2L, once = true))
      val mem = KvBackends("sync-backend").asInstanceOf[graft.sink.InMemoryKvBackend]

      import scala.jdk.CollectionConverters._
      val memKeys = mem.keys("*").sorted
      assert(redis.store.keySet().asScala.toSeq.sorted === memKeys)
      memKeys.foreach(k => assert(Option(redis.store.get(k)) === mem.get(k), s"mismatch at $k"))
      assert(redis.published.asScala.toSeq === mem.publishLog)
      assert(redis.published.asScala.nonEmpty)
    } finally { rpc.close(); redis.close() }
  }

  test("syncLoop restarts with the doubling backoff and gives up at maxRestarts") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val boom = intercept[RuntimeException] {
      SyncMain.syncLoop(
        spark,
        SyncMain.Args(maxRestarts = 3), // no source -> every attempt throws
        sleep = sleeps += _)
    }
    assert(boom.getMessage.contains("need --endpoints or --replay"))
    assert(sleeps.toSeq === Seq(1.0, 2.0, 4.0)) // bin/meeseeker:25-33 curve
  }
}
