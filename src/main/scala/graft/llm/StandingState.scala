package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED standing-corpus state for the ingest cycle — the artifact
  * store that makes [[CorpusPipeline.prepareIncremental]] truly
  * batch-shaped RUN-OVER-RUN, not just within one run.
  *
  * Without it, every daily ingest recomputes the standing side from the
  * corpus text: the exact leg re-digests every standing doc, the LSH leg
  * re-runs the shingle + minhash projection over every standing doc, and
  * the semantic leg (absent passed centroids) re-runs a Lloyd training —
  * all O(standing), i.e. O(100 TB), for a batch-sized result. This state
  * persists exactly those standing-side derivations as parquet tables:
  *
  *  - `digests/`   — distinct content digests ([[Dedup.digestCol]] of the
  *                   scrubbed text), the [[Dedup.exactIncrementalVsDigests]]
  *                   side: 16 bytes per standing doc;
  *  - `bands/`     — LSH band rows (doc_id, band, sig, n) over the
  *                   (optionally normalized) text, the
  *                   [[Dedup.dedupNearLshIncrementalVsBands]] side;
  *  - `centroids/` — frozen SemDeDup centroids (when an embeddings frame
  *                   was supplied): k x dim doubles;
  *  - `meta/`      — one row recording the fingerprint parameters
  *                   (shingleSize, numHashes, bandRows, normalization)
  *                   so a state cannot silently be used under a different
  *                   [[CorpusPipeline.Config]].
  *
  * Standing TEXT is deliberately NOT part of the state: the incremental
  * legs touch standing text only for batch-shaped candidate verification
  * and censuses, which read the standing corpus table directly (with
  * semi-join pruning). [[append]] closes the cycle: after admitting a
  * prepared batch, its digests and band rows append to the tables, so the
  * next ingest's standing side is one table scan of precomputed artifacts
  * regardless of corpus size.
  */
final case class StandingState(
    digests: DataFrame,
    bands: DataFrame,
    centroids: Option[Seq[Seq[Double]]],
    meta: StandingState.Meta,
    spanIndex: Option[(DataFrame, Int)] = None) {

  /** Fail loudly when a state trained under one fingerprint regime is fed
    * to a pipeline configured with another — mixed band rows would
    * silently miss near-dups. The span check is index-presence + window
    * width: a pipeline with the span stage on fed a state without a span
    * index would silently skip standing-side span coverage, and mixed
    * window widths would never hash-match. */
  def requireCompatible(cfg: CorpusPipeline.Config): Unit = {
    StandingState.requireMetaCompatible(meta, cfg)
    cfg.removeDupSpans.foreach { case (w, _) =>
      require(spanIndex.isDefined,
        "standing state has no span index but the config enables span dedup " +
          "(removeDupSpans) — rebuild/rewrite the state under this config")
      require(spanIndex.get._2 == w,
        s"standing state span index has w=${spanIndex.get._2}, config wants $w")
    }
  }
}

object StandingState {

  /** `docKeyed` is NOT persisted in the meta table — it is derived at
    * [[load]] from the digests table's own schema (presence of a
    * `doc_id` column), so the artifact regime is self-describing and a
    * meta row can never disagree with the rows it describes. Legacy
    * (payload-free) states read back `docKeyed = false` untouched. */
  final case class Meta(
      shingleSize: Int,
      numHashes: Int,
      bandRows: Int,
      normalizedFingerprints: Boolean,
      docKeyed: Boolean = false)

  /** The regime-compatibility check behind [[StandingState.requireCompatible]],
    * meta-only so the append paths can run it without a loaded state. */
  private[llm] def requireMetaCompatible(meta: Meta, cfg: CorpusPipeline.Config): Unit = {
    require(meta.shingleSize == cfg.shingleSize,
      s"standing state has shingleSize ${meta.shingleSize}, config wants ${cfg.shingleSize}")
    require(meta.normalizedFingerprints == cfg.normalizeFingerprints,
      s"standing state normalizedFingerprints=${meta.normalizedFingerprints}, " +
        s"config wants ${cfg.normalizeFingerprints}")
  }

  /** The fingerprint projection the state persists for a corpus frame
    * under `cfg`: digests over the raw (scrubbed) text — exact dedup is
    * byte-exact by design — and band rows over the normalized text when
    * the config normalizes fingerprints, mirroring
    * [[CorpusPipeline.prepareIncremental]]'s legs exactly. */
  private def artifacts(
      corpus: DataFrame, cfg: CorpusPipeline.Config,
      numHashes: Int, bandRows: Int, docKeyed: Boolean): (DataFrame, DataFrame) = {
    // DOC-KEYED digests carry the contributing doc_id (one row per doc,
    // +8 bytes over the payload-free set) — the schema that makes
    // retention SUBTRACTION sound: an expired doc's row drops by
    // anti-join while a retained doc sharing the digest keeps its own
    // row, so the digest stays standing. Consumers are unchanged either
    // way ([[Dedup.exactIncrementalVsDigests]] projects
    // `select("digest").distinct()`).
    val digests =
      if (docKeyed) corpus.select(col("doc_id"), Dedup.digestCol("text").as("digest"))
      else corpus.select(Dedup.digestCol("text").as("digest")).distinct()
    val fpCorpus =
      if (cfg.normalizeFingerprints) TextOps.normalized(corpus) else corpus
    val bands = TextOps.bandRowsSizedDF(
      fpCorpus, cfg.shingleSize, numHashes, bandRows)
      .select("doc_id", "band", "sig", "n")
    (digests, bands)
  }

  /** IN-SESSION state for an already-prepared standing corpus — no IO;
    * [[write]] is this plus persistence. `embeddings` (covering at least
    * the standing doc_ids) trains and freezes the SemDeDup centroids.
    * `docKeyed` (default TRUE — the regime for new states) keys the
    * digest and span-hash rows by contributing doc_id, which is what
    * makes [[expire]] an O(expired) anti-join pass instead of a
    * lease-held full-corpus re-featurize; pass false only to build a
    * legacy payload-free state (the rebuild-on-expire regime). */
  def build(
      standing: DataFrame,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config(),
      embeddings: Option[DataFrame] = None,
      numHashes: Int = 16,
      bandRows: Int = 2,
      docKeyed: Boolean = true): StandingState = {
    val (digests, bands) = artifacts(standing, cfg, numHashes, bandRows, docKeyed)
    val cs = embeddings.map { ef =>
      val standVecs = ef.join(standing.select("doc_id"), Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("vec_id"), col("embedding"))
        .localCheckpoint(false)
      Dedup.semDedupCentroids(standVecs, cfg.semDedupNCentroids)
    }
    val spans = cfg.removeDupSpans.map { case (w, _) =>
      (if (docKeyed) TextOps.spanWindowHashesKeyed(standing, w)
       else TextOps.spanWindowHashes(standing, w), w)
    }
    StandingState(digests, bands, cs,
      Meta(cfg.shingleSize, numHashes, bandRows, cfg.normalizeFingerprints,
        docKeyed),
      spans)
  }

  /** Persist the state for `standing` under `path` (overwrites). One pass
    * computes digests and band rows; the optional Lloyd run is the same
    * deterministic training the frame-fed pipeline would do per-ingest —
    * done ONCE here. */
  def write(
      standing: DataFrame,
      path: String,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config(),
      embeddings: Option[DataFrame] = None,
      numHashes: Int = 16,
      bandRows: Int = 2,
      docKeyed: Boolean = true): StandingState = {
    val spark = standing.sparkSession
    import spark.implicits._
    // one materialization of the scrubbed standing text feeds both legs
    val st = Frames.barrier(standing)
    val state = build(st, cfg, embeddings, numHashes, bandRows, docKeyed)
    // the four data tables are independent projections of the same
    // barriered corpus — write them CONCURRENTLY (guide §2.6; the lazy
    // checkpoint races are benign: whichever job computes a partition
    // first caches it for the others). The meta row commits strictly
    // LAST, preserving the failure shape a partial write leaves today
    // (a state dir without meta never loads as complete).
    inParallel(Seq(
      () => Frames.sizedWrite(state.digests)
        .write.mode("overwrite").parquet(s"$path/digests"),
      () => Frames.sizedWrite(state.bands)
        .write.mode("overwrite").parquet(s"$path/bands")) ++
      state.centroids.map(cs => () =>
        cs.zipWithIndex.map { case (c, i) => (i, c) }.toDF("idx", "c")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")) ++
      state.spanIndex.map { case (hashes, w) => () => {
        Frames.sizedWrite(hashes)
          .write.mode("overwrite").parquet(s"$path/span_hashes")
        // span_meta rides behind its own hashes (the spans' completion
        // marker), inside the parallel group — only the STATE meta row
        // below marks the whole write complete
        Seq(w).toDF("w")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/span_meta")
      } })
    Seq((state.meta.shingleSize, state.meta.numHashes, state.meta.bandRows,
      state.meta.normalizedFingerprints))
      .toDF("shingle_size", "num_hashes", "band_rows", "normalized")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    state
  }

  /** Load a persisted state. The digest/band frames are lazy table scans —
    * nothing is read until an ingest uses them.
    *
    * The META and SPAN-REGIME rows are content-cached across calls:
    * a streaming intake loads the state every micro-batch, and without
    * the cache each load pays one Spark job per regime row (meta.head,
    * span_meta.head) for values that are WRITE-TIME CONSTANTS of the
    * state. The cache key is the regime table's own part-file listing
    * (parquet part names carry a per-write UUID), so any rewrite —
    * however fast — changes the key and re-reads; no mtime-granularity
    * aliasing, and the per-batch cost drops to one driver-side
    * directory listing per regime table. */
  def load(spark: SparkSession, path: String): StandingState = {
    Seq("digests", "bands").foreach(heal(spark, path, _))
    val digests = readTable(spark, s"$path/digests")
    val metaRow = cachedRegimeRow(spark, s"$path/meta")
    val meta = Meta(metaRow.getAs[Int]("shingle_size"),
      metaRow.getAs[Int]("num_hashes"),
      metaRow.getAs[Int]("band_rows"), metaRow.getAs[Boolean]("normalized"),
      // the regime is self-describing: keyed iff the rows carry doc_id
      docKeyed = digests.columns.contains("doc_id"))
    val cs =
      if (!tableExists(spark, s"$path/centroids")) None
      else Some(spark.read.parquet(s"$path/centroids")
        .orderBy("idx").collect()
        .map(r => r.getSeq[Double](r.fieldIndex("c")).toSeq).toSeq)
    val spans =
      if (!tableExists(spark, s"$path/span_meta")) None
      else {
        heal(spark, path, "span_hashes")
        val w = cachedRegimeRow(spark, s"$path/span_meta").getAs[Int]("w")
        Some((readTable(spark, s"$path/span_hashes"), w))
      }
    StandingState(
      digests,
      readTable(spark, s"$path/bands"),
      cs, meta, spans)
  }

  /** Single-row regime tables (meta, span_meta), cached by the table
    * dir's part-file listing — see [[load]]. Superseded writes are
    * evicted by key replacement per table path; CROSS-path growth is
    * bounded by [[RegimeCacheMax]] — a driver that touches many
    * distinct state paths over its lifetime clears the cache when it
    * crosses the cap (a full re-read per table is one single-row
    * parquet fetch, so the miss penalty is trivial vs. an unbounded
    * Row-per-path map). */
  private val RegimeCacheMax = 128
  private val regimeRowCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Row)]()

  /** `spark.read.parquet(path)` with the table's Spark schema fetched
    * from ONE part-file footer DRIVER-SIDE. Spark 4 runs a distributed
    * schema-inference job per untyped parquet read — measured at one
    * Spark job per read even for a single-file table — and the intake's
    * per-micro-batch reads (state digests + bands + the corpus table)
    * paid three such jobs per batch, pure driver-roundtrip latency at
    * any scale (round-19 jobs-per-batch diet). Every table in scope is
    * Spark-written, so each footer carries the exact Spark schema under
    * the `org.apache.spark.sql.parquet.row.metadata` key; a file
    * without it (foreign writer), an unlistable dir, or any footer
    * hiccup falls back to the plain inference read, preserving today's
    * behavior including its error shapes. NO schema caching across
    * calls: the footer is re-read per call (~ms on any FS), so a
    * regime-changing rewrite (e.g. digest-table key migration) can
    * never serve a stale schema. */
  private[graft] def readTable(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val schema =
      try {
        val p = new HPath(path)
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = p.getFileSystem(conf)
        fs.listStatus(p).find { st =>
          val n = st.getPath.getName
          st.isFile && st.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
        }.flatMap { st =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
          try Option(rd.getFooter.getFileMetaData.getKeyValueMetaData
              .get("org.apache.spark.sql.parquet.row.metadata"))
            .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[org.apache.spark.sql.types.StructType])
          finally rd.close()
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    schema.map(s => spark.read.schema(s).parquet(path))
      .getOrElse(spark.read.parquet(path))
  }

  private def cachedRegimeRow(spark: SparkSession, tablePath: String): Row = {
    import org.apache.hadoop.fs.{Path => HPath}
    val p = new HPath(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val key =
      try fs.listStatus(p).map(_.getPath.getName).sorted.mkString(",")
      catch { case _: java.io.FileNotFoundException => "" }
    val cached = regimeRowCache.get(tablePath)
    if (cached != null && cached._1 == key && key.nonEmpty) cached._2
    else {
      val r = readTable(spark, tablePath).head()
      if (regimeRowCache.size >= RegimeCacheMax) regimeRowCache.clear()
      regimeRowCache.put(tablePath, (key, r))
      r
    }
  }

  /** Close the ingest cycle: append an ADMITTED batch's digests and band
    * rows to the persisted tables (batch-shaped work — the standing corpus
    * is untouched). The caller appends the batch rows to the corpus table
    * itself; centroids stay frozen (re-train deliberately, via [[write]]).
    * Duplicate digests across appends are fine — the exact leg dedupes.
    *
    * The band regime (numHashes, bandRows) is READ FROM THE STATE's meta
    * row, never passed: a state written under 32/4 must not accumulate
    * 16/2 band rows (sigs would never match and near-dups of appended
    * docs would silently sail through — same reason [[appendEmbBuckets]]
    * reads `emb_meta`). `cfg` must still match the persisted shingle /
    * normalization regime, checked loudly. */
  def append(
      batch: DataFrame,
      path: String,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()): Unit =
    appendWithMeta(batch, path, cfg, load(batch.sparkSession, path).meta)

  /** [[append]] with the state's meta row already in hand — the streaming
    * batch leg ([[graft.streaming.CorpusIntakeJob.ingestTextBatch]]) loads
    * the state once per micro-batch and passes the meta through, skipping
    * a second load per batch. Same compatibility checks, same write
    * order. */
  private[graft] def appendWithMeta(
      batch: DataFrame,
      path: String,
      cfg: CorpusPipeline.Config,
      meta: Meta): Unit = {
    val spark = batch.sparkSession
    val (digests, bands) = artifactsFor(batch, cfg, meta)
    val spans = spanHashesFor(batch, path)
    withLease(spark, path, "append") {
      writeArtifacts(digests, bands, path, spans)
    }
  }

  /** The admitted batch's span-window hashes under the state's PERSISTED
    * window width — Some iff the state carries a span index (`span_meta`
    * exists). Appending these closes the span-dedup cycle exactly like
    * digests/bands close the exact/near cycles: the next ingest's span
    * stage sees this batch's windows as standing. `w` is read from the
    * state, never passed — hashes built under a different width would
    * never match and cross-batch duplication would silently sail through
    * (the [[append]] band-regime rule applied to spans). */
  private[graft] def spanHashesFor(
      batch: DataFrame, path: String): Option[DataFrame] = {
    val spark = batch.sparkSession
    if (!tableExists(spark, s"$path/span_meta")) None
    else {
      val w = cachedRegimeRow(spark, s"$path/span_meta").getAs[Int]("w")
      // follow the PERSISTED table's regime (self-describing schema, same
      // rule as [[load]]) — appending payload-free rows to a keyed index
      // would fail the scan; appending keyed rows to a legacy index would
      // leave rows no anti-join can reach
      Some(if (spanIndexKeyed(spark, path)) TextOps.spanWindowHashesKeyed(batch, w)
           else TextOps.spanWindowHashes(batch, w))
    }
  }

  /** [[spanHashesFor]] against an already-LOADED state — the streaming
    * batch leg's form: [[load]] just resolved the span regime (width +
    * keyed-ness), so re-probing the path per micro-batch would re-pay
    * two existence probes and a schema read for constants already in
    * hand. Same regime rules, zero additional IO. */
  private[graft] def spanHashesForState(
      batch: DataFrame, state: StandingState): Option[DataFrame] =
    state.spanIndex.map { case (hashes, w) =>
      if (hashes.columns.contains("doc_id")) TextOps.spanWindowHashesKeyed(batch, w)
      else TextOps.spanWindowHashes(batch, w)
    }

  /** True iff the persisted span index at `path` is doc-keyed (carries a
    * `doc_id` column). False for legacy payload-free indexes and when the
    * table does not exist yet. */
  private def spanIndexKeyed(spark: SparkSession, path: String): Boolean =
    tableExists(spark, s"$path/span_hashes") &&
      spark.read.parquet(s"$path/span_hashes").columns.contains("doc_id")

  /** The artifact projection of [[appendWithMeta]] split from its write,
    * so the ingest batch leg can compute lazily and commit the corpus
    * append + artifact append under ONE (retried) lease hold. */
  private[graft] def artifactsFor(
      batch: DataFrame,
      cfg: CorpusPipeline.Config,
      meta: Meta): (DataFrame, DataFrame) = {
    requireMetaCompatible(meta, cfg)
    val b = Frames.barrier(batch)
    artifacts(b, cfg, meta.numHashes, meta.bandRows, meta.docKeyed)
  }

  /** The write half of [[appendWithMeta]] — caller MUST hold the lease.
    * Digests and span hashes commit CONCURRENTLY (independent tables,
    * both projections of the same checkpointed admitted frame — round-19
    * append fusion: overlapping them cuts one append's wall time from
    * every span-indexed ingest batch), bands strictly LAST: a crash
    * anywhere before the band write leaves docs with no band rows —
    * exactly the drift [[repairTextArtifacts]] detects (bands-absence is
    * the single witness; digests carry no doc_id in the legacy regime,
    * so digest-absence cannot be audited) and repairs by re-appending
    * everything (duplicates are set-semantic on every table). A failure
    * in EITHER parallel leg propagates before the band write, so every
    * crash/failure shape still leaves the drifted docs missing from
    * `bands/`. */
  private[graft] def writeArtifacts(
      digests: DataFrame, bands: DataFrame, path: String,
      spans: Option[DataFrame] = None): Unit = {
    // every append is output-file-sized (Frames.sizedWrite — guide §6):
    // the state tables are re-scanned every batch and re-listed by every
    // swap, so one advisory-sized file per append beats one tiny file
    // per upstream partition on both the write and every later read
    spans match {
      case None =>
        Frames.sizedWrite(digests).write.mode("append").parquet(s"$path/digests")
      case Some(sp) =>
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec = artifactWriteEc
        val fd = Future(
          Frames.sizedWrite(digests).write.mode("append").parquet(s"$path/digests"))
        val fs = Future(
          Frames.sizedWrite(sp).write.mode("append").parquet(s"$path/span_hashes"))
        // await BOTH before bands (and surface the first failure — a
        // half-committed parallel phase must not reach the band write)
        val errs = Seq(fd, fs).flatMap(f =>
          scala.util.Try(Await.result(f, Duration.Inf)).failed.toOption)
        errs.headOption.foreach(throw _)
    }
    Frames.sizedWrite(bands).write.mode("append").parquet(s"$path/bands")
  }

  /** Two daemon threads for [[writeArtifacts]]' parallel phase — the
    * writes are tiny (batch-shaped appends) and mostly driver-side
    * commit latency, so a fixed pool of 2 is the whole win. */
  private lazy val artifactWriteEc =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(2, r => {
        val t = new Thread(r, "graft-artifact-write")
        t.setDaemon(true)
        t
      }))

  /** Submit INDEPENDENT state-table jobs concurrently and await them all
    * (guide §2.6 — actions are only sequential because driver code calls
    * them sequentially): used where several tables derive from the same
    * input and carry no cross-table crash-ordering constraint among
    * themselves ([[write]]'s initial table writes, [[expireKeyed]]'s
    * artifact subtractions). EVERY task is awaited before the first
    * failure propagates — a caller sequencing a crash-ordered step after
    * this (meta write, corpus subtraction) must know no parallel job is
    * still in flight. Runs single tasks inline (no pool round-trip). */
  private[llm] def inParallel(tasks: Seq[() => Unit]): Unit = {
    if (tasks.sizeIs <= 1) tasks.foreach(_.apply())
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec = stateJobEc
      val errs = tasks.map(t => Future(t()))
        .flatMap(f => scala.util.Try(Await.result(f, Duration.Inf)).failed.toOption)
      errs.headOption.foreach(throw _)
    }
  }

  /** Pool for [[inParallel]] — four daemon threads: the widest parallel
    * group today is [[expireKeyed]]'s artifact tables (digests,
    * span_hashes, bands, pair_edges); the jobs are mostly driver-side
    * commit/rename latency plus small Spark jobs, so a deeper pool buys
    * nothing. */
  private lazy val stateJobEc =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4, r => {
        val t = new Thread(r, "graft-state-job")
        t.setDaemon(true)
        t
      }))

  /** Persist duplicate-CLUSTER labels (`clusters/` — the
    * [[Dedup.duplicateClusters]] output shape (doc_id, cluster_id,
    * cluster_size)) as part of the standing state. Written once from a
    * batch CC run; each ingest then maintains them with
    * [[updateClusters]] instead of re-running connected components over
    * the standing graph. This layout is UNPARTITIONED (one table dir,
    * full rewrite per update); a deployment where the per-ingest rewrite
    * of the whole labels table dominates uses
    * [[writeClustersPartitioned]] instead. */
  def writeClusters(labels: DataFrame, path: String): Unit =
    labels.select("doc_id", "cluster_id", "cluster_size")
      .write.mode("overwrite").parquet(s"$path/clusters")

  /** Persist the VERIFIED PAIR EDGES behind the duplicate-cluster labels
    * (`pair_edges/` — (doc_a, doc_b) rows, set-semantic): the OPT-IN
    * artifact that makes exact post-retention re-clustering incremental.
    * [[relabelClusters]]' default coarsening keeps two retained docs
    * co-labeled when their only connection ran THROUGH an expired bridge
    * doc, because labels alone cannot tell a direct edge from a
    * transitive one; with the edges persisted,
    * `relabelClusters(exact = true)` re-runs connected components over
    * the RETAINED edges instead — no fresh [[Dedup.duplicateClusters]]
    * pass over the corpus text. Maintained automatically once present:
    * [[updateClusters]] appends each ingest's new pairs (same lease
    * hold, before the label rewrite — a crash leaves extra edges, which
    * are set-semantic and only ever re-assert pairs the retried update
    * re-delivers; crash-retried duplicates are folded by [[compact]]'s
    * distinct rewrite like every other append-grown artifact), and
    * [[expire]] subtracts rows touching an expired endpoint exactly
    * like every other doc-keyed artifact (an edge is doubly keyed: it
    * drops when EITHER endpoint expires). Cost: one (id, id) row per
    * verified pair — the q43 pair relation, orders of magnitude below
    * the corpus. */
  def writePairEdges(pairs: DataFrame, path: String): Unit =
    pairs.select("doc_a", "doc_b")
      .write.mode("overwrite").parquet(s"$path/pair_edges")

  /** Lazy scan of the persisted pair edges: (doc_a, doc_b). */
  def loadPairEdges(spark: SparkSession, path: String): DataFrame = {
    heal(spark, path, "pair_edges")
    spark.read.parquet(s"$path/pair_edges")
  }

  /** Default cluster_id bucket count for [[writeClustersPartitioned]]. */
  val DefaultClusterParts = 64

  private def cpartCol(c: Column, nParts: Int): Column =
    pmod(c.cast("long"), lit(nParts.toLong))

  /** n_parts of the bucketed clusters layout — trusting the TABLE over
    * the meta row — or None for the plain layout. The empty-result
    * degrade in [[relabelClusters]] commits the plain table FIRST and
    * deletes `clusters_meta` second (the reverse order would strand a
    * healed partitioned table with no meta row, silently rerouting
    * subsequent updates through the legacy whole-table path); a crash
    * between the two leaves a meta row describing a table that is
    * already plain. Routing a TOUCHED-PARTITION rewrite at that shape
    * would rename cpart= dirs into a directory of plain parquet files —
    * a mixed table every reader would double-read — so the stale meta is
    * treated as the incomplete half of a committed degrade: this
    * COMPLETES it (deletes the meta) and reports the layout as plain.
    * Caller MUST hold the state lease (the delete mutates the state
    * dir) and must have healed/recovered the clusters table first
    * ([[loadClustersLeased]] / the relabel pass's healStranded), so the
    * live-dir probe never reads a mid-swap directory. A missing live dir
    * with a meta row (pre-first-write shape) trusts the meta. */
  private def leasedNParts(spark: SparkSession, path: String): Option[Int] = {
    import org.apache.hadoop.fs.{Path => HPath}
    if (!tableExists(spark, s"$path/clusters_meta")) return None
    val nParts = spark.read.parquet(s"$path/clusters_meta")
      .head().getAs[Int]("n_parts")
    val base = new HPath(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new HPath(base, "clusters")
    val stale = fs.exists(live) &&
      !fs.listStatus(live).exists(_.getPath.getName.startsWith("cpart="))
    if (!stale) Some(nParts)
    else {
      fs.delete(new HPath(base, "clusters_meta"), true)
      None
    }
  }

  /** [[writeClusters]] BUCKETED by cluster_id (`cpart = pmod(cluster_id,
    * nParts)` partition dirs): every row of one cluster lands in one
    * partition, so an ingest's [[updateClusters]] rewrites ONLY the
    * partitions holding touched components — O(touched clusters) write
    * IO instead of O(standing labels), removing the last
    * O(standing-labels) step from the ingest cycle. `nParts` is pinned in
    * a `clusters_meta` row (like every other state regime) so updates
    * can never bucket under a different modulus. */
  def writeClustersPartitioned(
      labels: DataFrame, path: String, nParts: Int = DefaultClusterParts): Unit = {
    val spark = labels.sparkSession
    import spark.implicits._
    require(nParts > 0, s"nParts must be positive, got $nParts")
    labels.select("doc_id", "cluster_id", "cluster_size")
      .withColumn("cpart", cpartCol(col("cluster_id"), nParts))
      .write.mode("overwrite").partitionBy("cpart").parquet(s"$path/clusters")
    Seq(nParts).toDF("n_parts")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/clusters_meta")
  }

  /** Lazy scan of the persisted cluster labels, in either layout
    * (self-healing first: a crashed legacy swap via [[healTable]], a
    * crashed partitioned commit via [[recoverClusterParts]]).
    *
    * A commit marker that SURVIVES the recovery pass means the lease is
    * held (recovery skips) — either a live mutator is mid-commit (its
    * renames finish in milliseconds; retry) or a crashed holder left the
    * table MIXED-GENERATION: some partitions new, some old, possibly one
    * deleted-but-not-yet-renamed. A reader cannot tell the two apart any
    * better than a mutator can, so the safe default is to FAIL LOUDLY
    * naming the holder instead of returning silently wrong labels (run
    * [[breakLease]] after confirming a crashed holder; the next load's
    * recovery then rolls the commit forward). */
  def loadClusters(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    heal(spark, path, "clusters")
    recoverClusterParts(spark, path)
    val base = new HPath(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new HPath(base, "clusters__parts_commit")))
      throw new IllegalStateException(
        s"StandingState: clusters table under $path has a pending partition " +
          s"commit and the lease is held by [${readHolder(fs, base)}] — " +
          "reading now would return mixed-generation labels. If the holder " +
          "is live, retry after its commit; if it crashed, verify it is " +
          "gone and run StandingState.breakLease (the next load rolls the " +
          "commit forward).")
    val df = spark.read.parquet(s"$path/clusters")
    if (df.columns.contains("cpart")) df.drop("cpart") else df
  }

  /** [[loadClusters]] for a caller that ALREADY HOLDS the state lease —
    * the read half of every leased read-modify-write ([[updateClusters]]
    * and the partitioned twin). Recovery mutations (crashed-commit
    * roll-forward/back, crashed-swap heal) run DIRECTLY: the lease we
    * hold is exactly the exclusion recovery needs. Loading under the
    * lease is what makes the subsequent rewrite sound — a snapshot pinned
    * before the acquire could be silently overwritten by a mutator that
    * commits in the load->acquire window (a lost update, contradicting
    * the lease's fails-loudly contract). */
  private def loadClustersLeased(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = new HPath(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new HPath(base, "clusters__parts_commit")))
      commitClusterParts(fs, base)
    else {
      val staged = new HPath(base, "clusters__parts_staged")
      if (fs.exists(staged)) fs.delete(staged, true)
    }
    healTable(fs, base, "clusters")
    val df = spark.read.parquet(s"$path/clusters")
    if (df.columns.contains("cpart")) df.drop("cpart") else df
  }

  /** Ingest-cycle cluster maintenance: fold a batch's verified pairs into
    * the persisted labels via [[Dedup.duplicateClustersIncremental]]
    * (star rounds over the contracted batch-shaped graph only; exact
    * batch-on-union equality) and atomically replace `clusters/` — the
    * updated labels are staged to a sibling directory and swapped in with
    * two renames, because parquet cannot overwrite a table that is its
    * own scan input. Returns the updated labels (a scan of the new
    * table). Cost per ingest: the incremental CC (O(batch + touched
    * components) compute) plus one rewrite of the labels table — labels
    * are (id, id, int) rows over only the docs that ARE in clusters,
    * orders of magnitude smaller than the corpus; a deployment where even
    * that rewrite dominates partitions `clusters/` by cluster_id range
    * and rewrites touched partitions only. */
  /** CLUSTER-LABEL HYGIENE after retention — [[expire]] deliberately
    * leaves `clusters/` untouched (labels are a REPORTING artifact, not
    * an admission input: none of the dedup legs read them, spec-pinned),
    * which strands GHOST rows (expired doc_ids) and stale cluster_size
    * values. This pass makes the documented rebuild recipe executable in
    * its cheap, subtraction-shaped form: drop label rows whose doc_id is
    * no longer in the corpus, recount cluster_size over the surviving
    * members, and drop clusters shrunk below two members (a singleton is
    * not a duplicate cluster — [[Dedup.duplicateClusters]]' own
    * `cluster_size >= 2` invariant).
    *
    * SEMANTICS: the result is the HISTORICAL pair graph's components
    * restricted to retained docs — two retained docs whose only
    * connection ran THROUGH an expired bridge doc stay co-labeled (a
    * deliberate coarsening: the pair edges are not persisted, so exact
    * re-clustering needs a fresh [[Dedup.duplicateClusters]] run over
    * the retained corpus + [[writeClusters]]; sizes here are exact
    * retained-member counts either way). Ghost detection is an
    * anti-join against the corpus id column, so the pass needs no
    * expired-id input, is idempotent, and can run any time after one or
    * MORE [[expire]] passes — or fold into the pass itself via
    * `expire(..., relabelClusters = true)`. Both cluster layouts are
    * preserved — and the BUCKETED layout rewrites ONLY the ghost-bearing
    * partitions: `cpart = pmod(cluster_id, nParts)` is a pure function
    * of cluster_id, so every member of a ghost cluster lives in that
    * cluster's partition, sizes change nowhere else, and a partition
    * without ghosts is bit-identical before and after the recount — its
    * files are never opened for write. The rewrite rides the same
    * staged-partition roll-forward protocol as
    * [[updateClustersPartitioned]] (stage -> marker -> per-partition
    * rename; crash before the marker rolls back, after it rolls
    * forward). The whole-table rewrite remains the legacy layout's
    * documented cost — labels are orders of magnitude smaller than the
    * corpus. Returns the number of ghost label rows dropped. */
  def relabelClusters(
      spark: SparkSession,
      statePath: String,
      corpusPath: String,
      exact: Boolean = false): Long = {
    // a clusters table stranded at __retired by a crashed swap must be
    // healed, not read as "no labels" — the skip would silently no-op
    // the hygiene pass forever (the ghosts resurrect on the next
    // reader-side heal with their stale sizes intact)
    healStranded(spark, statePath, "clusters", "relabelClusters:heal")
    if (!tableExists(spark, s"$statePath/clusters")) return 0L
    // EXACT relabel (opt-in, needs persisted [[writePairEdges]] edges):
    // re-run connected components over the RETAINED edges instead of
    // accepting the coarsening — two retained docs bridged only by an
    // expired doc SPLIT here, exactly as a fresh
    // [[Dedup.duplicateClusters]] over the retained corpus's verified
    // pairs would label them (spec-pinned equality). The rewrite is
    // whole-table BY NATURE (a re-clustering can move any label), so
    // both layouts stage-and-swap the full table; the cheap
    // ghost-bearing-partitions path remains the default. Returns the
    // SIGNED label-row delta (rows removed — ghosts + split-off
    // singletons — in the common case; NEGATIVE when persisted edges
    // outran the labels, e.g. an updateClusters crash after its edge
    // append but before the label swap, where the exact pass ADDS the
    // missing co-labels).
    if (exact) {
      healStranded(spark, statePath, "pair_edges", "relabelClusters:healEdges")
      require(tableExists(spark, s"$statePath/pair_edges"),
        "relabelClusters(exact = true) needs a persisted pair_edges table " +
          "(StandingState.writePairEdges) — without the edges only the " +
          "coarsening default is computable")
      return withLeaseRetry(spark, statePath, "relabelClusters:exact") {
        val before = loadClustersLeased(spark, statePath).count()
        val corpusIds = spark.read.parquet(corpusPath)
          .select("doc_id").distinct()
        // restrict BOTH endpoints to retained docs: expire already
        // subtracts, but the exact pass may run standalone after a
        // manual corpus edit
        val edges = spark.read.parquet(s"$statePath/pair_edges")
          .join(corpusIds.withColumnRenamed("doc_id", "doc_a"),
            Seq("doc_a"), "left_semi")
          .join(corpusIds.withColumnRenamed("doc_id", "doc_b"),
            Seq("doc_b"), "left_semi")
        val relabeled = Dedup.duplicateClusters(edges)
          .select("doc_id", "cluster_id", "cluster_size")
          .localCheckpoint(true)
        val nPartsOpt = leasedNParts(spark, statePath)
        if (nPartsOpt.nonEmpty && !relabeled.isEmpty) {
          val nParts = nPartsOpt.get
          swapTable(spark, statePath, "clusters") { staged =>
            relabeled.withColumn("cpart", cpartCol(col("cluster_id"), nParts))
              .write.mode("overwrite").partitionBy("cpart").parquet(staged)
          }
        } else {
          // empty bucketed result: degrade to the plain layout (the
          // globalEmpty discipline — a zero-row partitionBy write emits
          // no partition dirs and would brick the table). The plain
          // table SWAPS IN FIRST, the meta row dies second: a crash
          // between the two leaves a plain table with a stale meta row,
          // which leasedNParts detects and completes on the next
          // mutator (the reverse order's crash shape — a partitioned
          // table with no meta — would silently reroute every later
          // update through the legacy whole-table path).
          swapTable(spark, statePath, "clusters") { staged =>
            relabeled.write.mode("overwrite").parquet(staged)
          }
          if (nPartsOpt.nonEmpty) {
            import org.apache.hadoop.fs.{Path => HPath}
            val meta = new HPath(s"$statePath/clusters_meta")
            meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(meta, true)
          }
        }
        before - relabeled.count()
      }
    }
    withLeaseRetry(spark, statePath, "relabelClusters") {
      val labels = loadClustersLeased(spark, statePath)
      val corpusIds = spark.read.parquet(corpusPath)
        .select("doc_id").distinct()
      val kept = labels.join(corpusIds, Seq("doc_id"), "left_semi")
      // ghost ROWS, not just a count — the bucketed branch keys its
      // touched-partition list by their cluster_ids. One anti-join scan;
      // the lease is held through this phase and concurrent ingests
      // wait on it. Checkpointed so the count, the partition collect
      // and the staged write don't re-run the anti-join (and the last
      // two don't re-read a live table mid-mutation).
      val ghostRows = labels.join(corpusIds, Seq("doc_id"), "left_anti")
        .select("cluster_id").localCheckpoint(true)
      val ghosts = ghostRows.count()
      if (ghosts == 0L) 0L
      else {
        // recount sizes over the surviving members of `rows`' clusters
        // and drop clusters shrunk below two members
        def recountOf(rows: DataFrame): DataFrame = rows
          .drop("cluster_size")
          .join(
            rows.groupBy("cluster_id")
              .agg(count(lit(1)).cast("int").as("cluster_size")),
            Seq("cluster_id"))
          .filter(col("cluster_size") >= 2)
          .select("doc_id", "cluster_id", "cluster_size")
        val nPartsOpt = leasedNParts(spark, statePath)
        if (nPartsOpt.nonEmpty) {
          val nParts = nPartsOpt.get
          // TOUCHED partitions = the ghost clusters' cparts: cpart is a
          // pure function of cluster_id, so a ghost's co-members (whose
          // sizes change) live in the same partition, and every other
          // partition is bit-identical after the recount. <= nParts
          // values collected.
          val parts = ghostRows
            .select(cpartCol(col("cluster_id"), nParts).as("p"))
            .distinct().collect().map(_.getLong(0)).sorted
          val touched = kept.filter(
            cpartCol(col("cluster_id"), nParts).isin(parts.toIndexedSeq: _*))
          // checkpointed: the emptiness probe below must not recompute
          // the join, and the staged write must not re-read the live
          // table after the commit begins
          val recounted = recountOf(touched).localCheckpoint(true)
          // EMPTY TABLE in the bucketed layout: a dynamic partitionBy
          // write of zero rows emits zero partition dirs (just
          // _SUCCESS), which would brick the table. Emptiness here is
          // GLOBAL — no surviving rows in the touched partitions AND no
          // rows outside them (untouched partitions hold no ghosts, so
          // labels == kept there). Degrade the layout to the plain one:
          // swap in the schema-bearing empty plain table FIRST, then
          // drop clusters_meta — a crash between the two leaves a plain
          // table with a stale meta row, which leasedNParts detects and
          // completes on the next mutator (the reverse order's crash
          // shape — a partitioned table with no meta — would silently
          // reroute every later update through the legacy path).
          val globalEmpty = recounted.isEmpty && labels.filter(
            !cpartCol(col("cluster_id"), nParts)
              .isin(parts.toIndexedSeq: _*)).isEmpty
          if (globalEmpty) {
            import org.apache.hadoop.fs.{Path => HPath}
            swapTable(spark, statePath, "clusters") { staged =>
              recounted.write.mode("overwrite").parquet(staged)
            }
            val meta = new HPath(s"$statePath/clusters_meta")
            meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(meta, true)
          } else
            // ghost-bearing partitions only, through the same staged
            // roll-forward protocol as updateClustersPartitioned —
            // untouched partitions' files are never opened for write
            stageAndCommitClusterParts(
              spark, statePath, recounted, parts, nParts)
        } else {
          val recounted = recountOf(kept)
            // the swap below must not re-read the live table it replaces
            .localCheckpoint(true)
          // mode("overwrite"): a pass that crashed after staging leaves
          // the staged dir behind (healTable only restores the LIVE
          // dir), and the next pass must overwrite it, not die
          // path-exists — the updateClusters/expireRebuild swap
          // discipline
          swapTable(spark, statePath, "clusters") { staged =>
            recounted.write.mode("overwrite").parquet(staged)
          }
        }
        ghosts
      }
    }
  }

  def updateClusters(path: String, newPairs: DataFrame): DataFrame = {
    val spark = newPairs.sparkSession
    if (tableExists(spark, s"$path/clusters_meta"))
      updateClustersPartitioned(spark, path, newPairs)
    else
      // the WHOLE read-modify-write holds the lease: the standing scan's
      // pinned file index, the incremental CC, and the swap all run under
      // it, so a concurrent mutator fails loudly at its acquire instead
      // of having its committed update computed over and clobbered
      withLease(spark, path, "updateClusters") {
        // edge upkeep FIRST (opt-in, iff the state persists pair edges):
        // a crash after this append leaves edges whose label update never
        // landed — set-semantic extras the retried update re-delivers
        if (tableExists(spark, s"$path/pair_edges"))
          Frames.sizedWrite(newPairs.select("doc_a", "doc_b"))
            .write.mode("append").parquet(s"$path/pair_edges")
        val standing = loadClustersLeased(spark, path)
        val updated = Dedup.duplicateClustersIncremental(standing, newPairs)
        swapTable(spark, path, "clusters") { staged =>
          updated.select("doc_id", "cluster_id", "cluster_size")
            .write.mode("overwrite").parquet(staged)
        }
      }
    loadClusters(spark, path)
  }

  /** [[updateClusters]] over the BUCKETED layout: only partitions whose
    * content can change are rewritten. Every changed or moved row's OLD
    * location is keyed by a merged standing root (`rootMap.old_root`) and
    * its NEW location by a touched component's final id
    * (`touchedRows.cluster_id`) — [[Dedup.duplicateClustersIncrementalParts]]
    * returns both batch-shaped frames, so the touched-partition list is a
    * <= nParts-value collect. Untouched partitions' files are never
    * opened for write.
    *
    * Commit protocol (roll-FORWARD, not the legacy whole-table swap): the
    * replacement rows for ALL touched partitions are staged under
    * `clusters__parts_staged/` first, then a `clusters__parts_commit`
    * marker makes the staged set authoritative, then each staged
    * partition dir replaces its live twin. A crash before the marker
    * rolls back (staged dir deleted on next load); a crash after it
    * rolls forward ([[recoverClusterParts]] completes the remaining
    * per-partition renames — idempotent, runs on every load). A reader
    * scanning ACROSS the rename instant can see a transiently missing
    * partition, the same transient-reader caveat as [[swapTable]];
    * mutators are excluded by the lease. */
  private def updateClustersPartitioned(
      spark: SparkSession, path: String, newPairs: DataFrame): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    // the WHOLE read-modify-write holds the lease (same contract as the
    // legacy path): the standing load, the incremental CC, the touched-
    // partition collect, and the staged commit — a mutator that committed
    // between an unleased load and the acquire would otherwise have its
    // update silently overwritten by a rewrite computed from the
    // pre-commit snapshot
    withLease(spark, path, "updateClustersPartitioned") {
      // edge upkeep first — see the legacy branch's ordering note
      if (tableExists(spark, s"$path/pair_edges"))
        Frames.sizedWrite(newPairs.select("doc_a", "doc_b"))
          .write.mode("append").parquet(s"$path/pair_edges")
      val standing = loadClustersLeased(spark, path)
      leasedNParts(spark, path) match {
        case Some(nParts) =>
          val (updated, rootMap, touchedRows) =
            Dedup.duplicateClustersIncrementalParts(standing, newPairs)
          val parts = rootMap.select(cpartCol(col("old_root"), nParts).as("p"))
            .union(touchedRows.select(cpartCol(col("cluster_id"), nParts).as("p")))
            .distinct().collect().map(_.getLong(0)).sorted
          if (parts.nonEmpty)
            stageAndCommitClusterParts(spark, path, updated, parts, nParts)
        case None =>
          // the meta row was STALE (a crashed empty-degrade's pending
          // delete — leasedNParts just completed it): the live table is
          // plain, so a touched-partition commit would mix cpart= dirs
          // into plain files. Finish this update through the legacy
          // whole-table swap instead.
          val updated = Dedup.duplicateClustersIncremental(standing, newPairs)
          swapTable(spark, path, "clusters") { staged =>
            updated.select("doc_id", "cluster_id", "cluster_size")
              .write.mode("overwrite").parquet(staged)
          }
      }
    }
  }

  /** Steps 1–3 of the touched-partition commit, shared by
    * [[updateClustersPartitioned]] and [[relabelClusters]]: stage the
    * replacement rows for every partition in `parts` under
    * `clusters__parts_staged/` (plus an explicit EMPTY dir for any
    * touched partition whose rows all merged or dropped away, so the
    * commit still clears its live twin — otherwise the stale rows would
    * survive at their old location), drop the `clusters__parts_commit`
    * marker, then roll each staged partition forward over its live twin.
    * Caller must hold the state lease and must not mutate the live table
    * first — the staged write is the last reader of the pre-commit rows
    * (live dirs are only touched after it completes). */
  private def stageAndCommitClusterParts(
      spark: SparkSession,
      path: String,
      rows: DataFrame,
      parts: Array[Long],
      nParts: Int): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = new HPath(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new HPath(base, "clusters__parts_staged")
    // a leftover staging dir from a crashed pass (no marker -> the live
    // table was never touched) is overwritten, not a path-exists error
    if (fs.exists(staged)) fs.delete(staged, true)
    // 1. STAGE
    rows.withColumn("cpart", cpartCol(col("cluster_id"), nParts))
      .filter(col("cpart").isin(parts.toIndexedSeq: _*))
      .write.mode("overwrite").partitionBy("cpart").parquet(staged.toString)
    parts.foreach { p =>
      val d = new HPath(staged, s"cpart=$p")
      if (!fs.exists(d)) fs.mkdirs(d)
    }
    // 2. COMMIT POINT: marker makes the staged partitions authoritative
    val marker = new HPath(base, "clusters__parts_commit")
    fs.create(marker, true).close()
    // 3. per-partition swap + cleanup (idempotent; recovery re-runs it)
    commitClusterParts(fs, base)
  }

  /** Step 3 of the partitioned commit: move each staged partition dir
    * over its live twin, then clear the marker and staging area.
    * Idempotent — partitions already moved have no staged dir left. */
  private def commitClusterParts(
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val staged = new HPath(base, "clusters__parts_staged")
    val live = new HPath(base, "clusters")
    if (fs.exists(staged)) {
      fs.listStatus(staged).filter(_.getPath.getName.startsWith("cpart="))
        .foreach { st =>
          val target = new HPath(live, st.getPath.getName)
          if (fs.exists(target)) fs.delete(target, true)
          if (!fs.rename(st.getPath, target))
            throw new java.io.IOException(
              s"commitClusterParts: rename ${st.getPath} -> $target failed")
        }
      fs.delete(staged, true)
    }
    fs.delete(new HPath(base, "clusters__parts_commit"), false)
  }

  /** Crash recovery for the partitioned commit, run on every
    * [[loadClusters]]: a marker without a completed commit rolls FORWARD
    * (the staged partitions are authoritative — finish the renames); a
    * staging dir without a marker is an incomplete stage and rolls BACK
    * (deleted; the live table was never touched).
    *
    * Recovery MUTATES the directories, so it runs UNDER THE LEASE: if
    * the lease is unavailable the pass is skipped — either a live
    * mutator is mid-commit (its own commitClusterParts finishes the
    * work; recovering concurrently would race its renames) or a crashed
    * holder blocks mutation until [[breakLease]], after which the next
    * load's recovery acquires the lease and rolls forward. */
  private def recoverClusterParts(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = new HPath(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return
    val marker = new HPath(base, "clusters__parts_commit")
    val staged = new HPath(base, "clusters__parts_staged")
    if (!fs.exists(marker) && !fs.exists(staged)) return // the common case
    if (leaseHeld(fs, base)) return // live mutator or crashed holder — skip
    try withLease(spark, path, "recoverClusterParts") {
      // re-check under the lease: the mutator we raced may have finished
      if (fs.exists(marker)) commitClusterParts(fs, base)
      else if (fs.exists(staged)) fs.delete(staged, true)
    } catch {
      case _: IllegalStateException => () // lost the acquire race — skip
    }
  }

  /** Rewrite-and-swap one state table: write the replacement to
    * `<table>__staged`, then swap via two renames through the Hadoop
    * FileSystem API (so the state path may be any Hadoop-addressable URI —
    * hdfs://, s3a://, file: — exactly like the parquet IO around it;
    * java.nio cannot address those). The two renames are NOT one atomic
    * operation: a crash between them leaves no live table but a complete
    * `<table>__retired/` (the pre-swap rows, kept until the swap fully
    * succeeds) — recovery is SELF-HEALING: [[healTable]] renames retired
    * back, and runs both here (before the next swap) and on every load
    * path, so a crashed swap never needs manual intervention. A
    * metastore-backed deployment swaps a table pointer instead. */
  private def swapTable(spark: SparkSession, path: String, table: String)(
      writeStaged: String => Unit): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = new HPath(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    healTable(fs, base, table)
    val staged = new HPath(base, s"${table}__staged")
    writeStaged(staged.toString)
    AtomicSwap.commitStaged(fs, new HPath(base, table), staged, "swapTable")
  }

  /** Recover a table from a crash in [[swapTable]]'s two-rename window:
    * live dir missing but a complete `<table>__retired/` present — rename
    * retired back. (The staged dir, if any, is complete too — it was
    * written before the renames began — but retired is the KNOWN-good
    * pre-swap state; the staged rewrite re-runs on the next maintenance
    * pass. A leftover staged dir is overwritten by that pass.) Idempotent
    * and cheap (one existence probe in the common healthy case), so every
    * load path runs it — the reader self-heals instead of throwing
    * path-not-found. */
  private def healTable(
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path,
      table: String): Unit =
    healDir(fs, new org.apache.hadoop.fs.Path(base, table))

  /** [[healTable]] on a direct table dir (the corpus table lives outside
    * the state dir). Caller must hold — or have excluded — the lease. */
  private def healDir(
      fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path): Unit =
    AtomicSwap.heal(fs, live)

  /** [[healTable]] from a path-string context — the load-site form.
    * SKIPPED while the state lease is held: a live mutator mid-swap owns
    * the directories (healing concurrently would race its renames — the
    * reader would restore `__retired` while the writer renames
    * `__staged` in, failing the writer spuriously), and a crashed holder
    * blocks all mutation until [[breakLease]] anyway, after which the
    * next load heals. */
  private def heal(spark: SparkSession, path: String, table: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = new HPath(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base) && !leaseHeld(fs, base)) healTable(fs, base, table)
  }

  /** MUTATOR-side heal of a state table — the maintenance passes' form.
    * Unlike the reader-side [[heal]] (which SKIPS while the lease is
    * held — correct for loads, where a live holder's own commit path
    * finishes the work), a retention or regime-sniffing pass must not
    * silently treat a table stranded at `__retired` by an old crashed
    * swap as ABSENT: the skip would pass an existence filter, the
    * pass's other swaps would still land, and the stranded rows would
    * resurrect on the next load-side heal — permanently blocking
    * re-admission (expire) or manufacturing the mixed regime expire
    * refuses (span appends). So when — and only when — the table is
    * actually stranded, WAIT for the lease ([[withLeaseRetry]]: a live
    * ingest's brief hold passes; a crashed holder fails loudly with its
    * identity) and heal under it. The healthy path costs two existence
    * probes and never touches the lease; [[healDir]] re-checks under
    * the lease, so losing the acquire race to another healer is a
    * no-op. */
  private def healStranded(
      spark: SparkSession, statePath: String,
      table: String, op: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = new HPath(statePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new HPath(base, table)
    if (fs.exists(base) && !fs.exists(live) &&
        fs.exists(sibling(live, "__retired")))
      withLeaseRetry(spark, statePath, op) { healDir(fs, live) }
  }

  /** Name of the mutual-exclusion lease file under the state dir. */
  private val LeaseFile = "_lease"

  /** Best-effort mutual exclusion over the state's MUTATING operations —
    * the mechanism behind [[compact]]'s quiesce requirement (previously a
    * scaladoc convention; an append racing compact's snapshot->swap window
    * would be silently deleted with the old directory). Every mutator
    * ([[append]], [[appendEmbBuckets]], [[updateClusters]], [[compact]],
    * [[repairEmbBuckets]]' rewrite) takes the lease for its write window:
    * an exclusive-create of `_lease` under the state dir. ATOMICITY is
    * scheme-dependent: on HDFS, `create(overwrite=false)` is a single
    * atomic namenode op; on the LOCAL filesystem Hadoop's
    * RawLocalFileSystem implements the overwrite=false check as
    * exists()-then-create (no O_EXCL) — two local mutators racing the
    * acquire could BOTH succeed — so the `file:` scheme routes through
    * `java.io.File.createNewFile` instead, which the JDK documents as
    * atomic (exactly the SyncMain intakeState + PrepareMain maintenance
    * deployment shape). Object stores without atomic create remain
    * best-effort — a metastore lock row replaces this there. A held lease
    * fails the second mutator LOUDLY with the holder's identity instead
    * of losing rows.
    *
    * CRASHED-LEASE RECOVERY: a mutator that dies without releasing leaves
    * the lease file behind, and every subsequent mutator fails with its
    * holder string (op, pid, timestamp). After confirming the holder
    * process is gone, run [[breakLease]] (or the PrepareMain
    * `--breakStateLease` flag) — deliberately manual, because no timeout
    * can distinguish a crashed holder from a slow compaction over a large
    * table. */
  private def withLease[T](spark: SparkSession, path: String, op: String)(
      body: => T): T = {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = new HPath(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) fs.mkdirs(base)
    val lease = new HPath(base, LeaseFile)
    def failHeld(): Nothing =
      throw new IllegalStateException(
        s"StandingState: cannot $op under $path — lease held by " +
          s"[${readHolder(fs, base)}]. If that holder crashed, verify it " +
          "is gone and run StandingState.breakLease to recover.")
    val holderInfo =
      s"op=$op pid=${ProcessHandle.current().pid()} at=${java.time.Instant.now()}"
    // the CREATE is the lock; holder info is best-effort metadata.
    // AtomicSwap.atomicCreate routes the file: scheme through
    // java.io.File.createNewFile (RawLocalFileSystem's
    // create(overwrite=false) is exists()-then-create, not O_EXCL) and
    // deletes a half-born lease if the metadata write fails.
    if (!AtomicSwap.atomicCreate(fs, lease, holderInfo)) failHeld()
    try body finally fs.delete(lease, false)
  }

  /** [[withLease]] with ACQUIRE RETRY — the ingest batch leg's form
    * ([[graft.streaming.CorpusIntakeJob.ingestTextBatch]]): a live
    * compaction holds the lease for its O(delta + rename) swap window,
    * and a streaming append racing it must WAIT (bounded exponential
    * backoff) rather than die and kill the streaming query. The timeout
    * (`spark.graft.lease.retryTimeoutMs`, default 60s) still fails
    * loudly with the holder identity — a CRASHED holder blocks forever
    * by design (no timeout can tell crashed from slow; [[breakLease]] is
    * the operator recovery), and a stream stuck behind one should say so
    * rather than spin silently. */
  private[graft] def withLeaseRetry[T](
      spark: SparkSession, path: String, op: String)(body: => T): T = {
    val baseMs = spark.conf.get("spark.graft.lease.retryMs", "100").toLong
    val timeoutMs =
      spark.conf.get("spark.graft.lease.retryTimeoutMs", "60000").toLong
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var delay = math.max(1L, baseMs)
    while (true) {
      try return withLease(spark, path, op)(body)
      catch {
        case e: IllegalStateException if e.getMessage.contains("lease held") =>
          if (System.nanoTime() > deadline) throw e
          Thread.sleep(delay)
          delay = math.min(delay * 2, 2000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Best-effort read of the lease file's holder string (op, pid,
    * timestamp) for loud-failure messages. */
  private def readHolder(
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): String =
    try {
      val in = fs.open(new org.apache.hadoop.fs.Path(base, LeaseFile))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    } catch { case _: Exception => "<unreadable>" }

  /** True iff the state lease is currently held. Used by the reader-side
    * recovery passes: a held lease means either a LIVE mutator is
    * mid-write (its own commit path will finish the work — a concurrent
    * reader-side recovery would RACE its renames) or a crashed holder is
    * blocking all mutation until [[breakLease]] — in both cases the
    * reader must not touch the directories. */
  private def leaseHeld(
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(base, LeaseFile))

  /** Remove a crashed holder's lease (see [[withLease]]). Returns true if
    * a lease file existed. ONLY safe after confirming the recorded holder
    * process is dead — breaking a live holder's lease reintroduces the
    * lost-append race the lease exists to prevent. */
  def breakLease(spark: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.{Path => HPath}
    val base = new HPath(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new HPath(base, LeaseFile), false)
  }

  /** Default target output-file size for compaction rewrites. */
  val DefaultCompactTargetBytes: Long = 128L * 1024 * 1024

  /** Compact the APPEND-ONLY state tables — and, when `corpusPath` is
    * given, the standing CORPUS table itself (the largest append-grown
    * table of the intake cycle, and previously the only one with no
    * maintenance path: [[graft.streaming.CorpusIntakeJob.ingestTextBatch]]
    * appends files to it every micro-batch, ~28,800/day at the 3-second
    * reference cadence, degrading every file listing).
    *
    * [[append]]/[[appendEmbBuckets]] and replayed micro-batches leave
    * duplicate rows in the state tables — harmless for correctness (every
    * consuming leg has set semantics: the exact leg dedupes digests,
    * band/bucket collisions are distinct()-ed), but they grow the
    * per-ingest scan linearly with sloppy history. State tables get a
    * distinct() rewrite; the corpus table (rows already unique by doc_id)
    * gets a pure FILE-COUNT rewrite sized to `targetFileBytes` outputs.
    * Cluster labels are already rewritten whole by [[updateClusters]].
    *
    * LIVE-STREAM COEXISTENCE: compaction must NOT require stopping the
    * intake stream (the reference's own posture is continuous operation —
    * `bin/meeseeker:25-33` restarts forever). Each table compacts
    * SNAPSHOT-DELTA: (1) pin the live file list, (2) rewrite exactly
    * those files into `<table>__staged` — the O(table) work — with NO
    * lease held, so concurrent appends proceed; (3) under the lease,
    * append the DELTA files (anything appended during the rewrite,
    * read raw — duplicates are set-semantic for state tables and
    * impossible for the corpus) to the staged dir and swap it in with
    * the two-rename discipline. Appends are excluded only for the
    * O(delta + rename) window of step 3, which
    * [[graft.streaming.CorpusIntakeJob.ingestTextBatch]] rides through
    * by retrying its lease acquire with backoff ([[withLeaseRetry]])
    * instead of dying. Concurrent READERS are unaffected up to the
    * rename instant; a scan straddling the swap retries against the
    * fresh table (the documented transient-reader caveat).
    *
    * The CORPUS swap is serialized by the STATE's lease even though the
    * table lives outside the state dir — sound because every corpus
    * mutator (the ingest batch leg) appends under that same lease; a
    * manual corpus writer must hold it too (or quiesce). */
  /** RETENTION — the reference's key-TTL twin (it expires every
    * materialized key after `expire_keys` seconds,
    * `lib/meeseeker.rb:99`): drop the corpus rows matching `expired`
    * and EVERY artifact derived from them, so expired documents no
    * longer block replicas of their own text from (re-)admission.
    *
    * Two regimes, dispatched on the state's SELF-DESCRIBING artifact
    * schema (presence of `doc_id` on the digests rows — see [[Meta]]):
    *
    *  - DOC-KEYED states (the default regime since round 14): expire
    *    is SUBTRACTION — one anti-join per artifact table against the
    *    pinned expired-id set, each run under the snapshot-delta
    *    compaction discipline ([[compactDirLive]]): the O(table)
    *    anti-join rewrite holds NO lease (intake appends proceed
    *    freely), and the lease is held only for each table's delta
    *    catch-up + two renames. No text is ever re-featurized — the
    *    pass costs columnar IO over the small artifact rows (16-byte
    *    digest + 8-byte id) plus the corpus filter rewrite, instead of
    *    a re-digest / re-minhash / re-window-hash of every retained
    *    doc. Subtraction is SOUND precisely because the rows are
    *    keyed: a retained doc that shares a digest/window with an
    *    expired doc keeps its OWN row, so the value stays standing.
    *  - LEGACY payload-free states: digests and span hashes are
    *    doc_id-free sets, so subtraction is unsound (an expired doc's
    *    digest may also be a retained doc's digest, and dropping it
    *    would un-block the retained doc's replicas) — expire REBUILDS
    *    digests, bands and span hashes from the RETAINED corpus under
    *    the state's persisted regime, holding the lease for the whole
    *    O(retained) pass (the pre-round-14 behavior, kept as the
    *    migration fallback; [[write]] a fresh state to leave it).
    *
    * NULL-predicate rows are RETAINED in both regimes: a corpus row
    * where `expired` evaluates to NULL (e.g. `col("ts") < horizon`
    * with a null timestamp) does not POSITIVELY match the retention
    * policy, and a destructive maintenance op must not treat
    * don't-know as expired.
    *
    * Crash-safety: artifact tables mutate FIRST, the corpus LAST — a
    * crash anywhere earlier leaves the expired rows still in the
    * corpus, so a re-run detects pending work (n > 0) and completes
    * the pass (keyed anti-joins are idempotent; the legacy rebuild
    * derives only from the retained set). A repair pass racing a
    * keyed crash window can re-append a still-in-corpus expired doc's
    * artifacts; the re-run subtracts them again. Concurrent appends
    * during a keyed pass survive via each table's delta catch-up; a
    * doc appended DURING the pass that itself matches the predicate
    * is outside the pinned snapshot and falls to the next retention
    * pass. SemDeDup centroids are untouched (frozen training state,
    * not a per-doc blocker); cluster LABELS are untouched by DEFAULT —
    * they are a reporting artifact, not an admission input, and a bare
    * anti-join would leave stale cluster_size values — pass
    * `relabelClusters = true` (or run [[relabelClusters]] any time
    * later) to drop ghost rows, recount sizes and drop shrunk-to-
    * singleton clusters, with the documented coarsening semantics (a
    * fresh [[Dedup.duplicateClusters]] + [[writeClusters]] rebuild
    * remains the exact re-clustering path); the embedding and media
    * states have their own id-keyed twins,
    * [[expireEmbeddings]]/[[expireMedia]].
    *
    * `expired` is a boolean predicate over corpus rows (an ingest-time
    * timestamp column, a doc_id horizon, a source policy — schema is
    * the caller's). Returns the number of corpus rows dropped. */
  def expire(
      spark: SparkSession,
      statePath: String,
      corpusPath: String,
      expired: Column,
      relabelClusters: Boolean = false): Long = {
    val pred = coalesce(expired, lit(false))
    // heal a crashed digests swap BEFORE sniffing the regime — a
    // missing-live table would otherwise read as "no digests" and
    // silently downgrade a keyed state to the payload-free rebuild.
    // healStranded, not the reader-side heal: a concurrent ingest
    // briefly holding the lease at this instant would make heal() skip
    // and re-open exactly that downgrade
    healStranded(spark, statePath, "digests", "expire:healDigests")
    val keyed = digestsKeyed(spark, statePath)
    val n =
      if (keyed) expireKeyed(spark, statePath, corpusPath, pred)
      else expireRebuild(spark, statePath, corpusPath, pred) match {
        // the rebuild re-sniffs under its lease (a migrateToKeyed or
        // keyed writer can land in the sniff->acquire window); a state
        // found keyed there must subtract, never be rebuilt legacy
        case Some(m) => m
        case None => expireKeyed(spark, statePath, corpusPath, pred)
      }
    // optional label hygiene, AFTER the corpus swap (the ghost detection
    // anti-joins the post-expire corpus); crash between the swap and
    // here just leaves the ghosts for the next relabel — see
    // [[relabelClusters]]'s idempotence contract
    if (relabelClusters) this.relabelClusters(spark, statePath, corpusPath)
    // census upkeep LAST: a completed expire preserves sum(census) ==
    // count(corpus) via one recount; a crash anywhere above leaves the
    // mismatch this same call heals on the re-run (no-op when the state
    // maintains no census). DEEP witness here: the pass already paid
    // corpus-shaped work, so the per-source compare (which also catches
    // a compensating equal-total drift) is marginal.
    reconcileSourceCensus(spark, statePath, corpusPath, deep = true)
    n
  }

  /** [[expire]]'s doc-keyed subtraction regime. `pred` is already
    * null-coalesced. */
  private def expireKeyed(
      spark: SparkSession,
      statePath: String,
      corpusPath: String,
      pred: Column): Long = {
    import org.apache.hadoop.fs.{Path => HPath}
    val corpusDir = new HPath(corpusPath)
    val fs = corpusDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a prior pass that crashed between the corpus swap's two renames
    // left the table at __retired only — heal before reading (under the
    // lease, the same skip-free contract as every mutator-side heal)
    if (!fs.exists(corpusDir) && fs.exists(sibling(corpusDir, "__retired")))
      withLeaseRetry(spark, statePath, "expire:healCorpus") {
        healDir(fs, corpusDir)
      }
    // heal every artifact table BEFORE the existence filter below — a
    // table stranded at <table>__retired by a crashed swap would
    // otherwise read as absent, be silently skipped, and resurrect its
    // expired rows on the next load's heal (permanently blocking
    // re-admission, the exact invariant expire exists to remove).
    // healStranded, NOT the reader-side heal: that one skips while the
    // lease is held, and a concurrent ingest's brief hold at this
    // instant would re-open exactly the skip this heal exists to close
    Seq("digests", "span_hashes", "bands", "pair_edges")
      .foreach(healStranded(spark, statePath, _, "expire:healArtifacts"))
    // mixed-regime guard: a keyed state whose span index was written
    // payload-free (standalone writeSpanIndex) cannot be subtracted —
    // fail loudly instead of silently leaving unreachable rows
    if (tableExists(spark, s"$statePath/span_hashes") &&
        !spanIndexKeyed(spark, statePath))
      throw new IllegalStateException(
        s"expire: state at $statePath has doc-keyed digests but a " +
          "payload-free span index — rewrite the span index doc-keyed " +
          "(writeSpanIndex(..., docKeyed = true)) before expiring")
    // pin the expired-id set EAGERLY before any mutation: every
    // anti-join below subtracts exactly this set, and the corpus filter
    // drops exactly these rows, so the pass is consistent even as
    // appends land mid-pass. Keyed expiry is ID-level by construction:
    // every row of an expired doc_id drops (a duplicate-doc_id corpus is
    // already outside the ingest invariants); the returned count is
    // corpus ROWS dropped, matching the legacy regime's contract.
    // BARRIER + COUNT in one job (round-19 diet, the intake pattern):
    // the lazy checkpoint materializes — fully pinned — inside the
    // count's single RDD job; the eager checkpoint + count form paid
    // the same barrier as two jobs.
    val expiredIds = spark.read.parquet(corpusPath).filter(pred)
      .select("doc_id").distinct().localCheckpoint(false)
    val nIds = expiredIds.queryExecution.toRdd.count()
    val n =
      if (nIds == 0L) 0L
      else spark.read.parquet(corpusPath)
        .join(expiredIds, Seq("doc_id"), "left_semi").count()
    if (n == 0L) 0L
    else {
      // artifacts FIRST, corpus LAST (see the expire crash-safety note).
      // The artifact tables carry no ordering constraint AMONG THEMSELVES
      // (any completed subset + still-expired corpus rows = a re-run
      // completes the pass), so their snapshot-delta subtractions run
      // CONCURRENTLY (guide §2.6): the O(table) phase-2 rewrites overlap,
      // and the brief lease-held phase-3 swaps serialize themselves via
      // withLeaseRetry's backoff. inParallel awaits every job before the
      // corpus subtraction below can start.
      inParallel(
        (Seq("digests", "span_hashes", "bands")
          .filter(t => tableExists(spark, s"$statePath/$t"))
          .map { t => () =>
            compactDirLive(spark, statePath, new HPath(s"$statePath/$t"),
              _.join(expiredIds, Seq("doc_id"), "left_anti"))
          }) ++
        // pair edges are DOUBLY keyed: an edge drops when EITHER endpoint
        // expires (keeping it would let the exact relabel resurrect a
        // connection through a doc that no longer exists)
        (if (!tableExists(spark, s"$statePath/pair_edges")) Seq.empty
         else Seq(() =>
          compactDirLive(spark, statePath, new HPath(s"$statePath/pair_edges"),
            _.join(expiredIds.withColumnRenamed("doc_id", "doc_a"),
                Seq("doc_a"), "left_anti")
              .join(expiredIds.withColumnRenamed("doc_id", "doc_b"),
                Seq("doc_b"), "left_anti")
              .select("doc_a", "doc_b"))))) // joins reorder; keep the schema
      // the corpus subtracts the SAME pinned id set as the artifacts —
      // re-evaluating the predicate here could drop a matching row
      // appended mid-pass whose artifacts were never subtracted
      compactDirLive(spark, statePath, corpusDir,
        _.join(expiredIds, Seq("doc_id"), "left_anti"))
      n
    }
  }

  /** ONE-TIME migration of a legacy payload-free state to the
    * doc-keyed regime: rebuild digests, bands and (when present) the
    * span index from the standing corpus with doc_id-keyed rows, under
    * the lease — the LAST lease-held O(corpus) pass this state will
    * ever need, after which every [[expire]] is anti-join subtraction.
    * Centroids, meta, clusters and the emb/media tables are untouched
    * (meta carries no regime — keyedness is self-describing from the
    * rebuilt rows). No-op on an already-keyed state. Returns true iff
    * the migration ran. */
  def migrateToKeyed(
      spark: SparkSession,
      statePath: String,
      corpusPath: String): Boolean = {
    heal(spark, statePath, "digests")
    val alreadyKeyed = digestsKeyed(spark, statePath)
    if (alreadyKeyed) false
    else withLeaseRetry(spark, statePath, "migrateToKeyed") {
      import org.apache.hadoop.fs.{Path => HPath}
      locally {
        val base = new HPath(statePath)
        val sfs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        Seq("digests", "span_hashes", "bands").foreach(healTable(sfs, base, _))
      }
      // re-sniff UNDER the lease (post-heal): two migrations racing the
      // outside check — or a migration racing an expire-rebuild — can
      // both pass it; the loser must keep the no-op promise rather than
      // re-run the O(corpus) rebuild
      val keyedNow = digestsKeyed(spark, statePath)
      if (keyedNow) false else {
      val meta = {
        val r = spark.read.parquet(s"$statePath/meta").head()
        Meta(r.getAs[Int]("shingle_size"), r.getAs[Int]("num_hashes"),
          r.getAs[Int]("band_rows"), r.getAs[Boolean]("normalized"))
      }
      val cfg = CorpusPipeline.Config(
        shingleSize = meta.shingleSize,
        normalizeFingerprints = meta.normalizedFingerprints)
      val corpus = Frames.barrier(spark.read.parquet(corpusPath))
      val (digests, bands) =
        artifacts(corpus, cfg, meta.numHashes, meta.bandRows, docKeyed = true)
      swapTable(spark, statePath, "digests") { staged =>
        digests.write.mode("overwrite").parquet(staged)
      }
      if (tableExists(spark, s"$statePath/span_meta")) {
        val w = spark.read.parquet(s"$statePath/span_meta")
          .head().getAs[Int]("w")
        swapTable(spark, statePath, "span_hashes") { staged =>
          TextOps.spanWindowHashesKeyed(corpus, w).write.mode("overwrite").parquet(staged)
        }
      }
      swapTable(spark, statePath, "bands") { staged =>
        bands.write.mode("overwrite").parquet(staged)
      }
      true
      }
    }
  }

  /** [[expire]]'s legacy payload-free regime: lease-held rebuild of
    * every artifact from the retained corpus. `pred` is already
    * null-coalesced. Returns None when the under-lease re-sniff finds
    * the state KEYED (a migration or keyed writer landed in the
    * dispatcher's sniff->acquire window) — the dispatcher then runs
    * the subtraction path instead. */
  private def expireRebuild(
      spark: SparkSession,
      statePath: String,
      corpusPath: String,
      pred: Column): Option[Long] = {
    import org.apache.hadoop.fs.{Path => HPath}
    withLeaseRetry(spark, statePath, "expire") {
      val corpusDir = new HPath(corpusPath)
      val fs = corpusDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      healDir(fs, corpusDir) // we hold the lease — safe to heal a crashed swap
      // heal crashed artifact swaps too (directly — we hold the lease):
      // a table stranded at __retired must be rebuilt, not skipped; and
      // spanIndexKeyed below must see the healed table, not absence
      locally {
        val base = new HPath(statePath)
        val sfs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        Seq("digests", "span_hashes", "bands").foreach(healTable(sfs, base, _))
      }
      // re-sniff the regime UNDER the lease (post-heal): a migrateToKeyed
      // or keyed writer landing in expire's sniff->acquire window must
      // not have its doc-keyed artifacts silently rebuilt payload-free —
      // hand the pass back to the dispatcher, which subtracts instead
      val keyedNow = digestsKeyed(spark, statePath)
      if (keyedNow) None
      else {
      val corpus0 = spark.read.parquet(corpusPath)
      val retained = Frames.barrier(corpus0.filter(!pred))
      val n = corpus0.count() - retained.count()
      if (n == 0L) Some(0L)
      else {
        val meta = {
          val r = spark.read.parquet(s"$statePath/meta").head()
          Meta(r.getAs[Int]("shingle_size"), r.getAs[Int]("num_hashes"),
            r.getAs[Int]("band_rows"), r.getAs[Boolean]("normalized"))
        }
        val cfg = CorpusPipeline.Config(
          shingleSize = meta.shingleSize,
          normalizeFingerprints = meta.normalizedFingerprints)
        val (digests, bands) =
          artifacts(retained, cfg, meta.numHashes, meta.bandRows,
            docKeyed = false)
        swapTable(spark, statePath, "digests") { staged =>
          digests.write.mode("overwrite").parquet(staged)
        }
        if (tableExists(spark, s"$statePath/span_meta")) {
          val w = spark.read.parquet(s"$statePath/span_meta")
            .head().getAs[Int]("w")
          // rebuild in the index's OWN regime — a doc-keyed span index on
          // a legacy-digests state must not be silently downgraded to
          // payload-free (check BEFORE the swap replaces the table)
          val keyedSpans = spanIndexKeyed(spark, statePath)
          swapTable(spark, statePath, "span_hashes") { staged =>
            (if (keyedSpans) TextOps.spanWindowHashesKeyed(retained, w)
             else TextOps.spanWindowHashes(retained, w)).write.mode("overwrite").parquet(staged)
          }
        }
        swapTable(spark, statePath, "bands") { staged =>
          bands.write.mode("overwrite").parquet(staged)
        }
        // pair edges subtract in BOTH regimes (doubly doc-keyed by
        // construction — they cannot be rebuilt from text, only kept
        // where both endpoints survive)
        if (tableExists(spark, s"$statePath/pair_edges")) {
          val keptEdges = spark.read.parquet(s"$statePath/pair_edges")
            .join(retained.select(col("doc_id").as("doc_a")),
              Seq("doc_a"), "left_semi")
            .join(retained.select(col("doc_id").as("doc_b")),
              Seq("doc_b"), "left_semi")
            .select("doc_a", "doc_b") // joins reorder; keep the schema
            .localCheckpoint(true)
          swapTable(spark, statePath, "pair_edges") { staged =>
            keptEdges.write.mode("overwrite").parquet(staged)
          }
        }
        // corpus LAST (see crash-safety note above)
        val staged = sibling(corpusDir, "__staged")
        retained.write.mode("overwrite").parquet(staged.toString)
        val retired = sibling(corpusDir, "__retired")
        if (fs.exists(retired)) fs.delete(retired, true)
        if (!fs.rename(corpusDir, retired))
          throw new java.io.IOException(
            s"expire: rename $corpusDir -> $retired failed")
        if (!fs.rename(staged, corpusDir))
          throw new java.io.IOException(
            s"expire: rename $staged -> $corpusDir failed — pre-expire rows intact at $retired")
        fs.delete(retired, true)
        Some(n)
      }
      }
    }
  }

  /** RETENTION for the EMBEDDING state — [[expire]]'s vector twin: drop
    * the standing-vector rows matching `expired` and their `emb_buckets`
    * rows, so an expired vector no longer blocks replicas of itself
    * from (re-)admission through
    * [[Dedup.dedupByEmbeddingLshIncrementalVsBuckets]] /
    * [[graft.streaming.CorpusIntakeJob.ingestEmbeddingBatch]].
    *
    * The bucket table keys by vec_id ALREADY, so subtraction is sound
    * with no schema migration: each table anti-joins the pinned expired
    * id set under the snapshot-delta discipline ([[compactDirLive]] —
    * lease held only for delta catch-up + renames; concurrent ingest
    * appends ride through). Buckets subtract FIRST, the vector table
    * LAST: a crash mid-pass leaves the expired vectors in the table, so
    * a re-run finds n > 0 and re-subtracts (idempotent); the transient
    * missing-bucket drift is exactly what [[repairEmbBuckets]] detects,
    * and a repair racing the crash window merely re-appends rows the
    * re-run subtracts again. NULL-predicate rows are RETAINED (see
    * [[expire]]). Returns the number of vector rows dropped. */
  def expireEmbeddings(
      spark: SparkSession,
      statePath: String,
      standingVecsPath: String,
      expired: Column): Long = {
    import org.apache.hadoop.fs.{Path => HPath}
    val pred = coalesce(expired, lit(false))
    val vecsDir = new HPath(standingVecsPath)
    val fs = vecsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(vecsDir) && fs.exists(sibling(vecsDir, "__retired")))
      withLeaseRetry(spark, statePath, "expireEmbeddings:healVecs") {
        healDir(fs, vecsDir)
      }
    // heal a crashed bucket-table swap before the existence probe — a
    // table stranded at __retired must be subtracted, not skipped (and
    // not reader-side: that heal skips while a concurrent ingest holds
    // the lease, re-opening the skip)
    healStranded(spark, statePath, "emb_buckets", "expireEmbeddings:healBuckets")
    // barrier + count in one job (the expireKeyed round-19 shape)
    val expiredIds = spark.read.parquet(standingVecsPath).filter(pred)
      .select("vec_id").distinct().localCheckpoint(false)
    // count DROPPED ROWS via semi-join, not distinct ids — transient
    // crash-window double appends can leave duplicate-id rows, and the
    // contract ("number of vector rows dropped") matches expire's
    val n =
      if (expiredIds.queryExecution.toRdd.count() == 0L) 0L
      else spark.read.parquet(standingVecsPath)
        .join(expiredIds, Seq("vec_id"), "left_semi").count()
    if (n == 0L) 0L
    else {
      if (tableExists(spark, s"$statePath/emb_buckets"))
        compactDirLive(spark, statePath, new HPath(s"$statePath/emb_buckets"),
          _.join(expiredIds, Seq("vec_id"), "left_anti"))
      compactDirLive(spark, statePath, vecsDir,
        _.join(expiredIds, Seq("vec_id"), "left_anti"))
      n
    }
  }

  /** RETENTION for the MEDIA state — [[expire]]'s image/audio/video
    * twin: drop the standing-media rows matching `expired` and their
    * `media_phashes` + `media_bands` rows, so an expired item's
    * perceptual hash no longer blocks near-replicas from
    * (re-)admission through
    * [[graft.streaming.CorpusIntakeJob.ingestMediaBatch]]. Both
    * artifact tables key by media_id already — same sound-subtraction
    * shape, same snapshot-delta discipline, same artifacts-first /
    * media-table-LAST crash ordering and idempotent re-run as
    * [[expireEmbeddings]] (the transient phash/band drift of a crash
    * window is [[repairMediaArtifacts]]' witness). NULL-predicate rows
    * are RETAINED. Returns the number of media rows dropped. */
  def expireMedia(
      spark: SparkSession,
      statePath: String,
      standingMediaPath: String,
      expired: Column): Long = {
    import org.apache.hadoop.fs.{Path => HPath}
    val pred = coalesce(expired, lit(false))
    val mediaDir = new HPath(standingMediaPath)
    val fs = mediaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mediaDir) && fs.exists(sibling(mediaDir, "__retired")))
      withLeaseRetry(spark, statePath, "expireMedia:healMedia") {
        healDir(fs, mediaDir)
      }
    // heal crashed artifact swaps before the existence probes — a table
    // stranded at __retired must be subtracted, not skipped (and not
    // reader-side: that heal skips under a concurrent ingest's lease)
    Seq("media_phashes", "media_bands")
      .foreach(healStranded(spark, statePath, _, "expireMedia:healArtifacts"))
    // barrier + count in one job (the expireKeyed round-19 shape)
    val expiredIds = spark.read.parquet(standingMediaPath).filter(pred)
      .select("media_id").distinct().localCheckpoint(false)
    // dropped-ROW count via semi-join (see expireEmbeddings)
    val n =
      if (expiredIds.queryExecution.toRdd.count() == 0L) 0L
      else spark.read.parquet(standingMediaPath)
        .join(expiredIds, Seq("media_id"), "left_semi").count()
    if (n == 0L) 0L
    else {
      // both artifact tables subtract CONCURRENTLY (the expireKeyed
      // rationale — no ordering among artifacts, media table strictly last)
      inParallel(Seq("media_phashes", "media_bands")
        .filter(t => tableExists(spark, s"$statePath/$t"))
        .map { t => () =>
          compactDirLive(spark, statePath, new HPath(s"$statePath/$t"),
            _.join(expiredIds, Seq("media_id"), "left_anti"))
        })
      compactDirLive(spark, statePath, mediaDir,
        _.join(expiredIds, Seq("media_id"), "left_anti"))
      n
    }
  }

  def compact(spark: SparkSession, path: String): Unit =
    compact(spark, path, None)

  def compact(
      spark: SparkSession,
      path: String,
      corpusPath: Option[String],
      targetFileBytes: Long = DefaultCompactTargetBytes): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    Seq("digests", "bands", "emb_buckets", "media_phashes", "media_bands",
        "span_hashes", "pair_edges")
      .foreach { table =>
        compactDirLive(spark, path, new HPath(s"$path/$table"), _.distinct())
      }
    corpusPath.foreach { cp =>
      compactDirLive(spark, path, new HPath(cp), { df =>
        val fs = new HPath(cp).getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bytes =
          if (fs.exists(new HPath(cp))) fs.getContentSummary(new HPath(cp)).getLength
          else 0L
        val parts = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
        df.repartition(parts.toInt)
      })
    }
  }

  /** One table's snapshot-delta compaction (see [[compact]]). `rewrite`
    * is the leaseless O(table) transform (distinct / repartition); the
    * lease covers only the delta catch-up and the two renames.
    *
    * The delta diff is sound ONLY if nothing but appends happened between
    * the unleased snapshot pin and the leased diff. Two realistic
    * violators exist: a lease-held FULL-TABLE REWRITE in that window (the
    * repair passes' swapTable ghost-drop, a writeMediaState /
    * writeSpanIndex / writeEmbBuckets overwrite — all replace every file,
    * so every post-rewrite file would count as "delta" appended onto the
    * STALE staged snapshot, silently resurrecting rows the rewrite
    * deliberately dropped), and ANOTHER compact() of the same table
    * (whose swap also replaces every file). Both are caught by one check
    * inside the phase-3 lease: every pinned f0 file must still exist —
    * appends never remove files, so a vanished f0 file is proof of a
    * rewrite, and the run ABORTS its stale snapshot and re-pins from
    * scratch (bounded attempts, then a loud failure). Each invocation
    * stages under a UNIQUE `<table>__staged_<pid>_<nanos>` dir, so two
    * compactors can never clobber each other's phase-2 output; a crashed
    * run's leftover staged dir is garbage-collected by the next
    * successful swap once it is a day old (no live phase-2 rewrite runs
    * that long — and a deleted-anyway victim just re-pins). */
  private def compactDirLive(
      spark: SparkSession,
      leasePath: String,
      live: org.apache.hadoop.fs.Path,
      rewrite: DataFrame => DataFrame,
      attempts: Int = 3): Unit = {
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live)) {
      // a crashed prior swap may have left the table at __retired only —
      // heal (mutates, so under the lease), then re-check
      if (!fs.exists(sibling(live, "__retired"))) return
      withLeaseRetry(spark, leasePath, s"compact-heal:${live.getName}") {
        healDir(fs, live)
      }
      if (!fs.exists(live)) return
    }
    var attempt = 0
    var lastAbort: Throwable = null
    while (attempt < attempts) {
      attempt += 1
      // PHASE 1 — pin the snapshot: the exact data files the rewrite covers
      val f0 = listDataFiles(fs, live)
      if (f0.isEmpty) return
      val staged = sibling(live,
        s"__staged_${ProcessHandle.current().pid()}_${System.nanoTime()}")
      // create the staged dir EAGERLY: the vanished-staged abort below
      // keys on its absence, and only a dir that EXISTED can vanish — a
      // phase-2 failure thrown before Spark created the dir (an eager
      // collect inside the rewrite callback) must propagate with its
      // real cause, not be swallowed as a cross-host GC race
      fs.mkdirs(staged)
      // Staged-dir-vanished guard: a CONCURRENT same-table compactor's
      // post-swap [[gcStaleStaged]] can delete this run's staged dir if
      // the run is pathologically old (>24h in phase 2, or stuck that
      // long waiting on the lease) or the host clocks disagree. pid-
      // scoped GC makes that impossible same-host; cross-host it
      // remains reachable, and without this guard the victim dies on a
      // confusing files-vanished FS error. With it, a failure whose
      // staged dir is GONE is treated exactly like the pinned-file-
      // vanished case: abort the stale snapshot and re-pin (and if the
      // abort hit between the two phase-3 renames, the table sits at
      // __retired — heal it first, same as the entry-time crash path).
      def abortIfStagedVanished(e: Throwable): Boolean = {
        val vanished = try !fs.exists(staged)
        catch { case _: java.io.IOException => false }
        if (vanished && !fs.exists(live) &&
            fs.exists(sibling(live, "__retired")))
          withLeaseRetry(spark, leasePath, s"compact-heal:${live.getName}") {
            healDir(fs, live)
          }
        vanished
      }
      val swapped =
        try {
          // PHASE 2 — the O(table) rewrite, NO lease: appends continue freely
          rewrite(spark.read.parquet(f0.map(_.toString): _*))
            .write.mode("overwrite").parquet(staged.toString)
          compactPostStageHook(live.getName)
          // PHASE 3 — delta catch-up + swap, the only excluded window. The
          // acquire RETRIES: against a live intake stream the lease is briefly
          // held every few seconds by batch commits, and the compactor must
          // wait its turn like any other mutator (the bounded timeout still
          // surfaces a crashed holder loudly).
          withLeaseRetry(spark, leasePath, s"compact:${live.getName}") {
            val f0set = f0.map(_.toString).toSet
            val current = listDataFiles(fs, live)
            if (!f0set.forall(current.map(_.toString).toSet)) {
              // a full-table rewrite replaced the pinned snapshot — the
              // staged output is stale; drop it and re-pin
              fs.delete(staged, true)
              false
            } else {
              val delta = current.filterNot(p => f0set(p.toString))
              if (delta.nonEmpty)
                spark.read.parquet(delta.map(_.toString): _*)
                  .write.mode("append").parquet(staged.toString)
              val retired = sibling(live, "__retired")
              if (fs.exists(retired)) fs.delete(retired, true)
              if (!fs.rename(live, retired))
                throw new java.io.IOException(
                  s"compact: rename $live -> $retired failed")
              if (!fs.rename(staged, live))
                throw new java.io.IOException(
                  s"compact: rename $staged -> $live failed — pre-swap rows intact at $retired")
              fs.delete(retired, true)
              gcStaleStaged(fs, live)
              true
            }
          }
        } catch {
          case scala.util.control.NonFatal(e) if abortIfStagedVanished(e) =>
            lastAbort = e // preserved as the cause if every attempt aborts
            false
        }
      if (swapped) return
    }
    val fail = new IllegalStateException(
      s"compact: $live was fully rewritten during each of $attempts " +
        "snapshot attempts (a repair/maintenance rewrite or another " +
        "compactor keeps replacing the table) — compact during a quieter " +
        "window")
    if (lastAbort != null) fail.initCause(lastAbort)
    throw fail
  }

  /** TEST-ONLY injection point: invoked with the table dir's name after
    * each [[compactDirLive]] phase-2 rewrite (staged snapshot written,
    * phase-3 lease not yet acquired) — the window the
    * rewrite-vs-compaction race specs exercise deterministically. */
  @volatile private[graft] var compactPostStageHook: String => Unit = _ => ()

  /** Delete crashed compactors' leftover `<table>__staged_*` dirs (>= 1
    * day old) beside a table. Runs under the phase-3 lease right after a
    * successful swap. Scope guard: a dir whose embedded pid is STILL
    * ALIVE on this host is skipped regardless of age — a same-host
    * compactor legitimately >24h into phase 2 (the O(table) corpus
    * rewrite at the 100 TB posture) must not have its snapshot deleted
    * out from under it. A cross-host compactor's pid can't be probed;
    * there the age cutoff stands, and the victim recovers via
    * [[compactDirLive]]'s vanished-staged abort (clean re-pin, not an
    * FS error). An alive-but-unrelated pid collision merely defers GC
    * to a later swap. */
  private def gcStaleStaged(
      fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path): Unit = {
    val prefix = live.getName + "__staged_"
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    def pidAlive(name: String): Boolean =
      name.stripPrefix(prefix).split('_').headOption
        .flatMap(p => scala.util.Try(p.toLong).toOption)
        .exists(p => ProcessHandle.of(p).isPresent)
    try fs.listStatus(live.getParent).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix) &&
        st.getModificationTime < cutoff && !pidAlive(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, true))
    catch { case _: java.io.IOException => () } // GC is best-effort
  }

  /** `<dir>__suffix` beside `dir`. */
  private def sibling(
      dir: org.apache.hadoop.fs.Path, suffix: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(dir.getParent, dir.getName + suffix)

  /** Data files of a parquet table dir (skips `_SUCCESS`, checksums and
    * other `_`/`.`-prefixed bookkeeping). */
  private def listDataFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    fs.listStatus(dir).toSeq
      .filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .map(_.getPath)

  /** Parquet-table existence through the Spark reader, not java.io.File —
    * the state path may be any Hadoop-addressable URI (hdfs://, s3a://,
    * file:), where a local-File check is always false (which would e.g.
    * silently drop the frozen centroids and re-run a Lloyd training every
    * ingest). One probe idiom for every optional state table. */
  /** The digest-regime predicate every expire/migrate decision pivots
    * on: a state is DOC-KEYED iff its digests table exists and carries
    * the doc_id column (regimes are self-describing from schema — no
    * meta flag to drift). ONE implementation: the sniff is the
    * correctness pivot of the retention surface, and hand-copied
    * instances drifting independently is how a silent
    * keyed->payload-free downgrade gets reintroduced. Callers are
    * responsible for healing a crashed swap FIRST ([[healStranded]]
    * outside a lease, [[healTable]] under one) — a stranded table reads
    * as absent here. */
  private def digestsKeyed(spark: SparkSession, statePath: String): Boolean =
    tableExists(spark, s"$statePath/digests") &&
      spark.read.parquet(s"$statePath/digests").columns.contains("doc_id")

  private def tableExists(spark: SparkSession, path: String): Boolean =
    try { spark.read.parquet(path); true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }

  /** Restore the vector-table <-> bucket-table invariant after a crash in
    * the ingest's two-append window ([[graft.streaming.CorpusIntakeJob
    * .ingestEmbeddingBatch]] appends vectors, then bucket rows — a failure
    * between them leaves admitted vectors with no bucket rows, and those
    * vectors would never collide with future replicas):
    *
    *  - vectors MISSING bucket rows get them recomputed and appended
    *    (batch-shaped: an anti-join finds the drift, the hyperplane
    *    projection runs over drift rows only);
    *  - GHOST bucket rows (vec_id absent from the vector table — the
    *    reversed crash order) are dropped via a distinct-rewrite swap,
    *    but ONLY when ghosts exist (the common no-drift call never
    *    rewrites the table).
    *
    * Idempotent; [[graft.streaming.CorpusIntakeJob.runEmbeddingStream]]
    * runs it once at startup so a restarted stream always resumes from a
    * consistent pair of tables. Returns (bucket rows added, ghost rows
    * dropped). */
  def repairEmbBuckets(
      spark: SparkSession, statePath: String, standingVecsPath: String): (Long, Long) = {
    heal(spark, statePath, "emb_buckets")
    val m = spark.read.parquet(s"$statePath/emb_meta").head()
    val (nPlanes, dim) = (m.getAs[Int]("n_planes"), m.getAs[Int]("dim"))
    val vecs = spark.read.parquet(standingVecsPath)
    val buckets = spark.read.parquet(s"$statePath/emb_buckets")
    val missing = vecs.join(
        buckets.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      .localCheckpoint(true) // consumed by the append AND the count
    val nMissing = missing.count()
    if (nMissing > 0)
      withLease(spark, statePath, "repairEmbBuckets:append") {
        VectorOps.hyperplaneBuckets(missing, nPlanes, dim)
          .select("vec_id", "bucket")
          .write.mode("append").parquet(s"$statePath/emb_buckets")
      }
    val ghosts = buckets.join(
        vecs.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
    val nGhosts = ghosts.count()
    if (nGhosts > 0) {
      val keep = spark.read.parquet(s"$statePath/emb_buckets")
        .join(vecs.select("vec_id").distinct(), Seq("vec_id"), "left_semi")
        .localCheckpoint(true)
      withLease(spark, statePath, "repairEmbBuckets:rewrite") {
        swapTable(spark, statePath, "emb_buckets") { staged =>
          keep.write.mode("overwrite").parquet(staged)
        }
      }
    }
    (nMissing, nGhosts)
  }

  /** Restore the corpus-table <-> digest/band-table invariant after a
    * crash in the TEXT ingest's append window — the text twin of
    * [[repairEmbBuckets]]. [[graft.streaming.CorpusIntakeJob
    * .ingestTextBatch]] appends admitted text to the corpus table FIRST,
    * then its digests + band rows via [[append]]; a failure anywhere in
    * that chain leaves admitted docs with text but no (or partial)
    * artifacts, and byte-replicas of those docs would be re-admitted on
    * replay (duplicate corpus rows). Band-row ABSENCE is the drift
    * witness (the digest table has no doc_id column, so digests cannot be
    * audited directly — which is why [[append]] writes digests before
    * bands: every crash shape leaves the drifted doc missing from
    * `bands/`):
    *
    *  - corpus docs MISSING from `bands/` get BOTH artifacts recomputed
    *    under the state's persisted regime and appended (a digest that
    *    did land re-appends as a set-semantic duplicate — harmless,
    *    [[compact]] folds it);
    *  - GHOST band rows (doc_id absent from the corpus table — only a
    *    manual reversed write can produce this) are dropped via a
    *    distinct-rewrite swap, only when ghosts exist.
    *
    * Docs whose FINGERPRINT text is shorter than the shingle size can
    * never carry band rows, so they would re-appear as drift every run;
    * they re-append only their digest (idempotent up to set-semantic
    * duplicates). The gated intake never admits them (minWords >= shingle
    * size) — they arise only from manually-built corpus tables.
    *
    * Idempotent; [[graft.streaming.CorpusIntakeJob.runTextStream]] runs it
    * once at startup so a restarted stream always resumes from a
    * consistent (corpus, state) pair. Returns (drift docs repaired, ghost
    * band rows dropped). */
  def repairTextArtifacts(
      spark: SparkSession, statePath: String, standingDocsPath: String): (Long, Long) = {
    // a corpus compaction that crashed between its two renames leaves the
    // table only at `<corpus>__retired` — heal it here (the startup path)
    // under the state lease, same skip-when-held contract as [[heal]]
    locally {
      import org.apache.hadoop.fs.{Path => HPath}
      val live = new HPath(standingDocsPath)
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stateBase = new HPath(statePath)
      if (!fs.exists(live) && fs.exists(sibling(live, "__retired")) &&
          !leaseHeld(fs, stateBase))
        withLease(spark, statePath, "repairTextArtifacts:healCorpus") {
          healDir(fs, live)
        }
    }
    val state = load(spark, statePath)
    val cfg = CorpusPipeline.Config(
      shingleSize = state.meta.shingleSize,
      normalizeFingerprints = state.meta.normalizedFingerprints)
    val docs = spark.read.parquet(standingDocsPath).select("doc_id", "text")
    val bandIds = state.bands.select("doc_id").distinct()
    val drift = docs.join(bandIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // consumed by the artifact writes AND the count
    val nDrift = drift.count()
    if (nDrift > 0) {
      val (digests, bands) =
        artifacts(drift, cfg, state.meta.numHashes, state.meta.bandRows,
          state.meta.docKeyed)
      // drifted docs' span hashes re-append too (corpus text IS the
      // admitted cleaned text, and spanWindowHashes is deterministic, so
      // the repair rebuilds exactly what the crashed append would have
      // written; duplicates across the crash window are set-semantic)
      val spans = spanHashesFor(drift, statePath)
      withLease(spark, statePath, "repairTextArtifacts:append") {
        writeArtifacts(digests, bands, statePath, spans)
      }
    }
    val nGhosts = state.bands
      .join(docs.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .count()
    if (nGhosts > 0) {
      val keep = spark.read.parquet(s"$statePath/bands")
        .join(docs.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
      withLease(spark, statePath, "repairTextArtifacts:rewrite") {
        swapTable(spark, statePath, "bands") { staged =>
          keep.write.mode("overwrite").parquet(staged)
        }
      }
    }
    // census drift (a crash between the corpus append and its census
    // bump) heals on the same startup pass — no-op when no census. DEEP
    // witness: startup runs once and already scans the corpus, and the
    // per-source compare also catches a compensating equal-total drift
    // accumulated across crashes the cheap witness cannot see.
    reconcileSourceCensus(spark, statePath, standingDocsPath, deep = true)
    (nDrift, nGhosts)
  }

  /** Persist the standing corpus' PERCEPTUAL-HASH artifacts for the
    * MEDIA dedup cycle — the image/audio/video twin of `digests`/`bands`:
    * `media_phashes/` (media_id, phash — 8 bytes of state per standing
    * item, the fingerprint-then-discard shape: standing payloads are
    * never decoded again) + `media_bands/` (media_id, band, sig — the
    * [[Multimodal.phashBandRows]] projection) + a `media_meta` row
    * pinning the band regime. `phashes` is any [[Multimodal.imagePhash]]
    * / `audioPhash` / `videoPhash` output — the state machinery is
    * representation-agnostic over the 64-bit hash string. */
  def writeMediaState(
      phashes: DataFrame, path: String, nBands: Int = 4): Unit = {
    val spark = phashes.sparkSession
    import spark.implicits._
    val ph = Frames.barrier(phashes.select("media_id", "phash"))
    ph.write.mode("overwrite").parquet(s"$path/media_phashes")
    Multimodal.phashBandRows(ph, nBands)
      .select(col("doc_id").as("media_id"), col("band"), col("sig"))
      .write.mode("overwrite").parquet(s"$path/media_bands")
    Seq(nBands).toDF("n_bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/media_meta")
  }

  /** Lazy scans of the persisted media artifacts: (phashes, bands,
    * nBands). Heals crashed swaps first (skip-when-held, like every
    * load path). */
  def loadMediaState(spark: SparkSession, path: String): (DataFrame, DataFrame, Int) = {
    Seq("media_phashes", "media_bands").foreach(heal(spark, path, _))
    // regime row + schemas fetched driver-side (cachedRegimeRow /
    // readTable) — the media intake loads this every micro-batch, and
    // the uncached form paid one head() job + two schema-inference jobs
    // per batch for write-time constants
    val nBands = cachedRegimeRow(spark, s"$path/media_meta").getAs[Int]("n_bands")
    (readTable(spark, s"$path/media_phashes"),
      readTable(spark, s"$path/media_bands"), nBands)
  }

  /** Close the media ingest cycle: append an ADMITTED batch's phash and
    * band rows under the persisted regime. */
  def appendMediaPhashes(phashes: DataFrame, path: String): Unit = {
    val spark = phashes.sparkSession
    val nBands = cachedRegimeRow(spark, s"$path/media_meta").getAs[Int]("n_bands")
    withLease(spark, path, "appendMediaPhashes") {
      writeMediaArtifacts(phashes, path, nBands)
    }
  }

  /** The write half of [[appendMediaPhashes]] — caller MUST hold the
    * lease. Phashes FIRST, bands second: bands-absence is the drift
    * witness [[repairMediaArtifacts]] keys on (the same ordering
    * contract as [[writeArtifacts]]). */
  private[graft] def writeMediaArtifacts(
      phashes: DataFrame, path: String, nBands: Int): Unit = {
    val ph = Frames.barrier(phashes.select("media_id", "phash"))
    Frames.sizedWrite(ph).write.mode("append").parquet(s"$path/media_phashes")
    Frames.sizedWrite(Multimodal.phashBandRows(ph, nBands)
        .select(col("doc_id").as("media_id"), col("band"), col("sig")))
      .write.mode("append").parquet(s"$path/media_bands")
  }

  /** Restore the media-table <-> phash/band-table invariant after a crash
    * in the media ingest's append window — the media twin of
    * [[repairTextArtifacts]]: standing media rows missing from
    * `media_bands/` get BOTH artifacts recomputed (a per-partition
    * payload decode over the drift rows only, via `phashOf`) and
    * appended; ghost rows (artifacts whose media_id left the media
    * table) are dropped via a distinct-rewrite swap, only when present.
    * Returns (drift items repaired, ghost rows dropped). */
  def repairMediaArtifacts(
      spark: SparkSession,
      statePath: String,
      standingMediaPath: String,
      phashOf: DataFrame => DataFrame = Multimodal.imagePhash): (Long, Long) = {
    Seq("media_phashes", "media_bands").foreach(heal(spark, statePath, _))
    val nBands =
      spark.read.parquet(s"$statePath/media_meta").head().getAs[Int]("n_bands")
    val media = spark.read.parquet(standingMediaPath)
    val bandIds = spark.read.parquet(s"$statePath/media_bands")
      .select("media_id").distinct()
    val drift = media.join(bandIds, Seq("media_id"), "left_anti")
      .localCheckpoint(true) // consumed by the artifact writes AND the count
    val nDrift = drift.count()
    if (nDrift > 0) {
      val ph = phashOf(drift).localCheckpoint(true)
      withLease(spark, statePath, "repairMediaArtifacts:append") {
        writeMediaArtifacts(ph, statePath, nBands)
      }
    }
    val mediaIds = media.select("media_id").distinct().localCheckpoint(false)
    var nGhosts = 0L
    Seq("media_bands", "media_phashes").foreach { table =>
      val ghosts = spark.read.parquet(s"$statePath/$table")
        .join(mediaIds, Seq("media_id"), "left_anti").count()
      if (ghosts > 0) {
        nGhosts += ghosts
        val keep = spark.read.parquet(s"$statePath/$table")
          .join(mediaIds, Seq("media_id"), "left_semi")
          .localCheckpoint(true)
        withLease(spark, statePath, s"repairMediaArtifacts:rewrite:$table") {
          swapTable(spark, statePath, table) { staged =>
            keep.write.mode("overwrite").parquet(staged)
          }
        }
      }
    }
    (nDrift, nGhosts)
  }

  /** Persist the standing corpus' SPAN-DEDUP window-hash index
    * (`span_hashes/` — one 16-byte md5 per DISTINCT w-token window, the
    * [[TextOps.spanWindowHashes]] projection — plus a `span_meta` row
    * pinning `w`): the standing side of
    * [[TextOps.removeDuplicatedSpansIncremental]]. O(corpus tokens) rows
    * — the exact-substring index's honest, published cost, paid once as
    * a table instead of a census rebuild per ingest. */
  def writeSpanIndex(
      docs: DataFrame, path: String, w: Int = 20,
      docKeyed: Option[Boolean] = None): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // heal crashed swaps BEFORE the regime sniff and the overwrite: a
    // digests table stranded at __retired would read as "no digests"
    // and silently downgrade the new index to payload-free (the mixed
    // regime expire refuses); a stranded span_hashes would be orphaned
    // by the fresh overwrite below (its live dir then blocks healDir's
    // rename — standing hashes silently lost)
    healStranded(spark, path, "digests", "writeSpanIndex:healDigests")
    healStranded(spark, path, "span_hashes", "writeSpanIndex:healSpans")
    // default: FOLLOW the state's digest regime when one exists at this
    // path — an all-defaults write() + writeSpanIndex() must not
    // manufacture the mixed keyed-digests/payload-free-span state that
    // expire() refuses. A span-only path (no digests table) stays
    // payload-free unless explicitly asked.
    val keyed = docKeyed.getOrElse(
      tableExists(spark, s"$path/digests") &&
        spark.read.parquet(s"$path/digests").columns.contains("doc_id"))
    (if (keyed) TextOps.spanWindowHashesKeyed(docs, w)
     else TextOps.spanWindowHashes(docs, w))
      .write.mode("overwrite").parquet(s"$path/span_hashes")
    Seq(w).toDF("w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/span_meta")
  }

  /** Lazy scan of the persisted span index: (hashes, w). */
  def loadSpanIndex(spark: SparkSession, path: String): (DataFrame, Int) = {
    heal(spark, path, "span_hashes")
    val w = spark.read.parquet(s"$path/span_meta").head().getAs[Int]("w")
    (spark.read.parquet(s"$path/span_hashes"), w)
  }

  /** Close the span-dedup cycle: append the CLEANED admitted batch's
    * distinct window hashes under the persisted `w` (duplicates across
    * appends are set-semantic; [[compact]] folds them). */
  def appendSpanHashes(cleanedBatch: DataFrame, path: String): Unit = {
    val spark = cleanedBatch.sparkSession
    // heal a crashed span_hashes swap BEFORE the regime sniff: in the
    // crash window the sniff would read 'absent', the append would
    // write payload-free rows into a FRESH live dir, and that live dir
    // would block healDir's rename — the retired keyed rows orphaned
    // (standing hashes silently lost, under-dedup) and the state left
    // in the mixed regime expire refuses
    healStranded(spark, path, "span_hashes", "appendSpanHashes:heal")
    val w = spark.read.parquet(s"$path/span_meta").head().getAs[Int]("w")
    val rows =
      if (spanIndexKeyed(spark, path))
        TextOps.spanWindowHashesKeyed(cleanedBatch, w)
      else TextOps.spanWindowHashes(cleanedBatch, w)
    withLease(spark, path, "appendSpanHashes") {
      Frames.sizedWrite(rows).write.mode("append").parquet(s"$path/span_hashes")
    }
  }

  /** Initialize the MAINTAINED PER-SOURCE CENSUS (`source_census/` —
    * (source, n) rows): the standing-corpus count frame
    * [[Mixing.capPerKeyIncremental]] and [[Mixing.temperatureSampleCounts]]
    * consume. SURVEY §2.H's "at 100 TB a maintained census table, not a
    * corpus scan" made real: written once from one corpus recount, then
    * maintained by every [[graft.streaming.CorpusIntakeJob.ingestTextBatch]]
    * admission (a #sources-row rewrite under the batch's own lease hold —
    * the table is tiny, so the whole-table swap is the cheap operation
    * here) and recounted by [[expire]]. The artifact is OPT-IN: the
    * ingest maintains it iff this table exists.
    *
    * CRASH DISCIPLINE: the census updates LAST in the ingest commit
    * (corpus -> artifacts -> census), so every crash shape leaves it
    * UNDER-counting — the witness [[reconcileSourceCensus]] keys on
    * (sum(census) != count(corpus) — two metadata-cheap counts), run at
    * stream startup via [[repairTextArtifacts]] and at the end of every
    * [[expire]]. Deltas are never subtracted blindly (a crash-retried
    * subtraction would double-count); healing is always a recount. */
  def writeSourceCensus(
      spark: SparkSession, statePath: String, corpusPath: String): Unit =
    spark.read.parquet(corpusPath)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$statePath/source_census")

  /** Lazy scan of the maintained census: (source, n). */
  def loadSourceCensus(spark: SparkSession, statePath: String): DataFrame = {
    heal(spark, statePath, "source_census")
    spark.read.parquet(s"$statePath/source_census")
  }

  /** True iff the census artifact exists at this state path (the ingest's
    * maintain-iff-present probe). */
  private[graft] def sourceCensusExists(
      spark: SparkSession, statePath: String): Boolean =
    tableExists(spark, s"$statePath/source_census")

  /** Fold an ADMITTED batch's per-source counts into the census — caller
    * MUST hold the state lease (the ingest commit's hold). One union +
    * re-aggregate over (#sources + batch-sources) rows, checkpointed so
    * the swap never re-reads the live table it replaces. */
  private[graft] def bumpSourceCensus(
      spark: SparkSession, statePath: String, admitted: DataFrame): Unit = {
    val merged = spark.read.parquet(s"$statePath/source_census")
      .unionByName(
        admitted.groupBy("source").agg(count(lit(1)).as("n")))
      .groupBy("source").agg(sum("n").as("n"))
      .localCheckpoint(true)
    swapTable(spark, statePath, "source_census") { staged =>
      merged.coalesce(1).write.mode("overwrite").parquet(staged)
    }
  }

  /** Heal census drift from a crash between a corpus mutation and its
    * census update: when the census exists and its total disagrees with
    * the corpus row count (appends and expires both preserve the
    * equality when they complete), recount from the corpus and swap —
    * idempotent, under the lease. Returns true iff a recount ran. The
    * healthy path costs one census sum + one parquet-footer corpus
    * count.
    *
    * WITNESS GRANULARITY: the default (cheap) witness is total-only, so
    * a drift that PRESERVES the total but skews the per-source split —
    * two compensating crash shapes with no reconcile between them —
    * passes it. `deep = true` compares the census against the recount
    * PER SOURCE (one corpus groupBy + a full-outer join with the
    * #sources-row census — any disagreement, including the compensating
    * shape, fires the heal). The deep witness costs a corpus scan, so
    * it rides the passes that already pay corpus-shaped work — [[expire]]
    * and the stream-startup [[repairTextArtifacts]] — while the
    * per-batch replay reconcile stays cheap. */
  def reconcileSourceCensus(
      spark: SparkSession, statePath: String, corpusPath: String,
      deep: Boolean = false): Boolean = {
    healStranded(spark, statePath, "source_census", "reconcileCensus:heal")
    if (!sourceCensusExists(spark, statePath)) return false
    def drifted(): Boolean =
      if (deep) {
        // per-source witness: full-outer join so a source present on
        // only one side (admitted-then-crashed, or expired-to-zero)
        // disagrees with the other side's absence. NULL-SAFE key equality
        // (<=>): groupBy counts NULL sources as a group on BOTH sides, so
        // a plain equality join would leave the two NULL rows forever
        // unmatched and flag phantom drift that no recount can heal
        val cen = spark.read.parquet(s"$statePath/source_census")
          .select(col("source").as("__cs"), col("n").as("__cn"))
        val rec = spark.read.parquet(corpusPath)
          .groupBy("source").agg(count(lit(1)).as("__rn"))
        rec.join(cen, col("source") <=> col("__cs"), "full_outer")
          .filter(coalesce(col("__cn"), lit(0L)) =!= coalesce(col("__rn"), lit(0L)))
          .limit(1).count() > 0
      } else {
        val total = spark.read.parquet(s"$statePath/source_census")
          .agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
        total != spark.read.parquet(corpusPath).count()
      }
    // unleased fast path: the healthy case never touches the lease
    if (!drifted()) false
    else withLeaseRetry(spark, statePath, "reconcileSourceCensus") {
      // RE-CHECK and RECOUNT under the lease: a recount computed outside
      // it could land AFTER a concurrent ingest's census bump and clobber
      // that batch's counts with a stale snapshot (the lost-update race
      // the lease exists to exclude — ingest commits hold it for the
      // corpus append + bump pair, so under the lease the pair is
      // consistent). Drift is a crash-heal rarity; holding the lease for
      // one corpus recount is the price of a sound heal.
      if (!drifted()) false
      else {
        val recount = spark.read.parquet(corpusPath)
          .groupBy("source").agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        swapTable(spark, statePath, "source_census") { staged =>
          recount.coalesce(1).write.mode("overwrite").parquet(staged)
        }
        true
      }
    }
  }

  /** Persist a fitted DSIR log-ratio table (`dsir_ratios/`) — the
    * [[TextOps.dsirLogRatios]] output as a REGIME-GUARDED state artifact
    * instead of a bare parquet path: the frozen-model discipline the
    * SemDeDup centroids already get (fit once over the standing corpora,
    * score every batch against the frozen table), with the same loud
    * failure on a regime mismatch — ratios fit under one (m, lambda)
    * scored under another would silently mis-weight every bucket, the
    * exact drift [[loadDsirRatios]]' check refuses. The (m, lambda)
    * regime rides as CONSTANT COLUMNS on the ratio rows themselves
    * rather than a sibling meta table: two separate writes can tear (a
    * crash between them would leave new-regime ratios guarded by
    * old-regime meta, and the guard would then PASS a cross-regime
    * score — the exact silent failure it exists to refuse), while a
    * single self-describing table can only be fully old, fully new, or
    * loudly unreadable. The table is a FITTED MODEL, not a per-doc
    * artifact: [[expire]] deliberately leaves it untouched (an expired
    * doc's feature mass stays in the fitted distribution until the
    * model is deliberately re-fit — the centroid rule), and [[compact]]
    * skips it (m rows, nothing to fold). */
  def writeDsirRatios(
      ratios: DataFrame, path: String, m: Int, lambda: Double): Unit = {
    require(m >= 1, s"m must be positive, got $m")
    // A RE-fit routes through swapTable (stage + two renames + the
    // load-side heal) instead of overwriting the live dir in place:
    // mode("overwrite") deletes the live files before the new ones land,
    // so a crash mid-write could leave a partially-committed table whose
    // surviving rows still carry a self-consistent (m, lambda) — the
    // regime guard would pass while dsirScoresWithRatios' inner join on
    // bucket silently zeroed the missing buckets' contribution. The
    // first-ever write has no live dir to retire and writes directly;
    // loadDsirRatios' dense-coverage check is the belt to this suspender.
    val spark = ratios.sparkSession
    val out = ratios.select(col("bucket"), col("log_ratio"),
      lit(m).as("m"), lit(lambda).as("lambda"))
    if (tableExists(spark, s"$path/dsir_ratios"))
      // the swap holds the STATE LEASE like every other swapTable caller:
      // loadDsirRatios' heal skips only while the lease is held, so an
      // unleased re-fit racing a concurrent scorer's heal would have its
      // __retired renamed back mid-swap and fail spuriously
      withLeaseRetry(spark, path, "writeDsirRatios") {
        swapTable(spark, path, "dsir_ratios") { staged =>
          out.write.mode("overwrite").parquet(staged)
        }
      }
    else out.write.mode("overwrite").parquet(s"$path/dsir_ratios")
  }

  /** Lazy scan of the persisted DSIR ratio table, refusing an (m, lambda)
    * regime mismatch loudly (see [[writeDsirRatios]]). The caller feeds
    * the result to [[TextOps.dsirScoresWithRatios]] with the SAME m.
    *
    * The guard validates the WHOLE table, not just the head row:
    * [[TextOps.dsirLogRatios]] emits exactly one row per bucket 0..m-1,
    * so (a) every row must carry the same (m, lambda) — a mixed-regime
    * table can only come from a torn write and must not score — and (b)
    * the bucket set must cover 0..m-1 densely — a partially-committed
    * table would otherwise pass the regime check on any surviving row
    * while `dsirScoresWithRatios`' inner join on bucket silently zeroed
    * the missing buckets' contribution. One m-row aggregation. */
  def loadDsirRatios(
      spark: SparkSession, path: String, m: Int, lambda: Double): DataFrame = {
    heal(spark, path, "dsir_ratios")
    val df = spark.read.parquet(s"$path/dsir_ratios")
    val st = df.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("bucket")).as("nb"),
      min(col("bucket").cast("long")).as("bmin"),
      max(col("bucket").cast("long")).as("bmax"),
      countDistinct(col("m"), col("lambda")).as("nreg"),
      first("m").as("pm"), first("lambda").as("pl")).head()
    require(st.getAs[Long]("rows") > 0L,
      s"persisted DSIR ratio table at $path/dsir_ratios is empty — " +
        "re-fit (writeDsirRatios) before scoring")
    require(st.getAs[Long]("nreg") == 1L,
      s"persisted DSIR ratio table at $path/dsir_ratios carries " +
        s"${st.getAs[Long]("nreg")} distinct (m, lambda) regimes — a torn " +
        "write; re-fit (writeDsirRatios) before scoring")
    val (pm, pl) = (st.getAs[Int]("pm"), st.getAs[Double]("pl"))
    require(pm == m && pl == lambda,
      s"persisted DSIR ratios were fit under m=$pm, lambda=$pl; " +
        s"caller wants m=$m, lambda=$lambda — re-fit (writeDsirRatios) " +
        "under the new regime instead of scoring across regimes")
    require(st.getAs[Long]("rows") == m.toLong &&
        st.getAs[Long]("nb") == m.toLong &&
        st.getAs[Long]("bmin") == 0L && st.getAs[Long]("bmax") == (m - 1).toLong,
      s"persisted DSIR ratio table at $path/dsir_ratios must cover buckets " +
        s"0..${m - 1} densely (got ${st.getAs[Long]("rows")} rows, " +
        s"${st.getAs[Long]("nb")} distinct buckets in " +
        s"[${st.getAs[Long]("bmin")}, ${st.getAs[Long]("bmax")}]) — a " +
        "partially-committed write; re-fit (writeDsirRatios)")
    df.select("bucket", "log_ratio")
  }

  /** Persist the standing corpus' sign-LSH bucket rows for the EMBEDDING
    * dedup cycle (`emb_buckets/` + an `emb_meta/` row pinning the
    * hyperplane regime) — the vector twin of the `bands/` table: a daily
    * ingest feeds [[Dedup.dedupByEmbeddingLshIncrementalVsBuckets]] a
    * scan of precomputed (vec_id, bucket) rows instead of re-projecting
    * every standing float vector against the hyperplanes. */
  def writeEmbBuckets(
      standingVecs: DataFrame,
      path: String,
      nPlanes: Int = 4,
      dim: Int = 64): Unit = {
    val spark = standingVecs.sparkSession
    import spark.implicits._
    VectorOps.hyperplaneBuckets(standingVecs, nPlanes, dim)
      .select("vec_id", "bucket")
      .write.mode("overwrite").parquet(s"$path/emb_buckets")
    Seq((nPlanes, dim)).toDF("n_planes", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/emb_meta")
  }

  /** Load the persisted bucket rows, refusing a hyperplane-regime
    * mismatch loudly (buckets from different planes would silently miss
    * near-dups). Returns a lazy scan. */
  def loadEmbBuckets(
      spark: SparkSession, path: String,
      nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    heal(spark, path, "emb_buckets")
    val m = cachedRegimeRow(spark, s"$path/emb_meta")
    require(m.getAs[Int]("n_planes") == nPlanes && m.getAs[Int]("dim") == dim,
      s"persisted emb buckets use nPlanes=${m.getAs[Int]("n_planes")}, " +
        s"dim=${m.getAs[Int]("dim")}; caller wants nPlanes=$nPlanes, dim=$dim")
    readTable(spark, s"$path/emb_buckets")
  }

  /** Close the embedding cycle: append an ADMITTED batch's bucket rows
    * under the SAME persisted hyperplane regime (read from `emb_meta` —
    * batch-shaped work, standing untouched). */
  def appendEmbBuckets(batchVecs: DataFrame, path: String): Unit = {
    val spark = batchVecs.sparkSession
    val rows = embBucketRowsFor(batchVecs, path)
    withLease(spark, path, "appendEmbBuckets") {
      Frames.sizedWrite(rows).write.mode("append").parquet(s"$path/emb_buckets")
    }
  }

  /** The bucket projection of [[appendEmbBuckets]] split from its write
    * (the PERSISTED hyperplane regime, read from `emb_meta`), so the
    * ingest batch leg can commit the vector append + bucket append under
    * ONE (retried) lease hold — the embedding twin of [[artifactsFor]]. */
  private[graft] def embBucketRowsFor(batchVecs: DataFrame, path: String): DataFrame = {
    val spark = batchVecs.sparkSession
    val m = cachedRegimeRow(spark, s"$path/emb_meta")
    VectorOps.hyperplaneBuckets(
        batchVecs, m.getAs[Int]("n_planes"), m.getAs[Int]("dim"))
      .select("vec_id", "bucket")
  }

}
