package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-corpus preparation run — the entry point a user
  * of this library actually calls, chaining the individual operators in
  * the order production pipelines run them:
  *
  *   1. QUALITY GATE    — [[TextOps.gopherGate]] (per-row, scan parallel)
  *   2. PII SCRUB       — [[TextOps.redactPii]] (per-row; rewrites `text`)
  *   2b. PASSAGE SCRUB  — [[TextOps.removeDuplicatedPassages]] (optional:
  *                        cross-doc boilerplate stripped before any
  *                        fingerprint sees it)
  *   2c. SPAN SCRUB     — [[TextOps.removeDuplicatedSpans]] (optional: the
  *                        stride-1 sliding-window form — UNALIGNED
  *                        cross-doc runs the 2b chunks straddle)
  *   3. EXACT DEDUP     — [[Dedup.exactByHash]] (digest-only shuffle)
  *   4. NEAR DEDUP      — [[Dedup.dedupNearLsh]] (banded MinHash-LSH)
  *   5. SEMANTIC DEDUP  — [[Dedup.semDedup]] over a supplied
  *                        (doc_id, embedding) frame (optional)
  *   6. DECONTAM        — [[TextOps.decontaminate]] vs the eval corpus
  *                        (shingle equi-join, optional)
  *   7. MIX             — [[Mixing.sampleToTokenBudget]] per-source weights
  *                        (optional)
  *   8. PACK            — [[Packing.packSequences]] token-budget bins
  *                        (two-level prefix sum)
  *
  * Order rationale: the cheap per-row gates run FIRST so the shuffling
  * stages (dedup, decontamination) see the smallest possible corpus; PII
  * scrub precedes dedup so redacted text is what gets fingerprinted (two
  * docs differing only in emails ARE duplicates); packing runs last on
  * the final doc set. Every stage is individually oracle- or spec-pinned;
  * this wrapper adds only composition, no new semantics. Stage boundaries
  * are plain DataFrames — callers can splice in their own stages (e.g.
  * [[Dedup.semDedup]] on an embedding join, [[TextOps.repetitionStats]]
  * thresholds) between any two steps.
  *
  * At 100 TB: stages 1-2 are whole-stage-codegen projections at scan
  * parallelism; 3-6 shuffle only hashes/shingles/ids — never payloads
  * (step 3 runs [[Dedup.exactByHash]], so even exact dedup moves only
  * (doc_id, digest) pairs; step 5's clustering collects k x dim centroid
  * means like the IVF trainer); 7 is a broadcast census; 8's sequential
  * step is 1/8192nd of the corpus.
  */
object CorpusPipeline {

  final case class Config(
      // gopher gate (defaults = TextOps.gopherRules defaults)
      minWords: Int = 20,
      maxWords: Int = 100000,
      // trained quality-classifier gate (opt-in): Some((weightsMicros, m,
      // minScoreMicros)) inserts stage 1b — docs scoring below the
      // threshold under the supplied [[QualityLr]] micro-weights are
      // dropped, AFTER the rule gate and BEFORE the PII scrub (classifier
      // filters score raw text). The pipeline never trains: weights come
      // from [[QualityLr.trainQualityLr]] on a curated labeled sample,
      // trained once and reused across batch and incremental runs (so
      // batch/incremental parity is by construction). Scoring is one
      // broadcast weight map + a doc_id-keyed aggregation.
      qualityGate: Option[(Seq[Long], Int, Long)] = None,
      // trained LANGUAGE-ID gate (opt-in): Some((models, m, keep))
      // inserts stage 1c — each doc's language is predicted under the
      // supplied one-vs-rest [[QualityLr]] micro-weight models
      // ([[QualityLr.scoreOneVsRestLr]]'s argmax, ties to the smallest
      // class) and docs whose predicted language is not in `keep` are
      // dropped, after the rule/quality gates and BEFORE the PII scrub
      // (language ID reads raw text, like the classifier gate). `models`
      // must arrive class-sorted ([[QualityLr.trainOneVsRestLr]]'s
      // output order — enforced by the scorer). The pipeline never
      // trains: models come from a curated labeled sample, trained once
      // and ridden through the config, so batch/incremental parity is by
      // construction. Scoring is ONE feature pass + one doc_id-keyed
      // aggregation computing every class's logit.
      keepLangs: Option[(Seq[(String, Seq[Long])], Int, Set[String])] = None,
      // near-dedup
      nearDupTau: Double = 0.8,
      shingleSize: Int = 3,
      // fingerprint normalization (opt-in): near-dedup and decontamination
      // key on [[TextOps.normalizeText]]'d text (NFC, lowercase,
      // punctuation -> space, whitespace collapse) while every stage
      // boundary and the final output still carry the raw (scrubbed) text.
      // Case/punctuation/unicode-form variants of a document thereby
      // become near-dup candidates; q58 pins the normalization itself
      // cross-engine. Exact dedup stays byte-exact by design.
      normalizeFingerprints: Boolean = false,
      // boilerplate passage removal (opt-in): Some((w, minDocs)) inserts a
      // [[TextOps.removeDuplicatedPassages]] stage between PII scrub and
      // exact dedup — w-token chunks occurring in >= minDocs distinct docs
      // are stripped BEFORE any fingerprinting (shared boilerplate
      // inflates every similarity signal downstream). Docs whose text
      // empties entirely are dropped at this stage.
      removeDupPassages: Option[(Int, Int)] = None,
      // exact-substring SPAN scrub (opt-in): Some((w, minDocs)) inserts a
      // [[TextOps.removeDuplicatedSpans]] stage right after the positional
      // 2b slot (and before any fingerprinting) — every w-token STRIDE-1
      // window occurring in >= minDocs distinct docs marks its span, and
      // all covered tokens are removed from every doc. The sliding window
      // catches the unaligned boilerplate the fixed 2b chunks straddle;
      // docs whose text empties entirely are dropped at this stage. The
      // incremental forms run [[TextOps.removeDuplicatedSpansIncremental]]
      // against the standing corpus' window hashes (recomputed from the
      // frame, or the persisted span index when state-fed).
      removeDupSpans: Option[(Int, Int)] = None,
      // decontamination n-gram size
      decontamNgram: Int = 5,
      // semantic dedup (used only when an embeddings frame is supplied)
      semDedupTau: Double = 0.95,
      semDedupNCentroids: Int = 0, // 0 = auto-k ~ sqrt(n)
      // mixing: per-source weights toward a token budget (None = keep all)
      mixWeights: Option[(Long, Map[String, Double])] = None,
      // packing
      packBudget: Long = 2048L)

  /** Stage 1b — the trained QUALITY gate as a standalone transform: score
    * the frame's raw text under the supplied [[QualityLr]] micro-weights
    * and keep docs at or above the threshold. ONE implementation shared
    * by the batch pipeline, both incremental forms, and the streaming
    * intake ([[graft.streaming.CorpusIntakeJob.ingestTextBatch]]) so the
    * four deployment shapes cannot drift semantically. No-op on None. */
  private[graft] def applyQualityGate(
      df: DataFrame,
      gate: Option[(Seq[Long], Int, Long)]): DataFrame = gate match {
    case Some((w, m, thr)) =>
      val keep = QualityLr.scoreQualityLr(df, w.toArray, m)
        .filter(col("score_micros") >= thr).select("doc_id")
      df.join(keep, Seq("doc_id"), "left_semi")
    case None => df
  }

  /** Stage 1c — the trained LANGUAGE-ID gate as a standalone transform:
    * predict each doc's language under the supplied one-vs-rest models
    * ([[QualityLr.scoreOneVsRestLr]]'s argmax, ties to the smallest
    * class) and keep only the configured languages. Shared like
    * [[applyQualityGate]]; no-op on None. */
  private[graft] def applyLangGate(
      df: DataFrame,
      gate: Option[(Seq[(String, Seq[Long])], Int, Set[String])]): DataFrame =
    gate match {
      case Some((models, m, keep)) =>
        val ms = models.map { case (c, w) => c -> w.toArray }
        val keepIds = QualityLr.scoreOneVsRestLr(df, ms, m)
          .filter(col("pred_lang").isin(keep.toSeq.sorted: _*))
          .select("doc_id")
        df.join(keepIds, Seq("doc_id"), "left_semi")
      case None => df
    }

  /** Stages 1b + 1c FUSED over one featurize — the streaming intake's
    * per-batch form ([[graft.streaming.CorpusIntakeJob]]): when BOTH
    * gates are on and share one feature regime m, every doc's quality
    * score and language argmax come out of ONE [[QualityLr.lrFeatures]]
    * pass and ONE doc_id-keyed aggregation ([[QualityLr.scoreGatesFused]]),
    * and the kept set is the CONJUNCTION filter. Identical to applying
    * 1b then 1c through the standalone transforms (spec-pinned): scores
    * are per-doc functions — per-doc L1 feature normalization, per-doc
    * logit sums — so scoring the 1c argmax over the full frame instead
    * of the 1b survivors cannot move any doc's values, and keep(1b) ∧
    * keep(1c) selects exactly sequential-1b-then-1c's rows. Different
    * m's (or either gate off) fall back to the sequential transforms —
    * same result, one more featurize. */
  private[graft] def applyTrainedGates(
      df: DataFrame,
      quality: Option[(Seq[Long], Int, Long)],
      lang: Option[(Seq[(String, Seq[Long])], Int, Set[String])]): DataFrame =
    (quality, lang) match {
      case (Some((qw, qm, thr)), Some((models, lm, keep))) if qm == lm =>
        val keepIds = QualityLr.scoreGatesFused(df, qw.toArray,
            models.map { case (c, w) => c -> w.toArray }, qm)
          .filter(col("score_micros") >= thr &&
            col("pred_lang").isin(keep.toSeq.sorted: _*))
          .select("doc_id")
        df.join(keepIds, Seq("doc_id"), "left_semi")
      case _ => applyLangGate(applyQualityGate(df, quality), lang)
    }

  /** documents (doc_id, text, source, ...) [+ eval corpus] -> packed,
    * scrubbed, deduplicated, decontaminated training rows:
    * (doc_id, source, text, n_tokens, bin, pos_in_bin). */
  def prepare(
      docs: DataFrame,
      evalCorpus: Option[DataFrame] = None,
      cfg: Config = Config(),
      embeddings: Option[DataFrame] = None): DataFrame =
    stages(docs, evalCorpus, cfg, embeddings, identity,
      materializeScrub = true).last._2

  /** [[prepare]] plus the attrition report every production corpus run
    * needs: (result, report) where report is one row per stage —
    * (stage, n_docs, n_tokens) — in pipeline order. Stage boundaries are
    * LAZILY localCheckpointed so evaluating the result and all eight
    * censuses computes each stage once instead of recomputing the prefix
    * per census; the checkpoint blocks live only as long as the session
    * (for multi-day 100 TB runs, persist boundaries to a table instead). */
  def prepareWithReport(
      docs: DataFrame,
      evalCorpus: Option[DataFrame] = None,
      cfg: Config = Config(),
      embeddings: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val st = stages(docs, evalCorpus, cfg, embeddings, _.localCheckpoint(false))
    val report = st.map { case (name, df) =>
      df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(size(split(col("text"), " ")).cast("long")), lit(0L))
          .as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
    }.reduce(_ unionAll _)
    (st.last._2, report)
  }

  /** [[prepare]]'s INCREMENTAL form — the daily-ingest run: prepare an
    * incoming batch AGAINST an already-prepared standing corpus. Stages
    * 1-2 (gate, scrub) run per-row on the batch only; exact and near
    * dedup run batch-vs-standing ([[Dedup.exactIncremental]],
    * [[Dedup.dedupNearLshIncremental]] — candidate work is batch-shaped,
    * the standing corpus contributes a digest/signature projection and is
    * never modified); decontamination and packing run on the surviving
    * batch rows. `standing` must already be prepared (gated, scrubbed,
    * deduped — i.e. a previous [[prepare]] output or the corpus that
    * output was appended to); doc_ids must be disjoint from the batch.
    * Returns packed batch rows (the [[prepare]] shape) — append them to
    * the standing corpus to complete the ingest cycle.
    *
    * `embeddings` (optional) adds the SEMANTIC stage in its batch
    * position (after near dedup, before decontam): one (doc_id,
    * embedding) frame covering batch and standing docs; batch survivors
    * are [[Dedup.semDedupIncremental]]'d against the standing corpus
    * under `centroids` — pass the standing run's persisted centroids to
    * freeze cluster geometry across ingests (None re-trains on the
    * standing embeddings via [[Dedup.semDedupCentroids]], deterministic
    * but one extra Lloyd run per ingest). A doc without an embedding row
    * is never dropped by this stage.
    *
    * Stage parity with [[prepare]]: `cfg.removeDupPassages` inserts the
    * 2b passage scrub in its batch position (census over batch PLUS
    * standing via [[TextOps.removeDuplicatedPassagesAgainst]] — only
    * batch rows rewritten) and `cfg.mixWeights` the stage-7 mix (census
    * widened over the standing corpus so fractions match one batch pass;
    * only batch rows filtered — monotone hash membership keeps the
    * two-step sample consistent with the batch form).
    *
    * The standing frame is referenced by three legs (exact digests, LSH
    * band rows, the semantic doc_id set — plus 2b/7 censuses when
    * enabled), so a caller passing a DERIVED DAG (e.g. a fresh
    * [[prepare]] output) gets it lazily localCheckpointed ONCE here: one
    * evaluation, not one per leg. A standing frame that is already a bare
    * table scan / materialized RDD skips the barrier ([[Frames.barrier]]) —
    * at 100 TB standing is a materialized table, and checkpointing it
    * would copy the whole table into executor-local storage when each leg
    * can just re-scan it with its own column pruning. */
  def prepareIncremental(
      incoming: DataFrame,
      standing: DataFrame,
      evalCorpus: Option[DataFrame] = None,
      cfg: Config = Config(),
      embeddings: Option[DataFrame] = None,
      centroids: Option[Seq[Seq[Double]]] = None): DataFrame =
    prepareIncrementalImpl(incoming, standing, None, evalCorpus, cfg,
      embeddings, centroids)

  /** [[prepareIncremental]] fed from a persisted [[StandingState]] — the
    * production ingest cycle: the standing side's digests, band rows, and
    * frozen centroids come from the state's tables instead of being
    * recomputed from the corpus text, so per-ingest standing cost is a
    * scan of PRECOMPUTED artifacts (16-byte digests, band keys) rather
    * than a full-text digest + shingle + minhash pass — the difference
    * between O(batch) and O(corpus) work per day at 100 TB. `standing`
    * (the corpus table scan) is still consulted, but only for batch-shaped
    * work: candidate-text verification (semi-join pruned), the optional
    * 2b passage census, the mixing census, and the semantic stage's
    * standing-vector assignment. Result-identical to the frame-fed form
    * (spec-pinned); after admitting the result, [[StandingState.append]]
    * + appending the rows to the corpus table complete the cycle. */
  def prepareIncrementalWithState(
      incoming: DataFrame,
      standing: DataFrame,
      state: StandingState,
      evalCorpus: Option[DataFrame] = None,
      cfg: Config = Config(),
      embeddings: Option[DataFrame] = None): DataFrame = {
    state.requireCompatible(cfg)
    prepareIncrementalImpl(incoming, standing, Some(state), evalCorpus, cfg,
      embeddings, state.centroids)
  }

  private def prepareIncrementalImpl(
      incoming: DataFrame,
      standing: DataFrame,
      state: Option[StandingState],
      evalCorpus: Option[DataFrame],
      cfg: Config,
      embeddings: Option[DataFrame],
      centroids: Option[Seq[Seq[Double]]]): DataFrame = {
    val stand = Frames.barrier(standing)
    val gated = TextOps.gopherGate(incoming,
      minWords = cfg.minWords, maxWords = cfg.maxWords)
    // 1b + 1c. the trained gates in their batch positions — same weights
    // as the standing run (they ride the config), so parity with the
    // batch form is by construction; shared transforms (applyQualityGate/
    // applyLangGate) so the incremental, batch and streaming shapes
    // cannot drift
    val lgated = applyLangGate(
      applyQualityGate(gated, cfg.qualityGate), cfg.keepLangs)
    val scrubbed = TextOps.redactPii(lgated, "text")
      .drop("text", "n_email", "n_ipv4", "n_phone")
      .withColumnRenamed("redacted", "text")
    // The scrubbed batch is the other multiply-referenced frame: the exact
    // leg (digests + anti-join), the LSH leg (band rows + corpus shingle
    // sets), and the surviving-row chain each evaluate it — without a
    // barrier every leg re-runs the scan + gate + PII regexes. One lazy
    // localCheckpoint, same rationale as `stand` above.
    val descrubbed = (cfg.removeDupPassages match {
      case Some((w, minDocs)) =>
        val rewritten = TextOps.removeDuplicatedPassagesAgainst(
          scrubbed, stand, w, minDocs)
          .filter(col("text") =!= "")
          .select("doc_id", "text")
        scrubbed.drop("text").join(rewritten, Seq("doc_id"))
      case None => scrubbed
    }).localCheckpoint(false)
    // 2c. optional span scrub in its batch position: a batch token is
    // removed when a w-window over it matches the STANDING corpus' window
    // set — the persisted span index when state-fed ([[StandingState]]
    // `span_hashes`, O(batch tokens) work per ingest), recomputed from
    // the standing frame otherwise (the frame-fed form's honest
    // O(corpus tokens) cost, same trade as every other leg) — or a
    // >= minDocs within-batch window. Runs before any fingerprinting;
    // emptied docs drop here. Standing docs are never modified.
    val spanned = cfg.removeDupSpans match {
      case Some((w, minDocs)) =>
        val standingHashes = state.flatMap(_.spanIndex).map(_._1)
          .getOrElse(TextOps.spanWindowHashes(stand, w))
        val rewritten = TextOps.removeDuplicatedSpansIncremental(
            descrubbed, standingHashes, w, minDocs)
          .filter(col("text") =!= "")
          .select("doc_id", "text")
        descrubbed.drop("text").join(rewritten, Seq("doc_id"))
          .localCheckpoint(false) // multiply referenced by the legs below
      case None => descrubbed
    }
    val fp: DataFrame => DataFrame =
      if (cfg.normalizeFingerprints) TextOps.normalized(_) else identity
    val unfp: DataFrame => DataFrame =
      if (cfg.normalizeFingerprints)
        _.withColumn("text", col("raw_text")).drop("raw_text")
      else identity
    // exact + LSH legs: standing-side artifacts from the persisted state
    // when fed one (no standing recompute), else derived from the frame
    val exact = state match {
      case Some(st) => Dedup.exactIncrementalVsDigests(spanned, st.digests)
      case None => Dedup.exactIncremental(spanned, stand)
    }
    val deduped = state match {
      case Some(st) => unfp(Dedup.dedupNearLshIncrementalVsBands(
        fp(exact), st.bands, fp(stand).select("doc_id", "text"),
        tau = cfg.nearDupTau, shingleSize = cfg.shingleSize,
        numHashes = st.meta.numHashes, bandRows = st.meta.bandRows))
      case None => unfp(Dedup.dedupNearLshIncremental(
        fp(exact), fp(stand), tau = cfg.nearDupTau,
        shingleSize = cfg.shingleSize))
    }
    val semantic = embeddings match {
      case Some(ef) =>
        val inc = ef.join(deduped.select("doc_id"), Seq("doc_id"), "left_semi")
          .select(col("doc_id").as("vec_id"), col("embedding"))
        val standVecs = ef.join(stand.select("doc_id"), Seq("doc_id"), "left_semi")
          .select(col("doc_id").as("vec_id"), col("embedding"))
          .localCheckpoint(false)
        val cs = centroids.getOrElse(
          Dedup.semDedupCentroids(standVecs, cfg.semDedupNCentroids))
        val dropIds = inc.select("vec_id")
          .join(Dedup.semDedupIncremental(inc, standVecs, cs, cfg.semDedupTau)
            .select("vec_id"), Seq("vec_id"), "left_anti")
          .withColumnRenamed("vec_id", "doc_id")
        deduped.join(dropIds, Seq("doc_id"), "left_anti")
      case None => deduped
    }
    val clean = evalCorpus match {
      case Some(ev) =>
        unfp(TextOps.decontaminate(fp(semantic), fp(ev), cfg.decontamNgram))
      case None => semantic
    }
    val mixed = cfg.mixWeights match {
      case Some((budget, weights)) =>
        Mixing.sampleToTokenBudget(clean, budget, weights,
          censusOver = Some(clean.select("source", "text")
            .unionByName(stand.select("source", "text"))))
      case None => clean
    }
    Packing.packSequences(
      mixed.select(col("doc_id"), col("source"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      budget = cfg.packBudget)
      .select("doc_id", "source", "text", "n_tokens", "bin", "pos_in_bin")
  }

  /** The stage chain, each boundary passed through `tap` (identity for the
    * plain composable form; a lazy localCheckpoint for the reporting form).
    *
    * `materializeScrub` lazily localCheckpoints the post-scrub boundary in
    * the PLAIN form: the dedup stages' eager drop sets and the surviving-
    * row chain each evaluate that prefix (scan + gate + PII regexes) —
    * one barrier makes them all read cached rows. The reporting form taps
    * every boundary with a checkpoint already, so it passes false. */
  private def stages(
      docs: DataFrame,
      evalCorpus: Option[DataFrame],
      cfg: Config,
      embeddings: Option[DataFrame],
      tap: DataFrame => DataFrame,
      materializeScrub: Boolean = false): Seq[(String, DataFrame)] = {
    val input = tap(docs)

    // 1. quality gate: keep only docs passing every Gopher rule — the
    // filter form (no semi-join): one codegen'd projection over the scan
    val gated = tap(
      TextOps.gopherGate(input, minWords = cfg.minWords, maxWords = cfg.maxWords))

    // 1b. optional TRAINED quality gate: score the raw gated text under
    // the supplied QualityLr micro-weights and keep docs at or above the
    // threshold — the classifier twin of stage 1's rule gate (shared
    // transform: applyQualityGate)
    val qgated =
      if (cfg.qualityGate.isDefined)
        tap(applyQualityGate(gated, cfg.qualityGate))
      else gated

    // 1c. optional TRAINED language-ID gate: predict each doc's language
    // under the supplied one-vs-rest models and keep only the configured
    // languages — runs on raw (pre-scrub) text like 1b (shared
    // transform: applyLangGate)
    val lgated =
      if (cfg.keepLangs.isDefined) tap(applyLangGate(qgated, cfg.keepLangs))
      else qgated

    // 2. PII scrub — the redacted text REPLACES the raw text for every
    // downstream stage (fingerprints, shingles, packing all see clean text)
    val scrubbed = tap(TextOps.redactPii(lgated, "text")
      .drop("text", "n_email", "n_ipv4", "n_phone")
      .withColumnRenamed("redacted", "text"))

    // 2b. optional boilerplate removal: rewrite text with cross-doc
    // duplicated passages stripped, preserving every non-text column via
    // a doc_id equi-join (the op itself returns only the rewrite); docs
    // reduced to nothing but boilerplate are dropped
    val descrubbedRaw = cfg.removeDupPassages match {
      case Some((w, minDocs)) =>
        val rewritten = TextOps.removeDuplicatedPassages(scrubbed, w, minDocs)
          .filter(col("text") =!= "")
          .select("doc_id", "text")
        tap(scrubbed.drop("text").join(rewritten, Seq("doc_id")))
      case None => scrubbed
    }

    // 2c. optional exact-substring SPAN scrub — the sliding-window (stride
    // 1) strictly-stronger form of 2b, catching boilerplate the fixed
    // chunks straddle; runs after 2b (both on = positional pass first) and
    // before any fingerprinting so dedup never keys on shared runs. Same
    // doc_id re-join shape as 2b; emptied docs are dropped here.
    val spannedRaw = cfg.removeDupSpans match {
      case Some((w, minDocs)) =>
        val rewritten = TextOps.removeDuplicatedSpans(descrubbedRaw, w, minDocs)
          .filter(col("text") =!= "")
          .select("doc_id", "text")
        tap(descrubbedRaw.drop("text").join(rewritten, Seq("doc_id")))
      case None => descrubbedRaw
    }
    // the materialize barrier sits on the LAST pre-dedup boundary, so the
    // dedup legs and the surviving-row chain read cached rows whichever
    // optional scrub stages are on
    val descrubbed =
      if (materializeScrub) spannedRaw.localCheckpoint(false) else spannedRaw

    // fingerprint-path normalization (opt-in): `fp` swaps the text the
    // dedup/decontam machinery fingerprints for its normalized form
    // (raw survives as `raw_text`); `unfp` restores the raw text on the
    // way out so stage boundaries and the final output are normalization-
    // free. Both are identity when the flag is off.
    val fp: DataFrame => DataFrame =
      if (cfg.normalizeFingerprints) TextOps.normalized(_) else identity
    val unfp: DataFrame => DataFrame =
      if (cfg.normalizeFingerprints)
        _.withColumn("text", col("raw_text")).drop("raw_text")
      else identity

    // 3 + 4. exact then near dedup (exact first: free removal of identical
    // payloads before the LSH machinery runs). Hash form: the dedup
    // shuffle carries (doc_id, digest) only, never the text payload.
    val exact = tap(Dedup.exactByHash(descrubbed))
    val deduped = tap(unfp(Dedup.dedupNearLsh(fp(exact), tau = cfg.nearDupTau,
      shingleSize = cfg.shingleSize)))

    // 5. SEMANTIC dedup (optional — runs when the caller supplies a
    // (doc_id, embedding) frame): paraphrases and near-translations that
    // share no n-grams survive the text dedups but collapse here. Only
    // embeddings of still-surviving docs enter the clustering; a doc
    // WITHOUT an embedding row is never dropped by this stage.
    val semantic = tap(embeddings match {
      case Some(ef) =>
        val cur = ef.join(deduped.select("doc_id"), Seq("doc_id"), "left_semi")
          .select(col("doc_id").as("vec_id"), col("embedding"))
        val keptIds = Dedup.semDedup(cur, tau = cfg.semDedupTau,
          nCentroids = cfg.semDedupNCentroids).select("vec_id")
        val dropIds = cur.select("vec_id").join(keptIds, Seq("vec_id"), "left_anti")
          .withColumnRenamed("vec_id", "doc_id")
        deduped.join(dropIds, Seq("doc_id"), "left_anti")
      case None => deduped
    })

    // 6. eval-set decontamination (both sides normalized under the flag —
    // an eval passage must match however the training doc cases/punctuates)
    val clean = tap(evalCorpus match {
      case Some(ev) =>
        unfp(TextOps.decontaminate(fp(semantic), fp(ev), cfg.decontamNgram))
      case None => semantic
    })

    // 7. mixing toward a token budget
    val mixed = tap(cfg.mixWeights match {
      case Some((budget, weights)) =>
        Mixing.sampleToTokenBudget(clean, budget, weights)
      case None => clean
    })

    // 8. sequence packing
    val packed = tap(Packing.packSequences(
      mixed.select(col("doc_id"), col("source"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      budget = cfg.packBudget)
      .select("doc_id", "source", "text", "n_tokens", "bin", "pos_in_bin"))

    Seq(
      "0_input" -> input,
      "1_quality_gate" -> gated,
    ) ++
      cfg.qualityGate.map(_ => "1b_quality_lr_gate" -> qgated).toSeq ++
      cfg.keepLangs.map(_ => "1c_langid_gate" -> lgated).toSeq ++
      Seq(
        "2_pii_scrub" -> scrubbed,
      ) ++
      cfg.removeDupPassages.map(_ => "2b_passage_scrub" -> descrubbedRaw).toSeq ++
      cfg.removeDupSpans.map(_ => "2c_span_scrub" -> spannedRaw).toSeq ++
      Seq(
        "3_exact_dedup" -> exact,
        "4_near_dedup" -> deduped,
        "5_semantic_dedup" -> semantic,
        "6_decontam" -> clean,
        "7_mixed" -> mixed,
        "8_packed" -> packed,
      )
  }
}
