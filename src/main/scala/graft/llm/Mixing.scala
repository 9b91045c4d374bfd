package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixing operators for training-corpus assembly: deterministic
  * stratified sampling and token-budget scaling. The keep/drop decision is
  * a pure function of the row's id — `uint32(md5(id)[0..8)) < frac * 2^32`
  * — so samples are:
  *
  *  - LAYOUT-INDEPENDENT: repartitioning, task retries, and AQE re-plans
  *    cannot change membership (unlike `df.sample`, whose membership is
  *    partition-iteration-dependent);
  *  - REPRODUCIBLE across engines: the DuckDB oracle computes the same
  *    md5 threshold, so sampling queries are hash-match-gated like any
  *    other operator;
  *  - MONOTONE in the fraction: raising a source's budget only ADDS docs
  *    (the kept set at frac1 is a subset of the kept set at frac2 >= frac1)
  *    — incremental corpus growth never reshuffles what was already kept.
  *
  * No shuffle for the filter itself; the token-budget path adds one small
  * per-source aggregate joined back by broadcast.
  */
object Mixing {

  /** uint32 of the first 8 md5 hex chars of the id — the sampling hash. */
  def samplingHash(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("double")

  /** Keep predicate: hash(id) < frac * 2^32 (frac as a Column in [0,1]). */
  def hashKeep(idCol: Column, frac: Column): Column =
    samplingHash(idCol) < frac * lit(4294967296.0)

  /** Keys at or below this many entries fold a per-key rate map into a
    * `when`-chain of literals (zero-join, constant-folded); above it the
    * rates broadcast-join as a small frame instead — the plan would
    * otherwise grow O(#keys) in expression size (analyzer/codegen cost,
    * not data cost), which is fine at mixing's tens of sources but not
    * for a domain-cardinality caller with ~100k+ keys. Identical
    * membership by construction (differential-spec-pinned); override via
    * `spark.graft.mix.literalRateCap` (the ANN
    * `spark.graft.ann.broadcastCapBytes` cap-and-degrade precedent). */
  val DefaultLiteralRateCap = 64

  private def literalRateCap(docs: DataFrame): Int =
    docs.sparkSession.conf
      .get("spark.graft.mix.literalRateCap", DefaultLiteralRateCap.toString).toInt

  /** The broadcast-join sampling tail shared by the above-cap forms:
    * left-join the per-key rate frame, keep rows whose sampling hash
    * clears `coalesce(rate, default)` (an unmapped or NULL key misses
    * the join — the when-chain's otherwise arm), restore the caller's
    * schema and column order. ONE implementation so the two callers
    * cannot drift membership-wise. */
  /** `nullSafe = true` matches NULL keys with <=> — for rate frames that
    * DERIVE from the data (a census' NULL group must deliver its rate);
    * the default plain-equality form leaves NULL keys unmatched (rate =
    * `default`) — [[stratifiedSample]]'s documented contract, where the
    * fractions are a caller-supplied String-keyed map with no NULL key. */
  private def joinSampled(
      docs: DataFrame,
      rates: DataFrame,
      keyCol: String,
      rateName: String,
      default: Double,
      idCol: String,
      nullSafe: Boolean = false): DataFrame = {
    val joined =
      if (nullSafe)
        docs.join(broadcast(rates.withColumnRenamed(keyCol, "__rk")),
          col(keyCol) <=> col("__rk"), "left").drop("__rk")
      else docs.join(broadcast(rates), Seq(keyCol), "left")
    joined
      .filter(hashKeep(col(idCol), coalesce(col(rateName), lit(default))))
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-source stratified sample at the given fractions (sources absent
    * from the map keep `defaultFrac`; a NULL source matches nothing and
    * keeps `defaultFrac` in both forms). */
  def stratifiedSample(
      docs: DataFrame,
      fractions: Map[String, Double],
      defaultFrac: Double = 1.0,
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    if (fractions.size <= literalRateCap(docs)) {
      val frac = fractions.foldLeft(lit(defaultFrac)) { case (acc, (src, f)) =>
        when(col(sourceCol) === src, lit(f)).otherwise(acc)
      }
      docs.filter(hashKeep(col(idCol), frac))
    } else {
      val spark = docs.sparkSession
      import spark.implicits._
      val rateDf = fractions.toSeq.toDF(sourceCol, "__frac")
      joinSampled(docs, rateDf, sourceCol, "__frac", defaultFrac, idCol)
    }
  }

  /** Scale the corpus toward a whitespace-token budget with per-source
    * weights: source s gets a target of `weight_s / sum(weights) * budget`
    * tokens and is hash-sampled at `min(1, target_s / tokens_s)`. The
    * per-source token census is one aggregate over (source, tokens) —
    * output rows = #sources, broadcast back. Sources not in `weights` get
    * weight 0 (dropped). */
  def sampleToTokenBudget(
      docs: DataFrame,
      budgetTokens: Long,
      weights: Map[String, Double],
      idCol: String = "doc_id",
      sourceCol: String = "source",
      textCol: String = "text",
      censusOver: Option[DataFrame] = None): DataFrame = {
    val wSum = weights.values.sum
    require(wSum > 0, "weights must not all be zero")
    val weightCol = weights.foldLeft(lit(0.0)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    // `censusOver` widens the token census beyond the sampled frame — the
    // incremental-pipeline case, where the fraction must reflect the
    // standing corpus plus the increment while only increment rows are
    // filtered. Monotone hash membership makes the two-step (standing
    // sampled at its prepare time, increment sampled now under the wider
    // census) consistent with one batch pass at the same fractions.
    val census = censusOver.getOrElse(docs)
      .groupBy(sourceCol)
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("__src_tokens"))
    val withFrac = docs
      .join(broadcast(census), Seq(sourceCol))
      .withColumn("__frac",
        least(lit(1.0), weightCol / wSum * budgetTokens / col("__src_tokens")))
    withFrac
      .filter(hashKeep(col(idCol), col("__frac")))
      .drop("__src_tokens", "__frac")
  }

  /** Deterministic train/val/test split: every row gets a `split` label,
    * assigned by where its sampling hash falls among cumulative fraction
    * thresholds (`floor(cumFrac * 2^32)`). Same guarantees as the sampler
    * above — layout-independent, reproducible across engines, and STABLE
    * UNDER CORPUS GROWTH: a document's split never changes when other
    * documents arrive, which is the property that keeps yesterday's val
    * set out of tomorrow's train set. Pure per-row projection — no
    * shuffle at any scale. Fractions must sum to 1. */
  def hashSplit(
      docs: DataFrame,
      splits: Seq[(String, Double)],
      idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * 4294967296.0))
    val h = samplingHash(col(idCol))
    val named = splits.map(_._1).zip(thresholds)
    val splitCol = named.init.foldRight(lit(named.last._1): Column) {
      case ((name, thr), rest) => when(h < lit(thr), lit(name)).otherwise(rest)
    }
    docs.withColumn("split", splitCol)
  }

  /** Curriculum staging: exact global `ntile(nStages)` in ascending
    * `scoreCol` order (ties broken by `idCol`) — the "order the corpus
    * easy-to-hard, cut it into equal stages" pass before curriculum
    * training.
    *
    * A flat `ntile().over(Window.orderBy(score))` funnels the corpus
    * through ONE task (and PlanAuditSpec rejects it). This computes the
    * identical stage ids hierarchically, the [[graft.ops.Stitch]] /
    * [[Packing]] two-level shape adapted to a VALUE-ordered key:
    *
    *   1. rows bucket by `floor(clamp(score) * scoreBuckets)` — monotone
    *      in score, so bucket k's rows all precede bucket k+1's in the
    *      global order; within-bucket ranks come from a window PARTITIONED
    *      by bucket (parallel, O(rows/bucket) per task);
    *   2. per-bucket counts (<= scoreBuckets+1 control rows, like IVF's
    *      k x dim centroid fetch) are collected and turned into a literal
    *      offset map — no global window, no driver data-path loop;
    *   3. global rank = bucket offset + local rank; the exact ntile
    *      arithmetic (first `N mod n` tiles get one extra row) maps rank
    *      -> stage.
    *
    * `scoreCol` values are clamped into [lo, hi] for bucketing only —
    * out-of-range scores still rank correctly (they pile into the edge
    * buckets). Skew note: pathological corpora (all scores equal) put
    * everything in one bucket; stage assignment stays correct, parallelism
    * degrades to the flat form's — raise `scoreBuckets` or pre-normalize
    * scores if a real corpus does this. */
  def curriculumStages(
      docs: DataFrame,
      scoreCol: Column,
      nStages: Int,
      idCol: String = "doc_id",
      lo: Double = 0.0,
      hi: Double = 1.0,
      scoreBuckets: Int = 256): DataFrame = {
    require(nStages >= 1, "nStages must be >= 1")
    require(hi > lo, "hi must exceed lo")
    import org.apache.spark.sql.expressions.Window
    val bucket = floor(
      (least(greatest(scoreCol, lit(lo)), lit(hi)) - lit(lo))
        / lit(hi - lo) * lit(scoreBuckets.toDouble)).cast("long")
    // Sever lineage before the two passes (driver-side count fetch, then
    // the ranked pass): a nondeterministic upstream would otherwise make
    // the literal offset map disagree with the second pass.
    val b = docs.withColumn("__sbkt", bucket).localCheckpoint(false)
    // control-plane fetch: one (bucket, count) row per non-empty score
    // bucket, <= scoreBuckets + 1 rows total
    val counts = b.groupBy("__sbkt").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offsetMap = typedlit(counts.map(_._1).zip(offsets).toMap)
    val wLocal = Window.partitionBy("__sbkt").orderBy(scoreCol.asc, col(idCol).asc)
    val ranked = b.withColumn("__rank",
      element_at(offsetMap, col("__sbkt")) + row_number().over(wLocal))
    // exact ntile(n) over N rows: the first r = N mod n tiles hold q+1 =
    // N/n + 1 rows, the rest hold q (integer DIV — Column./ is double)
    val q = total / nStages
    val r = total % nStages
    val stage =
      if (q == 0) col("__rank") // N < n: ntile gives each row its own tile
      else expr(
        s"""CASE WHEN __rank <= ${r * (q + 1)}
           |     THEN (__rank - 1) DIV ${q + 1}
           |     ELSE $r + (__rank - 1 - ${r * (q + 1)}) DIV $q END + 1""".stripMargin)
    ranked.withColumn("stage", stage.cast("int")).drop("__sbkt", "__rank")
  }

  /** Per-stage keep thresholds for [[dsirResample]], in sampling-hash
    * units: stage `s` (1-based, ascending weight) keeps at fraction
    * `min(1, rate * 2s / (nStages+1))`, whose mean over stages is exactly
    * `rate` (unclamped — rate <= (S+1)/2S keeps every stage under 1).
    * Computed ONCE here and embedded as literals in both the Spark plan
    * and the DuckDB oracle, so the keep decision compares the same hash
    * against the same 64-bit constant in both engines — no cross-engine
    * floating-point expression divergence can flip a boundary doc. */
  def dsirStageThresholds(rate: Double, nStages: Int): Seq[Double] = {
    require(nStages >= 1, "nStages must be >= 1")
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0,1]")
    (1 to nStages).map { s =>
      math.min(1.0, rate * 2.0 * s / (nStages + 1.0)) * 4294967296.0
    }
  }

  /** DSIR-weighted mixing (the resample half of Xie et al. 2023, made
    * deterministic the way [[stratifiedSample]] makes `df.sample`
    * deterministic): documents keep with probability increasing in their
    * DSIR importance weight, realized as a per-stage md5-hash threshold.
    *
    *   1. score every raw doc: [[TextOps.dsirScores]] (single census per
    *      corpus, 6dp-decimal sums — zero-feature docs score 0.0);
    *   2. rank into `nStages` exact global ntiles by (log_w asc, doc_id)
    *      via [[curriculumStages]] — the hierarchical two-level rank, no
    *      unpartitioned window;
    *   3. keep iff samplingHash(doc_id) < threshold(stage), thresholds
    *      from [[dsirStageThresholds]] — linear in stage, mean keep rate
    *      exactly `rate` when no stage clamps at 1.
    *
    * Same guarantees as the q34 sampler: layout-independent membership,
    * reproducible cross-engine, and monotone in `rate` (raising the rate
    * only adds docs — every stage threshold grows). Shape at scale: the
    * scoring shuffle (doc_id-keyed) + the stage census's bounded
    * <= scoreBuckets-row collect + a per-row hash filter; nothing new
    * beyond dsirScores' own plan. Returns (doc_id, stage, n_feats,
    * log_w) for the kept docs. */
  def dsirResample(
      raw: DataFrame,
      target: DataFrame,
      rate: Double,
      m: Int = 1024,
      lambda: Double = 1.0,
      nStages: Int = 20,
      lo: Double = -20.0,
      hi: Double = 20.0): DataFrame = {
    val scores = TextOps.dsirScores(raw, target, m, lambda)
    val staged = curriculumStages(scores, col("log_w"), nStages, lo = lo, hi = hi)
    val thresholds = dsirStageThresholds(rate, nStages)
    val thr = thresholds.zipWithIndex.foldLeft(lit(Double.NaN)) {
      case (acc, (t, i)) => when(col("stage") === (i + 1), lit(t)).otherwise(acc)
    }
    staged
      .filter(samplingHash(col("doc_id")) < thr)
      .select("doc_id", "stage", "n_feats", "log_w")
  }

  /** Temperature-scaled source mixing (the T5/mT5/GPT-3 multinomial
    * pattern): source `s` with `n_s` documents gets sampling mass
    * `w_s = n_s^alpha` — `alpha < 1` UP-samples small sources relative to
    * their natural share, `alpha = 1` is proportional (no rebalance) —
    * and is hash-kept at rate `min(1, w_s / sum(w) * targetDocs / n_s)`,
    * so the expected output is `targetDocs` documents distributed
    * `∝ n_s^alpha` (clamping at 1 when a small source can't fill its
    * quota). Membership is the q34 sampling hash: layout-independent,
    * reproducible cross-engine, monotone in `targetDocs`.
    *
    * Cross-engine exactness: `n_s^alpha` is transcendental, so each
    * weight is rounded to 6dp and the weight total is summed as
    * DECIMAL(25,6) — exact and order-free — then the per-source rate is
    * one fixed double expression over bit-identical operands, rounded to
    * 6dp (the [[TextOps.tfidfTopTerms]] decimal discipline). Rates are
    * computed by the engine itself (two actions over the <= #sources-row
    * census) and embedded as literals in the filter.
    *
    * Shape at scale: one map-side-combinable census (rows = #sources, a
    * control-plane fetch), then a pure per-row hash filter — no shuffle
    * of the corpus itself at any scale. */
  def temperatureSample(
      docs: DataFrame,
      targetDocs: Long,
      alpha: Double = 0.5,
      idCol: String = "doc_id",
      sourceCol: String = "source",
      censusOver: Option[DataFrame] = None): DataFrame =
    temperatureSampleFromCounts(docs, targetDocs, alpha,
      censusOver.getOrElse(docs)
        .groupBy(sourceCol).agg(count(lit(1)).as("__n")),
      idCol, sourceCol)

  /** [[temperatureSample]] fed a PRECOMPUTED per-key count frame instead
    * of a frame to census — the maintained-census consumer
    * ([[StandingState.loadSourceCensus]]'s (source, n) rows): at 100 TB
    * the rates come from the state's #sources-row table, never from a
    * corpus scan. Identical membership to
    * `temperatureSample(censusOver = <the counted frame>)` by
    * construction (same weight/rate arithmetic over the same counts —
    * spec-pinned differentially). */
  def temperatureSampleCounts(
      docs: DataFrame,
      targetDocs: Long,
      counts: DataFrame,
      alpha: Double = 0.5,
      idCol: String = "doc_id",
      sourceCol: String = "source",
      countCol: String = "n"): DataFrame =
    temperatureSampleFromCounts(docs, targetDocs, alpha,
      counts.select(col(sourceCol), col(countCol).cast("long").as("__n")),
      idCol, sourceCol)

  /** Shared tail of the two temperature-mix forms: counts -> 6dp decimal
    * weights -> exact decimal total -> per-source literal-or-broadcast
    * rates -> hash filter. */
  private def temperatureSampleFromCounts(
      docs: DataFrame,
      targetDocs: Long,
      alpha: Double,
      counts: DataFrame, // (sourceCol, __n)
      idCol: String,
      sourceCol: String): DataFrame = {
    require(targetDocs >= 0, "targetDocs must be >= 0")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    import org.apache.spark.sql.types.DecimalType
    // alpha = 0.5 routes through sqrt (IEEE-correctly-rounded in every
    // engine, so the oracle's sqrt() is bit-identical); other alphas use
    // pow, whose ulp-level engine differences the 6dp rounding absorbs
    val w = if (alpha == 0.5) sqrt(col("__n").cast("double"))
            else pow(col("__n").cast("double"), lit(alpha))
    // `censusOver` widens the rate census beyond the filtered frame — the
    // incremental case (rates reflect standing ∪ batch, only batch rows
    // filter). Because membership is a pure function of (id, source
    // rate), the incremental form EQUALS the union-sampled set restricted
    // to the batch — spec-pinned, same consistency as sampleToTokenBudget
    val census = counts
      .withColumn("__w6", round(w, 6).cast(DecimalType(25, 6)))
      .localCheckpoint(false) // two control-plane actions below
    // exact decimal total of the 6dp weights (order-free), then one
    // deterministic decimal->double conversion — same value DuckDB's
    // CAST(SUM(..) AS DOUBLE) produces
    val sDouble = census.agg(sum(col("__w6"))).head().getDecimal(0).doubleValue
    // one fixed double expression per source — the SAME expression in
    // both forms below, so literal-vs-join membership is identical by
    // construction (the join form merely skips the driver round-trip)
    val rateFrame = census.select(
      col(sourceCol),
      least(lit(1.0),
        round(col("__w6").cast("double") / lit(sDouble)
          * lit(targetDocs.toDouble) / col("__n").cast("double"), 6))
        .as("__rate"))
    if (census.limit(literalRateCap(docs) + 1).count() <= literalRateCap(docs)) {
      val rates = rateFrame.collect().map(r => r.getString(0) -> r.getDouble(1))
      // a NULL source is a first-class census group here (the counts
      // DERIVE from the data — groupBy puts NULL rows in one group, and
      // their weight is already inside the rate denominator), so its
      // rate must DELIVER: a plain === arm would fall through to 0.0,
      // silently dropping every NULL-source doc while still diluting all
      // other sources' rates by the NULL group's census mass
      val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (src, r)) =>
        if (src == null) when(col(sourceCol).isNull, lit(r)).otherwise(acc)
        else when(col(sourceCol) === src, lit(r)).otherwise(acc)
      }
      docs.filter(hashKeep(col(idCol), rateCol))
    } else {
      // a source absent from the census (possible only when censusOver
      // under-covers) coalesces to rate 0 — the when-chain's otherwise
      // arm. nullSafe so the NULL census group's rate delivers in the
      // join form exactly like the literal chain's isNull arm.
      joinSampled(docs, rateFrame, sourceCol, "__rate", 0.0, idCol,
        nullSafe = true)
    }
  }

  /** Per-key document cap (the CCNet/RefinedWeb per-domain cap): keep at
    * most `maxPerKey` documents per key, chosen deterministically as the
    * `maxPerKey` smallest (samplingHash, id) pairs — so the kept set is
    * layout-independent, reproducible cross-engine, and STABLE UNDER
    * GROWTH in the same sense as [[hashSplit]]: a kept doc is only ever
    * evicted by a new doc with a smaller hash, never by repartitioning.
    *
    * Shape at scale: expressed as the `row_number() <= k` rank-filter
    * idiom ON PURPOSE — Spark's InferWindowGroupLimit rewrites it to a
    * WindowGroupLimit pass that keeps only the top `maxPerKey` rows per
    * key PER MAP PARTITION before the shuffle (verified in the plan:
    * `WindowGroupLimit ... Partial` below the exchange, `Final` above),
    * so the shuffle carries <= k rows per key per input partition rather
    * than the whole corpus, and no single-task sort of a mega-domain ever
    * materializes. */
  def capPerKey(
      docs: DataFrame,
      maxPerKey: Int,
      keyCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(maxPerKey >= 1, "maxPerKey must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(samplingHash(col(idCol)).asc, col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerKey)
      .drop("__rn")
  }

  /** [[capPerKey]]'s INCREMENTAL form — the daily-ingest cap: admit batch
    * docs per key only up to the quota the STANDING corpus hasn't already
    * used. STANDING WINS, like every incremental dedup policy here: an
    * admitted doc is never evicted by a later batch, so the admitted set
    * only grows and yesterday's corpus is stable — the price is that the
    * union is not the batch-form's hash-minimal k (spec pins equality
    * with [[capPerKey]] exactly when standing is empty). Within the
    * batch, admission order is the same deterministic (samplingHash, id).
    *
    * `standingCounts` is a per-key count frame — at 100 TB a maintained
    * census table, not a corpus scan. Shape: the constant-limit rank
    * filter runs FIRST (`row_number() <= k` — WindowGroupLimit bounds the
    * shuffle to <= k rows per key per map partition), then one equi-join
    * against the counts tightens each key to its remaining quota. */
  def capPerKeyIncremental(
      batch: DataFrame,
      standingCounts: DataFrame,
      maxPerKey: Int,
      keyCol: String = "source",
      idCol: String = "doc_id",
      countCol: String = "n"): DataFrame = {
    require(maxPerKey >= 1, "maxPerKey must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(samplingHash(col(idCol)).asc, col(idCol).asc)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerKey) // constant limit -> WindowGroupLimit
      // NULL-SAFE key equality (<=>): the window above groups NULL keys
      // into one capped partition, and a maintained census
      // (groupBy(keyCol)) counts them as a group too — a plain equality
      // join would never match the two NULL rows, silently granting
      // NULL-keyed batch docs a fresh quota regardless of standing count
      .join(standingCounts.select(
          col(keyCol).as("__sk"), col(countCol).as("__sn")),
        col(keyCol) <=> col("__sk"), "left")
      .filter(col("__rn") <= lit(maxPerKey.toLong) - coalesce(col("__sn"), lit(0L)))
      .drop("__rn", "__sn", "__sk")
  }
}
