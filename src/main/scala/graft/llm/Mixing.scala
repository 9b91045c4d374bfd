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

  /** Per-source stratified sample at the given fractions (sources absent
    * from the map keep `defaultFrac`). */
  def stratifiedSample(
      docs: DataFrame,
      fractions: Map[String, Double],
      defaultFrac: Double = 1.0,
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFrac)) { case (acc, (src, f)) =>
      when(col(sourceCol) === src, lit(f)).otherwise(acc)
    }
    docs.filter(hashKeep(col(idCol), frac))
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
      textCol: String = "text"): DataFrame = {
    val wSum = weights.values.sum
    require(wSum > 0, "weights must not all be zero")
    val weightCol = weights.foldLeft(lit(0.0)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    val census = docs
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
}
