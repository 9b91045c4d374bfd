package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text-pipeline building blocks over the `documents` table
  * (doc_id, text, lang, source, n_chars). All pure DataFrame transforms,
  * fully codegen'd (no UDFs): shingling via higher-order array functions,
  * hashing via md5 — deterministic and reproducible in the DuckDB oracle.
  *
  * Scale notes (100 TB posture): every transform here is per-row (no
  * shuffle) except the group-bys/joins that are explicitly keyed by shingle
  * or doc_id; near-dup discovery goes through MinHash LSH (candidate
  * generation by band equality) to avoid the O(n^2) pairwise comparison.
  */
object TextOps {

  /** Whitespace tokens of `text` as an array column. */
  def tokens(text: Column): Column = split(text, " ")

  /** (doc_id, source, shingle) rows: one per DISTINCT k-shingle per doc.
    * Input df must have (doc_id, source, text). Docs shorter than k tokens
    * are dropped (they have no k-shingle). */
  def shingleRows(docs: DataFrame, k: Int = 3): DataFrame = {
    val joined = (0 until k).map(j => s"t[i + $j]").mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
      .select(
        col("doc_id"),
        col("source"),
        explode(array_distinct(expr(s"transform(sequence(0, size(t) - $k), i -> $joined)")))
          .as("shingle"),
      )
  }

  /** Exact pairwise Jaccard over distinct-shingle rows, restricted to pairs
    * sharing at least one shingle (the join prunes disjoint pairs for free)
    * and, when `sameSourceOnly`, to pairs within one `source` partition.
    * Kept as the equi-join + map-side-countable groupBy: the bucketized
    * collect_list form (as in [[bucketPairs]]) measured 2.6x SLOWER here —
    * shingle buckets are mostly singletons, so the list/explode machinery
    * pays for itself only under LSH banding where buckets mean collisions.
    * Output: (doc_a, doc_b, common, na, nb, jaccard) with doc_a < doc_b. */
  def jaccardPairs(sh: DataFrame, sameSourceOnly: Boolean): DataFrame = {
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("doc_a"), col("source").as("src_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("source").as("src_b"), col("shingle").as("shingle_b"))
    val cond0 = a("shingle") === b("shingle_b") && a("doc_a") < b("doc_b")
    val cond = if (sameSourceOnly) cond0 && a("src_a") === b("src_b") else cond0
    a.join(b, cond)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
      .join(cnt.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(cnt.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", col("common").cast("double") / (col("na") + col("nb") - col("common")))
  }

  /** MinHash signatures: for each doc, `numHashes` independent minima of
    * md5(shingle || '#' || k). One aggregation pass, no row explosion and no
    * join — per-occurrence hashing is embarrassingly parallel and the only
    * shuffle is the final groupBy(doc_id). min over fixed-width lowercase
    * hex == numeric min, so plain string MIN is a valid minhash. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(k =>
      min(md5(concat(col("shingle"), lit(s"#$k")))).as(s"h$k"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Default LSH bucket-size cap: buckets larger than this are dropped from
    * candidate generation. A degenerate popular band key (boilerplate docs,
    * empty-ish shingle sets) otherwise fans out O(bucket^2) pairs — the one
    * skew hazard of banded LSH at 100 TB. Dropping is sound for NEAR-DUP
    * semantics: a band shared by >cap docs carries no discriminating signal,
    * and true near-dup pairs still collide on their other (rarer) bands. */
  val DefaultMaxBucketSize = 10000

  /** (band, sig) buckets -> candidate pairs, generated WITHIN each bucket
    * from the sorted doc-id list (doc_a < doc_b by construction) instead of
    * via a melted self-join: one small shuffle on the band key, no join, and
    * the bucket-size skew cap falls out of a plain size() filter. */
  def bucketPairs(bands: DataFrame, maxBucketSize: Int): DataFrame =
    bands.groupBy("band", "sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |            b -> named_struct('doc_a', a, 'doc_b', b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()

  /** LSH candidate pairs: melt signatures to (doc_id, band, sig) and bucket
    * on band equality. With bandRows = 1 each of the `numHashes` signature
    * elements is its own band (high-recall configuration for low-similarity
    * corpora); larger bandRows concatenates consecutive elements. */
  def lshCandidates(sigs: DataFrame, numHashes: Int, bandRows: Int,
                    maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must be divisible by bandRows")
    val nBands = numHashes / bandRows
    val bandCols = (0 until nBands).map { b =>
      val parts = (0 until bandRows).map(r => col(s"h${b * bandRows + r}"))
      concat(parts: _*)
    }
    val melted = sigs.select(
      col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "sig")),
    )
    bucketPairs(melted, maxBucketSize)
  }

  /** Per-doc profile: the distinct shingle set AND the `numHashes` minhash
    * minima in ONE aggregation pass — the near-dup pipeline's only full
    * shuffle over shingle rows. (The unfused formulation paid this shuffle
    * twice: once for signatures, once for the verify step's doc sets.) */
  def minhashProfiles(sh: DataFrame, numHashes: Int): DataFrame = {
    val aggs = collect_set(col("shingle")).as("sset") +:
      (0 until numHashes).map(k =>
        min(md5(concat(col("shingle"), lit(s"#$k")))).as(s"h$k"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Fused MinHash+LSH near-dup pipeline: shingle -> one groupBy(doc_id)
    * computing signatures + shingle sets -> band-bucket candidate pairs ->
    * exact-Jaccard verify against the cached profiles. Candidate semantics
    * are identical to [[minhashSignatures]] + [[lshCandidates]] +
    * [[verifyCandidates]] (pairs sharing >= 1 full band, then exact Jaccard)
    * but the plan has ONE shuffle over shingle rows instead of two, no
    * self-join, and no intermediate distinct over melted signatures.
    * Output: (doc_a, doc_b, common, na, nb, jaccard), doc_a < doc_b. */
  def lshNearDupPairs(docs: DataFrame, k: Int, numHashes: Int, bandRows: Int,
                      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must be divisible by bandRows")
    // lazy localCheckpoint, not cache(): the profile frame is consumed three
    // times (bands + both verify joins) within this one returned plan, and
    // its storage blocks are freed when the plan becomes unreachable (GC +
    // ContextCleaner) — a plain cache() with no caller-side handle would
    // leak one cached table per invocation for the session's lifetime.
    val prof = minhashProfiles(shingleRows(docs, k), numHashes).localCheckpoint(false)
    val nBands = numHashes / bandRows
    val bandCols = (0 until nBands).map { b =>
      concat((0 until bandRows).map(r => col(s"h${b * bandRows + r}")): _*)
    }
    val bands = prof.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "sig")))
    // pairs is small (post-LSH); AQE sees its runtime size and turns both
    // profile joins into broadcasts of the pair side (nested static
    // broadcast hints here measured WORSE — driver-side broadcast jobs of a
    // plan containing another broadcast exchange serialize badly).
    val pairs = bucketPairs(bands, maxBucketSize)
    pairs
      .join(prof.select(col("doc_id").as("doc_a"), col("sset").as("sa")), Seq("doc_a"))
      .join(prof.select(col("doc_id").as("doc_b"), col("sset").as("sb")), Seq("doc_b"))
      .withColumn("na", size(col("sa")).cast("long"))
      .withColumn("nb", size(col("sb")).cast("long"))
      .withColumn("common", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .select("doc_a", "doc_b", "common", "na", "nb", "jaccard")
  }

  /** Exact Jaccard evaluated only on candidate pairs (the LSH verify step).
    * Per-doc shingle sets are aggregated once, joined to the (small)
    * candidate-pair frame, and intersected as arrays — two hash joins on
    * doc_id instead of a shingle-level 3-way join. Counts are identical to
    * the join formulation (shingle rows are distinct per doc). */
  def verifyCandidates(cand: DataFrame, sh: DataFrame): DataFrame = {
    val docSets = sh.groupBy("doc_id")
      .agg(collect_set(col("shingle")).as("sset"), count(lit(1)).as("n"))
    cand
      .join(docSets.select(col("doc_id").as("doc_a"), col("sset").as("sa"), col("n").as("na")), "doc_a")
      .join(docSets.select(col("doc_id").as("doc_b"), col("sset").as("sb"), col("n").as("nb")), "doc_b")
      .withColumn("common", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .select("doc_a", "doc_b", "common", "na", "nb", "jaccard")
  }

  /** (doc_id, simhash) — 60-bit SimHash of the token multiset as a bigint,
    * via the native codegen'd expression [[graft.functions.SimHash64]]
    * (registered as `graft_simhash64` by GraftExtensions). Per-row, no
    * shuffle, one md5 per token. [[simhashHofDF]] keeps the pure
    * built-in-functions formulation — bit-identical, used as the
    * cross-check in the spec and as the fallback when the extension is not
    * registered. */
  def simhashDF(docs: DataFrame): DataFrame = {
    val registered = docs.sparkSession.catalog.functionExists("graft_simhash64")
    if (registered)
      docs.select(col("doc_id"), expr("graft_simhash64(text)").as("simhash"))
    else simhashHofDF(docs)
  }

  /** Higher-order-function formulation of the same simhash scheme: token
    * hash = first 15 hex chars of md5; bit votes; MSB-first fold. */
  def simhashHofDF(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        expr("transform(split(text, ' '), tk -> cast(conv(substring(md5(tk), 1, 15), 16, 10) as bigint))").as("hs"))
      .select(col("doc_id"),
        expr(
          """aggregate(
            |  transform(sequence(0, 59), j ->
            |    CASE WHEN aggregate(hs, 0L, (acc, h) -> acc + (shiftright(h, j) & 1L) * 2L - 1L) > 0L
            |         THEN 1L ELSE 0L END),
            |  0L, (acc, b) -> acc * 2L + b)""".stripMargin).as("simhash"))

  /** Per-doc n-gram repetition statistics — the Gopher/C4-style repetition
    * quality filters: `dup_frac` = fraction of n-gram OCCURRENCES that are
    * repeats of an earlier occurrence (1 - distinct/total), `top_frac` =
    * fraction taken by the single most frequent n-gram. Pure per-row HOFs,
    * no shuffle; cost is O(grams * distinct) per row, bounded by document
    * length. Docs shorter than n tokens report 0 repetition. */
  def repetitionStats(docs: DataFrame, n: Int): DataFrame = {
    val joined = (0 until n).map(j => s"t[i + $j]").mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      // the CASE gates the array accesses: ANSI subscripts throw on
      // out-of-bounds, so short docs must not build the transform at all
      .withColumn("grams", expr(
        s"CASE WHEN size(t) >= $n THEN transform(sequence(0, size(t) - $n), i -> $joined) ELSE array() END"))
      .withColumn("n_grams", size(col("grams")))
      .select(
        col("doc_id"),
        col("n_grams"),
        when(col("n_grams") > 0,
          lit(1.0) - size(array_distinct(col("grams"))).cast("double") / col("n_grams"))
          .otherwise(lit(0.0)).as("dup_frac"),
        when(col("n_grams") > 0,
          expr("array_max(transform(array_distinct(grams), g -> size(filter(grams, x -> x = g))))")
            .cast("double") / col("n_grams"))
          .otherwise(lit(0.0)).as("top_frac"),
      )
  }

  /** Eval-set decontamination: drop every training doc that shares at least
    * one n-gram with the eval corpus — the standard train/test overlap
    * guard. Candidate detection is an equi-join on the shingle (the same
    * scale shape as LSH candidate generation: no pairwise comparison), and
    * the contaminated-id set is applied with one anti-join. */
  def decontaminate(train: DataFrame, eval_ : DataFrame, n: Int): DataFrame = {
    val contaminated = contaminatedIds(train, eval_, n)
    train.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Distinct train doc_ids sharing >= 1 n-gram with the eval corpus. */
  def contaminatedIds(train: DataFrame, eval_ : DataFrame, n: Int): DataFrame = {
    val trainSh = shingleRows(train, n).select("doc_id", "shingle")
    val evalSh = shingleRows(eval_, n).select(col("shingle").as("e_shingle")).distinct()
    trainSh
      .join(evalSh, trainSh("shingle") === evalSh("e_shingle"), "left_semi")
      .select("doc_id").distinct()
  }

  /** Language-ID scoring: marker-token hit counts per language, argmax with a
    * fixed priority-order tie-break (and 'und' when no marker hits at all).
    * The marker lists are tiny common-stopword sets — a standard n-gram/
    * stopword heuristic; deterministic and oracle-expressible. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "fr" -> Seq("le", "les", "et", "des", "un"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "wo3"),
  )

  def langIdDF(docs: DataFrame): DataFrame = {
    val scored = langMarkers.zipWithIndex.map { case ((lang, words), idx) =>
      val inList = words.map(w => s"'$w'").mkString(", ")
      struct(
        expr(s"size(filter(split(text, ' '), x -> x IN ($inList)))").as("score"),
        lit(-idx).as("prio"),
        lit(lang).as("lang"),
      )
    }
    val best = greatest(scored: _*)
    docs.select(
      col("doc_id"),
      col("lang").as("actual_lang"),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und")).as("pred_lang"),
    )
  }
}
