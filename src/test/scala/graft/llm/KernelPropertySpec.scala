package graft.llm

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generative properties for the round-8 verify-path kernels: the
  * intersect-count and band-pair-emission loops must equal their
  * built-ins/HOF formulations on ADVERSARIAL inputs the real-corpus
  * cross-check specs cannot plant systematically — duplicate elements,
  * empty arrays, unicode payloads, zero/negative-free size bounds. The
  * generated batches run through ONE Spark job each (per-case jobs would
  * be minutes of scheduler overhead). */
class KernelPropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private val token: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
    Gen.oneOf("", " ", "naïve", "日本語", "a b", "##", "\t"))
  private val arr: Gen[Seq[String]] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, token)) // duplicates likely

  test("graft_isect_size == size(array_intersect) on arbitrary string arrays") {
    assert(spark.catalog.functionExists("graft_isect_size"), "kernel not registered")
    val cases = Gen.listOfN(300, Gen.zip(arr, arr)).sample.get
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "sa", "sb")
    val diverged = df
      .withColumn("kc", call_function("graft_isect_size", col("sa"), col("sb")))
      .withColumn("hc", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("kc") =!= col("hc"))
    assert(diverged.isEmpty, diverged.collect().take(3).mkString("; "))
  }

  test("graft_isect_size == size(array_intersect) on arbitrary LONG arrays (the screen's form)") {
    // the 64-bit-hash verify pre-screen dispatches the kernel's long
    // variant — pin it against the HOF on arbitrary arrays with likely
    // duplicates and collisions across sides
    val longArr: Gen[Seq[Long]] = Gen.chooseNum(0, 30)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-5L, 5L))) // collisions guaranteed
    val cases = Gen.listOfN(300, Gen.zip(longArr, longArr)).sample.get
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "ha", "hb")
    val diverged = df
      .withColumn("kc", call_function("graft_isect_size", col("ha"), col("hb")))
      .withColumn("hc", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .filter(col("kc") =!= col("hc"))
    assert(diverged.isEmpty, diverged.collect().take(3).mkString("; "))
  }

  test("hash screen: screened+exact verify == unscreened exact verify on random near-dup corpora") {
    // differential pin of TextOps.hashScreenPairs' soundness on real
    // machinery: lshNearDupPairs WITH the tau prefilter (screen active)
    // must produce exactly the >= tau pairs of the unprefiltered form
    val rnd = new scala.util.Random(7717)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def doc(n: Int): String = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val base = (0L until 60L).map(i => (i, doc(12 + rnd.nextInt(8))))
    val dups = base.take(20).map { case (i, t) =>
      (i + 1000L, if (rnd.nextBoolean()) t else t + " " + words(rnd.nextInt(words.size)))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
    val tau = 0.5
    def key(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("jaccard") >= tau)
        .select("doc_a", "doc_b", "common", "na", "nb")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val screened = key(TextOps.lshNearDupPairs(docs, 3, 16, 2, tauPrefilter = Some(tau)))
    val plain = key(TextOps.lshNearDupPairs(docs, 3, 16, 2))
    assert(screened === plain)
    assert(screened.nonEmpty, "vacuous: no near-dup pairs generated")
  }

  test("band-pair kernels == HOF emissions on arbitrary buckets") {
    assert(spark.catalog.functionExists("graft_band_pairs"), "kernel not registered")
    // buckets of (doc_id, inc, n) with distinct ids (the band-row contract),
    // tau sampled across the useful range
    val bucketGen = for {
      k <- Gen.chooseNum(2, 25)
      ids <- Gen.pick(k, 0L until 1000L)
      incs <- Gen.listOfN(k, Gen.oneOf(0L, 1L))
      ns <- Gen.listOfN(k, Gen.chooseNum(0L, 400L))
    } yield ids.toSeq.zip(incs).zip(ns).map { case ((i, c), n) => (i, c, n) }
    val buckets = Gen.listOfN(150, bucketGen).sample.get
    val df = buckets.zipWithIndex
      .map { case (items, i) => (i.toLong, items) }
      .toDF("bucket_id", "raw")
      .withColumn("items", expr(
        "transform(raw, x -> named_struct('doc_id', x._1, 'inc', x._2, 'n', x._3))"))
      .withColumn("ids", expr(
        "sort_array(transform(raw, x -> named_struct('doc_id', x._1, 'n', x._3)))"))
      .localCheckpoint(false)
    def collectPairs(c: org.apache.spark.sql.Column): Seq[(Long, Long, Long, Long, Long)] =
      df.select(col("bucket_id"), explode(c).as("p"))
        .select(col("bucket_id"), col("p.doc_a"), col("p.doc_b"), col("p.na"), col("p.nb"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    // production HOF twins (CAST tau AS DOUBLE + the shared slack), over
    // taus whose double representation ISN'T exact (0.87, 0.33) as well as
    // the near-exact 0.8 — the round-8 form only exercised 0.8, which
    // provably cannot diverge
    val slack = graft.functions.BandPairKernels.SizeBoundSlack
    for (tau <- Seq(0.8, 0.87, 0.33, 0.5)) {
      val hofInc = expr(
        s"""flatten(transform(
           |  filter(items, x -> x.inc = 1L),
           |  x -> transform(
           |    filter(items, a -> (a.inc = 0L OR a.doc_id < x.doc_id)
           |                       AND least(a.n, x.n) >=
           |                           CAST($tau AS DOUBLE) * greatest(a.n, x.n) * ${slack}D),
           |    a -> named_struct('doc_a', a.doc_id, 'doc_b', x.doc_id,
           |                      'na', a.n, 'nb', x.n))))""".stripMargin)
      assert(collectPairs(call_function("graft_inc_band_pairs", col("items"), lit(tau)))
        === collectPairs(hofInc), s"inc pairs diverged at tau=$tau")
      val hofAll = expr(
        s"""flatten(transform(ids, (a, i) ->
           |  transform(
           |    filter(slice(ids, i + 2, size(ids) - i - 1),
           |           b -> least(a.n, b.n) >=
           |                CAST($tau AS DOUBLE) * greatest(a.n, b.n) * ${slack}D),
           |    b -> named_struct('doc_a', a.doc_id, 'doc_b', b.doc_id,
           |                      'na', a.n, 'nb', b.n))))""".stripMargin)
      assert(collectPairs(call_function("graft_band_pairs", col("ids"), lit(tau)))
        === collectPairs(hofAll), s"band pairs diverged at tau=$tau")
    }
    // a DECIMAL tau from raw SQL must resolve (the function-builder accepts
    // decimal literals with the standard toDouble conversion)
    assert(df.selectExpr("explode(graft_band_pairs(ids, 0.8)) AS p").count() ===
      df.select(explode(call_function("graft_band_pairs", col("ids"), lit(0.8)))).count())
  }

  test("size-bound slack: boundary pairs are deferred, never culled") {
    // min == tau * max exactly (4/5 at tau=0.8) and one ulp below via an
    // inexact tau (0.87: 87, 100): the kernel prefilter must keep every
    // pair whose true jaccard could still reach tau — equality cases pass
    for ((na, nb, tau) <- Seq((4L, 5L, 0.8), (87L, 100L, 0.87), (33L, 100L, 0.33))) {
      val got = graft.functions.BandPairKernels.bandPairs(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
          org.apache.spark.sql.catalyst.InternalRow(1L, na),
          org.apache.spark.sql.catalyst.InternalRow(2L, nb))), tau)
      assert(got.numElements() === 1, s"boundary pair ($na,$nb) culled at tau=$tau")
    }
  }

  test("driver-side nearestCentroid == executed rank-0 assignment on random vectors") {
    // the residual-PQ seed path banks on this replica being bit-exact;
    // randomized vectors/centroids including zero vectors and zero
    // centroids (the 2.0-distance guard)
    val vecGen = Gen.listOfN(8, Gen.oneOf(
      Gen.chooseNum(-1000, 1000).map(_ / 251.0f),
      Gen.const(0.0f)))
    val caseGen = for {
      v <- vecGen
      k <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(k, Gen.listOfN(8, Gen.oneOf(
        Gen.chooseNum(-1000, 1000).map(_ / 257.0), Gen.const(0.0))))
    } yield (v, cs)
    val cases = Gen.listOfN(60, caseGen).sample.get
    cases.zipWithIndex.foreach { case ((v, cs), i) =>
      val df = Seq((i.toLong, v)).toDF("vec_id", "embedding")
      val executed = VectorOps.withRanks(df, cs.map(_.toSeq))
        .select(col("__ranks")(0)).as[Int].head()
      val driver = VectorOps.nearestCentroid(
        v.map(_.toDouble), cs.map(_.toSeq))
      assert(driver === executed, s"case $i: v=$v cs=$cs")
    }
  }
}
