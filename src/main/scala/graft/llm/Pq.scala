package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the similarity-search
  * compression that makes a 100 TB ANN scan tractable: each vector is cut
  * into `m` subvectors, each subvector is replaced by the index of its
  * nearest centroid in a per-subspace codebook (k centroids, trained by the
  * same seeded/rounded Lloyd recipe as [[VectorOps.trainCentroids]], but
  * under the L2 metric PQ reconstruction requires), so a dim-float vector
  * becomes `m` small codes + one stored norm. With m=8, k=16 a 64-float
  * (256-byte) embedding compresses to 8 codes + 4 bytes — ~20x less scan
  * IO than the float corpus and 5x less than int8 ([[Quantize]]).
  *
  * Ranking is asymmetric-distance (ADC): the QUERY stays float, each
  * candidate scores via its RECONSTRUCTED vector (concatenated codebook
  * centroids — a pure per-row literal lookup, no shuffle), normalized by
  * the candidate's TRUE stored norm; an exact re-rank of the top
  * `refine * k` ADC survivors against their true embeddings recovers
  * brute-force precision at the top (recall pinned by spec). This linear
  * ADC scan is the kernel IVF composes with at scale (probe buckets, then
  * ADC within them); training at 100 TB runs on a [[Mixing]] hash sample
  * (`trainFrac`), never the full corpus.
  *
  * Everything is built-ins (slice / zip_with folds / literal-array
  * lookups) inside codegen; codebooks are k x dim/m literals per subspace,
  * collected driver-side exactly like the IVF trainer. Deterministic:
  * md5-hash seed picks, id tie-breaks, 1e-6 floor-rounded means.
  */
object Pq {

  private def arrSql(c: Seq[Double]): String =
    c.map(v => s"${v}D").mkString("array(", ", ", ")")

  /** L2 distance of a float-array column slice to a centroid literal, as a
    * left-to-right double fold (same cross-engine discipline as the dots). */
  private def l2(colName: String, c: Seq[Double]): Column = expr(
    s"""aggregate(zip_with($colName, ${arrSql(c)},
       |  (x, w) -> (CAST(x AS DOUBLE) - w) * (CAST(x AS DOUBLE) - w)),
       |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  /** Index of the nearest codebook centroid (L2, index tie-break). */
  private def nearestCode(colName: String, cb: Seq[Seq[Double]]): Column =
    array_sort(array(cb.zipWithIndex.map { case (c, i) =>
      struct(l2(colName, c).as("dist"), lit(i).as("idx"))
    }: _*)).getField("idx")(0)

  /** One per-subspace codebook: seeded + floor-rounded Lloyd under L2.
    * `sub` must be (vec_id, embedding: array<float>[subDim]). */
  private[llm] def trainCodebook(
      sub: DataFrame, k: Int, iterations: Int): Seq[Seq[Double]] = {
    var cb: Seq[Seq[Double]] =
      sub.orderBy(Mixing.samplingHash(col("vec_id")), col("vec_id"))
        .limit(k)
        .collect()
        .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val dim = if (cb.isEmpty) 0 else cb.head.length
    for (_ <- 0 until iterations) {
      val dimAggs = (0 until dim).map(i =>
        (floor(avg(col("embedding")(i).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as(s"m$i"))
      val means = sub
        .withColumn("code", nearestCode("embedding", cb))
        .groupBy("code")
        .agg(dimAggs.head, dimAggs.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (1 to dim).map(r.getDouble).toSeq)
        .toMap
      cb = cb.indices.map(i => means.getOrElse(i, cb(i)))
    }
    cb
  }

  /** Train all `m` codebooks. `trainFrac` < 1 trains on the deterministic
    * md5 id-sample (the 100 TB posture — codebook quality needs a sample,
    * not the corpus); encoding still covers every vector. */
  def trainCodebooks(
      emb: DataFrame,
      m: Int,
      k: Int = 16,
      iterations: Int = 2,
      dim: Int = 64,
      trainFrac: Double = 1.0): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val base =
      if (trainFrac >= 1.0) emb
      else emb.filter(Mixing.hashKeep(col("vec_id"), lit(trainFrac)))
    val e = base.select(col("vec_id"), col("embedding")).localCheckpoint(false)
    (0 until m).map { j =>
      trainCodebook(
        e.select(col("vec_id"),
          slice(col("embedding"), j * subDim + 1, subDim).as("embedding")),
        k, iterations)
    }
  }

  /** (vec_id, embedding, ...) -> (vec_id, codes: array<int>[m], vn, ...):
    * per-row nearest-centroid codes + the true norm ADC needs. */
  def encode(emb: DataFrame, codebooks: Seq[Seq[Seq[Double]]], dim: Int = 64): DataFrame = {
    val m = codebooks.size
    val subDim = dim / m
    val codeCols = codebooks.zipWithIndex.map { case (cb, j) =>
      val sliced = s"slice(embedding, ${j * subDim + 1}, $subDim)"
      array_sort(array(cb.zipWithIndex.map { case (c, i) =>
        struct(l2(sliced, c).as("dist"), lit(i).as("idx"))
      }: _*)).getField("idx")(0)
    }
    emb
      .withColumn("codes", array(codeCols: _*))
      .withColumn("vn", expr(VectorOps.normExprFor(emb, "embedding")))
      .drop("embedding")
  }

  /** Reconstructed (approximate) embedding from codes: per subspace, the
    * codebook centroid the code names — flatten of literal-array lookups. */
  private def reconstruct(codebooks: Seq[Seq[Seq[Double]]]): Column =
    flatten(array(codebooks.zipWithIndex.map { case (cb, j) =>
      element_at(typedlit(cb), col("codes")(j) + 1)
    }: _*))

  /** PQ ANN top-k with exact re-rank: ADC-rank every candidate from its
    * codes (scan reads m codes + 1 norm per vector, never the floats),
    * keep the top `refine * k` per query, then re-rank those few against
    * their true embeddings. Output: (vec_id, neighbor_id, rnk, cos) — cos
    * is the EXACT cosine of the refined survivors. */
  def pqTopK(
      emb: DataFrame,
      queryIds: Column => Column,
      m: Int,
      k: Int,
      nCodes: Int = 16,
      refine: Int = 4,
      iterations: Int = 2,
      dim: Int = 64,
      trainFrac: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb.localCheckpoint(false)
    val codebooks = trainCodebooks(e, m, nCodes, iterations, dim, trainFrac)
    val enc = encode(e, codebooks, dim)
      .select(col("vec_id").as("nid"), col("codes"), col("vn").as("nn"))
      .withColumn("approx", reconstruct(codebooks))
    val q = broadcast(
      e.filter(queryIds(col("vec_id")))
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .withColumn("qn", expr(VectorOps.normExprFor(e, "qe"))))
    // ADC: dot(query float, candidate reconstruction) / (|q| * true |n|)
    val adcDot = expr(
      """aggregate(zip_with(qe, approx, (x, w) -> CAST(x AS DOUBLE) * w),
        |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("nid"))
    val shortlist = enc
      .join(q, col("qid") =!= col("nid"))
      .withColumn("adc",
        when(col("qn") * col("nn") === 0, lit(-2.0))
          .otherwise(adcDot / (col("qn") * col("nn"))))
      .withColumn("arnk", row_number().over(wAdc))
      .filter(col("arnk") <= refine * k)
      .select("qid", "qe", "qn", "nid")
    // exact re-rank of the shortlist only
    val wX = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    shortlist
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("ne")), Seq("nid"))
      .withColumn("nn", expr(VectorOps.normExprFor(e, "ne")))
      .withColumn("cos",
        when(col("qn") * col("nn") === 0, lit(-2.0))
          .otherwise(expr(VectorOps.dotExprFor(e, "qe", "ne")) / (col("qn") * col("nn"))))
      .withColumn("rnk", row_number().over(wX))
      .filter(col("rnk") <= k)
      .select(col("qid").as("vec_id"), col("nid").as("neighbor_id"), col("rnk"), col("cos"))
  }
}
