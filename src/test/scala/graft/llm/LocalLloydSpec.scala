package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential pinning of the driver-side Lloyd fast path against the
  * distributed trainers it replaces: on the real corpus every trainer must
  * produce EXACTLY the same centroids/codebooks whether the sample gate
  * fires (default cap) or is disabled (cap=0 forces the distributed loop).
  * This is what licenses the gate's transparency — and what the q33/q47/
  * q54/q55/q56 oracle replays rely on. */
class LocalLloydSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withCap[A](cap: Int)(f: => A): A = {
    spark.conf.set(LocalLloyd.CapConf, cap.toString)
    try f finally spark.conf.unset(LocalLloyd.CapConf)
  }

  test("samplingHashLocal replicates Mixing.samplingHash bit for bit") {
    val ids = Seq(0L, 1L, 7L, 42L, 1234567L, Long.MaxValue, -3L)
    val fromCol = spark.createDataFrame(ids.map(Tuple1(_))).toDF("id")
      .select(col("id"), Mixing.samplingHash(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ids.foreach { id =>
      assert(LocalLloyd.samplingHashLocal(id) === fromCol(id), s"id $id")
    }
  }

  test("local seeds == distributed seedRows on the real corpus") {
    val e = graft.Tables.embeddings(spark, dir).localCheckpoint(false)
    val s = LocalLloyd.sample(e).get
    assert(LocalLloyd.seeds(s, 16) === VectorOps.seedRows(e, 16))
  }

  test("coarse training: local == distributed, bit for bit") {
    val e = graft.Tables.embeddings(spark, dir).localCheckpoint(false)
    val local = VectorOps.trainCentroids(e, 8, 2)
    val dist = withCap(0) { VectorOps.trainCentroids(e, 8, 2) }
    assert(local === dist)
  }

  test("PQ codebook training: local == distributed, bit for bit") {
    val emb = graft.Tables.embeddings(spark, dir)
    val local = Pq.trainCodebooks(emb, m = 8, k = 16, iterations = 2)
    val dist = withCap(0) { Pq.trainCodebooks(emb, m = 8, k = 16, iterations = 2) }
    assert(local === dist)
  }

  test("fused IVF-PQ training: local == distributed, bit for bit") {
    val e = graft.Tables.embeddings(spark, dir).localCheckpoint(false)
    val local = Pq.trainIvfPqJoint(e, nCentroids = 8, m = 8, nCodes = 16,
      iterations = 2, dim = 64)
    val dist = withCap(0) { Pq.trainIvfPqJoint(e, nCentroids = 8, m = 8,
      nCodes = 16, iterations = 2, dim = 64) }
    assert(local._1 === dist._1, "coarse centroids diverged")
    assert(local._2 === dist._2, "PQ codebooks diverged")
  }

  test("residual IVF-PQ training: local == distributed, bit for bit") {
    val e = graft.Tables.embeddings(spark, dir).localCheckpoint(false)
    val local = Pq.trainIvfPqResidual(e, nCentroids = 8, m = 8, nCodes = 16,
      iterations = 2, dim = 64)
    val dist = withCap(0) { Pq.trainIvfPqResidual(e, nCentroids = 8, m = 8,
      nCodes = 16, iterations = 2, dim = 64) }
    assert(local._1 === dist._1, "coarse centroids diverged")
    assert(local._2 === dist._2, "residual PQ codebooks diverged")
  }

  test("pqCodesLocal == executed kernel codes on the real corpus") {
    val e = graft.Tables.embeddings(spark, dir).localCheckpoint(false)
    val cbs = Pq.trainCodebooks(e, m = 8, k = 16, iterations = 2)
    val executed = Pq.encode(e, cbs)
      .select("vec_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val s = LocalLloyd.sample(e).get
    s.ids.zip(s.vecs).foreach { case (id, v) =>
      assert(LocalLloyd.pqCodesLocal(v, cbs, 8).toSeq === executed(id), s"vec $id")
    }
  }

  test("short embeddings fail LOUDLY on both paths; longer ones train equal") {
    import spark.implicits._
    // a vector SHORTER than the centroid dim: the distributed mean agg
    // reads embedding[i] under ANSI semantics and throws — the local path
    // must mirror the loud failure, not silently produce 0/0 = NaN
    // centroid dims (which nearestFast would then never select)
    val s = LocalLloyd.Sample(
      Array(1L, 2L),
      Array(Array(1.0, 1.0), Array(1.0, 0.9)))
    val init = Seq(Seq(1.0, 1.0, 5.0, 5.0), Seq(-1.0, -1.0, 0.0, 0.0))
    val exLocal = intercept[IllegalArgumentException] {
      LocalLloyd.lloydCoarse(s, init, 1)
    }
    assert(exLocal.getMessage.contains("centroid dim"))
    val e = Seq(
      (1L, Array(1.0f, 1.0f)), (2L, Array(1.0f, 0.9f))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val exDist = intercept[Exception] {
      VectorOps.trainCentroidsFrom(e, init, 1)
    }
    assert(exDist.getMessage.contains("INVALID_ARRAY_INDEX"))
    // vectors LONGER than dim: extra dims ignored identically on both
    // paths, and an empty bucket keeps its previous centroid
    val s2 = LocalLloyd.Sample(
      Array(1L, 2L),
      Array(Array(1.0, 1.0, 7.0), Array(1.0, 0.9, 9.0)))
    val init2 = Seq(Seq(1.0, 1.0), Seq(-1.0, -1.0))
    val local2 = LocalLloyd.lloydCoarse(s2, init2, 1)
    val e2 = Seq(
      (1L, Array(1.0f, 1.0f, 7.0f)), (2L, Array(1.0f, 0.9f, 9.0f)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    assert(local2 === VectorOps.trainCentroidsFrom(e2, init2, 1))
    assert(local2(1) === init2(1)) // empty bucket -> previous centroid
    assert(local2.flatten.forall(d => !d.isNaN))
  }

  test("sample gate: over-cap frame falls back (returns None)") {
    val e = graft.Tables.embeddings(spark, dir)
    withCap(3) { assert(LocalLloyd.sample(e).isEmpty) }
    withCap(0) { assert(LocalLloyd.sample(e).isEmpty) }
    assert(LocalLloyd.sample(e).isDefined)
  }
}
