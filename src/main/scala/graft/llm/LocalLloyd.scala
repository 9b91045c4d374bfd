package graft.llm

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-side Lloyd training over a BOUNDED sample — the fast path every
  * k-means-family trainer here gates through before falling back to its
  * distributed loop.
  *
  * Why this exists: an iterative trainer run as Spark jobs pays a fixed
  * per-iteration toll (plan compile + two shuffle stage boundaries +
  * scheduling) that has nothing to do with data volume — at sf0.1 the
  * fused IVF-PQ trainer measured ~0.7 s PER Lloyd iteration over 2,000
  * cached rows, all of it stage latency. The standard production posture
  * for vector-quantization training (shared by every ANN system that
  * trains codebooks, and already this library's documented 100 TB stance:
  * "training runs on a [[Mixing]] hash sample, never the corpus") is:
  * fetch the bounded training sample ONCE, run all Lloyd iterations
  * in memory, broadcast the trained centroids back into the distributed
  * encode. One Spark job replaces `2 + iterations`.
  *
  * The gate is size-bounded and transparent: [[sample]] fetches at most
  * cap+1 rows (`spark.graft.ann.localTrainCap`, default 131,072 — ~64 MB
  * of doubles at dim 64, driver-trivial); if the frame is bigger, the
  * caller falls back to the distributed loop, so an UNSAMPLED 100 TB
  * corpus never lands on the driver. Setting the cap to 0 disables the
  * fast path outright (the differential specs pin both paths equal).
  *
  * Arithmetic mirrors the distributed trainers' post-rounding contract
  * EXACTLY — the same discipline that already makes the trained values
  * reproducible cross-engine against the DuckDB oracle replays:
  *  - seed pick: sort by (first-8-hex-of-md5(id), id) — [[samplingHashLocal]]
  *    is the bit-level replica of [[Mixing.samplingHash]] (a 32-bit
  *    unsigned value, exactly representable in double);
  *  - coarse assignment: [[VectorOps.nearestCentroid]], the spec-pinned
  *    driver replica of the executed `withRanks` rank-0 pick;
  *  - PQ code assignment: [[pqCodesLocal]], the same strict-`<` L2 loops
  *    as [[graft.functions.VectorKernels.pqCodes]] over exactly-widened
  *    floats;
  *  - means: per-(group, dim) sums over double-widened floats with
  *    per-dim null/short-vector counts (mirroring `avg`'s per-column
  *    null-skip), rounded by the shared floor(x*1e6+0.5)/1e6 quantum that
  *    absorbs summation-order ulps (the documented cross-engine
  *    tolerance; the differential spec pins local == distributed on real
  *    data).
  */
private[llm] object LocalLloyd {

  val CapConf = "spark.graft.ann.localTrainCap"
  val DefaultCap = 131072

  /** Parallel-array sample: ids for the seed ordering, vectors widened
    * float -> double (exact). A null embedding stays null (the distributed
    * paths drop null rows from every aggregate the same way). */
  final case class Sample(ids: Array[Long], vecs: Array[Array[Double]])

  private def cap(df: DataFrame): Int =
    df.sparkSession.conf.getOption(CapConf).map(_.toInt).getOrElse(DefaultCap)

  /** ONE bounded fetch: `limit(cap+1)` — if more rows come back than the
    * cap, the frame is too big for driver training and the caller takes
    * the distributed loop. Never a full count, never an unbounded collect. */
  def sample(e: DataFrame): Option[Sample] = {
    val c = cap(e)
    if (c <= 0) return None
    val rows = e.select(col("vec_id").cast("long"), col("embedding"))
      .limit(c + 1).collect()
    if (rows.length > c) None
    else {
      val ids = new Array[Long](rows.length)
      val vecs = new Array[Array[Double]](rows.length)
      var r = 0
      while (r < rows.length) {
        ids(r) = rows(r).getLong(0)
        val s = if (rows(r).isNullAt(1)) null else rows(r).getSeq[Float](1)
        if (s != null) {
          val a = new Array[Double](s.length)
          var i = 0
          while (i < a.length) { a(i) = s(i).toDouble; i += 1 }
          vecs(r) = a
        }
        r += 1
      }
      Some(Sample(ids, vecs))
    }
  }

  /** Bit-level replica of [[Mixing.samplingHash]]: first 8 hex chars of
    * md5(id as decimal string) parsed base-16 — i.e. the first 4 digest
    * bytes as a 32-bit unsigned value, exact in double. */
  def samplingHashLocal(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(id.toString.getBytes(StandardCharsets.UTF_8))
    (((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)).toDouble
  }

  /** The n seed vectors — smallest (samplingHash, id), exactly
    * [[VectorOps.seedRows]]' ordering (ties impossible on ids). */
  def seeds(s: Sample, n: Int): Seq[Seq[Double]] =
    s.ids.indices.toArray
      .sortBy(i => (samplingHashLocal(s.ids(i)), s.ids(i)))
      .take(n).map(i => s.vecs(i).toSeq).toSeq

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Bit-identical primitive-array replica of [[VectorOps.nearestCentroid]]
    * — the boxed Seq form costs ~60 s of driver time at k=200 x n=40k x
    * dim=64 (SemDeDup's auto-k regime) where this loop costs ~1 s. Every
    * sum runs in the same left-to-right order as the Seq foldLeft/map-sum
    * it replaces, the dot truncates to min length exactly like `zip`, the
    * zero-norm sentinel is the same 2.0, and ties keep the first index via
    * the same strict `<` — the LocalLloydSpec differentials (local ==
    * forced-distributed) pin the equivalence on real data. `cNorms` is the
    * per-centroid norm, loop-invariant across rows (hoisting it changes no
    * arithmetic: same sum, same sqrt). */
  private def nearestFast(
      v: Array[Double], cs: Array[Array[Double]], cNorms: Array[Double]): Int = {
    var vn = 0.0
    var i = 0
    while (i < v.length) { vn += v(i) * v(i); i += 1 }
    vn = math.sqrt(vn)
    var best = 0
    var bestDist = Double.MaxValue
    var ci = 0
    while (ci < cs.length) {
      val c = cs(ci)
      val cn = cNorms(ci)
      val dist =
        if (cn == 0 || vn == 0) 2.0
        else {
          var dot = 0.0
          var j = 0
          val n = math.min(v.length, c.length)
          while (j < n) { dot += v(j) * c(j); j += 1 }
          1.0 - dot / (vn * cn)
        }
      if (dist < bestDist) { bestDist = dist; best = ci }
      ci += 1
    }
    best
  }

  private def toArrays(cs: Seq[Seq[Double]]): (Array[Array[Double]], Array[Double]) = {
    val arr = cs.map(_.toArray).toArray
    val norms = arr.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    (arr, norms)
  }

  /** Coarse Lloyd: assignment via the spec-pinned [[VectorOps.nearestCentroid]]
    * replica; means with PER-DIM counts (a short vector contributes to the
    * dims it has, exactly like `avg(embedding[i])` null-skipping); empty
    * (bucket, dim) groups keep the previous centroid component the same way
    * the distributed `means.getOrElse` does per bucket. */
  def lloydCoarse(s: Sample, init: Seq[Seq[Double]], iterations: Int): Seq[Seq[Double]] = {
    var cents = init
    val k = init.size
    val dim = if (init.isEmpty) 0 else init.head.length
    for (_ <- 0 until iterations) {
      val sums = Array.ofDim[Double](k, dim)
      val members = new Array[Long](k)
      val (cs, csNorms) = toArrays(cents)
      var r = 0
      while (r < s.vecs.length) {
        val v = s.vecs(r)
        if (v != null) {
          // the distributed twin's mean agg reads embedding[i] for every
          // i < dim under ANSI semantics, which THROWS on a too-short
          // array — mirror the loud failure (the old min-truncation here
          // silently produced 0/0 = NaN centroid dims instead, which
          // nearestFast would then never select)
          if (v.length < dim) throw new IllegalArgumentException(
            s"trainCentroids: embedding has ${v.length} elements, " +
              s"centroid dim is $dim — the distributed ANSI array read fails here too")
          val b = nearestFast(v, cs, csNorms)
          members(b) += 1
          var i = 0
          while (i < dim) { sums(b)(i) += v(i); i += 1 }
        }
        r += 1
      }
      // empty buckets keep the previous centroid (the distributed
      // means.getOrElse); non-empty buckets have every dim counted
      // `members` times (short vectors are excluded above)
      cents = cents.indices.map { c =>
        if (members(c) == 0L) cents(c)
        else (0 until dim).map(i => round6(sums(c)(i) / members(c)))
      }
    }
    cents
  }

  /** Replica of [[graft.functions.VectorKernels.pqCodes]]: per-subspace
    * L2-nearest codebook index, strict `<` (ties to the lower index), loud
    * failure on a vector shorter than m*subDim — over already-widened
    * doubles (widening is exact, so the folds are bit-identical). */
  def pqCodesLocal(v: Array[Double], cbs: Seq[Seq[Seq[Double]]], subDim: Int): Array[Int] = {
    val m = cbs.size
    if (v.length < m * subDim)
      throw new IllegalArgumentException(
        s"graft_pq_codes: embedding has ${v.length} elements, needs m*subDim = ${m * subDim}")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * subDim
      val cb = cbs(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.size) {
        val cent = cb(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = v(off + i) - cent(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    codes
  }

  /** PQ Lloyd: codes via [[pqCodesLocal]]; per-(subspace, code, dim) means
    * with per-dim counts (mirroring the exploded `element_at` avg's
    * null-skip on short vectors); empty groups keep the previous centroid. */
  def lloydPq(
      s: Sample, init: Seq[Seq[Seq[Double]]], subDim: Int,
      iterations: Int): Seq[Seq[Seq[Double]]] = {
    var cbs = init
    val m = init.size
    val k = if (init.isEmpty) 0 else init.head.size
    for (_ <- 0 until iterations) {
      val sums = Array.ofDim[Double](m, k, subDim)
      val cnts = Array.ofDim[Long](m, k, subDim)
      val cur = cbs
      var r = 0
      while (r < s.vecs.length) {
        val v = s.vecs(r)
        if (v != null) {
          val codes = pqCodesLocal(v, cur, subDim)
          var j = 0
          while (j < m) {
            val c = codes(j)
            var i = 0
            while (i < subDim) {
              val idx = j * subDim + i
              if (idx < v.length) { sums(j)(c)(i) += v(idx); cnts(j)(c)(i) += 1 }
              i += 1
            }
            j += 1
          }
        }
        r += 1
      }
      cbs = cbs.indices.map { j =>
        cbs(j).indices.map { c =>
          if (cnts(j)(c).forall(_ == 0L)) cbs(j)(c)
          else (0 until subDim).map(i => round6(sums(j)(c)(i) / cnts(j)(c)(i)))
        }
      }
    }
    cbs
  }

  /** Residual projection of the sample against trained coarse centroids —
    * the in-memory twin of the executed `zip_with(x, c, (x, w) ->
    * (CAST(x AS DOUBLE) - w) CAST AS FLOAT)` projection: double subtract,
    * round-trip through float (the executed cast), widen back. */
  def residual(s: Sample, coarse: Seq[Seq[Double]]): Sample = {
    val (cArr, cNorms) = toArrays(coarse)
    val vecs = s.vecs.map { v =>
      if (v == null) null
      else {
        val b = nearestFast(v, cArr, cNorms)
        val c = coarse(b)
        val n = math.min(v.length, c.length)
        val out = new Array[Double](n)
        var i = 0
        while (i < n) { out(i) = (v(i) - c(i)).toFloat.toDouble; i += 1 }
        out
      }
    }
    Sample(s.ids, vecs)
  }
}
