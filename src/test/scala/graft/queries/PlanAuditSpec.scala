package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

import graft.{SparkEntry, SparkSpec}

/** Plan-quality regression gate over EVERY declared query: the scale
  * anti-patterns (accidental cross products, unpartitioned windows) must
  * not appear in any physical plan. The pairwise-by-design queries are
  * explicitly allowlisted with the reason — anything new that joins
  * without an equi-key or windows without a partition fails here first,
  * not at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Exact-pairwise BY DESIGN (documented small-side/sampled paths):
    * q20 broadcast brute-force cosine (non-equi on qid != nid),
    * q27 all-pairs on an id-sampled subset (vec_a < vec_b),
    * q51 the int8-quantized twin of q20 (same broadcast non-equi shape),
    * q54 PQ's linear ADC scan (reads m codes + 1 norm per candidate — the
    * compression IS the scan plan; IVF buckets compose on top at scale),
    * q57 the matryoshka-truncated twin of q20 (4x cheaper linear scan).
    * Their scale twins (q28 sign-LSH, q33 IVF, q55/q56 IVF-PQ) are
    * equi-joins and stay un-allowlisted. */
  private val pairwiseByDesign =
    Set("q20_cosine_topk", "q27_embedding_neardup", "q51_quantized_topk",
      "q54_pq_topk", "q57_matryoshka_topk")

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.inputPlan)
      case other => other.children.flatMap(collectNodes)
    }
    p +: (self ++ p.subqueries.flatMap(collectNodes))
  }

  test("no accidental cross products; every window is partitioned") {
    var windowsSeen = 0
    var pairwiseSeen = 0
    for (d <- SparkEntry.declared) {
      val nodes = collectNodes(
        d.build(spark, dir).queryExecution.executedPlan)
      windowsSeen += nodes.count(_.isInstanceOf[WindowExec])
      if (pairwiseByDesign(d.name))
        pairwiseSeen += nodes.count(n =>
          n.isInstanceOf[BroadcastNestedLoopJoinExec] || n.isInstanceOf[CartesianProductExec])
      if (!pairwiseByDesign(d.name)) {
        assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
          s"${d.name}: CartesianProduct in plan")
        assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
          s"${d.name}: BroadcastNestedLoopJoin in plan")
      }
      nodes.collect { case w: WindowExec => w }.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"${d.name}: unpartitioned WindowExec (single-task global sort)")
      }
    }
    // non-vacuity: the traversal must actually see the windows the query
    // set is known to contain, and the allowlisted pairwise joins
    assert(windowsSeen >= 5, s"traversal saw only $windowsSeen WindowExec nodes")
    assert(pairwiseSeen >= 1, "traversal never saw the documented pairwise joins")
  }

  test("q40 packing never windows by source alone over the raw corpus") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val q40 = SparkEntry.queries("q40_seq_packing")(spark, dir)
    val windows = collectNodes(q40.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "q40 plan lost its windows — check the traversal")
    // A window keyed by source alone funnels the corpus through #sources
    // tasks — UNLESS it consumes an already-aggregated frame (the
    // two-level design's per-bucket heads window, 1/bucketWidth-th of the
    // input). So: source-only windows must sit above an Aggregate.
    var headsWindows = 0
    windows.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).distinct
      if (keys == Seq("source")) {
        headsWindows += 1
        assert(collectNodes(w).exists(_.isInstanceOf[BaseAggregateExec]),
          "q40: WindowExec by source alone over the RAW corpus — parallelism = #sources")
      }
    }
    // non-vacuity: the heads window is expected to exist and be checked
    assert(headsWindows >= 1, "q40: expected the per-bucket heads window in the plan")
  }
}
