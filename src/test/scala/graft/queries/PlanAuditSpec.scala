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
    * q27 all-pairs on an id-sampled subset (vec_a < vec_b). Their scale
    * twins (q28 sign-LSH, q33 IVF) are equi-joins and stay un-allowlisted. */
  private val pairwiseByDesign = Set("q20_cosine_topk", "q27_embedding_neardup")

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
}
