package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Registry sanity + determinism of the statistically-flavored queries
  * (everything else is pinned row-exactly by the driver's DuckDB oracle). */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registry: unique names, every oracle key has a query, flagship runs") {
    val names = SparkEntry.declared.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // EVERY declared query carries a DuckDB oracle as of late round 5: q29
    // multimodal graduated with the real PPM codec, and q33 ann-ivf + q47
    // semdedup graduated when the 1e-6 centroid-mean rounding made the
    // iterative k-means training replayable as chained CTEs. Assert the
    // empty set so a new oracle-less query is a deliberate decision (and a
    // comment here), not an accident.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set.empty[String])
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("hash/sampling-flavored queries are run-to-run deterministic") {
    // q33/q54 included: their trained centroids/codebooks must be identical
    // across two independent training runs (the 1e-6 mean rounding
    // guarantees it)
    for (name <- Seq("q20_cosine_topk", "q21_minhash_lsh", "q26_fingerprint",
        "q28_ann_lsh", "q33_ann_ivf", "q54_pq_topk", "q55_ivf_pq",
        "q56_ivf_pq_residual")) {
      val q = SparkEntry.queries(name)
      val a = q(spark, dir).collect().map(_.toString).toSeq
      val b = q(spark, dir).collect().map(_.toString).toSeq
      assert(a === b, s"$name not deterministic")
      assert(a.nonEmpty, s"$name returned no rows at sf0.001")
    }
  }

  test("approx_count_distinct tracks exact distinct within rsd (D10)") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, dir)
    val exact = ev.select(countDistinct("user_id")).collect()(0).getLong(0)
    val approx = ev.select(approx_count_distinct("user_id", 0.05)).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }

  test("approx_percentile (the 100 TB path) tracks q39's exact percentiles") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, dir)
    val rows = ev.groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5D)").as("exact"),
        expr("approx_percentile(value, 0.5D, 10000)").as("approx"),
        (max("value") - min("value")).as("range"))
      .collect()
    rows.foreach { r =>
      val (exact, approx, range) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(approx - exact) / range < 0.02,
        s"${r.getString(0)}: approx p50 $approx vs exact $exact")
    }
  }
}
