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
    // Rows-only entries by design (no DuckDB oracle): q33 ann-ivf (iterative
    // centroid training has no single-SQL oracle; spec-pinned against brute
    // force) and q47 semdedup (trained k-means, likewise spec-pinned).
    // q29 multimodal graduated to a full oracle in round 5 (real PPM codec).
    // Everything else must carry an oracle — assert the exact set so a new
    // oracle-less query is a deliberate decision, not an accident.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("q33_ann_ivf", "q47_semdedup"))
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("hash/sampling-flavored queries are run-to-run deterministic") {
    for (name <- Seq("q20_cosine_topk", "q21_minhash_lsh", "q26_fingerprint", "q28_ann_lsh")) {
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
