package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The optimizer rule must surface raw-long bounds on the ns-encoded `ts`
  * column in the parquet scan's PushedFilters, without changing results. */
class NanosPredicatePushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("< predicate on converted ts reaches the scan as a raw nano bound") {
    val df = Tables.events(spark, dir)
      .filter(col("ts") < lit("2024-01-15").cast("timestamp"))
      .select("event_id")
    val plan = planOf(df)
    // 2024-01-15T00:00Z = 1705276800 s -> µs*1000 = ns
    assert(plan.contains("LessThan(ts,1705276800000000000)"), plan)
  }

  test("range predicate pushes both bounds") {
    val df = Tables.events(spark, dir).filter(
      col("ts") >= lit("2024-01-05").cast("timestamp") &&
        col("ts") < lit("2024-01-06").cast("timestamp"))
    val plan = planOf(df)
    assert(plan.contains("GreaterThan(ts,"), plan)
    assert(plan.contains("LessThan(ts,"), plan)
  }

  test("results are unchanged by the added bounds (implied-conjunct safety)") {
    // same filter computed through the converted column vs directly on the
    // raw long: identical row sets
    val viaConverted = Tables.events(spark, dir)
      .filter(col("ts") < lit("2024-01-15").cast("timestamp"))
      .count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val viaRaw = Tables.table(spark, dir, "events")
      .filter(col("ts") < lit(1705276800000000000L))
      .count()
    assert(viaConverted === viaRaw)
    assert(viaConverted > 0)
  }

  test("boundary exactness: events at exactly the bound are not dropped") {
    // d <= V must translate to a < (V+1)*1000, keeping ts values whose
    // sub-microsecond remainder would otherwise straddle the bound
    val e = Tables.events(spark, dir)
    val v = e.selectExpr("max(ts) as m").collect()(0).getTimestamp(0)
    val cnt = e.filter(col("ts") <= lit(v)).count()
    assert(cnt === e.count())
  }
}
