package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

import graft.{SparkSpec, Tables}

/** Scan pruning on `events.ts` must survive whichever file generation is on
  * disk (TESTDATA.md regenerates between rounds):
  *
  *  - TIMESTAMP(NANOS) era: Spark reads the raw nano Long (legacy
  *    nanosAsLong) and Tables.events converts via `timestamp_micros(div)`,
  *    which blocks native pushdown — [[NanosPredicatePushdown]] recovers it
  *    by adding the implied raw-long bound. Those assertions only apply when
  *    the file is actually nano-encoded, so they `assume` on the raw read
  *    schema and cancel otherwise.
  *  - TIMESTAMP(MICROS) era: Spark reads TIMESTAMP_NTZ natively and the
  *    session-zone cast unwraps, so the scan prunes without our rule; the
  *    twin test pins that native path.
  */
class NanosPredicatePushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Raw on-disk type of `events.ts` for the current testdata generation:
    * LongType = nanos era (legacy nanosAsLong read), TimestampNTZType =
    * micros era. */
  private def rawTsType: org.apache.spark.sql.types.DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.table(spark, dir, "events").schema("ts").dataType
  }

  test("nanos era: < predicate on converted ts reaches the scan as a raw nano bound") {
    assume(rawTsType == LongType, "events.ts is not TIMESTAMP(NANOS) in this generation")
    val df = Tables.events(spark, dir)
      .filter(col("ts") < lit("2024-01-15").cast("timestamp"))
      .select("event_id")
    val plan = planOf(df)
    // 2024-01-15T00:00Z = 1705276800 s -> µs*1000 = ns
    assert(plan.contains("LessThan(ts,1705276800000000000)"), plan)
  }

  test("nanos era: range predicate pushes both bounds") {
    assume(rawTsType == LongType, "events.ts is not TIMESTAMP(NANOS) in this generation")
    val df = Tables.events(spark, dir).filter(
      col("ts") >= lit("2024-01-05").cast("timestamp") &&
        col("ts") < lit("2024-01-06").cast("timestamp"))
    val plan = planOf(df)
    assert(plan.contains("GreaterThan(ts,"), plan)
    assert(plan.contains("LessThan(ts,"), plan)
  }

  test("nanos era: results are unchanged by the added bounds (implied-conjunct safety)") {
    assume(rawTsType == LongType, "events.ts is not TIMESTAMP(NANOS) in this generation")
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

  test("micros era: native pushdown prunes the scan through the NTZ cast") {
    assume(rawTsType == TimestampNTZType, "events.ts is not TIMESTAMP(MICROS) in this generation")
    val df = Tables.events(spark, dir)
      .filter(col("ts") < lit("2024-01-15").cast("timestamp"))
      .select("event_id")
    val plan = planOf(df)
    // the session-zone cast must not strand the predicate above the scan:
    // PushedFilters carries a ts bound for parquet row-group pruning
    assert(plan.contains("LessThan(ts,"), plan)
    // and the filter semantics hold
    assert(df.count() > 0)
  }

  test("micros era: range predicate pushes both NTZ bounds") {
    assume(rawTsType == TimestampNTZType, "events.ts is not TIMESTAMP(MICROS) in this generation")
    val df = Tables.events(spark, dir).filter(
      col("ts") >= lit("2024-01-05").cast("timestamp") &&
        col("ts") < lit("2024-01-06").cast("timestamp"))
    val plan = planOf(df)
    assert(plan.contains("GreaterThanOrEqual(ts,") || plan.contains("GreaterThan(ts,"), plan)
    assert(plan.contains("LessThan(ts,"), plan)
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
