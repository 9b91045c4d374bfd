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
  *    by adding the implied raw-long bound. The testdata generation
  *    stopped shipping nano-encoded files (rounds 8-13 left these
  *    assertions permanently canceled behind an `assume`), so the era is
  *    now pinned against a SELF-CONTAINED fixture: a plain INT64 `ts`
  *    column holding nano epochs is schema-identical to what the legacy
  *    nanosAsLong read of a TIMESTAMP(NANOS) file produces (LongType),
  *    so Tables.events takes the identical conversion path and the rule
  *    fires exactly as it did on real nano files.
  *  - TIMESTAMP(MICROS) era: Spark reads TIMESTAMP_NTZ natively and the
  *    session-zone cast unwraps, so the scan prunes without our rule; the
  *    twin test pins that native path against the on-disk testdata (still
  *    `assume`-guarded — it tracks whatever generation is shipped).
  */
class NanosPredicatePushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Synthetic nanos-era events table: Jan 2024, 10-minute cadence, +7ns
    * sub-microsecond remainder so bound translation exercises the
    * div-1000 truncation. */
  private lazy val nanosDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("nanos_events_").toString
    val base = 1704067200000000000L // 2024-01-01T00:00:00Z in ns
    spark.range(4000)
      .select(col("id").as("event_id"),
        (lit(base) + col("id") * lit(600000000000L) + lit(7L)).as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

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
    val df = Tables.events(spark, nanosDir)
      .filter(col("ts") < lit("2024-01-15").cast("timestamp"))
      .select("event_id")
    val plan = planOf(df)
    // 2024-01-15T00:00Z = 1705276800 s -> µs*1000 = ns
    assert(plan.contains("LessThan(ts,1705276800000000000)"), plan)
  }

  test("nanos era: range predicate pushes both bounds") {
    val df = Tables.events(spark, nanosDir).filter(
      col("ts") >= lit("2024-01-05").cast("timestamp") &&
        col("ts") < lit("2024-01-06").cast("timestamp"))
    val plan = planOf(df)
    assert(plan.contains("GreaterThan(ts,"), plan)
    assert(plan.contains("LessThan(ts,"), plan)
  }

  test("nanos era: results are unchanged by the added bounds (implied-conjunct safety)") {
    // same filter computed through the converted column vs directly on the
    // raw long: identical row sets
    val viaConverted = Tables.events(spark, nanosDir)
      .filter(col("ts") < lit("2024-01-15").cast("timestamp"))
      .count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val viaRaw = Tables.table(spark, nanosDir, "events")
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
