package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Semantics of the scale-safe as-of join: at-or-before matching including
  * equal timestamps, deterministic right-side tie-breaks, null attachment
  * when nothing precedes, and key isolation. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def t(ms: Long) = new Timestamp(ms)

  test("lastAtOrBefore: at-or-before, equal-ts inclusion, ties, no-match") {
    val trades = Seq(
      (100L, 1L, t(5)),   // before any quote -> nulls
      (101L, 1L, t(15)),  // between quotes -> rid 1
      (102L, 1L, t(20)),  // EQUAL ts to quotes 2 and 3 -> ties included, rid 3 wins
      (103L, 1L, t(99)),  // far after -> still rid 3
      (104L, 2L, t(50)),  // user with no quotes at all -> nulls
    ).toDF("trade_id", "user_id", "ts")
    val quotes = Seq(
      (1L, 1L, t(10), 1.0),
      (2L, 1L, t(20), 2.0), // same-ts pair: greatest tie (rid) must win
      (3L, 1L, t(20), 3.0),
    ).toDF("rid", "user_id", "ts", "px")

    val out = AsOfJoin.lastAtOrBefore(
        trades, quotes, by = Seq("user_id"), ts = "ts", tie = "rid",
        payload = Seq("rid", "px"), prefix = "q_")
      .select("trade_id", "q_rid", "q_px")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet

    assert(out === Set(
      (100L, None, None),
      (101L, Some(1L), Some(1.0)),
      (102L, Some(3L), Some(3.0)),
      (103L, Some(3L), Some(3.0)),
      (104L, None, None),
    ))
  }

  test("differential: matches a brute-force range-join oracle on random data") {
    val rnd = new scala.util.Random(42)
    val lefts = (0 until 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, t(rnd.nextInt(1000).toLong)))
    val rights = (0 until 200).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, t(rnd.nextInt(1000).toLong), rnd.nextDouble()))
    val lDf = lefts.toDF("lid", "user_id", "ts")
    val rDf = rights.toDF("rid", "user_id", "ts", "px")

    val got = AsOfJoin.lastAtOrBefore(
        lDf, rDf, by = Seq("user_id"), ts = "ts", tie = "rid",
        payload = Seq("rid"), prefix = "m_")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap

    // O(|L| x |R|) reference: greatest (ts, rid) right row at or before
    val want = lefts.map { case (lid, u, lts) =>
      lid -> rights
        .filter(r => r._2 == u && !r._3.after(lts))
        .sortBy(r => (r._3.getTime, r._1))
        .lastOption.map(_._1)
    }.toMap
    assert(got === want)
    assert(got.values.exists(_.nonEmpty) && got.values.exists(_.isEmpty)) // non-vacuous

    // the skew-safe bucketed form is IDENTICAL to the flat form, at a
    // bucket width small enough that carries cross many bucket boundaries
    val gotBucketed = AsOfJoin.lastAtOrBeforeBucketed(
        lDf, rDf, by = Seq("user_id"), ts = "ts", tie = "rid",
        payload = Seq("rid"), prefix = "m_", bucketMicros = 100L * 1000L)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(gotBucketed === want)
  }

  test("plan shape: keyed window, no cross/range join explosion") {
    val trades = Seq((100L, 1L, t(5))).toDF("trade_id", "user_id", "ts")
    val quotes = Seq((1L, 1L, t(10), 1.0)).toDF("rid", "user_id", "ts", "px")
    val plan = AsOfJoin.lastAtOrBefore(
        trades, quotes, Seq("user_id"), "ts", "rid", Seq("px"), "q_")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("cartesian") && !plan.contains("BroadcastNestedLoop"))
  }
}
