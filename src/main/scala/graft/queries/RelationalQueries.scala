package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Q1–Q17 of SURVEY.md §2.H: the relational capabilities of the reference
  * (scan/filter/project, explode, key derivation, aggs, set ops, joins,
  * windows, JSON, scalars) re-expressed as declarative Spark plans.
  *
  * Float discipline: SUMs over double columns are computed in exact decimal
  * (order-independent, identical in Spark and DuckDB) and cast back to double
  * at the end; see [[dsum]]. Plain double arithmetic (products, divisions) is
  * IEEE-deterministic and matches DuckDB bit-for-bit.
  */
object RelationalQueries {

  /** Order-independent exact sum of a double column: cast to decimal, sum,
    * re-cast to SCALE 4 (lossless — inputs are 2-decimal values, products
    * 4-decimal), then to double. The scale-4 hop matters: a decimal whose
    * unscaled value exceeds 2^53 converts to double through int128->double
    * + a division in DuckDB (double-rounded, can land 1 ulp off Spark's
    * correctly-rounded BigDecimal conversion — observed on sf0.1 revenue
    * sums at scale 8). At scale 4 the unscaled value stays exact in a
    * double up to 9e11, so both engines' conversions are correctly rounded
    * and identical. Oracle twin:
    * CAST(CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DECIMAL(25,4)) AS DOUBLE). */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(25, 6))).cast(DecimalType(25, 4)).cast("double")

  val all: Seq[Declared] = Seq(
    // ------------------------------------------------------------------
    // Q1 — scan + filter + project (reference glob queries G1–G4)
    Declared(
      "q01_scan_filter",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .filter($"event_type" === "purchase" && $"ts" < lit("2024-01-15").cast("timestamp"))
          .select("event_id", "user_id", "value")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-15'
             |ORDER BY event_id""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q2 — explode with position (reference block->trx->op explode, C1/C7):
    // posexplode hands out the ordinal statelessly, replacing the
    // reference's run-length counter (block_follower_job.rb:21-37).
    Declared(
      "q02_posexplode_tokens",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "token")))
          .orderBy("doc_id", "pos")
      },
      Some("""SELECT doc_id, CAST(pos AS INT) AS pos, token FROM (
             |  SELECT doc_id,
             |         unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
             |         unnest(string_split(text, ' ')) AS token
             |  FROM documents)
             |ORDER BY doc_id, pos""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q3 — composite key derivation + glob filter (C6/G6,
    // block_follower_job.rb:45 key grammar; glob 'hive:*:F' -> LIKE)
    Declared(
      "q03_key_glob",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select(concat_ws(":", lit("hive"), $"o_orderkey", $"o_orderstatus").as("key"))
          .filter($"key".like("hive:%:F"))
          .orderBy("key")
      },
      Some("""SELECT key FROM (
             |  SELECT 'hive:' || o_orderkey || ':' || o_orderstatus AS key FROM orders)
             |WHERE key LIKE 'hive:%:F' ORDER BY key""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q4 — per-group count (transaction_num, D1)
    Declared(
      "q04_count_per_user",
      (s, dir) => {
        Tables.events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id ORDER BY user_id"),
    ),

    // ------------------------------------------------------------------
    // Q5 — change-detect dedup keeping first (D2/D3)
    Declared(
      "q05_dedup_minkey",
      (s, dir) => {
        Tables.orders(s, dir).groupBy("o_custkey")
          .agg(min("o_orderkey").as("first_orderkey"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, MIN(o_orderkey) AS first_orderkey
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q6 — distinct + set intersection/difference (D4/E1/E2, the verify
    // tasks' `actual & expected` / `actual - expected`, Rakefile:247-261)
    Declared(
      "q06_set_ops",
      (s, dir) => {
        import s.implicits._
        val ev  = Tables.events(s, dir)
        val err = ev.filter($"event_type" === "error").select("user_id").distinct()
        val pur = ev.filter($"event_type" === "purchase").select("user_id").distinct()
        err.intersect(pur).withColumn("tag", lit("both"))
          .unionByName(err.except(pur).withColumn("tag", lit("error_only")))
          .orderBy("tag", "user_id")
      },
      Some("""SELECT user_id, 'both' AS tag FROM (
             |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
             |  INTERSECT
             |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
             |UNION ALL
             |SELECT user_id, 'error_only' AS tag FROM (
             |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
             |  EXCEPT
             |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
             |ORDER BY tag, user_id""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q7 — semi/anti join (E3 membership checks)
    Declared(
      "q07_semi_anti",
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val withOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
          .select("c_custkey").withColumn("tag", lit("with_orders"))
        val noOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
          .select("c_custkey").withColumn("tag", lit("no_orders"))
        withOrders.unionByName(noOrders).orderBy("tag", "c_custkey")
      },
      Some("""SELECT c_custkey, 'with_orders' AS tag FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders)
             |UNION ALL
             |SELECT c_custkey, 'no_orders' AS tag FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
             |ORDER BY tag, c_custkey""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q8 — group + collect_set (D5, Rakefile:429-445); joined to a string
    // so the hash compare is representation-stable across engines.
    Declared(
      "q08_collect_set",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir).groupBy("o_custkey")
          .agg(array_join(sort_array(collect_set($"o_orderstatus")), ",").as("statuses"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey,
             |       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q9 — last-wins aggregation (D6, Rakefile:577-608), deterministic
    // argmax via (ts, event_id) ordering.
    Declared(
      "q09_last_event",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy("user_id").orderBy($"ts".desc, $"event_id".desc)
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"user_id", $"ts".as("last_ts"), $"event_type".as("last_type"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, ts AS last_ts, event_type AS last_type FROM (
             |  SELECT user_id, ts, event_type,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY user_id""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q10 — multi-way inner join w/ broadcast dims (E4/E6). nation/region
    // are broadcast explicitly; customer/orders are left to AQE.
    Declared(
      "q10_join_revenue",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
          .groupBy("r_name")
          .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(25, 8)))
            .cast(DecimalType(25, 4)).cast("double").as("revenue"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name,
             |       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,8))) AS DECIMAL(25,4)) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey  = o_orderkey
             |JOIN customer ON o_custkey   = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q11 — TPC-H Q1-style aggregation (D8: partial+final hash agg)
    Declared(
      "q11_tpch_q1",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            (dsum($"l_discount") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"),
          )
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_qty,
             |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_base_price,
             |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DECIMAL(25,4)) AS DOUBLE) / COUNT(*) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q12 — ranking window functions (F4)
    Declared(
      "q12_window_rank",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
          .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, CAST(rn AS INT) AS rn FROM (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q13 — top-K (F5). Re-sorted after the limit so the written row order
    // is guaranteed regardless of the physical take-ordered plan.
    Declared(
      "q13_topk",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select("o_orderkey", "o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(10)
          .orderBy($"o_totalprice".desc, $"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q14 — tumbling time window (F6); 1-day windows align to UTC midnight,
    // i.e. date_trunc('day') in the oracle.
    Declared(
      "q14_tumbling_window",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy(window($"ts", "1 day").as("w"))
          .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
          .select($"w.start".as("day"), $"n_events", $"sum_value")
          .orderBy("day")
      },
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             |       COUNT(*) AS n_events,
             |       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY day""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q15 — session window, 30-minute gap (F6 [NS]). Spark's session_window
    // is half-open [first, last+gap): an event at exactly last+gap starts a
    // new session, hence `>=` in the oracle's gaps-and-islands emulation.
    Declared(
      "q15_session_window",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id", $"w.start".as("session_start"), $"n_events")
          .orderBy("user_id", "session_start")
      },
      Some("""WITH x AS (
             |  SELECT user_id, event_id, ts,
             |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |y AS (
             |  SELECT user_id, ts,
             |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                        ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM x)
             |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
             |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q16 — JSON extraction (C9/C13: op.value.id access)
    Declared(
      "q16_json_extract",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(sum($"k").as("sum_k"), count($"k").as("n_with_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n_with_k FROM (
             |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |  FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q17a — string scalars (C3 regexp_replace, C12 initcap). DuckDB lacks
    // initcap, so the oracle emulates it word-by-word.
    Declared(
      "q17a_string_scalars",
      (s, dir) => {
        import s.implicits._
        Tables.documentsRaw(s, dir)
          .select(
            $"doc_id",
            initcap(regexp_replace($"lang", "_", " ")).as("lang_cap"),
            regexp_replace($"source", "^src", "source_").as("src_norm"),
            substring($"text", 1, 20).as("head20"),
            length($"text").as("text_len"),
          )
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  array_to_string(list_transform(string_split(replace(lang, '_', ' '), ' '),
             |    w -> CASE WHEN len(w) = 0 THEN '' ELSE upper(w[1]) || lower(w[2:]) END), ' ') AS lang_cap,
             |  regexp_replace(source, '^src', 'source_') AS src_norm,
             |  substring(text, 1, 20) AS head20,
             |  CAST(len(text) AS INT) AS text_len
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q17b — date/time scalars (C15 time parse & diff). unix_timestamp
    // floors to seconds; oracle uses integer floor-division of epoch_us.
    Declared(
      "q17b_date_scalars",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .select(
            $"event_id",
            date_trunc("hour", $"ts").as("ts_hour"),
            datediff($"ts".cast("date"), lit("2024-01-01").cast("date")).as("days_since"),
            (unix_timestamp($"ts") - lit(1704067200L)).as("secs_since"),
          )
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
             |  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since,
             |  epoch_us(ts) // 1000000 - 1704067200 AS secs_since
             |FROM events ORDER BY event_id""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q30 — rollup / grouping sets (D9): subtotals + grand total over
    // (returnflag, linestatus). NULL group keys are coalesced to 'ALL' so
    // ordering and hashing are engine-agnostic.
    Declared(
      "q30_rollup",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .rollup("l_returnflag", "l_linestatus")
          .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
          .select(
            coalesce($"l_returnflag", lit("ALL")).as("rflag"),
            coalesce($"l_linestatus", lit("ALL")).as("lstatus"),
            $"sum_qty", $"n")
          .orderBy("rflag", "lstatus")
      },
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
             |       COALESCE(l_linestatus, 'ALL') AS lstatus,
             |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DECIMAL(25,4)) AS DOUBLE) AS sum_qty,
             |       COUNT(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY rflag, lstatus""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q31 — intersect-all / except-all (E7): multiset semantics over the
    // per-user event-type bags.
    Declared(
      "q31_multiset_ops",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val err = ev.filter($"event_type" === "error").select("user_id")
        val pur = ev.filter($"event_type" === "purchase").select("user_id")
        err.intersectAll(pur).groupBy("user_id").agg(count(lit(1)).as("n"))
          .withColumn("tag", lit("intersect_all"))
          .unionByName(
            err.exceptAll(pur).groupBy("user_id").agg(count(lit(1)).as("n"))
              .withColumn("tag", lit("except_all")))
          .orderBy("tag", "user_id")
      },
      Some("""SELECT user_id, COUNT(*) AS n, 'intersect_all' AS tag FROM (
             |  SELECT user_id FROM events WHERE event_type = 'error'
             |  INTERSECT ALL
             |  SELECT user_id FROM events WHERE event_type = 'purchase')
             |GROUP BY user_id
             |UNION ALL
             |SELECT user_id, COUNT(*) AS n, 'except_all' AS tag FROM (
             |  SELECT user_id FROM events WHERE event_type = 'error'
             |  EXCEPT ALL
             |  SELECT user_id FROM events WHERE event_type = 'purchase')
             |GROUP BY user_id
             |ORDER BY tag, user_id""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q32 — window frame specs (F4): 3-row sliding sum + running count per
    // customer over order history.
    Declared(
      "q32_sliding_frame",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, dir)
          .select(
            $"o_custkey", $"o_orderkey",
            sum($"o_totalprice".cast(DecimalType(25, 6)))
              .over(w.rowsBetween(-2, 0)).cast("double").as("sliding_sum"),
            count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("running_n"),
          )
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
             |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding_sum,
             |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q37 — as-of (point-in-time) join: each click gets the latest error by
    // the same user at or before its timestamp. Spark has no ASOF JOIN;
    // graft.ops.AsOfJoin is the scale-safe union+keyed-window form (one
    // shuffle of |L|+|R| rows, no pair explosion). The oracle mirrors the
    // union trick — deterministic tie semantics (same-ts errors count as
    // "at or before"; among them the greatest event_id wins), unlike native
    // ASOF JOIN whose equal-timestamp pick is unspecified.
    Declared(
      "q37_asof_join",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val clicks = ev.filter($"event_type" === "click")
          .select("event_id", "user_id", "ts")
        val errors = ev.filter($"event_type" === "error")
          .select("user_id", "ts", "event_id", "value")
        graft.ops.AsOfJoin.lastAtOrBefore(
            clicks, errors,
            by = Seq("user_id"), ts = "ts", tie = "event_id",
            payload = Seq("event_id", "ts", "value"), prefix = "err_")
          .orderBy("event_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, ts, event_id, value,
             |         CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS side
             |  FROM events WHERE event_type IN ('click', 'error')),
             |m AS (
             |  SELECT *,
             |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w AS err_event_id,
             |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS err_ts,
             |    last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER w AS err_value
             |  FROM u
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id, ts, err_event_id, err_ts, err_value
             |FROM m WHERE side = 1 ORDER BY event_id""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // Q39 — exact percentiles (linear interpolation) of event value per
    // type. Exact percentile is inherently sort-heavy; the 100 TB path is
    // approx_percentile (t-digest sketch, map-side combinable), spec-pinned
    // to track these exact values within tolerance.
    Declared(
      "q39_percentiles",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            expr("percentile(value, 0.5D)").as("p50"),
            expr("percentile(value, 0.9D)").as("p90"),
            expr("percentile(value, 0.99D)").as("p99"),
          )
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
             |       quantile_cont(value, 0.5) AS p50,
             |       quantile_cont(value, 0.9) AS p90,
             |       quantile_cont(value, 0.99) AS p99
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
  )
}
