package graft.queries

import graft.core.Tables
import graft.operators.{Intervals, Windows}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function catalog (SURVEY.md §2.5). Oracle note: `events.ts` is
  * ns-precision in parquet; Spark sees µs (see Tables.events), so every
  * oracle references `CAST(ts AS TIMESTAMP)` to truncate DuckDB to the same
  * µs values.
  */
object WindowQueries {

  val queries: Map[String, Q] = Map(
    // W2 dedup-latest — the servicenow SCD merge core
    // (ref: servicenow_api_extract.py:2334-2349).
    "w2_dedup_latest_event" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      Windows.dedupLatest(ev, Seq("user_id", "event_type"),
          Seq(col("ts"), col("event_id")))
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    },

    // W1 rank()==1 keep-ties rule selection (ref: bof_30_migrate.scala:79-81).
    "w1_rank_top_order_per_cust" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
      Windows.keepTopRanked(o, w)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    },

    // W5 cumulative sum over daily revenue (ref: usage_analysis.py:173-191).
    "w5_cumulative_daily_revenue" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("order_date"))
        .agg(dsum(col("o_totalprice")).as("daily_rev"))
      val w = Window.orderBy(col("order_date"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_rev", sum(dec(col("daily_rev"))).over(w).cast("double"))
        .orderBy("order_date")
    },

    // W4 LAG(expr, N) features (ref: automl_linearreg_process_stocks.py:
    // 220-285), replacing the reference's 10-way self-join J6 with one sort.
    "w4_lag_features" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("order_date"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      Windows.lagFeatures(daily, col("rev"), Seq(col("order_date")), Seq(1, 7), "rev_lag")
        .withColumn("rev_delta1",
          (dec(col("rev")) - dec(col("rev_lag1"))).cast("double"))
        .orderBy("order_date")
    },

    // W3 row_number sequencing (ref: automl…py:100 date rank).
    "w3_date_rank" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("order_date"))
        .agg(count(lit(1)).as("n_orders"))
      daily
        .withColumn("date_rank",
          row_number().over(Window.orderBy(col("order_date").desc)))
        .orderBy("order_date")
    },

    // W7 NTILE quartiles (ref: mlflow_pymatch_single_node.py:113-114).
    // Total order (acctbal, custkey) pinned so tile assignment is stable.
    // Computed via the range-partitioned global rank (Windows.scalableNtile)
    // — the oracle is plain NTILE(4), so a green row proves exact
    // equivalence without the single-task global-sort window.
    "w7_ntile_quartiles" -> { (s, dir) =>
      Windows.scalableNtile(Tables.customer(s, dir),
          Seq(col("c_acctbal"), col("c_custkey")), 4, "quartile")
        .groupBy("quartile")
        .agg(count(lit(1)).as("n"),
             dsum(col("c_acctbal")).as("total_bal"))
        .orderBy("quartile")
    },

    // W8 gaps-and-islands interval collapse, sweep-line form
    // (ref: overlap_query_no_recursive_cte_needed.sql:65-108; golden pair).
    // Orders become [date, date+3] intervals per customer, merged when
    // overlapping or abutting within 1 day.
    "w8_interval_collapse" -> { (s, dir) =>
      val iv = Tables.orders(s, dir).select(
        col("o_custkey"),
        to_date(col("o_orderdate")).as("begin_dt"),
        date_add(to_date(col("o_orderdate")), 3).as("end_dt"))
      Intervals.collapse(iv, Seq("o_custkey"), "begin_dt", "end_dt", gapDays = 1)
        .orderBy("o_custkey", "begin_dt")
    },

    // W6 RANGE BETWEEN time frame with approx_count_distinct — the HLL
    // sketch itself is not cross-engine hashable, so the row carries its
    // own tolerance proof: both the HLL and the exact windowed distinct
    // run over the identical frame, and `hll_ok` asserts every window's
    // absolute error stays within 3 + 3·rsd·exact (integer quantization
    // plus a 3-sigma band at the sketch's default rsd of 0.05; measured
    // max error is 1 at sf0.01 and 3 at sf0.1). The oracle computes the
    // exact frame and a literal TRUE — the row is fully hash-matchable
    // while still executing the HLL path
    // (ref: windowed_lagN_awskms_postgres_date_partition.py:138-147).
    // The proof runs on the first week of the corpus (same bounded-drain
    // pattern as st_tumbling_watermark): the HLL-vs-exact tolerance is a
    // property of the sketch, not of the slice length, and the exact
    // windowed-distinct semantics already carry a full-frame oracle in
    // w6c — re-proving them here on the full frame doubled the cost of
    // the catalog's most expensive dual-computation row.
    "w6_sliding_approx_distinct" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .filter(col("ts") < "2024-01-08")
        .withColumn("ts_sec", expr("ts_ns div 1000000000"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts_sec"))
        .rangeBetween(-600, 0)
      ev.withColumn("hll_10m", approx_count_distinct(col("user_id")).over(w))
        .withColumn("exact_10m",
          size(collect_set(col("user_id")).over(w)).cast("long"))
        .groupBy("event_type")
        .agg(
          max(col("exact_10m")).as("peak_users_10m"),
          count(lit(1)).as("n"),
          (max(abs(col("hll_10m") - col("exact_10m")) -
            (lit(3.0) + lit(0.15) * col("exact_10m"))) <= lit(0.0))
            .as("hll_ok"))
        .orderBy("event_type")
    },

    // W6 exact-distinct twin: the same 10-minute RANGE frame as w6, but
    // with an EXACT windowed distinct count (size(collect_set)) so the
    // windowed-distinct semantics get a cross-engine oracle (DuckDB
    // COUNT(DISTINCT) over the identical RANGE frame); the HLL variant
    // above stays the rows-only approximate-capability row. Integer
    // `div` on ts_ns — a double division could round a boundary value
    // into the wrong second.
    "w6c_sliding_exact_distinct" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("ts_sec", expr("ts_ns div 1000000000"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts_sec"))
        .rangeBetween(-600, 0)
      ev.withColumn("users_10m",
          size(collect_set(col("user_id")).over(w)).cast("long"))
        .select("event_id", "event_type", "ts_sec", "users_10m")
        .orderBy("event_id")
    },

    // W6 exact twin: RANGE BETWEEN INTERVAL time frame with a
    // decimal-exact sliding sum — same frame as w6 but fully oracleable
    // (DuckDB runs the identical RANGE frame over the same timestamps).
    "w6b_sliding_range_sum" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("sliding_sum", expr(
          """CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
            |  PARTITION BY event_type ORDER BY ts
            |  RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
            |) AS DOUBLE)""".stripMargin))
        .select("event_id", "event_type", "sliding_sum")
        .orderBy("event_id")
    },

    // W6 two-level scalable twin: the SAME 10-minute sliding sum as
    // w6b/w6c, but through Windows.slidingRangeSum — per-(type, second)
    // hash aggregate first (the only whole-relation shuffle, fully
    // parallel), keyed RANGE window over the collapsed per-second frame
    // (bounded by distinct seconds, not rows), join back per event. The
    // 100 TB answer to a 5-key window: SCALING.md ×100 measured the
    // direct form at 22.6× (five tasks carry everything); this form's
    // window frame stays 86 400 rows/key/day at any corpus size.
    "w6d_sliding_sum_scalable" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("ts_sec", expr("ts_ns div 1000000000"))
      Windows.slidingRangeSum(ev, Seq("event_type"), "ts_sec",
          dec(col("value")), 600L, "__ss")
        .select(col("event_id"), col("event_type"),
          col("__ss").cast("double").as("sliding_sum"))
        .orderBy("event_id")
    },

    // W6 two-level scalable exact-DISTINCT twin: the SAME 10-minute frame
    // and answer as w6c, but through Windows.slidingDistinctCount —
    // coverage-interval deltas per (type, user) occurrence run, running
    // sum over the collapsed per-second frame, join back per event.
    // Distinct counts don't decompose into per-tick partials the way w6d's
    // sums do, so this is the missing scalable form for the family: the
    // direct collect_set frame measured 26× at ×100 twins (five keyed
    // tasks re-scan a copy-proportional set per row), while every stage
    // here is bounded by distinct occurrences and distinct ticks.
    "w6e_sliding_distinct_scalable" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("ts_sec", expr("ts_ns div 1000000000"))
      Windows.slidingDistinctCount(ev, Seq("event_type"), "ts_sec",
          "user_id", 600L, "users_10m")
        .select(col("event_id"), col("event_type"), col("ts_sec"),
          col("users_10m").cast("long").as("users_10m"))
        .orderBy("event_id")
    },

    // first/last/nth over an unbounded frame: per user the first,
    // second, and last event type — the named-position window family
    // (first_value / nth_value / last_value) in one partitioned pass.
    "w10_first_last" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("first_type", first(col("event_type")).over(frame))
        .withColumn("second_type", nth_value(col("event_type"), 2).over(frame))
        .withColumn("last_type", last(col("event_type")).over(frame))
        .withColumn("__rn", row_number().over(seq))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("first_type"), col("second_type"),
          col("last_type"))
        .orderBy(col("user_id"))
    },

    // W11 percent_rank / cume_dist: relative-position statistics per
    // partition — a total tiebreaker makes both exact rationals, so the
    // IEEE division is bit-identical across engines. The window is
    // business-key partitioned (one shuffle, no global sort); the thin
    // filter runs after it, as it must.
    "w11_percent_rank" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .filter(col("c_custkey") % 100 === 0)
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },

    // Date-spine resample: a sparse daily series (1/997 of events)
    // zero-filled over the FULL min-max day range of the fact — the
    // gap-filling join every reporting pipeline needs. The spine is one
    // sequence-explode of a 2-value aggregate (metadata-sized), the
    // daily agg shuffles only the sparse subset, and the fill join is
    // broadcast — nothing here scales with the fact beyond the one agg.
    "w9_date_spine" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_id"), col("value"))
      val daily = ev.filter(col("event_id") % 997 === 0)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
      val spine = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("value_sum"), lit(0.0)).as("value_sum"))
        .orderBy(col("day"))
    },

    // W12 linear interpolation over the spine: sparse daily observations
    // → nearest known value before/after (ignoreNulls frame edges) →
    // lerp by day distance; spine edges clamp to the nearest
    // observation. The windows are global but run over the
    // POST-AGGREGATION day frame (≤ one row per day — the documented
    // small-global-window pattern, same as w5/w9), never the fact table.
    "w12_interpolate" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_id"), col("value"))
      val daily = ev.filter(col("event_id") % 997 === 0)
        .groupBy(col("day")).agg(dsum(col("value")).as("obs"))
      val spine = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val before = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val after = Window.orderBy(col("day"))
        .rowsBetween(0, Window.unboundedFollowing)
      spine.join(daily, Seq("day"), "left")
        .withColumn("prev_day", last(when(col("obs").isNotNull, col("day")),
          ignoreNulls = true).over(before))
        .withColumn("prev_obs", last(col("obs"), ignoreNulls = true).over(before))
        .withColumn("next_day", first(when(col("obs").isNotNull, col("day")),
          ignoreNulls = true).over(after))
        .withColumn("next_obs", first(col("obs"), ignoreNulls = true).over(after))
        .withColumn("interp",
          when(col("obs").isNotNull, col("obs"))
            .when(col("prev_obs").isNull, col("next_obs"))
            .when(col("next_obs").isNull, col("prev_obs"))
            .otherwise(col("prev_obs") +
              (col("next_obs") - col("prev_obs")) *
                datediff(col("day"), col("prev_day")) /
                datediff(col("next_day"), col("prev_day"))))
        .select(col("day"), col("obs"), col("interp"))
        .orderBy(col("day"))
    }
  )

  val oracle: Map[String, String] = Map(
    "w10_first_last" ->
      """WITH v AS (
        |  SELECT user_id,
        |    first_value(event_type) OVER w AS first_type,
        |    nth_value(event_type, 2) OVER w AS second_type,
        |    last_value(event_type) OVER w AS last_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, first_type, second_type, last_type
        |FROM v WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "w11_percent_rank" ->
      """WITH v AS (
        |  SELECT c_mktsegment, c_custkey,
        |    PERCENT_RANK() OVER w AS pr,
        |    CUME_DIST() OVER w AS cd
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment
        |               ORDER BY c_acctbal, c_custkey))
        |SELECT c_mktsegment, c_custkey, pr, cd
        |FROM v WHERE c_custkey % 100 = 0
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "w9_date_spine" ->
      s"""WITH b AS (
         |  SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS lo,
         |         CAST(date_trunc('day', MAX(ts)) AS DATE) AS hi
         |  FROM events),
         |spine AS (
         |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
         |  FROM b),
         |daily AS (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |    COUNT(*) AS n, ${sqlDsum("value")} AS value_sum
         |  FROM events WHERE event_id % 997 = 0 GROUP BY 1)
         |SELECT s.day, COALESCE(d.n, 0) AS n,
         |  COALESCE(d.value_sum, 0.0) AS value_sum
         |FROM spine s LEFT JOIN daily d ON s.day = d.day
         |ORDER BY s.day""".stripMargin,

    // identical lerp parenthesization (prev + (next-prev)*d1/d2) so the
    // IEEE operation sequence matches Spark's bit for bit
    "w12_interpolate" ->
      s"""WITH b AS (
         |  SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS lo,
         |         CAST(date_trunc('day', MAX(ts)) AS DATE) AS hi
         |  FROM events),
         |spine AS (
         |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
         |  FROM b),
         |daily AS (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |    ${sqlDsum("value")} AS obs
         |  FROM events WHERE event_id % 997 = 0 GROUP BY 1),
         |j AS (
         |  SELECT s.day, d.obs,
         |    last_value(CASE WHEN d.obs IS NOT NULL THEN s.day END IGNORE NULLS)
         |      OVER wb AS prev_day,
         |    last_value(d.obs IGNORE NULLS) OVER wb AS prev_obs,
         |    first_value(CASE WHEN d.obs IS NOT NULL THEN s.day END IGNORE NULLS)
         |      OVER wa AS next_day,
         |    first_value(d.obs IGNORE NULLS) OVER wa AS next_obs
         |  FROM spine s LEFT JOIN daily d ON s.day = d.day
         |  WINDOW
         |    wb AS (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wa AS (ORDER BY s.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT day, obs,
         |  CASE
         |    WHEN obs IS NOT NULL THEN obs
         |    WHEN prev_obs IS NULL THEN next_obs
         |    WHEN next_obs IS NULL THEN prev_obs
         |    ELSE prev_obs + (next_obs - prev_obs)
         |      * CAST(day - prev_day AS INT) / CAST(next_day - prev_day AS INT)
         |  END AS interp
         |FROM j ORDER BY day""".stripMargin,
    "w2_dedup_latest_event" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, value FROM ranked WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "w1_rank_top_order_per_cust" ->
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice FROM ranked WHERE rk = 1
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w5_cumulative_daily_revenue" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS order_date,
         |    ${sqlDsum("o_totalprice")} AS daily_rev
         |  FROM orders GROUP BY 1)
         |SELECT order_date, daily_rev,
         |  CAST(SUM(CAST(daily_rev AS DECIMAL(18,6))) OVER (ORDER BY order_date
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev
         |FROM daily ORDER BY order_date""".stripMargin,

    "w4_lag_features" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS order_date,
         |    ${sqlDsum("o_totalprice")} AS rev
         |  FROM orders GROUP BY 1)
         |SELECT order_date, rev,
         |  LAG(rev, 1) OVER (ORDER BY order_date) AS rev_lag1,
         |  LAG(rev, 7) OVER (ORDER BY order_date) AS rev_lag7,
         |  CAST(CAST(rev AS DECIMAL(18,6)) -
         |       CAST(LAG(rev, 1) OVER (ORDER BY order_date) AS DECIMAL(18,6))
         |       AS DOUBLE) AS rev_delta1
         |FROM daily ORDER BY order_date""".stripMargin,

    "w3_date_rank" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT order_date, n_orders,
        |  ROW_NUMBER() OVER (ORDER BY order_date DESC) AS date_rank
        |FROM daily ORDER BY order_date""".stripMargin,

    "w7_ntile_quartiles" ->
      s"""WITH t AS (
         |  SELECT c_acctbal,
         |    NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
         |  FROM customer)
         |SELECT quartile, COUNT(*) AS n, ${sqlDsum("c_acctbal")} AS total_bal
         |FROM t GROUP BY quartile ORDER BY quartile""".stripMargin,

    "w6_sliding_approx_distinct" ->
      """WITH t AS (
        |  SELECT event_type,
        |    COUNT(DISTINCT user_id) OVER (
        |      PARTITION BY event_type ORDER BY (epoch_ns(ts) // 1000000000)
        |      RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
        |    ) AS exact_10m
        |  FROM events WHERE ts < TIMESTAMP '2024-01-08')
        |SELECT event_type, MAX(exact_10m) AS peak_users_10m,
        |  COUNT(*) AS n, TRUE AS hll_ok
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    "w6c_sliding_exact_distinct" ->
      """SELECT event_id, event_type,
        |  epoch_ns(ts) // 1000000000 AS ts_sec,
        |  COUNT(DISTINCT user_id) OVER (
        |    PARTITION BY event_type ORDER BY (epoch_ns(ts) // 1000000000)
        |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
        |  ) AS users_10m
        |FROM events ORDER BY event_id""".stripMargin,

    "w6b_sliding_range_sum" ->
      """SELECT event_id, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY event_type ORDER BY ts
        |    RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW
        |  ) AS DOUBLE) AS sliding_sum
        |FROM events ORDER BY event_id""".stripMargin,

    "w6e_sliding_distinct_scalable" ->
      """SELECT event_id, event_type,
        |  epoch_ns(ts) // 1000000000 AS ts_sec,
        |  COUNT(DISTINCT user_id) OVER (
        |    PARTITION BY event_type ORDER BY (epoch_ns(ts) // 1000000000)
        |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
        |  ) AS users_10m
        |FROM events ORDER BY event_id""".stripMargin,

    "w6d_sliding_sum_scalable" ->
      """SELECT event_id, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY event_type ORDER BY (epoch_ns(ts) // 1000000000)
        |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
        |  ) AS DOUBLE) AS sliding_sum
        |FROM events ORDER BY event_id""".stripMargin,

    // DISTINCT intervals: a duplicate (custkey, date) order makes the
    // two window operators' (b, e) tie orders independent, so the
    // island-break flag can land mid-tie-group and glue two islands
    // together (observed once in 1.47M rows on the ×10 twin board —
    // the same tie-order defect class as st_session_window's replica;
    // Spark's sweep was the correct side). A duplicate interval is
    // wholly contained, so DISTINCT changes no island and makes the
    // ORDER BY unique.
    "w8_interval_collapse" ->
      """WITH iv AS (
        |  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS b,
        |         CAST(o_orderdate AS DATE) + 3 AS e
        |  FROM orders),
        |m AS (
        |  SELECT o_custkey, b, e,
        |    MAX(e) OVER (PARTITION BY o_custkey ORDER BY b, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv),
        |f AS (
        |  SELECT o_custkey, b, e,
        |    CASE WHEN pme IS NULL OR b > pme + 1 THEN 1 ELSE 0 END AS flag
        |  FROM m),
        |g AS (
        |  SELECT o_custkey, b, e,
        |    SUM(flag) OVER (PARTITION BY o_custkey ORDER BY b, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM f)
        |SELECT o_custkey, MIN(b) AS begin_dt, MAX(e) AS end_dt
        |FROM g GROUP BY o_custkey, grp
        |ORDER BY o_custkey, begin_dt""".stripMargin
  )
}
