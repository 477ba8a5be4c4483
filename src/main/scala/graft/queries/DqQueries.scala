package graft.queries

import graft.core.Tables
import graft.operators.DataQuality
import org.apache.spark.sql.functions._

/** Data-quality catalog (A9 + the dq_utils.py rule corpus). */
object DqQueries {

  val queries: Map[String, Q] = Map(
    // Violation audit rows: price-bounds rule over orders, exploded
    // row-per-column like the reference's MAP audit entries.
    "dq_audit_violations" -> { (s, dir) =>
      DataQuality.auditViolations(Tables.orders(s, dir),
          ruleName = "price_bounds",
          filterExpr = "o_totalprice > 400000.0 OR o_totalprice < 1000.0",
          idCol = "o_orderkey", cols = Seq("o_orderstatus", "o_totalprice"))
        .orderBy("row_id", "col_name")
    },

    // Per-column distinct profile of orders (the aggregate audit feed).
    "dq_distinct_profile" -> { (s, dir) =>
      DataQuality.distinctProfile(Tables.orders(s, dir),
          Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("col_name")
    },

    // New customer keys in the last order-week vs all time before.
    "dq_new_values" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val split = "2001-06-01"
      DataQuality.newValues(
          o.filter(col("o_orderdate") >= split),
          o.filter(col("o_orderdate") < split), "o_custkey")
        .orderBy("o_custkey")
    },

    // Per-feed freshness monitor: each event type's newest event vs the
    // table-wide newest, whole-hours lag, staleness flag at 24 h — the
    // standing "did every feed land?" check of a continuously-ingested
    // table. Exact integer lag (floor-divided epoch µs), so both engines
    // agree bit for bit.
    "dq_freshness" -> { (s, dir) =>
      DataQuality.freshness(Tables.events(s, dir),
          groupCol = "event_type", tsCol = "ts", maxLagHours = 24)
        .orderBy("event_type")
    },

    // Key reconciliation validator: lineitem orderkeys vs orders.
    "dq_reconcile_keys" -> { (s, dir) =>
      DataQuality.reconcileKeys(
        Tables.lineitem(s, dir), Tables.orders(s, dir),
        "l_orderkey", "o_orderkey")
    },

    // Multi-rule corpus into ONE audit log — the dq_check_for_target_
    // table.py shape (7 parameterized business rules all insert into the
    // shared audit table): rule instances differ only in table, filter,
    // and carried columns; rolled up per rule for a stable oracle.
    "dq_rule_corpus" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val log = DataQuality.auditViolations(o, "price_bounds",
          "o_totalprice > 400000.0 OR o_totalprice < 1000.0",
          "o_orderkey", Seq("o_totalprice"))
        .unionByName(DataQuality.auditViolations(o, "stale_open_order",
          "o_orderstatus = 'O' AND o_orderdate < '1993-01-01'",
          "o_orderkey", Seq("o_orderdate")))
        .unionByName(DataQuality.auditViolations(l, "qty_bounds",
          "l_quantity < 1.0 OR l_quantity > 49.0",
          "l_orderkey", Seq("l_quantity")))
      // keep zero-violation rules visible (the oracle's COUNT(*) arms
      // emit a 0 row; a bare groupBy would drop the absent group)
      import s.implicits._
      val rules = Seq("price_bounds", "stale_open_order", "qty_bounds")
        .toDF("rule_name")
      rules.join(
          log.groupBy(col("rule_name"))
            .agg(count(lit(1)).as("n_violations"),
              countDistinct(col("row_id")).as("n_rows")),
          Seq("rule_name"), "left")
        .select(col("rule_name"),
          coalesce(col("n_violations"), lit(0L)).as("n_violations"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"))
        .orderBy(col("rule_name"))
    },

    // Mixture-drift monitor (PSI — population stability index): the
    // event-type distribution of the newest window (ts ≥ Jan 24) vs the
    // reference period before it, per-category PSI terms
    // (p_cur − p_ref)·ln(p_cur/p_ref) in integer nano-units plus a
    // __TOTAL__ row (PSI > 0.2 is the standard drift alarm). ONE scan
    // builds both distributions via conditional aggregation; totals are
    // a broadcast 1-row cross join; the per-category float term is
    // floored at the category level so every sum is exact integer math.
    // The corpus-mix version of this (lang/source shares of a training
    // snapshot vs its predecessor) is the same plan over documents.
    "dq_mixture_drift" -> { (s, dir) =>
      val split = "2024-01-24"
      val byType = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(sum(when(col("ts") < lit(split), 1L).otherwise(0L)).as("n_ref"),
             sum(when(col("ts") >= lit(split), 1L).otherwise(0L)).as("n_cur"))
      val tot = byType.agg(sum(col("n_ref")).as("t_ref"),
        sum(col("n_cur")).as("t_cur"))
      // ε-smoothing (the standard PSI zero-cell fix): a category present
      // in only ONE window is the strongest drift signal — clamping its
      // proportion to ε keeps ln finite so it contributes (hugely, as it
      // should) instead of silently dropping out of __TOTAL__
      val eps = lit(1e-6)
      val terms = byType.crossJoin(broadcast(tot))
        .withColumn("p_ref", greatest(
          col("n_ref").cast("double") / col("t_ref").cast("double"), eps))
        .withColumn("p_cur", greatest(
          col("n_cur").cast("double") / col("t_cur").cast("double"), eps))
        .withColumn("psi_nano",
          floor((col("p_cur") - col("p_ref")) *
            log(col("p_cur") / col("p_ref")) * lit(1e9)).cast("long"))
        .select(col("event_type"), col("n_ref"), col("n_cur"), col("psi_nano"))
      val total = terms.agg(sum(col("n_ref")).as("n_ref"),
          sum(col("n_cur")).as("n_cur"), sum(col("psi_nano")).as("psi_nano"))
        .select(lit("__TOTAL__").as("event_type"), col("n_ref"),
          col("n_cur"), col("psi_nano"))
      terms.unionByName(total).orderBy(col("event_type"))
    },

    // Declarative expectation suite compiled into ONE aggregate pass —
    // six assertions (null rate, key uniqueness, value bounds, accepted
    // set, row count) evaluate in a single scan with map-side partials,
    // where naive per-assertion queries would scan the fact six times
    // (the shape that matters at 100 TB). Output: a row per expectation
    // with the observed metric and pass/fail.
    "dq_expectations" -> { (s, dir) =>
      import graft.operators.DataQuality.Expectation._
      DataQuality.expectationSuite(Tables.orders(s, dir), Seq(
          notNull("o_custkey"),
          unique("o_orderkey"),
          minAtLeast("o_totalprice", 0.0),
          maxAtMost("o_totalprice", 600000.0),
          valuesIn("o_orderstatus", Seq("O", "F", "P")),
          rowCountAtLeast(1000)))
        .orderBy("expectation")
    },

    // Winsorization: clip values to exact per-group [p05, p95] bounds
    // from the shared distribution-form quantile kernel
    // (operators/Quantiles — shuffles (group, value) pairs, never
    // buffers values; NULL values excluded for engine portability),
    // then report clip counts and the clipped sum. The bounds table is
    // groups-sized, so the clip join broadcasts.
    "dq_winsorize" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
        .filter(col("value").isNotNull)
      val bounds = graft.operators.Quantiles.distQuantiles(
        ev, "event_type", "value", Seq("lo" -> 0.05, "hi" -> 0.95))
      ev.join(broadcast(bounds), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("lo") || col("value") > col("hi"), 1)
            .otherwise(0)).cast("long").as("n_clipped"),
          dsum(least(greatest(col("value"), col("lo")), col("hi")))
            .as("clipped_sum"))
        .orderBy(col("event_type"))
    },

    // Robust outlier detection: median + MAD (median absolute
    // deviation) per group via TWO distribution-form quantile passes —
    // never a per-group sort, never a global window; the tiny stats
    // frames broadcast back. |x − med| > 3·MAD flags outliers the way
    // a z-score cannot when the outliers themselves inflate the stddev.
    // med/mad are actual data values (the distribution form returns
    // members, not interpolations), so both engines agree bit for bit.
    "dq_mad_outliers" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
        .filter(col("value").isNotNull)
      val med = graft.operators.Quantiles.distQuantiles(
        ev, "event_type", "value", Seq("med" -> 0.5))
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("value") - col("med")).as("__dev"))
      val mad = graft.operators.Quantiles.distQuantiles(
        dev, "event_type", "__dev", Seq("mad" -> 0.5))
      ev.join(broadcast(med), "event_type")
        .join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med"), col("mad"))
        .agg(count(lit(1)).as("n"),
          sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .select("event_type", "med", "mad", "n", "n_outliers")
        .orderBy("event_type")
    }
  )

  val oracle: Map[String, String] = Map(
    "dq_freshness" ->
      """WITH g AS (SELECT MAX(ts) AS gts FROM events),
        |latest AS (
        |  SELECT event_type, MAX(ts) AS latest_ts, COUNT(*) AS n_rows
        |  FROM events GROUP BY 1)
        |SELECT l.event_type, l.latest_ts, l.n_rows,
        |  (epoch_us(g.gts) - epoch_us(l.latest_ts)) // 3600000000 AS lag_hours,
        |  ((epoch_us(g.gts) - epoch_us(l.latest_ts)) // 3600000000) >= 24 AS stale
        |FROM latest l CROSS JOIN g
        |ORDER BY l.event_type""".stripMargin,

    "dq_audit_violations" ->
      """WITH flagged AS (
        |  SELECT * FROM orders
        |  WHERE o_totalprice > 400000.0 OR o_totalprice < 1000.0)
        |SELECT * FROM (
        |  SELECT 'price_bounds' AS rule_name, o_orderkey AS row_id,
        |    'o_orderstatus' AS col_name, CAST(o_orderstatus AS VARCHAR) AS col_value
        |  FROM flagged
        |  UNION ALL
        |  SELECT 'price_bounds', o_orderkey, 'o_totalprice',
        |    CAST(o_totalprice AS VARCHAR)
        |  FROM flagged)
        |ORDER BY row_id, col_name""".stripMargin,

    "dq_distinct_profile" ->
      """SELECT * FROM (
        |  SELECT 'o_custkey' AS col_name, COUNT(DISTINCT o_custkey) AS n_distinct FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', COUNT(DISTINCT o_orderpriority) FROM orders)
        |ORDER BY col_name""".stripMargin,

    "dq_new_values" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= '2001-06-01'
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < '2001-06-01'
        |ORDER BY o_custkey""".stripMargin,

    "dq_reconcile_keys" ->
      """WITH l AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        |r AS (SELECT DISTINCT o_orderkey AS k FROM orders)
        |SELECT
        |  CAST(SUM(CASE WHEN r.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_left,
        |  CAST(SUM(CASE WHEN l.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_right,
        |  CAST(SUM(CASE WHEN l.k IS NOT NULL AND r.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS common
        |FROM l FULL OUTER JOIN r ON l.k = r.k""".stripMargin,

    "dq_rule_corpus" ->
      """SELECT * FROM (
        |  SELECT 'price_bounds' AS rule_name, COUNT(*) AS n_violations,
        |    COUNT(DISTINCT o_orderkey) AS n_rows
        |  FROM orders WHERE o_totalprice > 400000.0 OR o_totalprice < 1000.0
        |  UNION ALL
        |  SELECT 'stale_open_order', COUNT(*), COUNT(DISTINCT o_orderkey)
        |  FROM orders WHERE o_orderstatus = 'O' AND o_orderdate < '1993-01-01'
        |  UNION ALL
        |  SELECT 'qty_bounds', COUNT(*), COUNT(DISTINCT l_orderkey)
        |  FROM lineitem WHERE l_quantity < 1.0 OR l_quantity > 49.0)
        |ORDER BY rule_name""".stripMargin,

    // same conditional-aggregation split on the µs-truncated timestamp
    // (CAST to TIMESTAMP matches Spark's µs view of the ns parquet);
    // identical left-assoc float sequence (diff · ln(ratio) · 1e9)
    "dq_mixture_drift" ->
      """WITH byt AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-24'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-24'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
        |         CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM byt),
        |terms AS (
        |  SELECT event_type, n_ref, n_cur,
        |    CAST(floor(
        |      (greatest(CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE), 1e-6)
        |        - greatest(CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE), 1e-6))
        |      * ln(greatest(CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE), 1e-6)
        |           / greatest(CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE), 1e-6))
        |      * 1e9) AS BIGINT) AS psi_nano
        |  FROM byt, tot)
        |SELECT * FROM (
        |  SELECT event_type, n_ref, n_cur, psi_nano FROM terms
        |  UNION ALL
        |  SELECT '__TOTAL__', CAST(SUM(n_ref) AS BIGINT),
        |    CAST(SUM(n_cur) AS BIGINT), CAST(SUM(psi_nano) AS BIGINT)
        |  FROM terms)
        |ORDER BY event_type""".stripMargin,

    // all six metrics from one aggregate over orders, unpivoted; the
    // doubles are exact (integer-valued or a single IEEE division both
    // engines perform identically)
    "dq_expectations" ->
      """WITH m AS (
        |  SELECT
        |    AVG(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS m0,
        |    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*) AS m1,
        |    CAST(MIN(o_totalprice) AS DOUBLE) AS m2,
        |    CAST(MAX(o_totalprice) AS DOUBLE) AS m3,
        |    CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
        |      AS DOUBLE) AS m4,
        |    CAST(COUNT(*) AS DOUBLE) AS m5
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'not_null:o_custkey' AS expectation, m0 AS observed,
        |    m0 >= 1.0 AS ok FROM m
        |  UNION ALL SELECT 'unique:o_orderkey', m1, m1 = 1.0 FROM m
        |  UNION ALL SELECT 'min:o_totalprice', m2, m2 >= 0.0 FROM m
        |  UNION ALL SELECT 'max:o_totalprice', m3, m3 <= 600000.0 FROM m
        |  UNION ALL SELECT 'values_in:o_orderstatus', m4, m4 = 0.0 FROM m
        |  UNION ALL SELECT 'row_count', m5, m5 >= 1000.0 FROM m)
        |ORDER BY expectation""".stripMargin,

    "dq_winsorize" ->
      s"""WITH hist AS (
         |  SELECT event_type, value, COUNT(*) AS cnt FROM events
         |  WHERE value IS NOT NULL GROUP BY 1, 2),
         |c AS (
         |  SELECT event_type, value,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
         |  FROM hist),
         |b AS (
         |  SELECT event_type,
         |    MIN(CASE WHEN cum >= ceil(0.05 * total) THEN value END) AS lo,
         |    MIN(CASE WHEN cum >= ceil(0.95 * total) THEN value END) AS hi
         |  FROM c GROUP BY 1)
         |SELECT e.event_type, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
         |  ${sqlDsum("least(greatest(e.value, b.lo), b.hi)")} AS clipped_sum
         |FROM events e JOIN b ON e.event_type = b.event_type
         |WHERE e.value IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same distribution-form member quantile as the engine (MIN value at
    // cum >= ceil(q·total)); CAST(3 AS DOUBLE) — a bare 3.0 would be
    // DECIMAL and change the comparison's type lattice
    "dq_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, value, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, value,
        |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY event_type) AS tot
        |  FROM h),
        |med AS (
        |  SELECT event_type,
        |    MIN(CASE WHEN cum >= ceil(0.5 * tot) THEN value END) AS med
        |  FROM c GROUP BY 1),
        |d AS (
        |  SELECT e.event_type, abs(e.value - med.med) AS dev
        |  FROM e JOIN med USING (event_type)),
        |hd AS (SELECT event_type, dev, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
        |cd AS (
        |  SELECT event_type, dev,
        |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY event_type) AS tot
        |  FROM hd),
        |mad AS (
        |  SELECT event_type,
        |    MIN(CASE WHEN cum >= ceil(0.5 * tot) THEN dev END) AS mad
        |  FROM cd GROUP BY 1)
        |SELECT e.event_type, med, mad, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN abs(e.value - med) > CAST(3 AS DOUBLE) * mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
  )
}
