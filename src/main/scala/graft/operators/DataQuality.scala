package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality rule engine (SURVEY.md §2 A9; ref:
  * dags/dataswm/utils/dq_utils.py:45-236).
  *
  * The reference's three DQ shapes, re-expressed over DataFrames:
  * violation audit rows (rule filter → MAP(col → value) + rule metadata),
  * per-column distinct profiles (the day-over-day reconciliation feed),
  * and new-values-since-yesterday EXCEPT checks. Everything is a plain
  * DataFrame program — filters and projections push into the scan, the
  * profile is one aggregate pass, no driver-side row handling.
  */
object DataQuality {

  /** Fluent builder mirroring the reference's DQBusinessCheckBuilder
    * (dq_utils.py:136-236): rows matching `filterExpr` become audit rows
    * carrying MAP(col name → value AS STRING) plus rule metadata. */
  final case class DqCheckBuilder(
      df: Option[DataFrame] = None,
      ruleName: String = "test",
      filterExpr: String = "true",
      cols: Seq[String] = Nil) {

    def setTable(d: DataFrame): DqCheckBuilder = copy(df = Some(d))
    def setRuleName(n: String): DqCheckBuilder = copy(ruleName = n)
    def setFilterExpr(e: String): DqCheckBuilder = copy(filterExpr = e)
    def setInsertCols(c: Seq[String]): DqCheckBuilder = copy(cols = c)

    /** The audit-log DataFrame: (data MAP<string,string>, rule_name). */
    def build(): DataFrame = {
      val base = df.getOrElse(throw new IllegalStateException("setTable first"))
      val kvs = cols.flatMap(c => Seq(lit(c), col(c).cast("string")))
      base.filter(expr(filterExpr))
        .select(map(kvs: _*).as("data"), lit(ruleName).as("rule_name"))
    }
  }

  def check: DqCheckBuilder = DqCheckBuilder()

  /** Violation audit rows in exploded (row-per-column) form — the
    * deterministic, engine-portable image of the MAP audit row. */
  def auditViolations(df: DataFrame, ruleName: String, filterExpr: String,
                      idCol: String, cols: Seq[String]): DataFrame = {
    val flagged = df.filter(expr(filterExpr))
    val arms = cols.map(c => flagged.select(
      lit(ruleName).as("rule_name"),
      col(idCol).cast("long").as("row_id"),
      lit(c).as("col_name"),
      col(c).cast("string").as("col_value")))
    arms.reduce(_.unionAll(_))
  }

  /** Per-column distinct-count profile, one row per column — the
    * reference's aggregate audit log (dq_utils.py:76-114; exact counts
    * rather than APPROX_DISTINCT so reconciliation is yes/no, not fuzzy;
    * swap in approx_count_distinct at trillion-row scale). */
  def distinctProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val agg = df.agg(
      countDistinct(col(cols.head)).as(cols.head),
      cols.tail.map(c => countDistinct(col(c)).as(c)): _*)
    val stacked = cols.map(c => s"'$c', `$c`").mkString(", ")
    agg.selectExpr(s"stack(${cols.size}, $stacked) AS (col_name, n_distinct)")
  }

  /** New distinct values of `valueCol` present in `today` but not in
    * `yesterday` (dq_utils.py USER_QUERY EXCEPT shape). */
  def newValues(today: DataFrame, yesterday: DataFrame, valueCol: String): DataFrame =
    today.select(valueCol).distinct()
      .except(yesterday.select(valueCol).distinct())

  /** Key reconciliation between two tables: rows only-in-left,
    * only-in-right, and common — the A9 count validator
    * (ref: from_api_call_to_columnar_db.py:686-703). One full-outer join
    * on the key, counted in a single pass. */
  def reconcileKeys(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = left.select(col(leftKey).as("__k")).distinct()
      .withColumn("__in_l", lit(1))
    val r = right.select(col(rightKey).as("__k")).distinct()
      .withColumn("__in_r", lit(1))
    l.join(r, Seq("__k"), "outer")
      .agg(
        sum(when(col("__in_l").isNotNull && col("__in_r").isNull, 1).otherwise(0))
          .as("only_left"),
        sum(when(col("__in_l").isNull && col("__in_r").isNotNull, 1).otherwise(0))
          .as("only_right"),
        sum(when(col("__in_l").isNotNull && col("__in_r").isNotNull, 1).otherwise(0))
          .as("common"))
  }

  /** One declarative expectation: `metric` is any aggregate expression
    * over the table; `check` turns the observed metric into pass/fail.
    * The suite compiles every expectation into ONE aggregate pass. */
  final case class Expectation(name: String, metric: Column,
                               check: Column => Column)

  object Expectation {
    /** Fraction of non-null values in `c` must be ≥ `minRate`. */
    def notNull(c: String, minRate: Double = 1.0): Expectation =
      Expectation(s"not_null:$c",
        avg(col(c).isNotNull.cast("int")), _ >= minRate)

    /** `c` must be unique across the table (distinct/total = 1). */
    def unique(c: String): Expectation =
      Expectation(s"unique:$c",
        countDistinct(col(c)).cast("double") / count(lit(1)), _ === 1.0)

    /** Minimum of `c` must be ≥ `lo`. */
    def minAtLeast(c: String, lo: Double): Expectation =
      Expectation(s"min:$c", min(col(c)).cast("double"), _ >= lo)

    /** Maximum of `c` must be ≤ `hi`. */
    def maxAtMost(c: String, hi: Double): Expectation =
      Expectation(s"max:$c", max(col(c)).cast("double"), _ <= hi)

    /** Count of values of `c` outside `allowed` must be 0. */
    def valuesIn(c: String, allowed: Seq[String]): Expectation =
      Expectation(s"values_in:$c",
        sum(when(col(c).isInCollection(allowed), 0).otherwise(1))
          .cast("double"), _ === 0.0)

    /** Total row count must be ≥ `n`. */
    def rowCountAtLeast(n: Long): Expectation =
      Expectation("row_count", count(lit(1)).cast("double"), _ >= n.toDouble)
  }

  /** Single-pass expectation suite: every metric evaluates in ONE
    * aggregate over the table (one scan, map-side partials — the shape
    * that holds at 100 TB; N separate assertion queries would scan the
    * fact N times), then the 1-row result unpivots to a row per
    * expectation: (expectation, observed DOUBLE, ok BOOLEAN). */
  def expectationSuite(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "expectationSuite needs at least one expectation")
    val metrics = exps.zipWithIndex.map { case (e, i) =>
      e.metric.cast("double").as(s"__m$i") }
    val agged = df.agg(metrics.head, metrics.tail: _*)
    // coalesce(ok, false): on an empty table avg/min/max/countDistinct
    // are NULL, and a NULL verdict would slip past any `ok = false`
    // consumer — an undefined metric FAILS its expectation (conservative)
    val rows = array(exps.zipWithIndex.map { case (e, i) =>
      struct(lit(e.name).as("expectation"),
        col(s"__m$i").as("observed"),
        coalesce(e.check(col(s"__m$i")), lit(false)).as("ok"))
    }: _*)
    agged.select(explode(rows).as("__r")).select(col("__r.*"))
  }

  /** In-flight metrics on a write: attach aggregate observations to the
    * frame, run the sink action, and return the metrics THE WRITE ITSELF
    * computed — zero extra scans. At 100 TB the naive pattern (write,
    * then re-read the sink to count/validate) re-scans the table once
    * per metric query; `Observation` piggybacks on the write's own pass
    * (accumulator-backed, exact for the completed action). Returns the
    * observed Row keyed by metric alias. */
  def observedWrite(df: DataFrame, metrics: Seq[Column])
                   (write: DataFrame => Unit): Map[String, Any] = {
    require(metrics.nonEmpty, "observedWrite needs at least one metric")
    val obs = org.apache.spark.sql.Observation()
    write(df.observe(obs, metrics.head, metrics.tail: _*))
    obs.get
  }

  /** Per-partition freshness monitor: each group's newest event time,
    * its whole-hours lag behind the table-wide newest, and a staleness
    * flag at `maxLagHours` — the standing "did every feed land?" check
    * of any continuously-ingested table. One aggregation; the global
    * maximum joins back as a broadcast scalar, so the fact scans once.
    * Lag is exact integer arithmetic (floor-divided epoch microseconds),
    * engine-portable by construction. */
  def freshness(df: DataFrame, groupCol: String, tsCol: String,
                maxLagHours: Int): DataFrame = {
    val latest = df.groupBy(col(groupCol))
      .agg(max(col(tsCol)).as("latest_ts"), count(lit(1)).as("n_rows"))
    val global = df.agg(max(col(tsCol)).as("__global_ts"))
    latest.crossJoin(broadcast(global))
      .withColumn("lag_hours",
        expr("(unix_micros(__global_ts) - unix_micros(latest_ts)) DIV 3600000000"))
      .select(col(groupCol), col("latest_ts"), col("n_rows"),
        col("lag_hours"), (col("lag_hours") >= maxLagHours).as("stale"))
  }
}
