package graft.queries

import graft.core.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2.11 ML wrapper — the deterministic linear-algebra half, oracled.
  *
  * The reference's pipeline (ref: notebooks/databricks/python/
  * automl_linearreg_process_stocks.py:460-545) is VectorAssembler → PCA →
  * PolynomialExpansion → GeneralizedLinearRegression(gaussian, identity).
  * The iterative GLR solver can't be oracled cross-engine, but its
  * gaussian/identity case IS ordinary least squares, which has a closed
  * form over five aggregate moments — and PCA's input is the feature
  * covariance matrix, which is pure aggregate arithmetic. Both halves are
  * computed here from exact DECIMAL(38,6) moment sums (order-insensitive,
  * bit-stable at any parallelism — the engine-wide dsum discipline, widened
  * to 38 digits because second moments of price-scale columns overflow
  * (18,6) already at sf0.01), with the final closed-form arithmetic done in
  * DOUBLE with an identical expression tree on both engines.
  *
  * CapabilitiesSpec ties these rows to the real ML pipeline: the GLR
  * coefficient matches the closed-form slope, and Spark PCA's
  * explainedVariance matches the eigen-spectrum of the covariance matrix
  * these aggregates produce.
  *
  * Scale: both rows are ONE map-side-combinable aggregate over the fact
  * table — no shuffle wider than the 3-group key (or a single global
  * group), no driver collect. The moments pattern is how a 1000-executor
  * fit actually works: ship Σx, Σy, Σxy, Σx², Σy² partials, solve on the
  * reduced frame.
  */
object MlQueries {

  /** Exact wide-decimal image of a per-row double expression (see
    * [[queries.dec]]; 38,6 because second moments need the headroom). */
  private def dec38(c: Column): Column = c.cast(DecimalType(38, 6))
  private def dsum38(c: Column): Column = sum(dec38(c)).cast("double")
  private def sqlDsum38(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(38,6))) AS DOUBLE)"

  val queries: Map[String, Q] = Map(
    // GLR(gaussian, identity) == OLS: fit y = a + b·x per return flag via
    // the normal equations over exact moment sums. slope/intercept/r2 are
    // the model summary the reference reads after fit.
    "ml_ols_closed_form" -> { (s, dir) =>
      val mom = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          col("l_quantity").as("x"), col("l_extendedprice").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("nd"),
          dsum38(col("x")).as("sx"),
          dsum38(col("y")).as("sy"),
          dsum38(col("x") * col("x")).as("sxx"),
          dsum38(col("x") * col("y")).as("sxy"),
          dsum38(col("y") * col("y")).as("syy"))
      // identical double expression tree as the SQL twin below
      val slope = (col("nd") * col("sxy") - col("sx") * col("sy")) /
        (col("nd") * col("sxx") - col("sx") * col("sx"))
      mom.select(
          col("l_returnflag"), col("nd").cast("long").as("n"),
          slope.as("slope"),
          ((col("sy") - slope * col("sx")) / col("nd")).as("intercept"),
          (((col("nd") * col("sxy") - col("sx") * col("sy")) *
            (col("nd") * col("sxy") - col("sx") * col("sy"))) /
           ((col("nd") * col("sxx") - col("sx") * col("sx")) *
            (col("nd") * col("syy") - col("sy") * col("sy")))).as("r2"))
        .orderBy(col("l_returnflag"))
    },

    // PCA input: the assembler's population covariance matrix (upper
    // triangle) + feature means over the §2.11 test's literal feature
    // set (f1 = o_orderkey % 97, f2 = o_custkey % 89, f3 = month).
    "ml_feature_covariance" -> { (s, dir) =>
      val feats = Tables.orders(s, dir).select(
        (col("o_orderkey") % 97).cast("double").as("f1"),
        (col("o_custkey") % 89).cast("double").as("f2"),
        month(col("o_orderdate")).cast("double").as("f3"))
      val mom = feats.agg(
        count(lit(1)).cast("double").as("nd"),
        dsum38(col("f1")).as("s1"), dsum38(col("f2")).as("s2"),
        dsum38(col("f3")).as("s3"),
        dsum38(col("f1") * col("f1")).as("s11"),
        dsum38(col("f1") * col("f2")).as("s12"),
        dsum38(col("f1") * col("f3")).as("s13"),
        dsum38(col("f2") * col("f2")).as("s22"),
        dsum38(col("f2") * col("f3")).as("s23"),
        dsum38(col("f3") * col("f3")).as("s33"))
      def cov(spq: Column, sp: Column, sq: Column): Column =
        (spq - sp * sq / col("nd")) / col("nd")
      mom.select(
        col("nd").cast("long").as("n"),
        (col("s1") / col("nd")).as("mean_f1"),
        (col("s2") / col("nd")).as("mean_f2"),
        (col("s3") / col("nd")).as("mean_f3"),
        cov(col("s11"), col("s1"), col("s1")).as("cov_11"),
        cov(col("s12"), col("s1"), col("s2")).as("cov_12"),
        cov(col("s13"), col("s1"), col("s3")).as("cov_13"),
        cov(col("s22"), col("s2"), col("s2")).as("cov_22"),
        cov(col("s23"), col("s2"), col("s3")).as("cov_23"),
        cov(col("s33"), col("s3"), col("s3")).as("cov_33"))
    },
  )

  val oracle: Map[String, String] = Map(
    "ml_ols_closed_form" ->
      s"""WITH mom AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS nd,
         |    ${sqlDsum38("l_quantity")} AS sx,
         |    ${sqlDsum38("l_extendedprice")} AS sy,
         |    ${sqlDsum38("l_quantity * l_quantity")} AS sxx,
         |    ${sqlDsum38("l_quantity * l_extendedprice")} AS sxy,
         |    ${sqlDsum38("l_extendedprice * l_extendedprice")} AS syy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, CAST(nd AS BIGINT) AS n,
         |  (nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope,
         |  (sy - (nd * sxy - sx * sy) / (nd * sxx - sx * sx) * sx) / nd
         |    AS intercept,
         |  ((nd * sxy - sx * sy) * (nd * sxy - sx * sy)) /
         |    ((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS r2
         |FROM mom ORDER BY l_returnflag""".stripMargin,

    "ml_feature_covariance" ->
      s"""WITH feats AS (
         |  SELECT CAST(o_orderkey % 97 AS DOUBLE) AS f1,
         |         CAST(o_custkey % 89 AS DOUBLE) AS f2,
         |         CAST(month(o_orderdate) AS DOUBLE) AS f3
         |  FROM orders),
         |mom AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
         |    ${sqlDsum38("f1")} AS s1, ${sqlDsum38("f2")} AS s2,
         |    ${sqlDsum38("f3")} AS s3,
         |    ${sqlDsum38("f1 * f1")} AS s11, ${sqlDsum38("f1 * f2")} AS s12,
         |    ${sqlDsum38("f1 * f3")} AS s13, ${sqlDsum38("f2 * f2")} AS s22,
         |    ${sqlDsum38("f2 * f3")} AS s23, ${sqlDsum38("f3 * f3")} AS s33
         |  FROM feats)
         |SELECT CAST(nd AS BIGINT) AS n,
         |  s1 / nd AS mean_f1, s2 / nd AS mean_f2, s3 / nd AS mean_f3,
         |  (s11 - s1 * s1 / nd) / nd AS cov_11,
         |  (s12 - s1 * s2 / nd) / nd AS cov_12,
         |  (s13 - s1 * s3 / nd) / nd AS cov_13,
         |  (s22 - s2 * s2 / nd) / nd AS cov_22,
         |  (s23 - s2 * s3 / nd) / nd AS cov_23,
         |  (s33 - s3 * s3 / nd) / nd AS cov_33
         |FROM mom""".stripMargin,
  )
}
