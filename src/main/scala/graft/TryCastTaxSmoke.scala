package graft

import org.apache.spark.sql.functions._

/** Measures the TRY-cast exception tax per target family (r16 verdict
  * item 2's adoption gate: "adopt only if ... a BenchOne A/B shows the
  * tax"). Two arms over the same scan of N/2 always-failing + N/2
  * parsing strings, arm construction per family:
  *
  *   - INTEGRAL targets (where TryCastNoThrowRule rewrites): rule on vs
  *     rule off via `spark.sql.optimizer.excludedRules` (injected rules
  *     live in the operator-optimization batches, where the exclusion
  *     conf applies — a per-query A/B switch inside one JVM). Measured
  *     r17: int 16.1× — the formatted SparkNumberFormatException per
  *     failing row is real.
  *   - TEMPORAL targets (where the rule deliberately does NOT rewrite —
  *     this drill is why): the unrewritten `try_cast` vs the plain
  *     LEGACY cast it could be rewritten to (value-identical per the
  *     PlanAuditSpec battery; the session is non-ANSI so `cast` IS the
  *     LEGACY form). This arm pair needs no optimizer switch, so it
  *     keeps working — and stays re-runnable as the adoption gate —
  *     whether or not the rewrite is ever adopted. Measured r17:
  *     date/timestamp 1.1× (13 ms on 1M failing rows, noise-level):
  *     Spark 4.1's temporal TRY cast nulls via the Option parser
  *     without constructing a per-row exception, so the rewrite was
  *     refuted and NOT adopted.
  *
  * Usage: runMain graft.TryCastTaxSmoke [nRows] [date|timestamp|int|...]
  */
object TryCastTaxSmoke {
  private val Integral = Set("tinyint", "smallint", "int", "bigint",
    "float", "double", "boolean")

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val target = if (args.length > 1) args(1) else "date"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-trycast-tax")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_trycast_tax"
    spark.range(n)
      .selectExpr(
        "CASE WHEN id % 2 = 0 THEN concat('bad-', id) " +
          "ELSE concat('2024-01-0', 1 + id % 9) END AS s")
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val excludeKey = "spark.sql.optimizer.excludedRules"
    // (label, expression, must plan a surviving try_cast?, conf setup)
    val arms: Seq[(String, String, Boolean, () => Unit)] =
      if (Integral(target)) Seq(
        ("rule-off", s"try_cast(s AS $target)", true,
          () => spark.conf.set(excludeKey, "graft.plans.TryCastNoThrowRule")),
        ("rule-on", s"try_cast(s AS $target)", false,
          () => spark.conf.unset(excludeKey)))
      else Seq(
        ("try", s"try_cast(s AS $target)", true, () => ()),
        ("legacy", s"cast(s AS $target)", false, () => ()))
    def run(label: String, exprSql: String, expectTry: Boolean,
            setup: () => Unit): Double = {
      setup()
      // sanity: the arm really plans what its label claims
      val plan = df.selectExpr(s"$exprSql AS v")
        .queryExecution.executedPlan.toString.toLowerCase
      require(plan.contains("try_cast") == expectTry,
        s"arm $label: unexpected plan (try_cast present=${!expectTry} wanted)")
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        df.selectExpr(s"$exprSql AS v").agg(count(col("v"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.drop(1).min // first run carries JIT
      println(f"[trycasttax] $label%-10s best=$best%7.3f s  " +
        f"runs=${times.map(t => f"$t%.3f").mkString(",")}")
      best
    }
    val slow = run(arms(0)._1, arms(0)._2, arms(0)._3, arms(0)._4)
    val fast = run(arms(1)._1, arms(1)._2, arms(1)._3, arms(1)._4)
    println(f"[trycasttax] target=$target rows=$n tax=${slow - fast}%.3f s " +
      f"(${slow / fast}%.1fx)")
    spark.stop()
  }
}
