package graft

import org.apache.spark.sql.functions._

/** Measures the TRY-cast exception tax on temporal targets and the
  * TryCastNoThrowRule rewrite's effect (r16 verdict item 2's adoption
  * gate: "adopt only if ... a BenchOne A/B shows the tax").
  *
  * Two arms over the same scan of N always-failing + N parsing date
  * strings: the session default (rule rewrites TRY → LEGACY) vs the
  * same query with the rule disabled via
  * `spark.sql.optimizer.excludedRules` (injected rules live in the
  * operator-optimization batches, where the exclusion conf applies — a
  * per-query A/B switch inside one JVM, same JIT state). Rows where the
  * parse FAILS are where the arms diverge: the unrewritten TRY cast
  * constructs and catches a formatted SparkDateTimeException per row,
  * the LEGACY cast returns null from the same parser's None.
  *
  * Usage: runMain graft.TryCastTaxSmoke [nRows] [date|timestamp]
  */
object TryCastTaxSmoke {
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
    def run(label: String, exclude: Boolean): Double = {
      if (exclude)
        spark.conf.set(excludeKey, "graft.plans.TryCastNoThrowRule")
      else spark.conf.unset(excludeKey)
      // sanity: the arm really is (un)rewritten
      val plan = df.selectExpr(s"try_cast(s AS $target) AS v")
        .queryExecution.executedPlan.toString.toLowerCase
      require(plan.contains("try_cast") == exclude,
        s"arm $label: unexpected plan (try_cast present=${!exclude} wanted)")
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        df.selectExpr(s"try_cast(s AS $target) AS v")
          .agg(count(col("v"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.drop(1).min // first run carries JIT
      println(f"[trycasttax] $label%-10s best=$best%7.3f s  " +
        f"runs=${times.map(t => f"$t%.3f").mkString(",")}")
      best
    }
    val off = run("rule-off", exclude = true)
    val on = run("rule-on", exclude = false)
    println(f"[trycasttax] target=$target rows=$n tax=${off - on}%.3f s " +
      f"(${off / on}%.1fx)")
    spark.stop()
  }
}
