package graft

/** Single-query profiler: times one catalog query (sort-stripped, noop
  * sink, after one untimed warm-up run) and prints its formatted physical
  * plan. Iteration tool for chasing bench outliers.
  *
  * Usage: runMain graft.BenchOne <queryName> [sfDir]
  *          [explain|noexplain|explainonly]
  * (`explainonly` prints the formatted plan WITHOUT executing — for
  * plan-shape diagnosis on boards too big to run casually)
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.length <= 2 || args(2) != "noexplain"
    val explainOnly = args.length > 2 && args(2) == "explainonly"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-bench-one")
    val fn = SparkEntry.queries(name)
    if (explainOnly) {
      org.apache.spark.sql.graft.GraftSql.stripTrailingSort(fn(spark, sfDir))
        .explain("formatted")
      spark.stop()
      return
    }
    def run(): Double = {
      val t0 = System.nanoTime()
      org.apache.spark.sql.graft.GraftSql.stripTrailingSort(fn(spark, sfDir))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val warm = run()
    val timed = (1 to 3).map(_ => run())
    if (doExplain)
      org.apache.spark.sql.graft.GraftSql.stripTrailingSort(fn(spark, sfDir))
        .explain("formatted")
    println(f"[benchone] $name warm=$warm%.3f timed=${timed.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
