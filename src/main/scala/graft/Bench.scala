package graft

/** Benchmark main — one JSON line with per-query wall seconds at the
  * SPARK_GRAFT_SF_DIR scale factor. Failed queries are reported in an
  * `errors` map (name → exception class) instead of being silently timed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-bench")
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // untimed warm-up: session init + codegen/JIT otherwise lands on the
    // alphabetically-first query's number
    try { SparkEntry.queries("a1_pricing_summary")(spark, sfDir)
            .write.format("noop").mode("overwrite").save() }
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        org.apache.spark.sql.graft.GraftSql.stripTrailingSort(fn(spark, sfDir))
          .write.format("noop").mode("overwrite").save()
      }
      catch { case e: Throwable => errors(name) = e.getClass.getSimpleName }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val ok = results.filterNot { case (k, _) => errors.contains(k) }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
