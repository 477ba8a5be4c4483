package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Confs mirror the manual physical tuning observed across the reference
  * corpus (SURVEY.md §4): AQE on (supersedes the 16-way manual salt in
  * `sas_conversion_with_manual_salt_skewed_join.sql:23-27`), shuffle
  * partitions sized to the machine instead of the 200 default, UTC session
  * time zone for deterministic date semantics.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      // graft's native expressions (minhash/simhash) for SQL-string callers
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.ts is TIMESTAMP(NANOS) parquet, unreadable otherwise
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reference pipelines assume lenient Hive-style null-on-error casts
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
