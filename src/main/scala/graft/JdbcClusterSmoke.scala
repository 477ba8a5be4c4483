package graft

import org.apache.spark.sql.functions._

/** Multi-JVM JDBC-scan drill — closes the one gap the local-cluster
  * verify board documents: the catalog's two JDBC rows use EMBEDDED
  * in-memory Derby, which is by definition a single-process database
  * (Spark's JDBC writer creates the table over a driver-side connection
  * and inserts over executor-side connections — with a per-JVM embedded
  * DB those are different databases, so the rows can only run on local
  * masters; Spark's own JDBCSuite has the same constraint).
  *
  * On a real cluster the endpoint is a NETWORK database. This drill
  * reproduces that topology in-container: the driver's session catalog
  * is served over a thrift JDBC endpoint (HiveThriftServer2 inside the
  * same app), and `JdbcIO.read` scans it with `partitionColumn` from
  * executor JVMs — real network hops, real per-task connections, real
  * pushed range+filter predicates (via [[graft.sources.SparkSqlDialect]]).
  * The aggregate over the JDBC scan must equal the same aggregate over
  * the parquet source directly.
  *
  * Usage: run-main.sh graft.JdbcClusterSmoke [sfDir]
  */
object JdbcClusterSmoke {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val port = 10123
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local-cluster[2,4,3072]")
      .appName("graft-jdbc-smoke")
      .config("spark.executor.extraClassPath",
        graft.core.GraftSession.executorClasses)
      .config("spark.executor.extraJavaOptions",
        graft.core.GraftSession.executorJavaOptions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_jdbc_smoke_wh")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("hive.server2.thrift.port", port.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.SparkSqlDialect.register()

    // the "database": customer staged into the session catalog, served
    // over thrift — the driver JVM is the DB server, executors are
    // network clients (exactly the production JDBC-source topology)
    graft.core.Tables.customer(spark, sfDir)
      .write.mode("overwrite").saveAsTable("customers")
    org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    // wait for the listener to come up
    var up = false
    var tries = 0
    while (!up && tries < 60) {
      try {
        new java.net.Socket("localhost", port).close(); up = true
      } catch { case _: Throwable => Thread.sleep(500); tries += 1 }
    }
    require(up, s"thrift endpoint :$port did not come up")

    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.hive.jdbc.HiveDriver")
    // partition bounds from the ACTUAL key range, so each of the 4 JDBC
    // partitions carries real rows at every scale factor (hardcoded
    // bounds would funnel all rows into one stride's partition elsewhere)
    val Array(bounds) = spark.table("customers")
      .agg(min(col("c_custkey")).as("lo"), max(col("c_custkey")).as("hi"))
      .collect()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val viaJdbc = graft.sources.JdbcIO.read(spark,
        s"jdbc:hive2://localhost:$port/default", "customers",
        partitionColumn = Some(("c_custkey", lo, hi + 1, 4)), props = props)
      .filter(col("c_acctbal") > 0.0)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).as("bal"))
      .orderBy(col("c_mktsegment"))
      .collect().map(_.toString).toSeq
    val direct = graft.core.Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 0.0)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).as("bal"))
      .orderBy(col("c_mktsegment"))
      .collect().map(_.toString).toSeq
    val ok = viaJdbc == direct && viaJdbc.nonEmpty
    println(s"[jdbcsmoke] partitioned network scan from executors: " +
      (if (ok) s"MATCH (${viaJdbc.size} groups)"
       else s"MISMATCH jdbc=$viaJdbc direct=$direct"))
    spark.stop()
    sys.exit(if (ok) 0 else 1)
  }
}
