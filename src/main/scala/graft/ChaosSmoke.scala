package graft

import org.apache.spark.sql.functions._

/** Executor-loss chaos drill for [[graft.core.Materialize]] — the
  * observation behind the scaladoc's rationale, not just the argument:
  *
  *   1. `reliable` mode (scratch-parquet round trip) must SURVIVE losing
  *      an executor after the materialization: the data lives in shared
  *      storage, any surviving/relaunched executor re-reads it.
  *   2. `local` mode (`localCheckpoint`) must FAIL the same drill: the
  *      RDD blocks are stored unreplicated on the killed executor and
  *      lineage is truncated, so there is no recompute path. (The
  *      standalone worker relaunches the executor process, but the new
  *      JVM does not have the lost blocks — the job still dies.)
  *
  * Runs under `local-cluster[2,2,2048]` — two REAL executor JVMs, real
  * serialization and block-manager boundaries. The kill is a SIGKILL of
  * one CoarseGrainedExecutorBackend child process.
  *
  * Usage: run-main.sh graft.ChaosSmoke   (prints one [chaos] line per leg)
  */
object ChaosSmoke {

  /** Executor JVMs belonging to THIS application only: the standalone
    * executor launch command carries `--app-id <applicationId>`, so
    * filtering on it keeps the SIGKILL away from any unrelated Spark
    * app that happens to share the host. */
  private def executorPids(appId: String): Seq[Int] = {
    val procs = new java.io.File("/proc").listFiles()
      .filter(f => f.getName.forall(_.isDigit))
    procs.flatMap { p =>
      try {
        val cmd = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"/proc/${p.getName}/cmdline"))
        if (cmd.contains("CoarseGrainedExecutorBackend") &&
            cmd.contains(appId)) Some(p.getName.toInt)
        else None
      } catch { case _: Throwable => None }
    }.toSeq.sorted
  }

  private def killOneExecutor(appId: String): Int = {
    val pids = executorPids(appId)
    require(pids.nonEmpty, "no executor JVMs found to kill")
    val pid = pids.head
    Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
    // wait for the process to actually vanish before proceeding
    var tries = 0
    while (executorPids(appId).contains(pid) && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    pid
  }

  def main(args: Array[String]): Unit = {
    import graft.core.Materialize
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local-cluster[2,2,2048]")
      .appName("graft-chaos")
      .config("spark.executor.extraClassPath",
        graft.core.GraftSession.executorClasses)
      .config("spark.executor.extraJavaOptions",
        graft.core.GraftSession.executorJavaOptions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_chaos_warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // fail fast once the block is gone instead of retrying for minutes
      .config("spark.task.maxFailures", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val appId = spark.sparkContext.applicationId

    def someFrame(seed: Int) = spark.range(0, 2000000, 1, 8)
      .withColumn("k", pmod(hash(col("id") + lit(seed)), lit(1000)))
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("id")).as("s"))

    // Leg 1: reliable materialization survives executor loss.
    spark.conf.set(Materialize.ModeKey, "reliable")
    val reliable = Materialize(someFrame(1), eager = true)
    val killed1 = killOneExecutor(appId)
    val leg1 =
      try { val n = reliable.count(); s"SURVIVED n=$n" }
      catch { case e: Throwable => s"DIED ${e.getClass.getSimpleName}" }
    println(s"[chaos] reliable-mode after kill(pid=$killed1): $leg1")
    Materialize.releaseScratch(spark)

    // Leg 2: localCheckpoint dies with the executor that held its blocks.
    // Kill BOTH current executors to guarantee the block holder is gone
    // (blocks are unreplicated but their placement is scheduler-chosen).
    spark.conf.set(Materialize.ModeKey, "local")
    val local = Materialize(someFrame(2), eager = true)
    val pids = executorPids(appId)
    pids.foreach { pid =>
      Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
    }
    Thread.sleep(2000) // let the master notice; workers relaunch fresh JVMs
    val leg2 =
      try { val n = local.count(); s"SURVIVED n=$n (unexpected)" }
      catch { case e: Throwable => s"DIED ${e.getClass.getSimpleName}" }
    println(s"[chaos] local-mode (localCheckpoint) after kill(pids=$pids): $leg2")

    // Leg 3: the relaunched executors run a fresh reliable materialization
    // + consume end-to-end — the session itself stays usable after chaos.
    spark.conf.set(Materialize.ModeKey, "reliable")
    val again = Materialize(someFrame(3), eager = true)
    println(s"[chaos] post-chaos reliable run: n=${again.count()}")
    Materialize.releaseScratch(spark)

    // Leg 4: a partitioned JDBC scan over the network thrift endpoint
    // survives an executor SIGKILL mid-scan. Two failure surfaces at
    // once: the CLIENT-side scan tasks (each holding a JDBC connection)
    // are retried by the scheduler on surviving/relaunched JVMs, and the
    // SERVER-side statement jobs (each partition SELECT is a Spark job
    // inside the driver-hosted endpoint) lose their own tasks to the
    // same kill and retry too. 2 read partitions, not 4: the endpoint
    // executes server-side jobs on the same 4 cluster cores the client
    // tasks occupy, and a full-width scan would starve the server until
    // the worker relaunches the killed JVM.
    val url = graft.sources.ThriftEndpoint.ensure(spark)
    val tprops = graft.sources.ThriftEndpoint.clientProps()
    val src = spark.range(0, 200000, 1, 8)
      .select(col("id").as("k"), pmod(hash(col("id")), lit(997)).as("v"))
    graft.sources.JdbcIO.writeStatements(src, url, "chaos_scan",
      maxConnections = 1, rowsPerStatement = 5000, props = tprops)
    val want = src.agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .collect()(0)
    val scan = graft.sources.JdbcIO.read(spark, url, "chaos_scan",
        partitionColumn = Some(("k", 0L, 200000L, 2)), props = tprops)
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    val pending = new java.util.concurrent.CompletableFuture[org.apache.spark.sql.Row]()
    val t = new Thread(() =>
      try pending.complete(scan.collect()(0))
      catch { case e: Throwable => pending.completeExceptionally(e) })
    t.start()
    Thread.sleep(1500) // let partition tasks start before the kill
    val midFlight = !pending.isDone
    val killed4 = killOneExecutor(appId)
    val leg4 =
      try {
        val got = pending.get(180, java.util.concurrent.TimeUnit.SECONDS)
        val ok = got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1)
        s"${if (ok) "SURVIVED-EXACT" else s"WRONG got=$got want=$want"}" +
          s"${if (midFlight) "" else " (kill landed post-completion — inconclusive)"}"
      } catch { case e: Throwable => s"DIED ${e.getClass.getSimpleName}" }
    println(s"[chaos] thrift-jdbc scan after kill(pid=$killed4): $leg4")
    spark.stop()
  }
}
