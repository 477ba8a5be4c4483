package graft

import graft.pipelines.Dag
import org.apache.spark.sql.functions._

/** Chaos case for the §3.4 DAG runner: a stage is killed MID-WRITE (an
  * executor task throws while the sink job is running) and the DAG is
  * re-run — the reference's restart semantics
  * (`dags/dataswm/servicenow_api_extract.py:2220-2368`: a restarted run
  * must skip the extracts whose targets landed and re-run exactly the
  * stage that died, not the whole chain).
  *
  * The marker discipline under test: `doneWhen` gates on the sink's own
  * `_SUCCESS` file, which Spark's committer writes only after a job
  * COMMITS — a job that dies mid-write aborts its task attempts and
  * leaves no marker, so the resumed run can never false-cache a
  * partial output. (DagSpec covers the driver-side resume logic; this
  * suite proves it against a real Spark sink failure.)
  */
class DagChaosSpec extends SparkSpec {

  test("stage killed mid-write: resume skips landed stages, re-runs the partial one exactly once") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dag-chaos").toString
    val extractPath = s"$root/extract"
    val loadPath = s"$root/load"
    // executor-visible poison: tasks check the file, not a driver var —
    // the same mechanism works beyond local mode
    val poison = new java.io.File(root, "POISON")
    poison.createNewFile()
    var extractRuns = 0
    var loadRuns = 0
    def landed(p: String) = new java.io.File(p, "_SUCCESS").exists
    val poisonPath = poison.getAbsolutePath

    def build() = {
      val d = Dag("chaos")
      d.stage("extract", doneWhen = _ => landed(extractPath)) { _ =>
        extractRuns += 1
        spark.range(0, 1000).select(col("id"), (col("id") * 7).as("v"))
          .write.mode("overwrite").parquet(extractPath)
      }
      d.stage("load", deps = Seq("extract"),
              doneWhen = _ => landed(loadPath)) { _ =>
        loadRuns += 1
        val df = spark.read.parquet(extractPath).repartition(8)
        val dying = df.as[(Long, Long)].mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          // partition 5 dies while OTHER tasks are committing part
          // files — the worst-case partial write
          if (pid == 5 && new java.io.File(poisonPath).exists())
            throw new RuntimeException(s"chaos: task $pid killed mid-write")
          it
        }.toDF("id", "v")
        dying.write.mode("overwrite").parquet(loadPath)
      }
      d.reconcile("verify", deps = Seq("load")) { _ =>
        Seq(("rows", 1000L, spark.read.parquet(loadPath).count()))
      }
      d
    }

    // run 1: load dies mid-write → failed; verify skipped; extract landed
    val r1 = build().run(failFast = false)
    assert(r1("extract").status == "success")
    assert(r1("load").status == "failed")
    assert(r1("verify").status == "skipped")
    assert(landed(extractPath), "extract's marker must have landed")
    assert(!landed(loadPath),
      "a job killed mid-write must NOT leave a _SUCCESS marker")

    // run 2: fault cleared → extract cached (never re-runs), load
    // re-runs exactly once, verify reconciles the full row count
    assert(poison.delete())
    val r2 = build().run()
    assert(r2.succeeded)
    assert(r2("extract").status == "cached")
    assert(r2("load").status == "success" && r2("load").attempts == 1)
    assert(r2("verify").status == "success")
    assert(extractRuns == 1 && loadRuns == 2,
      s"extract must run once, load twice — got $extractRuns/$loadRuns")
    // the resumed output is complete and exactly-once (no dup rows from
    // the aborted attempt)
    val out = spark.read.parquet(loadPath)
    assert(out.count() == 1000 && out.select("id").distinct().count() == 1000)

    // run 3: fully-landed DAG is a no-op chain of cached stages except
    // the reconcile (which has no marker and re-verifies by design)
    val r3 = build().run()
    assert(r3("extract").status == "cached" && r3("load").status == "cached")
    assert(loadRuns == 2)
  }
}
