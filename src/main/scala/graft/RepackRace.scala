package graft

import org.apache.spark.sql.functions._

/** Two-PROCESS repack race drill (tools/repack_race.sh): resolves base
  * tables through [[graft.core.Tables]] on a shared repack root while a
  * sibling JVM does the same, then prints a content fingerprint per
  * table. The script launches two of these concurrently against a fresh
  * SPARK_GRAFT_REPACK_DIR and asserts (a) both print identical
  * fingerprints — neither read a half-published repack — and (b) no
  * `.tmp_*` staging orphan survives under the root. This is the
  * cross-JVM leg of the atomic-rename contract; RepackSpec drives the
  * same race in-process below the JVM-local lock.
  *
  * Usage: runMain graft.RepackRace [sfDir] [table,table,...]
  */
object RepackRace {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val tables: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("lineitem", "orders", "documents")
    val spark = graft.core.GraftSession.local(8, "graft-repack-race")
    tables.foreach { t =>
      val df = graft.core.Tables(spark, sfDir, t)
      // order-insensitive content fingerprint: count + sum of per-row
      // 64-bit hashes over every column
      val r = df.agg(count(lit(1)).as("n"),
        sum(xxhash64(df.columns.map(col): _*)).as("h")).head()
      println(s"RACE $t ${r.get(0)} ${r.get(1)}")
    }
    spark.stop()
  }
}
