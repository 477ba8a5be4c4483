package graft.queries

import graft.core.Tables
import graft.streaming.Incremental
import org.apache.spark.sql.functions._

/** Streaming-adjacent catalog: the batch-incremental high-watermark load
  * (ST5/ST6) is deterministic and oracleable — the continuously-running
  * stream operators (ST1-ST4, ST7) are verified by batch-equivalence in
  * StreamingSpec instead (a stream drain is not SQL-expressible).
  */
object StreamQueries {

  private def scratch(dir: String, leaf: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_stream_${new java.io.File(dir).getName}/$leaf"

  private def rmrf(path: String): Unit = {
    val root = new java.io.File(path)
    if (root.exists()) {
      Option(root.listFiles()).foreach(_.foreach(f => rmrf(f.getPath)))
      root.delete()
    }
  }

  val queries: Map[String, Q] = Map(
    // ST5+ST6: day-1 load sees everything before Jan 20 EXCEPT a withheld
    // late subset from Jan 18-19; day-2 load (3-day lookback from the
    // watermark) must re-ingest those late rows by rebuilding their date
    // partitions. Final target == the full events table.
    "st_incremental_load" -> { (s, dir) =>
      val target = scratch(dir, "inc_target"); val state = scratch(dir, "inc_state")
      Seq(target, state).foreach(rmrf)
      val ev = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val cutoff = "2024-01-20"
      val late = col("ts") >= "2024-01-18" && col("ts") < cutoff && col("event_id") % 7 === 0
      val phase1 = ev.filter(col("ts") < cutoff && !late)
      Incremental.incrementalLoad(phase1, "ts", target, state, lookbackDays = 3)
      Incremental.incrementalLoad(ev, "ts", target, state, lookbackDays = 3)
      s.read.parquet(target)
        .groupBy(col("__dt"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
        .orderBy(col("__dt"))
    }
  )

  val oracle: Map[String, String] = Map(
    "st_incremental_load" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS __dt, COUNT(*) AS n,
         |  ${sqlDsum("value")} AS value_sum
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
