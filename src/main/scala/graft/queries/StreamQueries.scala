package graft.queries

import graft.core.Tables
import graft.streaming.Incremental
import org.apache.spark.sql.functions._

/** Streaming-adjacent catalog: the batch-incremental high-watermark load
  * (ST5/ST6) is deterministic and oracleable; the full ST1→ST4 file-
  * stream ETL is oracleable too when drained with Trigger.AvailableNow
  * (processes everything then stops — a deterministic end state).
  * Continuous-trigger behavior and ST7 state operators stay in
  * StreamingSpec (not SQL-expressible).
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
    },

    // ST1→ST4 end to end, driver-checked: events → JSON landing files →
    // schema'd file stream (several microbatches via maxFilesPerTrigger)
    // → stateless transform → partitioned parquet sink with checkpoint →
    // drain (AvailableNow) → batch query of the streaming output. The
    // cloudtrail_etl.scala shape with a deterministic end state.
    "st_stream_etl" -> { (s, dir) =>
      import graft.streaming.FileStreams
      val in = scratch(dir, "etl_in"); val out = scratch(dir, "etl_out")
      val ckpt = scratch(dir, "etl_ckpt")
      Seq(in, out, ckpt).foreach(rmrf)
      Tables.events(s, dir)
        .select(col("event_id"), col("ts").cast("string").as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .repartition(6) // several landing files → several microbatches
        .write.json(in)
      val schema = graft.core.SchemaDsl.fromSpec(
        "event_id:l;ts:c;user_id:l;event_type:c;value:d")
      val stream = FileStreams.jsonFileStream(s, in, schema,
        maxFilesPerTrigger = 2)
        .withColumn("ts", to_timestamp(col("ts")))      // ST2 parse
        .filter(col("event_id").isNotNull)
      FileStreams.startPartitionedParquetSink(stream, out, ckpt,
        Seq("event_type"), availableNow = true).awaitTermination()
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .orderBy(col("event_type"))
    }
  )

  val oracle: Map[String, String] = Map(
    "st_incremental_load" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS __dt, COUNT(*) AS n,
         |  ${sqlDsum("value")} AS value_sum
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "st_stream_etl" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS value_sum,
         |  MIN(ts) AS first_ts, MAX(ts) AS last_ts
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
