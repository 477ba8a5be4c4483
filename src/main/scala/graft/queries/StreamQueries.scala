package graft.queries

import graft.core.Tables
import graft.streaming.Incremental
import org.apache.spark.sql.SaveMode
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
    scratchDir("stream", dir, leaf)

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
      ensureOnce(in, s"$dir/events.parquet") {
        Tables.events(s, dir)
          .select(col("event_id"), col("ts").cast("string").as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .repartition(6) // several landing files → several microbatches
          .write.json(in)
      }
      val schema = graft.core.SchemaDsl.fromSpec(
        "event_id:l;ts:c;user_id:l;event_type:c;value:d")
      drainOnce(out, in) {
        Seq(out, ckpt).foreach(rmrf)
        val stream = FileStreams.jsonFileStream(s, in, schema,
          maxFilesPerTrigger = 2)
          .withColumn("ts", to_timestamp(col("ts")))    // ST2 parse
          .filter(col("event_id").isNotNull)
        FileStreams.startPartitionedParquetSink(stream, out, ckpt,
          Seq("event_type"), availableNow = true).awaitTermination()
      }
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .orderBy(col("event_type"))
    },

    // ST7 end to end, driver-checked: watermarked 6-hour tumbling-window
    // aggregation in APPEND mode through a checkpointed partitioned
    // parquet sink (the at-scale output mode — only finalized windows are
    // ever written). Two drains over ONE checkpoint: drain 1 emits every
    // window the watermark passed; a single far-future sentinel event
    // then closes the horizon, and drain 2 — recovering window state
    // from the checkpoint — flushes the remaining windows. The
    // sentinel's own window never finalizes, so the sink holds exactly
    // the real-event windows.
    "st_tumbling_watermark" -> { (s, dir) =>
      import graft.streaming.FileStreams
      val in = scratch(dir, "wm_land"); val out = scratch(dir, "wm_out")
      val ckpt = scratch(dir, "wm_ckpt")
      // landing split as in st_session_window: base/ built once per
      // testdata, extra/ takes this run's sentinel, stream reads the glob
      val base = s"$in/base"; val extra = s"$in/extra"
      val schema = graft.core.SchemaDsl.fromSpec(
        "event_id:l;ts:c;event_type:c;value:d")
      // one week of the landing data: the windowed-state machinery
      // (watermark advance, append finalization, checkpoint recovery) is
      // identical at any drain volume, so the query proves ST7 on a
      // quarter of the month and the oracle applies the same bound
      val drainCutoff = "2024-01-08"
      ensureOnce(base, s"$dir/events.parquet") {
        Tables.events(s, dir)
          .filter(col("ts") < drainCutoff)
          .select(col("event_id"), col("ts").cast("string").as("ts"),
            col("event_type"), col("value"))
          .repartition(4).write.json(base)
      }
      def windowed(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("ts", to_timestamp(col("ts")))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
        .select(col("w.start").as("win_start"), col("event_type"),
          col("n"), col("value_sum"))
      // several-microbatch behavior is proven by st_stream_etl; here one
      // batch per drain keeps the state-commit rounds minimal
      def drain(): Unit = FileStreams.startPartitionedParquetSink(
        windowed(FileStreams.jsonFileStream(s, s"$in/*", schema,
          maxFilesPerTrigger = 4)),
        out, ckpt, Seq("event_type")).awaitTermination()
      // streaming state partition count is fixed at checkpoint creation;
      // ~3k window states don't need 32 stores × batches × drains of
      // commit-file churn — at production volume this is sized to the
      // state, not to the shuffle default
      drainOnce(out, base) {
        Seq(extra, out, ckpt).foreach(rmrf)
        val partKey = "spark.sql.shuffle.partitions"
        val prevParts = s.conf.get(partKey)
        s.conf.set(partKey, "4")
        try {
          drain()
          import s.implicits._
          Seq((-1L, "2030-01-01 00:00:00", "zz_sentinel", 0.0))
            .toDF("event_id", "ts", "event_type", "value")
            .coalesce(1).write.mode(SaveMode.Append).json(extra)
          drain()
        } finally s.conf.set(partKey, prevParts)
      }
      s.read.parquet(out)
        .select("win_start", "event_type", "n", "value_sum")
        .orderBy("win_start", "event_type")
    },

    // SLIDING (overlapping) windows in append mode: window('6 hours',
    // '3 hours') puts every event into TWO live state windows at once —
    // the overlapping-window state shape tumbling can't exercise
    // (state rows ≈ 2× window count, append finalization must close
    // each overlapping window independently as the watermark passes
    // it). Same landing split / two-drain sentinel horizon close as
    // st_tumbling_watermark; the oracle replays each event into both
    // of its slide-aligned windows.
    "st_sliding_window" -> { (s, dir) =>
      import graft.streaming.FileStreams
      val in = scratch(dir, "sl_land"); val out = scratch(dir, "sl_out")
      val ckpt = scratch(dir, "sl_ckpt")
      val base = s"$in/base"; val extra = s"$in/extra"
      val schema = graft.core.SchemaDsl.fromSpec(
        "event_id:l;ts:c;event_type:c;value:d")
      val drainCutoff = "2024-01-08"
      ensureOnce(base, s"$dir/events.parquet") {
        Tables.events(s, dir)
          .filter(col("ts") < drainCutoff)
          .select(col("event_id"), col("ts").cast("string").as("ts"),
            col("event_type"), col("value"))
          .repartition(4).write.json(base)
      }
      def windowed(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("ts", to_timestamp(col("ts")))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
        .select(col("w.start").as("win_start"), col("event_type"),
          col("n"), col("value_sum"))
      def drain(): Unit = FileStreams.startPartitionedParquetSink(
        windowed(FileStreams.jsonFileStream(s, s"$in/*", schema,
          maxFilesPerTrigger = 4)),
        out, ckpt, Seq("event_type")).awaitTermination()
      drainOnce(out, base) {
        Seq(extra, out, ckpt).foreach(rmrf)
        val partKey = "spark.sql.shuffle.partitions"
        val prevParts = s.conf.get(partKey)
        s.conf.set(partKey, "4")
        try {
          drain()
          import s.implicits._
          Seq((-1L, "2030-01-01 00:00:00", "zz_sentinel", 0.0))
            .toDF("event_id", "ts", "event_type", "value")
            .coalesce(1).write.mode(SaveMode.Append).json(extra)
          drain()
        } finally s.conf.set(partKey, prevParts)
      }
      s.read.parquet(out)
        .select("win_start", "event_type", "n", "value_sum")
        .orderBy("win_start", "event_type")
    },

    // Stateful SESSION windows in append mode: per-account sessions
    // split on >=30 min inactivity, windows merging as events arrive and
    // finalizing only when the watermark passes their (moving) end — the
    // hardest stateful streaming aggregation shape. Same two-drain /
    // far-future-sentinel horizon close as st_tumbling_watermark; the
    // oracle replays the identical session algebra as batch
    // gaps-and-islands (Spark merges while next_ts < end, so the break
    // condition is diff >= gap, end-exclusive).
    "st_session_window" -> { (s, dir) =>
      import graft.streaming.FileStreams
      // "sw_land", not the pre-split "sw_in": a leftover flat-layout dir
      // would double the stream under the glob
      val in = scratch(dir, "sw_land"); val out = scratch(dir, "sw_out")
      val ckpt = scratch(dir, "sw_ckpt")
      // landing split: base/ is a pure function of the testdata (built
      // once — warm runs must not pay the rewrite), extra/ holds this
      // run's sentinel appends and is rebuilt per run; the stream reads
      // the glob over both
      val base = s"$in/base"; val extra = s"$in/extra"
      val drainCutoff = "2024-01-08"
      ensureOnce(base, s"$dir/events.parquet") {
        Tables.events(s, dir)
          .filter(col("ts") < drainCutoff)
          .select((col("user_id") % 20).as("acct"),
            col("ts").cast("string").as("ts"), col("value"))
          .repartition(4).write.json(base)
      }
      val schema = graft.core.SchemaDsl.fromSpec("acct:l;ts:c;value:d")
      def windowed(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("ts", to_timestamp(col("ts")))
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("acct"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
        .select(col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("acct"), col("n"),
          col("value_sum"))
      def drain(): Unit = FileStreams.startPartitionedParquetSink(
        windowed(FileStreams.jsonFileStream(s, s"$in/*", schema,
          maxFilesPerTrigger = 4)),
        out, ckpt, Seq.empty).awaitTermination()
      drainOnce(out, base) {
        Seq(extra, out, ckpt).foreach(rmrf)
        val partKey = "spark.sql.shuffle.partitions"
        val prevParts = s.conf.get(partKey)
        s.conf.set(partKey, "8")
        try {
          drain()
          import s.implicits._
          Seq((-1L, "2030-01-01 00:00:00", 0.0)).toDF("acct", "ts", "value")
            .coalesce(1).write.mode(SaveMode.Append).json(extra)
          drain() // checkpoint-recovered state flushes the remaining sessions
        } finally s.conf.set(partKey, prevParts)
      }
      s.read.parquet(out)
        .select("session_start", "session_end", "acct", "n", "value_sum")
        .orderBy("acct", "session_start")
    },

    // Stateful streaming dedup: the landing data carries every event
    // TWICE (an at-least-once delivery); dropDuplicates on the event key
    // holds seen-key state across micro-batches so replays are dropped
    // wherever they land. The drain's end state must equal the distinct
    // batch — in production the state is bounded with
    // dropDuplicatesWithinWatermark (proven in StreamingSpec); the
    // unbounded form here keeps the drain deterministic for the oracle.
    "st_stream_dedup" -> { (s, dir) =>
      import graft.streaming.FileStreams
      val in = scratch(dir, "dd_in"); val out = scratch(dir, "dd_out")
      val ckpt = scratch(dir, "dd_ckpt")
      ensureOnce(in, s"$dir/events.parquet") {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        ev.unionAll(ev).repartition(6).write.json(in)
      }
      val schema = graft.core.SchemaDsl.fromSpec(
        "event_id:l;event_type:c;value:d")
      drainOnce(out, in) {
        Seq(out, ckpt).foreach(rmrf)
        val deduped = FileStreams.jsonFileStream(s, in, schema,
            maxFilesPerTrigger = 2)
          .dropDuplicates("event_id")
        val partKey = "spark.sql.shuffle.partitions"
        val prevParts = s.conf.get(partKey)
        s.conf.set(partKey, "8")
        try FileStreams.startPartitionedParquetSink(deduped, out, ckpt, Seq.empty)
          .awaitTermination()
        finally s.conf.set(partKey, prevParts)
      }
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
        .orderBy(col("event_type"))
    },

    // Stream-static enrichment: the event stream joins a BROADCAST batch
    // dimension per micro-batch — stateless (unlike stream-stream: no
    // watermark, no join state), the dimension is re-resolved each batch
    // so slowly-changing dims pick up updates between batches. The
    // standard streaming-ETL enrichment shape at any scale: the stream
    // never shuffles for the join.
    "st_stream_enrich" -> { (s, dir) =>
      import graft.streaming.FileStreams
      val in = scratch(dir, "enr_in"); val out = scratch(dir, "enr_out")
      val ckpt = scratch(dir, "enr_ckpt")
      ensureOnce(in, s"$dir/events.parquet") {
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .repartition(4).write.json(in)
      }
      val schema = graft.core.SchemaDsl.fromSpec(
        "event_id:l;user_id:l;event_type:c;value:d")
      drainOnce(out, in) {
        Seq(out, ckpt).foreach(rmrf)
        val dim = Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))
        val enriched = FileStreams.jsonFileStream(s, in, schema,
            maxFilesPerTrigger = 2)
          .withColumn("nk", col("user_id") % 25)
          .join(broadcast(dim), col("nk") === col("n_nationkey"))
          .select(col("event_id"), col("n_name"), col("event_type"), col("value"))
        FileStreams.startPartitionedParquetSink(enriched, out, ckpt, Seq.empty)
          .awaitTermination()
      }
      s.read.parquet(out)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
        .orderBy(col("n_name"))
    },

    // Stream-stream interval join (beyond reference — the remaining core
    // Structured Streaming operator): a view stream joins a click stream
    // on user within (view.ts, view.ts + 1 h], both sides watermarked.
    // Inner-join matches emit as both sides arrive (no watermark
    // finalization wait), so an AvailableNow drain reaches a
    // deterministic end state; the watermark delay is set beyond the
    // fixture's span so no cross-batch arrival order can drop a late
    // row — in production the delay is the real lateness bound and the
    // SAME watermark is what lets Spark evict join state older than
    // delay + interval (state stays bounded at any stream length).
    "st_stream_join" -> { (s, dir) =>
      import graft.streaming.FileStreams
      val inV = scratch(dir, "ssj_views"); val inC = scratch(dir, "ssj_clicks")
      val out = scratch(dir, "ssj_out"); val ckpt = scratch(dir, "ssj_ckpt")
      def ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts").cast("string").as("ts"),
          col("user_id"), col("event_type"), col("value"))
      ensureOnce(inV, s"$dir/events.parquet") {
        ev.filter(col("event_type") === "view").repartition(2).write.json(inV)
      }
      ensureOnce(inC, s"$dir/events.parquet") {
        ev.filter(col("event_type") === "click").repartition(2).write.json(inC)
      }
      val schema = graft.core.SchemaDsl.fromSpec(
        "event_id:l;ts:c;user_id:l;event_type:c;value:d")
      def side(path: String, prefix: String) =
        FileStreams.jsonFileStream(s, path, schema, maxFilesPerTrigger = 2)
          .withColumn("ts", to_timestamp(col("ts")))
          .withWatermark("ts", "60 days")
          .select(col("user_id").as(s"${prefix}_user"),
            col("ts").as(s"${prefix}_ts"), col("value").as(s"${prefix}_value"))
      // join state is keyed by user (~hundreds of keys in the fixture):
      // size the state stores to the state, not the shuffle default —
      // each extra partition costs 4 store commits per batch here (two
      // sides × two join-state stores). Staleness key: inV suffices —
      // both landings rebuild together from the same events table.
      drainOnce(out, inV) {
        Seq(out, ckpt).foreach(rmrf)
        val joined = side(inV, "v").join(side(inC, "c"),
          col("v_user") === col("c_user") &&
            col("c_ts") > col("v_ts") &&
            col("c_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
        val partKey = "spark.sql.shuffle.partitions"
        val prevParts = s.conf.get(partKey)
        s.conf.set(partKey, "8")
        try FileStreams.startPartitionedParquetSink(joined, out, ckpt, Seq.empty)
          .awaitTermination()
        finally s.conf.set(partKey, prevParts)
      }
      s.read.parquet(out)
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          dsum(col("c_value")).as("click_value_sum"))
        .orderBy(col("user_id"))
    },

    // Streaming CDC upsert via foreachBatch (beyond reference —
    // composes the batch SCD merge with the file stream): wave 1 lands
    // every event at version 1; the drain merges them into the keyed
    // target over several micro-batches. Wave 2 appends updated rows
    // (doubled value, version 2) for every 10th key; a second drain
    // over the SAME checkpoint processes only the new files and merges
    // them in. The target must hold exactly the latest version per key.
    "st_upsert_merge" -> { (s, dir) =>
      import graft.streaming.Upsert
      val in = scratch(dir, "ups_land"); val target = scratch(dir, "ups_target")
      val ckpt = scratch(dir, "ups_ckpt")
      // landing split: wave-1 (the full table) is a pure function of the
      // testdata and lands once; wave-2 must appear only after drain 1,
      // so it rebuilds per run — it is 1/10th of the rows in one file
      val base = s"$in/base"; val wave2 = s"$in/wave2"
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), lit(1L).as("ver"))
      ensureOnce(base, s"$dir/events.parquet") {
        ev.repartition(4).write.parquet(base)
      }
      val schema = graft.core.SchemaDsl.fromSpec(
        "event_id:l;user_id:l;event_type:c;value:d;ver:l")
      def drain(): Unit = Upsert.startParquetUpsert(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 2)
          .parquet(s"$in/*"),
        target, ckpt, keys = Seq("event_id"),
        orderCols = Seq("ver", "event_id")).awaitTermination()
      // state-light job: the merge is stateless per batch (state lives
      // in the target table), so small shuffle fan-out suffices
      drainOnce(target, base) {
        Seq(wave2, target, ckpt).foreach(rmrf)
        val partKey = "spark.sql.shuffle.partitions"
        val prevParts = s.conf.get(partKey)
        s.conf.set(partKey, "8")
        try {
          drain()
          ev.filter(col("event_id") % 10 === 0)
            .withColumn("value", col("value") * 2.0)
            .withColumn("ver", lit(2L))
            .coalesce(1).write.mode(SaveMode.Append).parquet(wave2)
          drain()
        } finally s.conf.set(partKey, prevParts)
      }
      s.read.parquet(target)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"),
          sum(col("ver")).as("ver_sum"))
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
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // 6 h = 21600 s; epoch-aligned floor matches Spark's window() origin;
    // same one-week drain bound as the query
    "st_tumbling_watermark" ->
      s"""SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 21600) * 21600) AS TIMESTAMP)
         |    AS win_start,
         |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS value_sum
         |FROM events WHERE ts < TIMESTAMP '2024-01-08'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // every event replays into BOTH of its slide-aligned 6h/3h windows:
    // starts floor(ts/3h)·3h and that minus 3h (membership holds for
    // exactly those two)
    "st_sliding_window" ->
      s"""SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 10800) * 10800 - k * 10800)
         |    AS TIMESTAMP) AS win_start,
         |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS value_sum
         |FROM events, unnest([0, 1]) AS u(k)
         |WHERE ts < TIMESTAMP '2024-01-08'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // batch gaps-and-islands replica of session_window: break when the
    // inactivity gap reaches 30 min (>= — Spark windows are
    // end-exclusive); session end = last event + gap
    // Sessionization must run over DISTINCT (acct, ts): with tied
    // timestamps (the ScaleSmoke twin board folds 10 copies onto one
    // acct at the same ts), lag() and the cumulative SUM are two
    // independent window operators whose tie orders need not agree, so
    // the brk=1 flag can land mid-tie-group and split same-ts events
    // across sessions (observed at sf1: 6/734 rows off). A session
    // break is a property of the tie GROUP; pre-aggregating per ts
    // makes the ORDER BY unique and is exact for the decimal sum.
    "st_session_window" ->
      s"""WITH ev AS (
         |  SELECT user_id % 20 AS acct, ts, value
         |  FROM events WHERE ts < TIMESTAMP '2024-01-08'),
         |g AS (
         |  SELECT acct, ts, COUNT(*) AS cnt,
         |    SUM(CAST(value AS DECIMAL(18,6))) AS vsum
         |  FROM ev GROUP BY acct, ts),
         |flagged AS (
         |  SELECT acct, ts, cnt, vsum,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
         |         THEN 1 ELSE 0 END AS brk
         |  FROM g WINDOW w AS (PARTITION BY acct ORDER BY ts)),
         |sessions AS (
         |  SELECT acct, ts, cnt, vsum,
         |    SUM(brk) OVER (PARTITION BY acct ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged)
         |SELECT MIN(ts) AS session_start,
         |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
         |  acct, CAST(SUM(cnt) AS BIGINT) AS n,
         |  CAST(SUM(vsum) AS DOUBLE) AS value_sum
         |FROM sessions GROUP BY acct, sid
         |ORDER BY acct, session_start""".stripMargin,

    // the duplicated landing collapses back to the distinct fact
    "st_stream_dedup" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS value_sum
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "st_stream_enrich" ->
      s"""SELECT n.n_name, COUNT(*) AS n, ${sqlDsum("e.value")} AS value_sum
         |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "st_stream_join" ->
      s"""WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         |c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
         |SELECT v.user_id, COUNT(*) AS n_pairs,
         |  ${sqlDsum("c.value")} AS click_value_sum
         |FROM v JOIN c ON c.user_id = v.user_id
         |  AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // final upserted state: every 10th key carries the v2 row
    "st_upsert_merge" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${sqlDsum("CASE WHEN event_id % 10 = 0 THEN value * 2 ELSE value END")} AS value_sum,
         |  CAST(SUM(CASE WHEN event_id % 10 = 0 THEN 2 ELSE 1 END) AS BIGINT) AS ver_sum
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
