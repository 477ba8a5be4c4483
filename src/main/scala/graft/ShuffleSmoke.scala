package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.graft.GraftSql

/** Per-query shuffle/input/spill accounting — makes "where every shuffle
  * comes from" (SCALING.md) a MEASURED table instead of a narrative one.
  *
  * A [[SparkListener]] accumulates task-level metrics (input bytes,
  * shuffle write/read bytes+records, mem/disk spill); the harness
  * snapshots the counters around each catalog query (listener bus drained
  * via [[GraftSql.drainListenerBus]] so the after-snapshot is exact, not
  * racy) and prints one row per query plus the shuffle-to-input byte
  * ratio — the number that decides whether an operator's network cost at
  * 100 TB is a scan-shaped constant or a blow-up.
  *
  * Usage: runMain graft.ShuffleSmoke [sfDir] [name ...]
  * (no names → a default panel of the shuffle-heaviest board rows)
  *
  * The harness session disables parquet vectored IO: Hadoop's vectored
  * range reads on local files bypass the per-thread `FileSystem.Statistics`
  * that feed `taskMetrics.inputMetrics`, so with it on every parquet scan
  * reports ~0 input bytes (measured: a1 5.7 MB read vs 0.0 reported).
  * Metrics-harness-only — production sessions keep vectored IO.
  */
object ShuffleSmoke {
  /** Task-metrics accumulator; public so ShuffleMetricsSpec can pin the
    * measured byte/record flow of audited queries, not just plan shape.
    * `snap` layout: input bytes, input records, shuffle-write bytes,
    * shuffle-write records, shuffle-read bytes, shuffle-read records,
    * memory-spill bytes, disk-spill bytes, task count. */
  final class Tally extends SparkListener {
    val input = new AtomicLong; val inputRec = new AtomicLong
    val shWrite = new AtomicLong; val shWriteRec = new AtomicLong
    val shRead = new AtomicLong; val shReadRec = new AtomicLong
    val memSpill = new AtomicLong; val diskSpill = new AtomicLong
    val tasks = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        inputRec.addAndGet(m.inputMetrics.recordsRead)
        shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shWriteRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shReadRec.addAndGet(m.shuffleReadMetrics.recordsRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        tasks.incrementAndGet()
      }
    }
    def snap: Array[Long] = Array(input.get, inputRec.get, shWrite.get,
      shWriteRec.get, shRead.get, shReadRec.get, memSpill.get,
      diskSpill.get, tasks.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("a1_pricing_summary", "j1_star_revenue", "q9_product_profit",
        "q18_large_orders", "w8_interval_collapse", "w2_dedup_latest_event",
        "d_exact_dedup", "d_minhash_lsh", "d_simhash", "d_ngram_jaccard",
        "d_triangles", "t_edit_distance", "s_semdedup", "s_srp_lsh",
        "s_cosine_topk", "t_bm25_search", "e_pagerank", "e_sessionize",
        "j13_salted_join", "u2_union_distinct")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    // see scaladoc: vectored IO hides parquet bytes from inputMetrics
    System.setProperty("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
    val spark = graft.core.GraftSession.local(cpus, "graft-shuffle-smoke")
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)
    val mb = 1024.0 * 1024.0
    println(f"${"query"}%-26s ${"wall_s"}%7s ${"input_mb"}%9s ${"sh_w_mb"}%8s " +
      f"${"sh_r_mb"}%8s ${"sh_w_rec"}%10s ${"spill_mb"}%9s ${"tasks"}%6s ${"sh/in"}%6s")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: no such query")
        case Some(fn) =>
          // warm-up run outside the measured window (scan caches, codegen)
          GraftSql.stripTrailingSort(fn(spark, sfDir))
            .write.format("noop").mode("overwrite").save()
          GraftSql.drainListenerBus(spark)
          val before = tally.snap
          val t0 = System.nanoTime()
          GraftSql.stripTrailingSort(fn(spark, sfDir))
            .write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          GraftSql.drainListenerBus(spark)
          graft.core.Materialize.releaseScratch(spark)
          val d = tally.snap.zip(before).map { case (a, b) => a - b }
          val ratio = if (d(0) > 0) d(2).toDouble / d(0) else 0.0
          println(f"$name%-26s $wall%7.2f ${d(0) / mb}%9.1f ${d(2) / mb}%8.1f " +
            f"${d(4) / mb}%8.1f ${d(3)}%10d ${(d(6) + d(7)) / mb}%9.1f ${d(8)}%6d $ratio%6.2f")
      }
    }
    spark.stop()
  }
}
