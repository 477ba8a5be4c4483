package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke: materializes a ×K copy of an sf dir (FK-consistent —
  * every key column shifts by the same per-copy offset, so joins produce
  * K disjoint images of the original join graph; dims stay single-copy)
  * and times representative heavy queries at 1× and K×. A design that
  * "would survive 100×" should scale ≈ linearly here; anything
  * super-linear (candidate-pair blowup, global-sort bottleneck, driver
  * loop) shows up as ratio >> K.
  *
  * Note the duplication is itself a stress: documents/embeddings copies
  * are byte-identical, so every doc gains K−1 exact near-dups — the
  * dedup paths see K× docs AND K²-ish intra-cluster pair volume, the
  * worst realistic shape for web-scale dedup.
  *
  * Usage: runMain graft.ScaleSmoke [srcSfDir] [K] [query,query,...] [nowarm]
  *
  * `nowarm` skips the untimed JIT warm-up run per (query, dir): for
  * multi-minute ×100 rows the warm-up doubles a long measurement to
  * shave noise that is already <1% of it.
  */
object ScaleSmoke {

  private val Offset = 1000000000L // > any key in sf0.1

  /** key columns to shift per table; all other columns copy through */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val dims = Seq("region", "nation")

  def build(spark: SparkSession, src: String, out: String, k: Int): Unit = {
    val done = new java.io.File(s"$out/_DONE_$k")
    if (done.exists()) return
    dims.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val copies = (0 until k).map { i =>
        keys.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i * Offset))
        }
      }
      copies.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    done.createNewFile()
  }

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("a1_pricing_summary", "j1_star_revenue", "w2_dedup_latest_event",
        "e_sessionize", "w8_interval_collapse", "w6b_sliding_range_sum",
        "d_exact_dedup", "d_minhash_lsh", "s_cosine_ann_ivf", "t_token_stats")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_scale_x$k"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-scale-smoke")
    build(spark, src, out, k)
    val warmup = !(args.length > 3 && args(3) == "nowarm")
    def run(name: String, dir: String): Double = {
      def once() = org.apache.spark.sql.graft.GraftSql
        .stripTrailingSort(SparkEntry.queries(name)(spark, dir))
        .write.format("noop").mode("overwrite").save()
      if (warmup) once() // warm (codegen/JIT)
      time(once())
    }
    println(f"${"query"}%-26s ${"1x_sec"}%8s ${s"${k}x_sec"}%8s ${"ratio"}%6s")
    names.foreach { n =>
      val t1 = run(n, src)
      val tk = run(n, out)
      println(f"$n%-26s $t1%8.2f $tk%8.2f ${tk / t1}%6.1f")
    }
    spark.stop()
  }
}
