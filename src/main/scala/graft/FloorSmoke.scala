package graft

/** Floor-pricing experiment (r16, VERDICT r15 #1): the bench's per-run
  * floor probe reads 0.106–0.141 s, and a 215-row board pays ~rows ×
  * floor ≈ 23–30 s of pure harness ceremony — ~25-30% of a controlled
  * total. The r14 decomposition priced the trivial-job submit at
  * ~80 ms, of which the AQE wrapper (plan → AdaptiveSparkPlanExec,
  * per-stage job submission, final-stage re-optimization) was ~40 ms.
  * This drill prices the ONE candidate change that attacks that term —
  * `spark.sql.adaptive.enabled=false` — on the floor probe itself and
  * on a sample of steady sub-second catalog rows, alternating A/B/A
  * within one JVM so JIT drift shows up as A≠A rather than polluting
  * the comparison.
  *
  * AQE is value-neutral by design (runtime re-planning never changes
  * results), so the toggle is hash-neutral by construction; the
  * decision bar for adopting it in Bench is wall time only (≥5 s off a
  * controlled board, per the verdict's one-change protocol).
  *
  * Usage: runMain graft.FloorSmoke [sfDir] [query,query,...]
  */
object FloorSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("f_udf_scalar", "a4_having", "q21_waiting_suppliers",
        "u1_union_all", "f_case_buckets", "j11_anti_customers_no_orders",
        "a10_minmax_group", "w7_ntile_quartiles")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-floor-smoke")
    def aqe(on: Boolean): Unit =
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
    def floorOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(1000000L).selectExpr("sum(id) AS s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def floorMin(): Double = { (1 to 2).foreach(_ => floorOnce())
      (1 to 7).map(_ => floorOnce()).min }
    def runQ(name: String): Double = {
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        org.apache.spark.sql.graft.GraftSql.stripTrailingSort(fn(spark, sfDir))
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        graft.core.Materialize.releaseScratch(spark)
        s
      }
      (1 to 2).foreach(_ => once())
      (1 to 5).map(_ => once()).min
    }
    // A/B/A/B — EQUAL sample counts per arm (r16 review: the first
    // draft compared min of TWO AQE-on samples against ONE AQE-off
    // sample; E[min of 2] < E[1] under any noise, biasing every row
    // toward AQE-on by ~0.5σ and the ×215 extrapolation by seconds)
    aqe(true);  val fA1 = floorMin()
    aqe(false); val fB1 = floorMin()
    aqe(true);  val fA2 = floorMin()
    aqe(false); val fB2 = floorMin()
    println(f"[floor] aqe_on=${math.min(fA1, fA2)}%.3f " +
      f"aqe_off=${math.min(fB1, fB2)}%.3f " +
      f"(raw $fA1%.3f/$fB1%.3f/$fA2%.3f/$fB2%.3f; " +
      f"saving/run ${math.min(fA1, fA2) - math.min(fB1, fB2)}%.3f s)")
    println(f"${"query"}%-32s ${"on_min"}%8s ${"off_min"}%8s ${"delta"}%7s")
    var totOn = 0.0; var totOff = 0.0
    names.foreach { n =>
      aqe(true);  val a1 = runQ(n)
      aqe(false); val b1 = runQ(n)
      aqe(true);  val a2 = runQ(n)
      aqe(false); val b2 = runQ(n)
      val on = math.min(a1, a2); val off = math.min(b1, b2)
      totOn += on; totOff += off
      println(f"$n%-32s $on%8.3f $off%8.3f ${on - off}%+7.3f")
    }
    println(f"[floorsmoke] sample total: aqe_on=$totOn%.2f aqe_off=$totOff%.2f " +
      f"(x215-row extrapolation ${(totOn - totOff) / names.size * 215}%+.1f s)")
    spark.stop()
  }
}
