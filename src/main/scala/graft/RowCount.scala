package graft

/** Output-volume probe: counts the rows a catalog query produces on a
  * given table dir. Pairs with ScaleSmoke walls to make
  * "output-proportional" a measured claim on twin boards — a pair
  * operator whose mutated-×K wall ratio tracks its output ratio is
  * paying for its answer, not for a plan defect.
  *
  * Usage: runMain graft.RowCount <dir> <name,name,...>
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-row-count")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(f"[rowcount] $n%-26s $c%12d rows  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
