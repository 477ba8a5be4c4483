package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** General driver-paced fixed-point iteration — the recursive-CTE
  * substitute (SURVEY §4; ref: slow_temp_table_write_in_palce_of_
  * recursive_cte.py:104-183 loops {step → overwrite temp table → count}
  * until the count stabilizes).
  *
  * Each generation is materialized to parquet so the lineage stays one
  * step deep (an unmaterialized loop would stack N plan copies and
  * re-execute everything per action). The driver holds only counts and
  * the iteration index; every step is distributed. Convergence is
  * count-based by default (the reference's criterion) — pass a custom
  * predicate for monotone steps where equal counts don't imply a fixed
  * point.
  */
object FixedPoint {

  /** @param init         starting frame
    * @param step         one distributed rewrite; must be deterministic
    * @param maxIter      hard bound — a step that never converges throws
    * @param tmpDir       generation storage (a fresh temp dir if None)
    * @param convergedWhen (prevCount, newCount) => done; default: equal
    * @param trackCounts  false skips the per-generation count job and
    *                     feeds (0, 0) to the predicate — for fixed-step
    *                     schedules (power iteration) where counts never
    *                     inform convergence, halving the actions per
    *                     generation
    * @return the converged frame (reads from the last generation) */
  def iterate(init: DataFrame, step: DataFrame => DataFrame, maxIter: Int,
              tmpDir: Option[String] = None,
              convergedWhen: (Long, Long) => Boolean = _ == _,
              trackCounts: Boolean = true): DataFrame = {
    val spark = init.sparkSession
    val dir = tmpDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-fixpoint").toString)
    var cur = init
    var n = if (trackCounts) cur.count() else 0L
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val path = s"$dir/iter$iter"
      step(cur).write.mode(SaveMode.Overwrite).parquet(path)
      cur = spark.read.parquet(path)
      val n2 = if (trackCounts) cur.count() else 0L
      done = convergedWhen(n, n2)
      n = n2
      iter += 1
    }
    if (!done) throw new IllegalStateException(
      s"fixed-point iteration did not converge in $maxIter steps")
    cur
  }
}
