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
    * @return the converged frame (reads from the last generation) */
  def iterate(init: DataFrame, step: DataFrame => DataFrame, maxIter: Int,
              tmpDir: Option[String] = None,
              convergedWhen: (Long, Long) => Boolean = _ == _): DataFrame = {
    val spark = init.sparkSession
    val dir = genDir(tmpDir)
    var cur = init
    var n = cur.count()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val path = s"$dir/iter$iter"
      step(cur).write.mode(SaveMode.Overwrite).parquet(path)
      cur = spark.read.parquet(path)
      val n2 = cur.count()
      done = convergedWhen(n, n2)
      n = n2
      iter += 1
    }
    if (!done) throw new IllegalStateException(
      s"fixed-point iteration did not converge in $maxIter steps")
    cur
  }

  /** Exactly `numSteps` generations — the FIXED-STEP schedule (power
    * iteration and friends) where convergence is analytic, not
    * count-based: no per-generation count job runs and no convergence
    * predicate applies. Kept separate from [[iterate]] so a fixed-step
    * intent can never silently interact with count-based convergence.
    *
    * `materializeEvery` batches generations per parquet round-trip: with
    * 2, steps run as step(step(gen)) inside ONE job before the write —
    * identical arithmetic (materialization never changes values; doubles
    * round-trip parquet exactly), half the job count, and the lineage
    * stays bounded at `materializeEvery` plan copies. The LAST generation
    * is always materialized so the returned frame reads from storage, not
    * a deep plan. Keep the value small (2-3): each unmaterialized step
    * multiplies the plan under the write, and optimizer time grows with
    * it. */
  def iterateSteps(init: DataFrame, step: DataFrame => DataFrame,
                   numSteps: Int, tmpDir: Option[String] = None,
                   materializeEvery: Int = 1): DataFrame = {
    require(numSteps > 0, "numSteps must be positive")
    require(materializeEvery > 0, "materializeEvery must be positive")
    val spark = init.sparkSession
    val dir = genDir(tmpDir)
    var cur = init
    var i = 0
    while (i < numSteps) {
      val next = step(cur)
      if ((i + 1) % materializeEvery == 0 || i == numSteps - 1) {
        val path = s"$dir/iter$i"
        next.write.mode(SaveMode.Overwrite).parquet(path)
        cur = spark.read.parquet(path)
      } else cur = next
      i += 1
    }
    cur
  }

  /** Generation storage root. Callers in any repeated context (query
    * catalog, tests) should pass `tmpDir` — the fresh-dir fallback is
    * never cleaned up by this process and is meant for one-shot
    * interactive use. */
  private def genDir(tmpDir: Option[String]): String = tmpDir.getOrElse(
    java.nio.file.Files.createTempDirectory("graft-fixpoint").toString)
}
