package graft.pipelines

import scala.collection.mutable

/** Deterministic in-process stage/DAG runner (SURVEY §3.4) — the engine's
  * re-expression of the reference's operator model: stages declare a
  * `dep_list`, sensors poll for external readiness with a timeout, and
  * flaky stages retry with backoff
  * (ref: `dags/dataswm/servicenow_api_extract.py:2220-2368` dep_list
  * chains and `max_retry=2`; `:78-117` the 5-minute file-arrival poll;
  * `dags/airflow/graphql_to_postgres.py:86-167`
  * `latest_only >> create_tables >> primary >> trasform_to_conformed`).
  *
  * Scheduling is deterministic: Kahn's topological sort with
  * declaration-order tie-break, executed sequentially on the driver. The
  * runner orchestrates; all data movement stays inside the Spark jobs the
  * stage bodies submit, so the driver holds stage metadata only — at
  * 100 TB the DAG is exactly as big as its stage count.
  */
object Dag {

  /** Outcome of one stage after [[Builder.run]]. `status` is one of
    * success | cached (doneWhen already satisfied — body not run) |
    * failed | skipped (a dep failed upstream). */
  final case class StageResult(name: String, status: String, attempts: Int,
                               durationMs: Long, error: Option[String])

  final case class Report(dag: String, results: Seq[StageResult]) {
    def succeeded: Boolean =
      results.forall(r => r.status == "success" || r.status == "cached")
    def apply(name: String): StageResult =
      results.find(_.name == name)
        .getOrElse(sys.error(s"no stage '$name' in dag '$dag'"))
  }

  /** A sensor exhausted its timeout — the reference raises SystemExit with
    * the same shape of message (`servicenow_api_extract.py:100-111`). */
  final class SensorTimeout(msg: String) extends RuntimeException(msg)

  /** A stage exhausted its retries under `run(failFast = true)`. */
  final class StageFailed(val stage: String, cause: Throwable)
    extends RuntimeException(s"stage '$stage' failed: ${cause.getMessage}", cause)

  /** Count-reconciliation mismatch (A9 decorator form). */
  final class ReconcileMismatch(msg: String) extends RuntimeException(msg)

  /** Mutable key-value store handed between stages — how a fetch stage
    * passes its DataFrame/path/count to downstream loads. */
  final class Ctx {
    private val store = mutable.Map.empty[String, Any]
    def put(key: String, value: Any): Unit = store(key) = value
    def apply[T](key: String): T =
      store.getOrElse(key, sys.error(s"ctx key '$key' not set")).asInstanceOf[T]
    def get[T](key: String): Option[T] = store.get(key).map(_.asInstanceOf[T])
  }

  private final case class Stage(name: String, deps: Seq[String],
                                 maxRetry: Int, backoffMs: Long,
                                 doneWhen: Ctx => Boolean,
                                 body: Ctx => Unit)

  def apply(name: String): Builder = new Builder(name)

  final class Builder private[Dag] (val name: String) {
    private val stages = mutable.LinkedHashMap.empty[String, Stage]

    /** Declare a stage. `deps` must name previously-declared stages;
      * `maxRetry` extra attempts run after the first failure, sleeping
      * `backoffMs * attempt` between tries (ref `max_retry=2`,
      * `servicenow_api_extract.py:2261`). `doneWhen` is the
      * resume-from-markers guard: checked BEFORE the body on every run,
      * and when already satisfied the stage records `cached` and its
      * body never executes — re-running a half-finished DAG skips the
      * stages whose targets already landed (the Airflow
      * latest_only / target-exists idempotence pattern; ref
      * `dq_check_for_target_table.py:53` WaitForHiveOperator guarding
      * re-runs). Markers must be written by the stage body itself
      * (e.g. the sink's _SUCCESS), so a crash mid-stage re-runs it. */
    def stage(name: String, deps: Seq[String] = Nil, maxRetry: Int = 0,
              backoffMs: Long = 0L, doneWhen: Ctx => Boolean = _ => false)
             (body: Ctx => Unit): this.type = {
      require(!stages.contains(name), s"duplicate stage '$name'")
      val ds = deps.distinct // a repeated dep would skew Kahn's indegrees
      ds.foreach(d => require(stages.contains(d),
        s"stage '$name' depends on undeclared '$d' — declare stages in dependency order"))
      stages(name) = Stage(name, ds, maxRetry, backoffMs, doneWhen, body)
      this
    }

    /** File-arrival/readiness sensor: polls `ready` every `pollMs` until
      * it returns true, raising [[SensorTimeout]] after `timeoutMs`
      * (ref: the 6-second poll / 5-minute cap MFS file wait,
      * `servicenow_api_extract.py:78-117`). */
    def sensor(name: String, deps: Seq[String] = Nil, pollMs: Long = 1000L,
               timeoutMs: Long = 300000L)(ready: Ctx => Boolean): this.type =
      stage(name, deps) { ctx =>
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        var ok = ready(ctx)
        while (!ok && System.nanoTime() < deadline) {
          Thread.sleep(pollMs)
          ok = ready(ctx)
        }
        if (!ok) throw new SensorTimeout(
          s"TIMEOUT: sensor '$name' in dag '${Builder.this.name}' not ready after ${timeoutMs} ms")
      }

    /** Count-reconciliation decorator (A9; ref the raw-vs-staging row
      * checks the reference DAG runs after each load): each `(label,
      * expected, actual)` triple must agree or the stage fails with every
      * discrepancy listed. */
    def reconcile(name: String, deps: Seq[String] = Nil)
                 (checks: Ctx => Seq[(String, Long, Long)]): this.type =
      stage(name, deps) { ctx =>
        val bad = checks(ctx).collect {
          case (label, exp, act) if exp != act => s"$label: expected=$exp actual=$act"
        }
        if (bad.nonEmpty) throw new ReconcileMismatch(
          s"reconciliation '$name' failed — ${bad.mkString("; ")}")
      }

    /** Execute: deterministic topological order, sequential. With
      * `failFast` (default) the first stage to exhaust its retries throws
      * [[StageFailed]]; otherwise it is recorded `failed`, its transitive
      * dependents `skipped`, and independent branches keep running —
      * inspect the returned [[Report]]. */
    def run(failFast: Boolean = true): Report = runCtx(failFast)._1

    /** [[run]], also returning the ctx — for callers that consume a frame
      * the terminal stage left behind. */
    def runCtx(failFast: Boolean = true): (Report, Ctx) = {
      val order = topoOrder()
      val ctx = new Ctx
      val results = mutable.ArrayBuffer.empty[StageResult]
      val failedOrSkipped = mutable.Set.empty[String]
      for (s <- order) {
        if (s.deps.exists(failedOrSkipped)) {
          failedOrSkipped += s.name
          results += StageResult(s.name, "skipped", 0, 0L, None)
        } else if (s.doneWhen(ctx)) {
          results += StageResult(s.name, "cached", 0, 0L, None)
        } else {
          val t0 = System.nanoTime()
          var attempt = 0
          var done = false
          var lastErr: Throwable = null
          while (!done && attempt <= s.maxRetry) {
            attempt += 1
            try { s.body(ctx); done = true }
            catch {
              case e: Exception =>
                lastErr = e
                if (attempt <= s.maxRetry && s.backoffMs > 0)
                  Thread.sleep(s.backoffMs * attempt)
            }
          }
          val ms = (System.nanoTime() - t0) / 1000000L
          if (done)
            results += StageResult(s.name, "success", attempt, ms, None)
          else if (failFast) throw new StageFailed(s.name, lastErr)
          else {
            failedOrSkipped += s.name
            results += StageResult(s.name, "failed", attempt, ms,
              Some(lastErr.toString))
          }
        }
      }
      (Report(name, results.toSeq), ctx)
    }

    // Kahn with declaration-order tie-break: the ready set is scanned in
    // insertion order, so equal-depth siblings run in the order declared —
    // reruns are bit-reproducible.
    private def topoOrder(): Seq[Stage] = {
      val indeg = mutable.LinkedHashMap(stages.values.toSeq.map(s =>
        s.name -> s.deps.size): _*)
      val out = mutable.ArrayBuffer.empty[Stage]
      while (indeg.nonEmpty) {
        val ready = indeg.collectFirst { case (n, 0) => n }.getOrElse(
          sys.error(s"dag '$name' has a dependency cycle among: ${indeg.keys.mkString(", ")}"))
        indeg.remove(ready)
        out += stages(ready)
        for (s <- stages.values if s.deps.contains(ready) && indeg.contains(s.name))
          indeg(s.name) = indeg(s.name) - 1
      }
      out.toSeq
    }
  }
}
