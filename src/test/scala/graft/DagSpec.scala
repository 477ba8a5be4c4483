package graft

import graft.pipelines.Dag
import org.scalatest.funsuite.AnyFunSuite

/** §3.4 stage/DAG runner: ordering, sensor, retry, reconcile, and
  * failure-propagation semantics (no Spark needed — the runner is pure
  * driver-side orchestration). */
class DagSpec extends AnyFunSuite {

  test("stages run in deterministic topological order (declaration tie-break)") {
    val ran = collection.mutable.ArrayBuffer.empty[String]
    val d = Dag("order")
    d.stage("a") { _ => ran += "a" }
    d.stage("b", deps = Seq("a")) { _ => ran += "b" }
    d.stage("c", deps = Seq("a")) { _ => ran += "c" }
    d.stage("d", deps = Seq("c", "b")) { _ => ran += "d" }
    val report = d.run()
    assert(report.succeeded)
    // b before c: equal depth, declared first — reruns are reproducible
    assert(ran.toSeq == Seq("a", "b", "c", "d"))
  }

  test("ctx hands values downstream; runCtx exposes the terminal frame") {
    val d = Dag("ctx")
    d.stage("produce") { ctx => ctx.put("n", 42L) }
    d.stage("consume", deps = Seq("produce")) { ctx =>
      ctx.put("out", ctx[Long]("n") + 1)
    }
    val (report, ctx) = d.runCtx()
    assert(report.succeeded && ctx[Long]("out") == 43L)
  }

  test("sensor: polls until ready") {
    var calls = 0
    val d = Dag("sensor-ok")
    d.sensor("wait", pollMs = 5L, timeoutMs = 5000L) { _ =>
      calls += 1; calls >= 3
    }
    assert(d.run().succeeded && calls == 3)
  }

  test("sensor: timeout throws SensorTimeout (the reference's 5-min file wait)") {
    val d = Dag("sensor-timeout")
    d.sensor("never", pollMs = 5L, timeoutMs = 40L) { _ => false }
    val e = intercept[Dag.StageFailed](d.run())
    assert(e.getCause.isInstanceOf[Dag.SensorTimeout])
    assert(e.getCause.getMessage.contains("TIMEOUT"))
  }

  test("retry: a transient failure recovers within maxRetry (ref max_retry=2)") {
    var attempts = 0
    val d = Dag("retry")
    d.stage("flaky", maxRetry = 2, backoffMs = 1L) { _ =>
      attempts += 1
      if (attempts < 3) sys.error(s"transient #$attempts")
    }
    val report = d.run()
    assert(report.succeeded)
    assert(report("flaky").attempts == 3)
  }

  test("retry exhausted: failFast throws StageFailed with the last cause") {
    val d = Dag("retry-fail")
    d.stage("doomed", maxRetry = 1) { _ => sys.error("still broken") }
    val e = intercept[Dag.StageFailed](d.run())
    assert(e.stage == "doomed" && e.getCause.getMessage == "still broken")
  }

  test("failFast=false: dependents skip, independent branches still run") {
    val ran = collection.mutable.ArrayBuffer.empty[String]
    val d = Dag("branches")
    d.stage("bad") { _ => sys.error("boom") }
    d.stage("child", deps = Seq("bad")) { _ => ran += "child" }
    d.stage("grandchild", deps = Seq("child")) { _ => ran += "grandchild" }
    d.stage("other") { _ => ran += "other" }
    val report = d.run(failFast = false)
    assert(!report.succeeded)
    assert(report("bad").status == "failed")
    assert(report("child").status == "skipped")
    assert(report("grandchild").status == "skipped")
    assert(report("other").status == "success")
    assert(ran.toSeq == Seq("other"))
  }

  test("reconcile: mismatch lists every discrepancy and fails the stage") {
    val d = Dag("reconcile")
    d.stage("load") { ctx => ctx.put("n", 7L) }
    d.reconcile("check", deps = Seq("load")) { ctx =>
      Seq(("rows", 10L, ctx[Long]("n")), ("ok", 1L, 1L), ("cols", 4L, 3L))
    }
    val e = intercept[Dag.StageFailed](d.run())
    assert(e.getCause.isInstanceOf[Dag.ReconcileMismatch])
    val msg = e.getCause.getMessage
    assert(msg.contains("rows: expected=10 actual=7"))
    assert(msg.contains("cols: expected=4 actual=3"))
    assert(!msg.contains("ok:"))
  }

  test("doneWhen: resume skips landed stages, dependents still run, crash re-runs") {
    // a "target" that the produce stage lands; re-running the same DAG
    // definition must skip produce (cached) but still run consume
    var target: Option[String] = None
    var produced = 0; var consumed = 0
    def build() = {
      val d = Dag("resume")
      d.stage("produce", doneWhen = _ => target.isDefined) { _ =>
        produced += 1; target = Some("landed")
      }
      d.stage("consume", deps = Seq("produce")) { _ => consumed += 1 }
      d
    }
    val r1 = build().run()
    assert(r1.succeeded && r1("produce").status == "success")
    val r2 = build().run()
    assert(r2.succeeded)
    assert(r2("produce").status == "cached")
    assert(r2("consume").status == "success")
    assert(produced == 1 && consumed == 2)
    // a crash BEFORE the marker lands re-runs the body (no false cache)
    target = None
    val r3 = build().run()
    assert(r3("produce").status == "success" && produced == 2)
  }

  test("graph validation: duplicate and undeclared-dep stages are rejected") {
    val d = Dag("invalid")
    d.stage("a") { _ => () }
    intercept[IllegalArgumentException](d.stage("a") { _ => () })
    intercept[IllegalArgumentException](
      d.stage("b", deps = Seq("missing")) { _ => () })
  }
}
