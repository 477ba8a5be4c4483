package graft

import org.apache.spark.sql.graft.GraftSql

/** Measured-data-movement audits. PlanAuditSpec pins plan SHAPE (broadcast
  * nodes present, no cartesians); these pin the actual task-metric flow —
  * catching regressions the plan string can't show, e.g. a broadcast that
  * falls back to a shuffled join at runtime, or a partial aggregate that
  * stops combining and ships the full fact through the exchange.
  * Thresholds are orders-of-magnitude gates (fact tables at sf0.001 are
  * thousands of rows; the audited exchanges must stay at tens), not exact
  * counts — partition-count and AQE changes shouldn't flake them. */
class ShuffleMetricsSpec extends SparkSpec {

  /** Tally deltas for one query run (warm plan, noop sink). The bus is
    * drained before registering so a prior job's backlog can't leak into
    * the tally, and after the job so the snapshot is complete. */
  private def measure(name: String): Array[Long] = {
    GraftSql.drainListenerBus(spark)
    val tally = new ShuffleSmoke.Tally
    spark.sparkContext.addSparkListener(tally)
    try {
      GraftSql.stripTrailingSort(SparkEntry.queries(name)(spark, sf001))
        .write.format("noop").mode("overwrite").save()
      GraftSql.drainListenerBus(spark)
      tally.snap
    } finally spark.sparkContext.removeSparkListener(tally)
  }

  private def shuffleRecords(m: Array[Long]) = m(3)
  private def spillBytes(m: Array[Long]) = m(6) + m(7)

  test("j1: broadcast star — the fact side never rides an exchange") {
    val m = measure("j1_star_revenue")
    // only the agg partial->final hop shuffles: group rows, not lineitem
    assert(shuffleRecords(m) < 1000,
      s"j1 shuffled ${shuffleRecords(m)} records — a dim stopped broadcasting")
  }

  test("a1: map-side combine holds — shuffle carries group rows only") {
    val m = measure("a1_pricing_summary")
    assert(shuffleRecords(m) < 200,
      s"a1 shuffled ${shuffleRecords(m)} records — partial aggregation lost")
  }

  test("j13: salted join replicates the dim, never shuffles the fact") {
    val m = measure("j13_salted_join")
    assert(shuffleRecords(m) < 1000,
      s"j13 shuffled ${shuffleRecords(m)} records — salt fell back to exchange")
  }

  test("s_cosine_topk: corpus is scanned, not shuffled, for the join") {
    val m = measure("s_cosine_topk")
    assert(shuffleRecords(m) < 1000,
      s"topk shuffled ${shuffleRecords(m)} records — queries stopped broadcasting")
  }

  test("pair-dedup family: no spill at test scale") {
    for (q <- Seq("d_minhash_lsh", "d_simhash", "t_edit_distance")) {
      val m = measure(q)
      assert(spillBytes(m) == 0, s"$q spilled ${spillBytes(m)} bytes")
    }
  }
}
