package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketches — the "find the hot keys without
  * grouping by the key" family.
  *
  * At 100 TB a `groupBy(key)` over a high-cardinality key shuffles (and
  * spills) one row per distinct key per partition; when the point of the
  * query is only the handful of HEAVY keys (skew diagnosis, stop-word
  * discovery, abuse detection), a Misra-Gries pass bounds executor
  * memory at k counters and the shuffle at partitions·k rows, and a
  * second exact pass over just the candidates makes the answer exact —
  * the sketch never decides the output, only prunes the work.
  */
object Sketches {

  /** Per-partition Misra-Gries summary (capacity k): processes the
    * iterator with at most k counters; any item whose LOCAL count
    * exceeds localN/k survives. mapPartitions is the right tool here —
    * this is genuinely imperative per-partition state (a bounded counter
    * map), not row-at-a-time logic a Column could express. */
  private def mgSummary(it: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val counters = new java.util.HashMap[String, Long](k * 2)
    var localN = 0L
    while (it.hasNext) {
      val x = it.next()
      if (x != null) {
        localN += 1
        val c = counters.get(x)
        if (c != 0L || counters.containsKey(x)) counters.put(x, c + 1)
        else if (counters.size < k) counters.put(x, 1L)
        else {
          // decrement-all, dropping zeros (amortized O(1) per row)
          val iter = counters.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1)
          }
        }
      }
    }
    val out = Seq.newBuilder[(String, Long)]
    counters.keySet().forEach(key => out += ((key, 0L)))
    out += ((null, localN)) // one local-total row per partition
    out.result().iterator
  }

  /** EXACT heavy hitters — every key with count·k > total row count
    * (frequency strictly above n/k) — in two passes:
    *
    * 1. candidate pass: per-partition Misra-Gries (capacity k). A
    *    globally heavy key is locally heavy in ≥1 partition (if its
    *    local count were ≤ localN/k everywhere, summing gives global
    *    ≤ n/k), so the union of partition summaries is a SUPERSET of
    *    the answer. Shuffle: ≤ partitions·k candidate rows + one
    *    local-count row per partition.
    * 2. exact pass: count ONLY candidate-keyed rows (broadcast semi
    *    join) and keep those with cnt·k > n — integer arithmetic, no
    *    division, so the threshold is exact in any engine.
    *
    * NULL keys are ignored (a NULL is not a key). Output:
    * (keyCol STRING, cnt LONG), exact — order-of-arrival inside the
    * sketch never affects the result, only which non-answers get
    * pruned early. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 1, "heavyHitters needs k > 1")
    val spark = df.sparkSession
    import spark.implicits._
    val keys: Dataset[String] =
      df.select(col(keyCol).cast("string")).as[String]
    // materialize the tiny summary (≤ partitions·(k+1) rows) ONCE —
    // candidates and total are two consumers, and without this each
    // re-runs the full sketch scan, making three input passes of the
    // documented two
    val summary = keys.mapPartitions(it => mgSummary(it, k))
      .toDF("__key", "__local_n")
      .localCheckpoint(true)
    val candidates = summary.filter(col("__key").isNotNull)
      .select(col("__key").as(keyCol)).distinct()
    val total = summary.filter(col("__key").isNull)
      .agg(sum(col("__local_n")).as("__n"))
    df.select(col(keyCol).cast("string").as(keyCol))
      .filter(col(keyCol).isNotNull)
      .join(broadcast(candidates), keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("__n"))
      .select(col(keyCol), col("cnt"))
  }
}
