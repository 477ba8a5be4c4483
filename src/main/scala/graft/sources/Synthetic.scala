package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S14: deterministic synthetic table generator — `spark.range` plus
  * arithmetic-only derived columns (Knuth multiplicative hash), so any
  * engine can reproduce the table exactly (no RNG, no hash-function
  * dependency). The reference's generators (tpcds_automated_population.py)
  * shell out to dsdgen; this is the in-engine analogue for tests and
  * benchmarks, distributed by construction (range is split across
  * executors, every derived column is codegen'd arithmetic). */
object Synthetic {

  private val Knuth = 2654435761L

  /** n rows: id, bucket = id % buckets, val = (id * 2654435761) % 997. */
  def table(spark: SparkSession, n: Long, buckets: Int = 7): DataFrame =
    spark.range(n).select(
      col("id"),
      (col("id") % buckets).as("bucket"),
      ((col("id") * Knuth) % 997).as("val"))
}
