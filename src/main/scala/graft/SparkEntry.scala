package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every per-family query catalog into the single map the
  * driver's correctness (DuckDB oracle at sf0.01) and bench (sf0.1) runs
  * consume. Each catalog object owns its `queries` and `oracle` maps so a
  * family can be developed and tested in isolation; this object is pure
  * wiring.
  */
object SparkEntry {

  private val catalogs: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (AggQueries.queries, AggQueries.oracle),
    (JoinQueries.queries, JoinQueries.oracle),
    (WindowQueries.queries, WindowQueries.oracle),
    (FuncQueries.queries, FuncQueries.oracle),
    (SetQueries.queries, SetQueries.oracle),
    (MiscQueries.queries, MiscQueries.oracle),
    (UdfQueries.queries, UdfQueries.oracle),
    (DedupQueries.queries, DedupQueries.oracle),
    (TextQueries.queries, TextQueries.oracle),
    (SimQueries.queries, SimQueries.oracle),
    (IoQueries.queries, IoQueries.oracle),
    (StreamQueries.queries, StreamQueries.oracle),
    (DqQueries.queries, DqQueries.oracle),
    (MultimodalQueries.queries, MultimodalQueries.oracle),
    (PipelineQueries.queries, PipelineQueries.oracle),
    (DataPrepQueries.queries, DataPrepQueries.oracle),
    (OlapQueries.queries, OlapQueries.oracle),
    (AnalyticsQueries.queries, AnalyticsQueries.oracle),
    (MlQueries.queries, MlQueries.oracle),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary — exercises scan, filter pushdown,
    * hash aggregate, and sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.queries("a1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    catalogs.iterator.map(_._2).reduce(_ ++ _)
}
