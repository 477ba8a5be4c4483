package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot dedup-merge — the reference's daily SCD pattern
  * (ref: `servicenow_api_extract.py:2328-2368`: previous snapshot ∪ today's
  * staging, newest version per business key wins). SURVEY.md §7.4-3: the
  * reference leaves equal-timestamp ties nondeterministic; we require the
  * caller to pin a total order (version columns + tiebreak).
  */
object DedupMerge {

  /** prev ∪ staging → latest-per-key. One shuffle on `keys` (the union is
    * shuffle-free); at 100 TB both inputs should already be partitioned by
    * the key for exchange reuse. */
  def snapshotMerge(prev: DataFrame, staging: DataFrame, keys: Seq[String],
                    versionOrder: Seq[Column]): DataFrame =
    Windows.dedupLatest(prev.unionByName(staging), keys, versionOrder)

  /** Aggregate-then-join-back dedup (A11; ref: `sas_conversion…sql:184-189`
    * max(provid) per encid re-attached; `partiton_by_date…py:198-245`).
    * Equivalent to dedupLatest but expressed as the reference does it. */
  def latestByAggJoin(df: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val latest = df.groupBy(keys.map(col): _*)
      .agg(max(col(versionCol)).as(versionCol))
    df.join(latest, keys :+ versionCol)
  }
}
