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

  /** SCD Type-2 apply: merge an incoming snapshot into a versioned
    * history table carrying `valid_from`/`valid_to` (NULL = current).
    *
    * Per business key, against the CURRENT slice of the history:
    *  - attribute change → the old version closes (`valid_to` =
    *    `effective`) and the incoming row inserts as the new current;
    *  - key absent from the incoming snapshot → the version closes
    *    (a full-snapshot feed implies deletion);
    *  - new key → inserts as current; unchanged → carried as is.
    * Already-closed versions pass through untouched.
    *
    * The merge is ONE full-outer join on the key (both sides should be
    * key-partitioned at scale for exchange reuse) plus a null-safe
    * any-attribute-differs comparison; history grows append-only, so
    * the output is a plain union of closed ∪ carried ∪ inserted.
    * `incoming` must be one row per key (a snapshot, not a changelog —
    * run [[snapshotMerge]]'s dedup first for changelogs). */
  def scd2Apply(history: DataFrame, incoming: DataFrame, keys: Seq[String],
                attrs: Seq[String], effective: String): DataFrame = {
    val cols = keys ++ attrs
    val closedBefore = history.filter(col("valid_to").isNotNull)
    // side presence comes from explicit marker columns, NOT key
    // null-checks: the join is null-safe, so a legitimately null-keyed
    // row would otherwise read as "absent" on its own side and fall
    // through every branch — silently vanishing from the history
    val current = history.filter(col("valid_to").isNull)
      .select((cols :+ "valid_from").map(col): _*)
      .withColumn("__in_h", lit(true))
    val inc = incoming.select(cols.map(col): _*)
      .withColumn("__in_i", lit(true))
    val h = current.alias("__h")
    val i = inc.alias("__i")
    val joined = h.join(i,
      keys.map(k => col(s"__h.$k") <=> col(s"__i.$k")).reduce(_ && _),
      "full_outer")
    val presentH = col("__h.__in_h").isNotNull
    val presentI = col("__i.__in_i").isNotNull
    val changed = attrs.map(a => !(col(s"__h.$a") <=> col(s"__i.$a")))
      .reduceOption(_ || _).getOrElse(lit(false))
    // closes: current versions whose key vanished or whose attrs changed
    val closes = joined.filter(presentH && (!presentI || changed))
      .select(cols.map(c => col(s"__h.$c")) :+ col("__h.valid_from") :+
        lit(effective).cast("date").as("valid_to"): _*)
    // carries: unchanged current versions keep their open interval
    val carries = joined.filter(presentH && presentI && !changed)
      .select(cols.map(c => col(s"__h.$c")) :+ col("__h.valid_from") :+
        lit(null).cast("date").as("valid_to"): _*)
    // inserts: new keys and the new version of changed keys
    val inserts = joined.filter(presentI && (!presentH || changed))
      .select(cols.map(c => col(s"__i.$c")) :+
        lit(effective).cast("date").as("valid_from") :+
        lit(null).cast("date").as("valid_to"): _*)
    closedBefore.select((cols :+ "valid_from" :+ "valid_to").map(col): _*)
      .unionByName(closes).unionByName(carries).unionByName(inserts)
  }
}
