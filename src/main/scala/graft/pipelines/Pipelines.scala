package graft.pipelines

import graft.operators.{DedupMerge, RuleJoins, Windows}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.{dec, dsum}

/** Composable re-expressions of the reference's flagship programs
  * (SURVEY.md §7.0 `pipelines/`) — each a pure DataFrame → DataFrame
  * stage chain over the testdata star schema, exercised end-to-end by an
  * oracled query in [[graft.queries.PipelineQueries]].
  */
object Pipelines {

  /** usage_analysis.py:179-191 shape: date-window filter → broadcast rate
    * dim → spend derivation → daily rollup → cumulative spend. The
    * cumulative window is global-but-small: it runs over the
    * post-aggregation daily frame (one row per day), never the fact
    * table. */
  def usageAnalysis(orders: DataFrame, rates: DataFrame,
                    from: String, to: String): DataFrame = {
    val daily = orders
      .filter(col("o_orderdate").between(from, to))
      .join(broadcast(rates), Seq("o_orderpriority"))
      .withColumn("spend", col("o_totalprice") * col("rate"))
      .groupBy(col("o_orderdate").as("d"))
      .agg(dsum(col("spend")).as("daily_spend"))
    val w = Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)
    daily.withColumn("cumulative_spend",
      sum(dec(col("daily_spend"))).over(w).cast("double"))
  }

  /** servicenow_api_extract.py:2328-2368 shape: previous snapshot ∪
    * today's staging → newest version per business key wins. Version
    * order is pinned (ts, event_id) — the reference leaves equal-ts ties
    * nondeterministic (SURVEY §7.4-3). */
  def snapshotIngest(prev: DataFrame, staging: DataFrame): DataFrame =
    DedupMerge.snapshotMerge(prev, staging, Seq("user_id"),
      Seq(col("ts"), col("event_id")))

  /** pbi_airport_rls_example.py shape: row-level security — a
    * (principal, user) mapping table restricts the fact to the rows a
    * user may see, as a broadcast semi join (the fact is filtered in
    * place, never shuffled; the security table is tiny by nature). */
  def rlsRestrict(fact: DataFrame, security: DataFrame, principalCol: String,
                  user: String): DataFrame = {
    val allowed = security.filter(col("user") === user).select("principal")
    fact.join(broadcast(allowed),
      fact(principalCol) === allowed("principal"), "left_semi")
  }

  /** mlflow_pymatch_single_node.py shape: propensity-score matching —
    * each treated unit matches its nearest control by score within a
    * stratum. The reference's single-node matcher takes 13.3 minutes on
    * 129k rows (BASELINE.md); here it is two as-of joins over the
    * score-sorted union (nearest-below and nearest-above, then pick the
    * closer) — one shuffle per direction, linear in-partition work.
    * Strata partition the match space; controls are deduped to one id per
    * (stratum, score) so the choice is total-order deterministic. */
  def nearestScoreMatch(treated: DataFrame, controls: DataFrame,
                        stratumCol: String, scoreCol: String,
                        idCol: String): DataFrame = {
    import graft.operators.{AsOf, Windows}
    val ctl = Windows.dedupLatest(
        controls.select(col(stratumCol), col(scoreCol),
          col(idCol).as("ctl_id"), col(scoreCol).as("ctl_score")),
        Seq(stratumCol, scoreCol), Seq(col("ctl_id") * -1))
    val t = treated.select(col(stratumCol), col(scoreCol), col(idCol).as("t_id"))
    val below = AsOf.asofJoin(t, ctl, Seq(stratumCol), scoreCol, scoreCol,
        Seq("ctl_id", "ctl_score"))
      .withColumnRenamed("ctl_id", "below_id")
      .withColumnRenamed("ctl_score", "below_score")
    val withNeg = below.withColumn("__neg", -col(scoreCol))
    val ctlNeg = ctl.withColumn("__neg", -col(scoreCol))
      .select(col(stratumCol), col("__neg"),
        col("ctl_id").as("above_id"), col("ctl_score").as("above_score"))
    val both = AsOf.asofJoin(withNeg, ctlNeg, Seq(stratumCol), "__neg", "__neg",
        Seq("above_id", "above_score"))
    both.withColumn("matched_id",
        when(col("below_id").isNull, col("above_id"))
          .when(col("above_id").isNull, col("below_id"))
          .when(col(scoreCol) - col("below_score") <=
                col("above_score") - col(scoreCol), col("below_id"))
          .otherwise(col("above_id")))
      .select(col("t_id"), col(stratumCol), col("matched_id"))
  }

  /** bof_30_migrate.scala:64-110 + 1098-1103 shape: wildcard rule join
    * with rank-1 tie-keeping priority selection, then a band join on the
    * measure — both rule tables broadcast. */
  def ruleMigrate(fact: DataFrame, rules: DataFrame, bands: DataFrame): DataFrame = {
    val ruled = RuleJoins.wildcardRuleJoin(fact, rules,
      RuleJoins.wildcardMatch(rules("rp"), fact("o_orderpriority")) &&
        RuleJoins.wildcardMatch(rules("rs"), fact("o_orderstatus")),
      Seq("o_orderkey"), col("prio"))
    RuleJoins.rangeJoin(ruled, bands, col("o_totalprice"),
      col("lo"), col("hi") - lit(0.000001))
  }

  /** One resource of the servicenow extractor's per-resource config
    * (ref: dags/dataswm/servicenow_api_extract.py:185-216): typed
    * projections out of a raw JSON-string column via lenient casts, plus
    * the SCD dedup order for the nightly merge.
    *
    * @param name     resource selector in the shared raw table
    * @param fields   (outputCol, jsonPath, sqlType) triples — each becomes
    *                 `try_cast(get_json_object(json_value, path) AS type)`
    * @param dedupKey business key for the snapshot merge
    * @param orderBy  plain version columns — [[Windows.dedupLatest]]
    *                 orders them DESCENDING (newest wins); ties must be
    *                 pinned by adding tiebreak columns */
  case class ResourceSpec(name: String, fields: Seq[(String, String, String)],
                          dedupKey: String, orderBy: Seq[Column])

  /** servicenow_api_extract.py staging insert (ref :2313-2321): filter the
    * shared raw table to one resource, project typed columns from the raw
    * JSON — per-row parse cost only, no shuffle.
    *
    * When every path is top-level the JSON is parsed ONCE per row via
    * from_json into an all-string struct and then try_cast per field
    * (the reference's per-field JSON_EXTRACT_SCALAR parses the document
    * once per FIELD — 4 fields = 4 parses; at 100 TB the single-parse
    * form is the difference). Nested paths fall back to
    * get_json_object per field, which handles arbitrary paths. */
  def resourceStaging(raw: DataFrame, spec: ResourceSpec): DataFrame = {
    val filtered = raw.filter(col("resource_name") === spec.name)
    val flat = spec.fields.forall { case (_, path, _) =>
      path.startsWith("$.") && !path.stripPrefix("$.").contains(".")
    }
    if (flat) {
      val schema = org.apache.spark.sql.types.StructType(
        spec.fields.map { case (_, path, _) =>
          org.apache.spark.sql.types.StructField(path.stripPrefix("$."),
            org.apache.spark.sql.types.StringType)
        })
      filtered
        .withColumn("__doc", from_json(col("json_value"), schema))
        .select(spec.fields.map { case (out, path, t) =>
          expr(s"try_cast(__doc.${path.stripPrefix("$.")} AS $t)").as(out)
        }: _*)
    } else filtered
      .select(spec.fields.map { case (out, path, t) =>
        expr(s"try_cast(get_json_object(json_value, '$path') AS $t)").as(out)
      }: _*)
  }

  /** servicenow_api_extract.py nightly merge (ref :2328-2368): previous
    * destination partition ∪ today's staging, ROW_NUMBER()=1 per business
    * key in version order. The whole 14-resource × N-instance DAG is this
    * function in a loop over [[ResourceSpec]]s. */
  def resourceIngest(raw: DataFrame, spec: ResourceSpec,
                     prev: Option[DataFrame]): DataFrame = {
    val staged = resourceStaging(raw, spec)
    val merged = prev.fold(staged)(p =>
      DedupMerge.snapshotMerge(p, staged, Seq(spec.dedupKey), spec.orderBy))
    if (prev.isEmpty)
      Windows.dedupLatest(merged, Seq(spec.dedupKey), spec.orderBy)
    else merged
  }

  /** cloudtrail_analytics_snapshots.scala:13 shape: the streaming sink's
    * parquet output re-read as a direct-path SQL temp view
    * (`` select * from parquet.`path` ``) for ad-hoc analytics. Handles
    * the testdata's TIMESTAMP(NANOS) encoding the same way
    * [[graft.core.Tables.events]] does (nanosAsLong → timestamp_micros).
    * Returns the registered view name. */
  def registerSnapshotView(spark: SparkSession, parquetPath: String,
                           view: String): String = {
    val raw = spark.sql(s"select * from parquet.`$parquetPath`")
    val fixed =
      if (raw.schema.exists(_.name == "ts"))
        graft.core.Tables.normalizeEventTs(raw)
      else raw
    fixed.createOrReplaceTempView(view)
    view
  }

  /** cloudtrail_analytics_snapshots.scala:42-55 shape: per-user access
    * rollup over the snapshot view — MAX/MIN event time, event count,
    * lexical max/min event source. One hash aggregate, partial map-side
    * combine; scales with distinct users, not events. */
  def snapshotUserAccess(spark: SparkSession, view: String): DataFrame =
    spark.sql(
      s"""SELECT user_id,
         |  MAX(ts) AS max_time, MIN(ts) AS min_time,
         |  COUNT(*) AS row_count,
         |  MAX(event_type) AS max_source, MIN(event_type) AS min_source
         |FROM $view WHERE user_id IS NOT NULL
         |GROUP BY user_id""".stripMargin)

  /** cloudtrail_analytics_snapshots.scala:18-26 shape: event volume per
    * (YEAR-MONTH string, event type). */
  def snapshotMonthlyRollup(spark: SparkSession, view: String): DataFrame =
    spark.sql(
      s"""SELECT CAST(YEAR(ts) AS STRING) || '-' || CAST(MONTH(ts) AS STRING)
         |    AS month,
         |  event_type, COUNT(*) AS row_count
         |FROM $view GROUP BY 1, 2""".stripMargin)

  /** glue_catolog_copy_register_tables.py:10-108 shape: SHOW TABLES loop
    * over a source database → copy each table to a shared filesystem
    * location → `CREATE TABLE IF NOT EXISTS … USING parquet LOCATION` in
    * the target database (names prepended `temp_`) → per-table row-count
    * reconciliation. The loop is driver-side over table NAMES only
    * (catalog metadata); each copy is a distributed write. Returns
    * (table_name, n_rows) for the registered copies. */
  def catalogCopyRegister(spark: SparkSession, sourceDb: String,
                          targetDb: String, root: String,
                          exclude: Set[String] = Set.empty): DataFrame = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $targetDb")
    // SHOW TABLES also lists the session's temp views — keep only real
    // tables of the source database
    val names = spark.sql(s"SHOW TABLES IN $sourceDb")
      .filter(!col("isTemporary"))
      .select("tableName").collect().map(_.getString(0))
      .filterNot(exclude).sorted
    val counts = names.map { t =>
      val loc = s"$root/$t"
      spark.table(s"$sourceDb.$t").write.mode("overwrite").parquet(loc)
      spark.sql(s"DROP TABLE IF EXISTS $targetDb.temp_$t")
      spark.sql(s"CREATE TABLE IF NOT EXISTS $targetDb.temp_$t " +
        s"USING parquet LOCATION '$loc'")
      t -> spark.table(s"$targetDb.temp_$t").count()
    }
    import spark.implicits._
    counts.toSeq.toDF("table_name", "n_rows")
  }

  /** hive_to_hive_cte.py:42-158 shape — the reference's 8-CTE flexible-
    * bundle migration, composed as one call: a JSON `metadata` blob per
    * bundle is flag-filtered (`$.flexibleBundle = 'true'`), its
    * `$.bundledItems` array is bracket-stripped / split / re-wrapped and
    * exploded LATERAL-VIEW style (ref :59), each fragment re-parsed with
    * get_json_object (ref :55-57); items resolve against a primary and a
    * fallback catalog by a two-key (inventory, item number) left join with
    * a three-way id coalesce (ref :96-104); legacy bundles union in with
    * the reference's CASE discount normalization (ref :85-89); and four
    * chained left-outer release-date lookups finish with coalesce defaults
    * (ref :141-158).
    *
    * Scale notes: each lookup side is keyed-unique (the joins stay 1:≤1)
    * and dimension-sized, so Catalyst broadcasts them under AQE while the
    * exploded fact side never shuffles before its joins; the JSON
    * re-parse per fragment is get_json_object (codegen'd), not a UDF.
    *
    * Inputs (column contracts):
    *   - buyItems: (bundle_id string, metadata string)
    *   - catalog: (inv int, item_num long, item_id string), item_num unique
    *   - catalogNA: (inv int, item_num long, item_id_na string), unique
    *   - oldBundles: (bundle_id string, item_id string, disc_rp int)
    *   - bundle/item releases: (key string, rd date), key unique
    * Output: (bundle_id, item_id, bundle_release_date, item_release_date,
    * discount). */
  def flexibleBundleMigrate(buyItems: DataFrame,
                            catalog: DataFrame, catalogNA: DataFrame,
                            oldBundles: DataFrame,
                            bundleReleases: DataFrame, bundleReleasesNA: DataFrame,
                            itemReleases: DataFrame, itemReleasesNA: DataFrame): DataFrame = {
    // sib_partial: flag filter + array-text extraction + bracket strip
    val sibPartial = buyItems
      .filter(get_json_object(col("metadata"), "$.flexibleBundle") === "true")
      .select(col("bundle_id"),
        expr("substring(get_json_object(metadata, '$.bundledItems'), 3, " +
          "length(get_json_object(metadata, '$.bundledItems')) - 4)").as("core"))
    // sib: explode the item fragments, re-wrap each as an object, re-parse
    def frag(path: String) =
      get_json_object(concat(lit("{"), col("blob"), lit("}")), path)
    val sib = sibPartial
      .select(col("bundle_id"), explode(split(col("core"), "\\},\\{")).as("blob"))
      .select(col("bundle_id"),
        frag("$.itemId").cast("long").as("item_num"),
        frag("$.discount").cast("double").as("discount"),
        frag("$.inv").cast("int").as("inv"))
    // sb: two-catalog resolution + legacy union (CASE normalization)
    val resolved = sib
      .join(catalog, Seq("inv", "item_num"), "left")
      .join(catalogNA, Seq("inv", "item_num"), "left")
      .select(col("bundle_id"),
        coalesce(col("item_id"), col("item_id_na"), col("bundle_id")).as("item_id"),
        col("discount"))
    val legacy = oldBundles.select(col("bundle_id"), col("item_id"),
      when(col("disc_rp") === 0, 1.0)
        .otherwise(round(lit(1.0) - col("disc_rp") / 100.0, 2)).as("discount"))
    val sb = resolved.unionByName(legacy)
    // final: four chained left-outer release lookups + coalesce defaults
    def rel(df: DataFrame, as: String) =
      df.select(col("key").as(s"__k_$as"), col("rd").as(s"__rd_$as"))
    sb
      .join(rel(bundleReleases, "b"), col("bundle_id") === col("__k_b"), "left")
      .join(rel(bundleReleasesNA, "bna"), col("bundle_id") === col("__k_bna"), "left")
      .join(rel(itemReleases, "i"), col("item_id") === col("__k_i"), "left")
      .join(rel(itemReleasesNA, "ina"), col("item_id") === col("__k_ina"), "left")
      .select(col("bundle_id"), col("item_id"),
        coalesce(col("__rd_b"), col("__rd_bna")).as("bundle_release_date"),
        coalesce(col("__rd_i"), col("__rd_ina")).as("item_release_date"),
        coalesce(col("discount"), lit(0.0)).as("discount"))
  }
}
