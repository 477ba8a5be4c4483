package graft.queries

import graft.core.Tables
import graft.functions.DateOps
import org.apache.spark.sql.functions._

/** Scalar-function catalog (SURVEY.md §2.8): string / date / conditional /
  * JSON / generator families, each checked against a DuckDB-dialect twin.
  */
object FuncQueries {

  val queries: Map[String, Q] = Map(
    // String family (ref: §2.8 string row — substr/length/concat/regexp_*).
    "f_string_ops" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          substring(col("p_name"), 1, 4).as("name_head"),
          length(col("p_name")).as("name_len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
          regexp_replace(col("p_name"), "\\s+", "_").as("name_snake"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          reverse(col("p_name")).as("name_rev"),
          col("p_name").like("%widget%").as("is_widget"))
        .orderBy("p_partkey")
    },

    // Date family (ref: §2.8 date/time row).
    "f_date_ops" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          to_date(col("o_orderdate")).as("order_date"),
          date_add(to_date(col("o_orderdate")), 30).as("due_date"),
          last_day(col("o_orderdate")).as("month_end"),
          datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))).as("age_days"),
          unix_timestamp(col("o_orderdate")).as("epoch_sec"))
        .orderBy("o_orderkey")
    },

    // The reference's custom yyyyMMdd UDF family, re-expressed natively
    // (ref: bof_30_migrate.scala:425-523 + :170-189 fiscal).
    "f_yyyymmdd_ops" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyyMMdd").as("d8"))
      base.select(
          col("o_orderkey"),
          col("d8"),
          DateOps.addDaysYyyymmdd(col("d8"), lit(45)).as("d8_plus45"),
          DateOps.lastDayOfMonthYyyymmdd(col("d8")).as("d8_eom"),
          DateOps.fiscalYyyymm(col("d8")).as("fiscal_ym"),
          DateOps.lagDateYyyymm00(col("d8")).as("lag_ym00"))
        .orderBy("o_orderkey")
    },

    // Conditional family: nested when/otherwise decision tree + coalesce
    // (ref: bof_30_migrate.scala:191-215; mlflow CASE bucketing).
    "f_case_buckets" -> { (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("price_band",
          when(col("o_totalprice") < 50000.0, "low")
            .when(col("o_totalprice") < 150000.0, "mid")
            .when(col("o_totalprice") < 300000.0, "high")
            .otherwise("extreme"))
        .withColumn("urgency",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
        .groupBy("price_band", "urgency")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("price_band", "urgency")
    },

    // JSON family: get_json_object / from_json over the events props column
    // (ref: hive_to_hive_cte.py:46-58; usage_analysis.py:75).
    "f_json_extract" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .groupBy("k_val")
        .agg(count(lit(1)).as("n"))
        .orderBy("k_val")
    },

    // Deterministic LISTAGG: collect_list is unordered by contract, so
    // the report-formatting shape sorts the array before joining —
    // parallelism-invariant output, the only safe form at any scale.
    "f_string_agg" -> { (s, dir) =>
      Tables.nation(s, dir)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list(col("n_name"))), ",").as("names"))
        .orderBy(col("n_regionkey"))
    },

    // Array higher-order functions — sequence → transform → filter →
    // aggregate, the codegen'd lambda surface that replaces per-row UDF
    // loops over array columns. Arrays are constructed arithmetically so
    // the oracle rebuilds them with DuckDB's list_* twins.
    "f_array_hof" -> { (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("arr",
          sequence(lit(1), (col("o_orderkey") % 5 + 3).cast("int")))
        .withColumn("evens",
          filter(transform(col("arr"), x => x * (col("o_orderkey") % 7 + 1)),
            x => x % 2 === 0))
        .select((col("o_orderkey") % 5).as("len_class"),
          size(col("evens")).as("n_even"),
          aggregate(col("evens"), lit(0L), (a, x) => a + x).as("even_sum"))
        .groupBy(col("len_class"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_even")).cast("long").as("even_count_sum"),
          sum(col("even_sum")).cast("long").as("even_sum_sum"))
        .orderBy(col("len_class"))
    },

    // Generator family: explode(split(...)) = LATERAL VIEW word expansion
    // (ref: hive_to_hive_cte.py:59; gcp_test.py:82-97 wordcount).
    "f_explode_wordcount" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
    },

    // Generator family: stack() unpivot (ref: sas_conversion…sql:240).
    "f_stack_unpivot" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          dsum(col("l_quantity")).as("qty"),
          dsum(col("l_extendedprice")).as("price"),
          dsum(col("l_discount")).as("disc"))
        .select(col("l_returnflag"),
          expr("stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (metric, value)"))
        .orderBy("l_returnflag", "metric")
    },

    // Map family: create_map packing + element_at access — the f-map pattern
    // (ref: from_api_call_to_columnar_db.py:565-578; fmaps…py:43-77).
    // Output unpacks to scalars so the oracle does not depend on map
    // physical encoding.
    "f_map_pack_unpack" -> { (s, dir) =>
      Tables.customer(s, dir)
        .withColumn("f", map(
          lit("name"), col("c_name"),
          lit("segment"), col("c_mktsegment"),
          lit("bal"), col("c_acctbal").cast("string")))
        .select(
          col("c_custkey"),
          element_at(col("f"), "name").as("f_name"),
          element_at(col("f"), "segment").as("f_segment"),
          element_at(col("f"), "bal").cast("double").as("f_bal"),
          array_contains(map_keys(col("f")), "segment").as("has_segment"))
        .orderBy("c_custkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "f_string_ops" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  substring(p_name, 1, 4) AS name_head,
        |  length(p_name) AS name_len,
        |  p_brand || ':' || p_type AS brand_type,
        |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
        |  regexp_replace(p_name, '\s+', '_', 'g') AS name_snake,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  reverse(p_name) AS name_rev,
        |  p_name LIKE '%widget%' AS is_widget
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f_date_ops" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f_yyyymmdd_ops" ->
      """WITH base AS (
        |  SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d') AS d8,
        |         CAST(o_orderdate AS DATE) AS d
        |  FROM orders)
        |SELECT o_orderkey, d8,
        |  strftime(d + 45, '%Y%m%d') AS d8_plus45,
        |  strftime(last_day(d), '%Y%m%d') AS d8_eom,
        |  CASE WHEN month(d) >= 10
        |    THEN format('{:04d}{:02d}', CAST(year(d) + 1 AS INT), CAST(month(d) - 9 AS INT))
        |    ELSE format('{:04d}{:02d}', CAST(year(d) AS INT), CAST(month(d) + 3 AS INT))
        |  END AS fiscal_ym,
        |  strftime(date_trunc('month', d) + INTERVAL 2 MONTH, '%Y%m') || '00' AS lag_ym00
        |FROM base ORDER BY o_orderkey""".stripMargin,

    "f_case_buckets" ->
      s"""WITH t AS (
         |  SELECT o_totalprice,
         |    CASE WHEN o_totalprice < 50000.0 THEN 'low'
         |         WHEN o_totalprice < 150000.0 THEN 'mid'
         |         WHEN o_totalprice < 300000.0 THEN 'high'
         |         ELSE 'extreme' END AS price_band,
         |    CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS urgency
         |  FROM orders)
         |SELECT price_band, urgency, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM t GROUP BY price_band, urgency ORDER BY price_band, urgency""".stripMargin,

    "f_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_val, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY k_val""".stripMargin,

    "f_string_agg" ->
      """SELECT n_regionkey, COUNT(*) AS n,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,

    "f_array_hof" ->
      """WITH t AS (
        |  SELECT o_orderkey % 5 AS len_class,
        |    list_filter(
        |      list_transform(generate_series(1, CAST(o_orderkey % 5 + 3 AS INT)),
        |        x -> x * (o_orderkey % 7 + 1)),
        |      x -> x % 2 = 0) AS evens
        |  FROM orders)
        |SELECT len_class, COUNT(*) AS n,
        |  CAST(SUM(len(evens)) AS BIGINT) AS even_count_sum,
        |  CAST(SUM(list_aggregate(evens, 'sum')) AS BIGINT) AS even_sum_sum
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "f_explode_wordcount" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY cnt DESC, word""".stripMargin,

    "f_stack_unpivot" ->
      s"""WITH agg AS (
         |  SELECT l_returnflag,
         |    ${sqlDsum("l_quantity")} AS qty,
         |    ${sqlDsum("l_extendedprice")} AS price,
         |    ${sqlDsum("l_discount")} AS disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, metric, value FROM (
         |  SELECT l_returnflag, 'qty' AS metric, qty AS value FROM agg
         |  UNION ALL SELECT l_returnflag, 'price', price FROM agg
         |  UNION ALL SELECT l_returnflag, 'disc', disc FROM agg)
         |ORDER BY l_returnflag, metric""".stripMargin,

    "f_map_pack_unpack" ->
      """SELECT c_custkey,
        |  c_name AS f_name,
        |  c_mktsegment AS f_segment,
        |  CAST(CAST(c_acctbal AS VARCHAR) AS DOUBLE) AS f_bal,
        |  TRUE AS has_segment
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
