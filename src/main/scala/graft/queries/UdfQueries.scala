package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Parsed log record for the typed Dataset.map port (F8; ref:
  * notebooks/databricks/scala/logparsing.scala:42-77 — regex line parse
  * into a case class via an implicit product Encoder). */
case class EventLine(event_type: String, user_id: Long, value: Double)

/** Struct payload for the F4 struct-returning udf. */
case class PrioParts(num: Int, label: String)

/** Buffer for [[GeoMean]] — decimal ln-sum + count. The sum is of
  * per-row 6-dp-rounded ln values (exact decimal addition, so the
  * aggregate is order-insensitive — the same trick as `dsum`), which is
  * what lets a custom UDAF produce a hash-stable double under Spark's
  * nondeterministic partial-aggregation order. */
case class GeoBuf(s: BigDecimal, n: Long)

/** F6 custom typed UDAF (ref has none — capability beyond the survey's
  * declared scope): exact-decimal geometric mean via
  * `org.apache.spark.sql.expressions.Aggregator` + `functions.udaf`.
  * Non-positive and null inputs are skipped (ln undefined), mirroring
  * SQL aggregate null semantics. */
object GeoMean extends org.apache.spark.sql.expressions.Aggregator[
    java.lang.Double, GeoBuf, Double] {
  private def lnDec(x: Double): BigDecimal =
    BigDecimal(math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  def zero: GeoBuf = GeoBuf(BigDecimal(0), 0L)
  def reduce(b: GeoBuf, x: java.lang.Double): GeoBuf =
    // NaN/Infinity join null and non-positives as ln-undefined skips:
    // they pass a bare `<= 0` guard (NaN compares false) and
    // BigDecimal(log(x)) would then throw, failing the whole job
    if (x == null || x.isNaN || x.isInfinite || x <= 0.0) b
    else GeoBuf(b.s + lnDec(x), b.n + 1)
  def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.s + b.s, a.n + b.n)
  def finish(b: GeoBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.s.toDouble / b.n)
  def bufferEncoder: org.apache.spark.sql.Encoder[GeoBuf] =
    org.apache.spark.sql.Encoders.product[GeoBuf]
  def outputEncoder: org.apache.spark.sql.Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}

/** UDF-surface catalog (SURVEY.md §2.10 F1-F4, F8).
  *
  * Everything here is deliberately ALSO expressible with native functions —
  * graft's style rule is "functions, not UDFs" (UDFs are codegen opaque: no
  * predicate pushdown through them, no whole-stage fusion). These queries
  * exist to prove the capability the reference uses heavily:
  * udf-from-val (bof_30_migrate.scala:189,447,462), spark.udf.register
  * (sap_bw_api.scala:227), typed Dataset.map (logparsing.scala:42-77).
  * The DuckDB oracles are the native-SQL equivalents, so a green row also
  * proves UDF-vs-native semantic parity.
  */
object UdfQueries {

  /** F1: unallowable-character flag, the sap_bw_api.scala:227 shape. */
  private val hasBadChar = udf((s: String) =>
    s != null && !s.matches("[A-Za-z0-9 #_-]*"))

  /** F2: two-arg udf — status-conditional discount. */
  private val discounted = udf((price: Double, status: String) =>
    if (status == "F") price * 0.9 else price)

  val queries: Map[String, Q] = Map(
    // F1+F2 udf vals applied as Columns.
    "f_udf_scalar" -> { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .withColumn("bad_name", hasBadChar(col("c_name")))
        .withColumn("eff_price", discounted(col("o_totalprice"), col("o_orderstatus")))
        .groupBy(col("o_orderstatus"), col("bad_name"))
        .agg(count(lit(1)).as("n"), dsum(col("eff_price")).as("eff_total"))
        .orderBy(col("o_orderstatus"), col("bad_name"))
    },

    // F3 spark.udf.register + use from SQL string (selectExpr).
    "f_udf_register" -> { (s, dir) =>
      s.udf.register("prio_num", (p: String) => p.split("-")(0).toInt)
      Tables.orders(s, dir)
        .selectExpr("prio_num(o_orderpriority) AS prio_num", "o_totalprice")
        .groupBy(col("prio_num"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("prio_num"))
    },

    // F4 struct-returning udf (the schema-evolution shim shape:
    // one udf emits several derived fields at once).
    "f_udf_struct" -> { (s, dir) =>
      val parsePrio = udf((p: String) => {
        val parts = p.split("-", 2)
        PrioParts(parts(0).toInt, if (parts.length > 1) parts(1) else "")
      })
      Tables.orders(s, dir)
        .withColumn("pp", parsePrio(col("o_orderpriority")))
        .select(col("pp.num").as("prio_num"), col("pp.label").as("prio_label"))
        .groupBy(col("prio_num"), col("prio_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prio_num"))
    },

    // Jar-shipped Hive-UDF registration form (ref: windowed_lagN_awskms_
    // postgres_date_partition.py:61-64 — `create temporary function
    // geog_ip_ext as 'com.acme...GeogIPExt'`, guarded by SHOW FUNCTIONS).
    // The SQL DDL needs a Hive catalog; HiveUdfRegistrar is the
    // catalog-neutral equivalent — reflectively loads the Hive-contract
    // class and registers it as the same named SQL function, idempotent.
    // The oracle re-derives the geo bucket arithmetically, proving the
    // class-loaded function computes what it claims.
    "f_hive_udf_class" -> { (s, dir) =>
      graft.functions.HiveUdfRegistrar.registerIfAbsent(
        s, "region_of_ip", "graft.functions.RegionOfIpUdf")
      Tables.customer(s, dir)
        .withColumn("ip",
          when(col("c_custkey") % 100 === 0, lit("not-an-ip"))
            .otherwise(concat(
              (col("c_custkey") % 256).cast("string"), lit("."),
              ((col("c_custkey") * 7) % 256).cast("string"), lit(".1.2"))))
        .selectExpr("coalesce(region_of_ip(ip), 'INVALID') AS region",
          "c_acctbal")
        .groupBy(col("region"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("bal"))
        .orderBy(col("region"))
    },

    // F8 typed Dataset.map with a case-class Encoder: serialize each event
    // to a delimited log line, then parse it back (logparsing.scala port).
    "f_typed_map_logparse" -> { (s, dir) =>
      import s.implicits._
      val lines = Tables.events(s, dir)
        .select(concat_ws("|", col("event_type"), col("user_id"), col("value")))
        .as[String]
      val parsed = lines.map { line =>
        val Array(t, u, v) = line.split("\\|", 3)
        EventLine(t, u.toLong, v.toDouble)
      }
      parsed.toDF()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             countDistinct(col("user_id")).as("n_users"),
             dsum(col("value")).as("value_sum"))
        .orderBy(col("event_type"))
    },

    // F5 udf over ML VectorUDT (ref: automl_linearreg_process_stocks.py:
    // 470-474 — a udf consuming org.apache.spark.ml.linalg vectors).
    // Assemble per-line features into a DenseVector, then a second udf
    // CONSUMES the vector (element extract + L2 norm) — the UDT crosses
    // the udf boundary in both directions. Per-row sqrt is IEEE-identical
    // to the oracle's arithmetic re-derivation; dsum makes the aggregate
    // order-insensitive.
    "f_vector_udf" -> { (s, dir) =>
      import org.apache.spark.ml.linalg.{Vector, Vectors}
      val assemble = udf((q: Double, p: Double, d: Double) =>
        Vectors.dense(q, p, d))
      val firstEl = udf((v: Vector) => v(0))
      val l2 = udf((v: Vector) =>
        math.sqrt(v.toArray.foldLeft(0.0)((acc, x) => acc + x * x)))
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          assemble(col("l_quantity"), col("l_extendedprice"),
            col("l_discount")).as("fv"))
        .select(col("l_returnflag"),
          firstEl(col("fv")).as("q"), l2(col("fv")).as("nrm"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("q")).as("q_sum"),
          dsum(col("nrm")).as("norm_sum"))
        .orderBy(col("l_returnflag"))
    },

    // F6 custom UDAF: decimal-exact geometric mean of l_quantity per
    // return flag through the Aggregator/udaf registration path.
    "f_udaf_geomean" -> { (s, dir) =>
      val geomean = udaf(GeoMean)
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          geomean(col("l_quantity")).as("geomean_qty"))
        .orderBy(col("l_returnflag"))
    }
  )

  val oracle: Map[String, String] = Map(
    "f_udf_scalar" ->
      s"""SELECT o.o_orderstatus,
         |  NOT regexp_full_match(c.c_name, '[A-Za-z0-9 #_-]*') AS bad_name,
         |  COUNT(*) AS n,
         |  ${sqlDsum("CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice * 0.9 ELSE o.o_totalprice END")} AS eff_total
         |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "f_udf_register" ->
      s"""SELECT CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num,
         |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "f_udf_struct" ->
      """SELECT CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num,
        |  COALESCE(string_split(o_orderpriority, '-')[2], '') AS prio_label,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "f_hive_udf_class" ->
      s"""SELECT CASE WHEN c_custkey % 100 = 0 THEN 'INVALID'
         |  ELSE 'REGION_' || CAST(((c_custkey % 256) * 7 + (c_custkey * 7) % 256) % 5 AS VARCHAR)
         |  END AS region,
         |  COUNT(*) AS n, ${sqlDsum("c_acctbal")} AS bal
         |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "f_typed_map_logparse" ->
      s"""SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
         |  ${sqlDsum("value")} AS value_sum
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "f_vector_udf" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${sqlDsum("l_quantity")} AS q_sum,
         |  ${sqlDsum("SQRT(l_quantity * l_quantity + l_extendedprice * l_extendedprice + l_discount * l_discount)")} AS norm_sum
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "f_udaf_geomean" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  EXP(CAST(SUM(CAST(LN(l_quantity) AS DECIMAL(18,6))) AS DOUBLE)
        |      / COUNT(*)) AS geomean_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
