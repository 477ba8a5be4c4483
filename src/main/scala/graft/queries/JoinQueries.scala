package graft.queries

import graft.core.Tables
import graft.operators.RuleJoins
import org.apache.spark.sql.functions._

/** Join operator catalog (SURVEY.md §2.3).
  *
  * Physical-plan intent at scale: `nation`/`region`/rule CTE tables are
  * broadcast (no shuffle of the fact side); customer⋈orders and
  * orders⋈lineitem shuffle on their keys once; AQE handles skew.
  */
object JoinQueries {

  val queries: Map[String, Q] = Map(
    // J1/J17 star-schema multi-dim join with broadcast dims
    // (ref: pbi_airport_rls_example.py:72-109).
    "j1_star_revenue" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"), col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"), col("c_mktsegment"))
    },

    // J3 left outer join keeping unmatched fact rows
    // (ref: bof_30_migrate.scala:64-78; hive_to_hive_cte.py:96-103).
    "j3_left_outer" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))
        .orderBy(col("c_custkey"))
    },

    // J11 anti join (ref: partiton_by_date…py:121-133 SQL anti join).
    "j11_anti_customers_no_orders" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // J12 semi join / EXISTS (ref: dq_check_for_target_table.py:179-193).
    "j12_semi_customers_with_f_orders" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F").select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // J8 range/band join against a small broadcast band table
    // (ref: bof_30_migrate.scala:1098-1103 BLOPRCTR..BHIPRCTR).
    "j8_range_band" -> { (s, dir) =>
      import s.implicits._
      val bands = Seq(
        ("S", 0.0, 10.0), ("M", 10.0, 25.0), ("L", 25.0, 40.0), ("XL", 40.0, 1e9)
      ).toDF("qty_band", "lo", "hi")
      val li = Tables.lineitem(s, dir)
      RuleJoins.rangeJoin(li, bands, col("l_quantity"), col("lo"), col("hi") - lit(0.000001))
        .groupBy(col("qty_band"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total_price"))
        .orderBy(col("qty_band"))
    },

    // J5 full-outer coalesce merge = upsert (ref: joinIngestBofs,
    // bof_30_migrate.scala:38-52). "Existing" = O-status orders, "incoming"
    // = F-status; incoming wins on shared keys.
    "j5_outer_coalesce_merge" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val existing = o.filter(col("o_orderstatus") =!= "F")
        .select(col("o_custkey"), col("o_orderpriority"),
                col("o_totalprice").as("price_a"))
        .groupBy("o_custkey", "o_orderpriority")
        .agg(dsum(col("price_a")).as("price_a"))
      val incoming = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"), col("o_orderpriority"),
                col("o_totalprice").as("price_b"))
        .groupBy("o_custkey", "o_orderpriority")
        .agg(dsum(col("price_b")).as("price_b"))
      RuleJoins.outerCoalesceMerge(existing, incoming, Seq("o_custkey", "o_orderpriority"))
        .orderBy("o_custkey", "o_orderpriority")
    },

    // J13 manual salted skew join (ref: sas_conversion_with_manual_salt_
    // skewed_join.sql). Salt is physical only — the oracle is the plain
    // equi-join, proving salting preserves semantics.
    "j13_salted_join" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      RuleJoins.saltedJoin(li, o, "l_orderkey", "o_orderkey", 16, seed = 42L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("qty"))
        .orderBy(col("o_orderpriority"))
    },

    // J7+J16+W1 wildcard rule join with priority selection, keeping ties
    // (ref: bof_30_migrate.scala:64-110): a literal rule table whose '*'
    // cells match anything; each order keeps its best-priority rule(s) by
    // rank()==1 — an urgent finished order matches BOTH priority-1 rules
    // and is deliberately counted twice, exactly like the reference.
    "j7_wildcard_rules" -> { (s, dir) =>
      import s.implicits._
      val rules = Seq(
        ("1-URGENT", "*", "expedite", 1),
        ("*",        "F", "archive",  1),
        ("2-HIGH",   "O", "fast",     2),
        ("*",        "*", "default",  9)
      ).toDF("rp", "rs", "label", "prio")
      val o = Tables.orders(s, dir)
      RuleJoins.wildcardRuleJoin(o, rules,
          RuleJoins.wildcardMatch(rules("rp"), o("o_orderpriority")) &&
          RuleJoins.wildcardMatch(rules("rs"), o("o_orderstatus")),
          Seq("o_orderkey"), col("prio"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("label"))
    },

    // J17 second star shape over the supply side: lineitem ⋈ part ⋈
    // supplier ⋈ nation (TPC-H Q9-ish). part/supplier shuffle-join on
    // their keys (they grow with the catalog at scale); nation broadcasts.
    "j18_part_supplier_star" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir).select("p_partkey", "p_brand")
      val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      li.join(p, li("l_partkey") === p("p_partkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
             dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("n_name"), col("p_brand"))
    },

    // J4 right outer join (ref: sap_bw_api.scala:318).
    "j4_right_outer" -> { (s, dir) =>
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
      val c = Tables.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_p_orders"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("c_mktsegment"))
    },

    // J16/A11 aggregate-then-join-back: latest order(s) per customer via
    // max-date join-back, ties kept (ref: sas_conversion…sql:184-189).
    "j16_agg_join_back" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      graft.operators.DedupMerge.latestByAggJoin(o, Seq("o_custkey"), "o_orderdate")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    },

    // As-of (point-in-time) join: each purchase event picks up the
    // latest prior-or-simultaneous view by the same user — the
    // training-data feature-lookup shape, composed as union+window (one
    // shuffle, no range join). Oracle is DuckDB's native ASOF JOIN.
    "j19_asof_events" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      val viewsUnique = graft.operators.Windows.dedupLatest(
        views, Seq("user_id", "ts"), Seq(col("view_id")))
      graft.operators.AsOf.asofJoin(purchases, viewsUnique,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightVals = Seq("view_id", "view_value"))
        .select("event_id", "user_id", "view_id", "view_value")
        .orderBy("event_id")
    },

    // LATERAL correlated subquery join (beyond reference — the SQL
    // surface for per-row top-k that window row_number expresses
    // relationally): Catalyst decorrelates the correlated LIMIT subquery
    // into a ranked join, so the per-customer scan never loops.
    "j20_lateral_topk" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("lat_customer")
      Tables.orders(s, dir).createOrReplaceTempView("lat_orders")
      s.sql(
        """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
          |FROM lat_customer c JOIN LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM lat_orders
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey
          |  LIMIT 2
          |) l
          |WHERE c.c_custkey % 50 = 0
          |ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey""".stripMargin)
    },

    // J10 interval-overlap self join (ref: overlap_query_no_recursive_cte_
    // needed.sql:7-17): pairs of orders by the same customer within 7 days.
    "j10_interval_overlap_self" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
      val a = o.as("a"); val b = o.as("b")
      a.join(b,
          col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") < col("b.o_orderkey") &&
          col("b.o_orderdate") >= col("a.o_orderdate") &&
          col("b.o_orderdate") <= col("a.o_orderdate") + expr("INTERVAL 7 DAYS"))
        .select(col("a.o_custkey").as("custkey"),
                col("a.o_orderkey").as("k1"), col("b.o_orderkey").as("k2"))
        .orderBy("custkey", "k1", "k2")
    }
  )

  private def lateralTopkOracle: String =
    """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
      |FROM customer c JOIN LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey
      |  LIMIT 2
      |) l ON true
      |WHERE c.c_custkey % 50 = 0
      |ORDER BY c.c_custkey, l.o_totalprice DESC, l.o_orderkey""".stripMargin

  private def saltedJoinOracle: String =
    s"""SELECT o.o_orderpriority, COUNT(*) AS n_lines, ${sqlDsum("l.l_quantity")} AS qty
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin

  val oracle: Map[String, String] = Map(
    "j20_lateral_topk" -> lateralTopkOracle,

    "j1_star_revenue" ->
      s"""SELECT r.r_name, n.n_name, c.c_mktsegment,
         |  ${sqlDsum("o.o_totalprice")} AS revenue, COUNT(*) AS n_orders
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY r.r_name, n.n_name, c.c_mktsegment
         |ORDER BY r.r_name, n.n_name, c.c_mktsegment""".stripMargin,

    "j3_left_outer" ->
      s"""SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
         |  COALESCE(${sqlDsum("o.o_totalprice")}, 0.0) AS spend
         |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
         |GROUP BY c.c_custkey, c.c_name ORDER BY c.c_custkey""".stripMargin,

    "j11_anti_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "j12_semi_customers_with_f_orders" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "j8_range_band" ->
      s"""WITH bands(qty_band, lo, hi) AS (
         |  VALUES ('S', 0.0, 10.0), ('M', 10.0, 25.0), ('L', 25.0, 40.0), ('XL', 40.0, 1e9))
         |SELECT qty_band, COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS total_price
         |FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity <= hi - 0.000001
         |GROUP BY qty_band ORDER BY qty_band""".stripMargin,

    "j5_outer_coalesce_merge" ->
      s"""WITH a AS (
         |  SELECT o_custkey, o_orderpriority, ${sqlDsum("o_totalprice")} AS price_a
         |  FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_custkey, o_orderpriority),
         |b AS (
         |  SELECT o_custkey, o_orderpriority, ${sqlDsum("o_totalprice")} AS price_b
         |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey, o_orderpriority)
         |SELECT COALESCE(b.o_custkey, a.o_custkey) AS o_custkey,
         |  COALESCE(b.o_orderpriority, a.o_orderpriority) AS o_orderpriority,
         |  a.price_a, b.price_b
         |FROM a FULL OUTER JOIN b
         |  ON a.o_custkey = b.o_custkey AND a.o_orderpriority = b.o_orderpriority
         |ORDER BY o_custkey, o_orderpriority""".stripMargin,

    "j13_salted_join" -> saltedJoinOracle,

    "j7_wildcard_rules" ->
      s"""WITH rules(rp, rs, label, prio) AS (VALUES
         |  ('1-URGENT', '*', 'expedite', 1),
         |  ('*',        'F', 'archive',  1),
         |  ('2-HIGH',   'O', 'fast',     2),
         |  ('*',        '*', 'default',  9)),
         |j AS (
         |  SELECT o.o_orderkey, o.o_totalprice, r.label, r.prio
         |  FROM orders o LEFT JOIN rules r
         |    ON (r.rp = '*' OR r.rp = o.o_orderpriority)
         |   AND (r.rs = '*' OR r.rs = o.o_orderstatus)),
         |rk AS (
         |  SELECT *, RANK() OVER (PARTITION BY o_orderkey ORDER BY prio) AS rnk FROM j)
         |SELECT label, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM rk WHERE rnk = 1 GROUP BY label ORDER BY label""".stripMargin,

    "j18_part_supplier_star" ->
      s"""SELECT n.n_name, p.p_brand, COUNT(*) AS n_lines,
         |  ${sqlDsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |GROUP BY n.n_name, p.p_brand
         |ORDER BY n.n_name, p.p_brand""".stripMargin,

    "j4_right_outer" ->
      """SELECT c.c_mktsegment, COUNT(o.o_orderkey) AS n_p_orders, COUNT(*) AS n_rows
        |FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        |RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    "j16_agg_join_back" ->
      """WITH mx AS (
        |  SELECT o_custkey, MAX(o_orderdate) AS o_orderdate
        |  FROM orders GROUP BY o_custkey)
        |SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
        |FROM orders o JOIN mx ON o.o_custkey = mx.o_custkey
        |                     AND o.o_orderdate = mx.o_orderdate
        |ORDER BY o.o_custkey, o.o_orderkey""".stripMargin,

    "j19_asof_events" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id AS view_id, value AS view_value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'view'),
        |vd AS (SELECT user_id, ts, view_id, view_value FROM v WHERE rn = 1),
        |p AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, vd.view_id, vd.view_value
        |FROM p ASOF LEFT JOIN vd
        |  ON p.user_id = vd.user_id AND p.ts >= vd.ts
        |ORDER BY p.event_id""".stripMargin,

    "j10_interval_overlap_self" ->
      """SELECT a.o_custkey AS custkey, a.o_orderkey AS k1, b.o_orderkey AS k2
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        | AND b.o_orderdate >= a.o_orderdate
        | AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY
        |ORDER BY custkey, k1, k2""".stripMargin
  )
}
