package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Classic analytics suite over the TPC-H-ish testdata — the multi-join
  * plans a warehouse engine lives on (Q3/Q5/Q10 shapes). Dims broadcast,
  * facts shuffle once per join key, filters push into every scan.
  */
object AnalyticsQueries {

  val queries: Map[String, Q] = Map(
    // Q3 shape: shipping priority — top revenue orders in a segment/date
    // window across customer ⋈ orders ⋈ lineitem.
    "q3_shipping_priority" -> { (s, dir) =>
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < "1998-03-15")
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > "1996-03-15")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // Q5 shape: local-supplier volume — six-way join where lineitem's
    // supplier and the order's customer must share a nation.
    "q5_local_supplier_volume" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
                  c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Q10 shape: returned-item reporting — customers ranked by revenue
    // lost to returns in a quarter.
    "q10_returned_items" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-10-01" && col("o_orderdate") < "1997-01-01")
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val n = Tables.nation(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q2 shape: correlated scalar subquery — cheapest line per part;
    // Catalyst decorrelates into an aggregate + join (no per-row
    // subquery execution). Proves subquery decorrelation beyond the
    // EXISTS form (J12). min_price passes the stored double through
    // untouched (bit-exact in both engines); a DECIMAL output column
    // is the one type the driver's comparator canonicalizes
    // differently per engine (r3's only hash miss).
    "q2_min_price_line" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q2_lineitem")
      Tables.supplier(s, dir).createOrReplaceTempView("q2_supplier")
      s.sql(
        s"""SELECT l.l_partkey, s.s_name,
           |  l.l_extendedprice AS min_price
           |FROM q2_lineitem l JOIN q2_supplier s ON l.l_suppkey = s.s_suppkey
           |WHERE l.l_partkey < 2000
           |  AND l.l_extendedprice = (
           |    SELECT MIN(l2.l_extendedprice) FROM q2_lineitem l2
           |    WHERE l2.l_partkey = l.l_partkey)
           |ORDER BY l.l_partkey, s.s_name""".stripMargin)
    },

    // Q7 shape: volume shipping between two nations — supplier nation ≠
    // customer nation, both directions, yearly rollup.
    "q7_nation_volume" -> { (s, dir) =>
      val su = Tables.supplier(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      l.join(su, l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), su("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // Q12 shape: per line-class, how many lines belong to high- vs
    // low-priority orders in a ship-year — the fact⋈fact join with a
    // conditional split aggregation (shipmode→returnflag: the testdata
    // is TPC-H-ish and carries no shipmode/commitdate columns).
    "q12_priority_lines" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },

    // Q4 shape: order-priority checking — EXISTS correlated subquery
    // (lineitem has no commit/receipt dates in this testdata, so the
    // "late line" predicate becomes "returned line in the ship window").
    // Catalyst must rewrite the EXISTS into a left-semi join on
    // o_orderkey; no per-row subquery execution survives in the plan.
    "q4_priority_exists" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("q4_orders")
      Tables.lineitem(s, dir).createOrReplaceTempView("q4_lineitem")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM q4_orders o
          |WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
          |  AND EXISTS (
          |    SELECT 1 FROM q4_lineitem l
          |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // Q17 shape: small-quantity-order revenue — correlated SCALAR
    // subquery (per-part average) that Catalyst decorrelates into an
    // aggregate + join on p_partkey. The threshold is computed in pure
    // double ops (exact-decimal sum, then double division) so the
    // strict < comparison is bit-identical in both engines; a decimal
    // QUOTIENT here would hit the engine-specific-scale trap.
    "q17_small_qty_revenue" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q17_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("q17_part")
      s.sql(
        """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          |    / CAST(7 AS DOUBLE) AS avg_yearly,
          |  COUNT(*) AS n_small_lines
          |FROM q17_lineitem l JOIN q17_part p ON l.l_partkey = p.p_partkey
          |WHERE p.p_brand = 'BRAND_1'
          |  AND l.l_quantity < CAST(0.2 AS DOUBLE) * (
          |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
          |         / CAST(COUNT(*) AS DOUBLE)
          |    FROM q17_lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
    },

    // Q18 shape: large-volume orders — IN over a grouped HAVING
    // subquery (the "which orders cross a total-quantity threshold"
    // semi-join). The HAVING compare stays in the exact decimal domain.
    "q18_large_orders" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("q18_customer")
      Tables.orders(s, dir).createOrReplaceTempView("q18_orders")
      Tables.lineitem(s, dir).createOrReplaceTempView("q18_lineitem")
      s.sql(
        """SELECT c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
          |  o.o_totalprice,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
          |FROM q18_customer c
          |JOIN q18_orders o ON c.c_custkey = o.o_custkey
          |JOIN q18_lineitem l ON o.o_orderkey = l.l_orderkey
          |WHERE o.o_orderkey IN (
          |  SELECT l_orderkey FROM q18_lineitem
          |  GROUP BY l_orderkey
          |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 210)
          |GROUP BY c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
          |  o.o_totalprice
          |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin)
    },

    // Q22 shape: idle rich customers — uncorrelated scalar subquery
    // (global positive-balance average) + NOT EXISTS anti-join, rolled
    // up per market segment. Both subquery forms in one plan: the
    // scalar becomes a broadcast single-row join, the NOT EXISTS a
    // left-anti on c_custkey.
    "q22_idle_balance" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("q22_customer")
      Tables.orders(s, dir).createOrReplaceTempView("q22_orders")
      s.sql(
        """SELECT c_mktsegment, COUNT(*) AS numcust,
          |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
          |FROM q22_customer c
          |WHERE c_acctbal > (
          |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
          |         / CAST(COUNT(*) AS DOUBLE)
          |    FROM q22_customer WHERE c_acctbal > CAST(0.0 AS DOUBLE))
          |  AND NOT EXISTS (
          |    SELECT 1 FROM q22_orders o
          |    WHERE o.o_custkey = c.c_custkey
          |      AND o.o_orderdate >= '2000-01-01')
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    },

    // Q14 shape: promo revenue share — conditional revenue over a
    // part-dim join, one division at the very end (both sums
    // decimal-exact, so the ratio is one deterministic IEEE op).
    "q14_promo_revenue" -> { (s, dir) =>
      val p = Tables.part(s, dir)
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-07-01")
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg((lit(100.0) *
          dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          dsum(rev)).as("promo_pct"),
          count(lit(1)).as("n_lines"))
    },

    // Q8 shape: national market share — one supplier-nation's slice of
    // PROMO revenue sold into ASIA, per order year. Eight-way join:
    // three dims broadcast, the two fact joins shuffle once each; the
    // share is a ratio of two exact-decimal sums (one IEEE division
    // per output row).
    "q8_market_share" -> { (s, dir) =>
      val p = Tables.part(s, dir).filter(col("p_type") === "PROMO")
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
      val c = Tables.customer(s, dir)
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), c("c_nationkey") === col("c_nk"))
        .join(broadcast(r), col("c_rk") === r("r_regionkey"))
        .join(broadcast(n2), su("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_8", rev).otherwise(lit(0.0))) /
          dsum(rev)).as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_year"))
    },

    // Q9 shape: product profit by nation and year — profit per line is
    // revenue minus a retail-price-proportional cost (the testdata has
    // no partsupp/supplycost; 0.1·p_retailprice·l_quantity stands in).
    // The per-row amount is pure double arithmetic in a fixed op
    // order, then summed exactly.
    "q9_product_profit" -> { (s, dir) =>
      val p = Tables.part(s, dir).filter(col("p_name").like("%red%"))
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val o = Tables.orders(s, dir)
      val n = Tables.nation(s, dir)
      val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(0.1) * col("p_retailprice") * col("l_quantity")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(dsum(amount).as("profit"), count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"), col("o_year"))
    },

    // Q11 shape: important inventory value — per-part value restricted
    // to one nation's suppliers, kept only when the group's value
    // crosses a fraction of the GLOBAL total (group HAVING vs an
    // uncorrelated scalar subquery; the scalar becomes a single-row
    // broadcast join).
    "q11_important_value" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q11_lineitem")
      Tables.supplier(s, dir).createOrReplaceTempView("q11_supplier")
      Tables.nation(s, dir).createOrReplaceTempView("q11_nation")
      s.sql(
        """SELECT l_partkey,
          |  CAST(SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6)))
          |    AS DOUBLE) AS part_value
          |FROM q11_lineitem l
          |JOIN q11_supplier s ON l.l_suppkey = s.s_suppkey
          |JOIN q11_nation n ON s.s_nationkey = n.n_nationkey
          |WHERE n.n_name = 'NATION_3'
          |GROUP BY l_partkey
          |HAVING CAST(SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6)))
          |    AS DOUBLE) > (
          |  SELECT CAST(SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6)))
          |      AS DOUBLE) * CAST(0.001 AS DOUBLE)
          |  FROM q11_lineitem l2
          |  JOIN q11_supplier s2 ON l2.l_suppkey = s2.s_suppkey
          |  JOIN q11_nation n2 ON s2.s_nationkey = n2.n_nationkey
          |  WHERE n2.n_name = 'NATION_3')
          |ORDER BY part_value DESC, l_partkey""".stripMargin)
    },

    // Q13 shape: customer order-count distribution — LEFT OUTER join
    // with the filter in the ON clause (customers with zero qualifying
    // orders must survive as c_count = 0), then a second aggregation
    // over the counts. Two keyed shuffles, all-integer output.
    "q13_order_distribution" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q15 shape: top supplier — a revenue CTE reused twice, the second
    // use as an uncorrelated scalar MAX. The equality compare is safe:
    // both sides carry the identical exact-decimal-then-double sum.
    "q15_top_supplier" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q15_lineitem")
      Tables.supplier(s, dir).createOrReplaceTempView("q15_supplier")
      s.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |    CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount))
          |      AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
          |  FROM q15_lineitem
          |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, total_revenue
          |FROM q15_supplier JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
          |ORDER BY s_suppkey""".stripMargin)
    },

    // Q16 shape: supplier counting — NOT IN over a subquery (Catalyst
    // plans the null-aware anti-join) + COUNT(DISTINCT) per part
    // attribute triple. lineitem stands in for the partsupp relation.
    "q16_supplier_count" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q16_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("q16_part")
      Tables.supplier(s, dir).createOrReplaceTempView("q16_supplier")
      s.sql(
        """SELECT p_brand, p_type, p_size,
          |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
          |FROM q16_lineitem l JOIN q16_part p ON p.p_partkey = l.l_partkey
          |WHERE p_brand <> 'Brand#1'
          |  AND p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
          |  AND l_suppkey NOT IN (
          |    SELECT s_suppkey FROM q16_supplier
          |    WHERE s_acctbal < CAST(0.0 AS DOUBLE))
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    },

    // Q19 shape: discounted revenue under disjunctive brand/size/
    // quantity bands — the OR-of-ANDs must still push the join key and
    // the per-branch ranges into the scans.
    "q19_disjunctive_revenue" -> { (s, dir) =>
      val p = Tables.part(s, dir)
      val l = Tables.lineitem(s, dir)
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(dsum(rev).as("revenue"), count(lit(1)).as("n_lines"))
    },

    // Q20 shape: heavy promo shippers — a nested IN chain (supplier ∈
    // aggregated shippers of parts ∈ PROMO) that Catalyst turns into
    // two stacked semi-joins; the HAVING compare stays in the exact
    // decimal domain. s_acctbal passes the stored double through.
    "q20_promo_suppliers" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q20_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("q20_part")
      Tables.supplier(s, dir).createOrReplaceTempView("q20_supplier")
      s.sql(
        """SELECT s_name, s_acctbal
          |FROM q20_supplier
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey FROM q20_lineitem
          |  WHERE l_partkey IN (
          |      SELECT p_partkey FROM q20_part WHERE p_type = 'PROMO')
          |    AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          |  GROUP BY l_suppkey
          |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 500)
          |ORDER BY s_name""".stripMargin)
    },

    // Q21 shape: suppliers who kept orders waiting — correlated EXISTS
    // (another supplier contributed to the order) AND NOT EXISTS (no
    // OTHER supplier's line was returned) over the same fact table:
    // one left-semi + one left-anti against lineitem in a single plan.
    "q21_waiting_suppliers" -> { (s, dir) =>
      Tables.supplier(s, dir).createOrReplaceTempView("q21_supplier")
      Tables.lineitem(s, dir).createOrReplaceTempView("q21_lineitem")
      Tables.orders(s, dir).createOrReplaceTempView("q21_orders")
      s.sql(
        """SELECT s_name, COUNT(*) AS numwait
          |FROM q21_supplier s
          |JOIN q21_lineitem l1 ON s.s_suppkey = l1.l_suppkey
          |JOIN q21_orders o ON o.o_orderkey = l1.l_orderkey
          |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (
          |    SELECT 1 FROM q21_lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM q21_lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_returnflag = 'R')
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
    }
  )

  private val rev = sqlDsum("l_extendedprice * (1.0 - l_discount)")

  val oracle: Map[String, String] = Map(
    "q12_priority_lines" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // identical op order: (100.0 * promo_sum) / total_sum, every
    // constant CAST to DOUBLE (DuckDB bare literals are DECIMAL)
    "q14_promo_revenue" ->
      s"""SELECT CAST(100 AS DOUBLE) *
         |  ${sqlDsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
         |  / ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS promo_pct,
         |  COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01'""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority, $rev AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < '1998-03-15' AND l.l_shipdate > '1996-03-15'
         |GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
         |ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier_volume" ->
      s"""SELECT r.r_name, n.n_name, $rev AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |               AND c.c_nationkey = s.s_nationkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1997-01-01'
         |GROUP BY r.r_name, n.n_name
         |ORDER BY r.r_name, n.n_name""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c.c_custkey, c.c_name, n.n_name, $rev AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE o.o_orderdate >= '1996-10-01' AND o.o_orderdate < '1997-01-01'
         |  AND l.l_returnflag = 'R'
         |GROUP BY c.c_custkey, c.c_name, n.n_name
         |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,

    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q17_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(7 AS DOUBLE) AS avg_yearly,
        |  COUNT(*) AS n_small_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand = 'BRAND_1'
        |  AND l.l_quantity < CAST(0.2 AS DOUBLE) * (
        |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 210)
        |GROUP BY c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin,

    "q22_idle_balance" ->
      """SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)
        |    FROM customer WHERE c_acctbal > CAST(0.0 AS DOUBLE))
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q2_min_price_line" ->
      """SELECT l.l_partkey, s.s_name,
        |  l.l_extendedprice AS min_price
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE l.l_partkey < 2000
        |  AND l.l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        |    WHERE l2.l_partkey = l.l_partkey)
        |ORDER BY l.l_partkey, s.s_name""".stripMargin,

    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l.l_shipdate) AS l_year, $rev AS revenue
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         |WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
         |       (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         |  ${sqlDsum("CASE WHEN n2.n_name = 'NATION_8' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
         |  / ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS mkt_share,
         |  COUNT(*) AS n_lines
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
         |JOIN region r ON n1.n_regionkey = r.r_regionkey
         |JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
         |WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
         |  AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1998-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q9_product_profit" ->
      s"""SELECT n.n_name, year(o.o_orderdate) AS o_year,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount) - CAST(0.1 AS DOUBLE) * p_retailprice * l_quantity")} AS profit,
         |  COUNT(*) AS n_lines
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE p.p_name LIKE '%red%'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q11_important_value" ->
      """SELECT l_partkey,
        |  CAST(SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS part_value
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE n.n_name = 'NATION_3'
        |GROUP BY l_partkey
        |HAVING CAST(SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6)))
        |    AS DOUBLE) > (
        |  SELECT CAST(SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6)))
        |      AS DOUBLE) * CAST(0.001 AS DOUBLE)
        |  FROM lineitem l2
        |  JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        |  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |  WHERE n2.n_name = 'NATION_3')
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT OUTER JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount))
        |      AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier
        |    WHERE s_acctbal < CAST(0.0 AS DOUBLE))
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q19_disjunctive_revenue" ->
      s"""SELECT $rev AS revenue, COUNT(*) AS n_lines
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_promo_suppliers" ->
      """SELECT s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        |    AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  GROUP BY l_suppkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 500)
        |ORDER BY s_name""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin
  )
}
