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
    }
  )

  private val rev = sqlDsum("l_extendedprice * (1.0 - l_discount)")

  val oracle: Map[String, String] = Map(
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
         |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin
  )
}
