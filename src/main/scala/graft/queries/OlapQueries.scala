package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._

/** OLAP-surface catalog beyond the reference corpus (SURVEY §2 marks
  * A14/U5 unused there): rollup with grouping ids, intersect, and pivot —
  * a user of a general analytics engine expects these even though the
  * reference never wrote one. */
object OlapQueries {

  val queries: Map[String, Q] = Map(
    // A14 ROLLUP with grouping() disambiguation of the null rows.
    "a14_rollup" -> { (s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
             grouping(col("o_orderstatus")).as("g_status"),
             grouping(col("o_orderpriority")).as("g_prio"))
        .orderBy(col("g_status"), col("g_prio"),
          col("o_orderstatus"), col("o_orderpriority"))
    },

    // U5 INTERSECT: customers with both an F and an O order.
    "u5_intersect" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // Pivot: revenue matrix status × priority with pinned pivot values.
    "a15_pivot" -> { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", Seq(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(dsum(col("o_totalprice")))
        .orderBy(col("o_orderstatus"))
    },

    // GROUPING SETS with an explicit set list (rollup/cube cover only the
    // prefix/powerset shapes; arbitrary sets are the general form) —
    // detail, per-status subtotal, and grand total in ONE pass over the
    // fact, disambiguated by grouping() flags.
    "a18_grouping_sets" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("gs_orders")
      s.sql(
        s"""SELECT o_orderstatus, o_orderpriority,
           |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
           |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
           |FROM gs_orders
           |GROUP BY GROUPING SETS (
           |  (o_orderstatus, o_orderpriority), (o_orderstatus), ())
           |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin)
    }
  )

  val oracle: Map[String, String] = Map(
    "a14_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS total,
         |  CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio
         |FROM orders
         |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin,

    "u5_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "a15_pivot" ->
      s"""SELECT o_orderstatus,
         |  ${sqlDsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS "1-URGENT",
         |  ${sqlDsum("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END")} AS "2-HIGH",
         |  ${sqlDsum("CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END")} AS "3-MEDIUM",
         |  ${sqlDsum("CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END")} AS "4-NOT SPECIFIED",
         |  ${sqlDsum("CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END")} AS "5-LOW"
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "a18_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
         |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY GROUPING SETS (
         |  (o_orderstatus, o_orderpriority), (o_orderstatus), ())
         |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin
  )
}
