package graft.queries

import graft.core.Tables
import graft.operators.SetOps
import org.apache.spark.sql.functions._

/** Set-operation catalog (SURVEY.md §2.7). */
object SetQueries {

  val queries: Map[String, Q] = Map(
    // U1 UNION ALL of prev-snapshot ∪ staging shape
    // (ref: servicenow_api_extract.py:2328-2333).
    "u1_union_all" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val a = o.filter(col("o_orderstatus") === "F")
      val b = o.filter(col("o_orderstatus") =!= "F")
      a.unionAll(b)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },

    // U2 UNION with dedup (ref: slow_temp…py:110-121).
    "u2_union_distinct" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val highValue = o.filter(col("o_totalprice") > 100000.0).select("o_custkey")
      val urgent    = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      highValue.union(urgent).distinct().orderBy("o_custkey")
    },

    // U3 n-way union via fold with schema alignment
    // (ref: from_raw_to_hive_with_glue.py:66-88).
    "u3_union_fold" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val parts = Seq("F", "O", "P").map { st =>
        o.filter(col("o_orderstatus") === st)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      }
      SetOps.unionByNameAll(parts)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // U4 EXCEPT / subtract (ref: from_api_call_to_columnar_db.py:688-703).
    "u4_except" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val all = o.select("o_custkey").distinct()
      val f   = o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
      all.except(f).orderBy("o_custkey")
    },

    // Multiset (ALL) forms — duplicate-count subtraction/minimum, not
    // set membership: a customer with three orders and one F order keeps
    // TWO copies under EXCEPT ALL. The bag semantics are what dedup
    // ledgers and reconciliation diffs actually need; the aggregated
    // read-back pins the per-key multiplicities.
    "u6_except_all" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.select("o_custkey")
        .exceptAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n_copies"))
        .orderBy("o_custkey")
    },

    "u7_intersect_all" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.filter(col("o_totalprice") > 100000.0).select("o_custkey")
        .intersectAll(o.filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n_copies"))
        .orderBy("o_custkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "u1_union_all" ->
      s"""WITH u AS (
         |  SELECT * FROM orders WHERE o_orderstatus = 'F'
         |  UNION ALL
         |  SELECT * FROM orders WHERE o_orderstatus <> 'F')
         |SELECT o_orderstatus, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM u GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "u2_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "u3_union_fold" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'P')
        |SELECT o_orderstatus, COUNT(*) AS n FROM u
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "u4_except" ->
      """SELECT DISTINCT o_custkey FROM orders
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "u6_except_all" ->
      """WITH d AS (
        |  SELECT o_custkey FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT o_custkey, COUNT(*) AS n_copies
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "u7_intersect_all" ->
      """WITH d AS (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT o_custkey, COUNT(*) AS n_copies
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
