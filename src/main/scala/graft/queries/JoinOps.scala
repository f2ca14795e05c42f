package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Relational joins (SURVEY §2.9: the reference only has stream-alignment
  * joins; real equi/semi/anti joins come free with Spark and are part of the
  * engine's surface). Dimension tables are explicitly broadcast — at 100 TB
  * the fact side never shuffles for these joins.
  */
object JoinOps extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // inner equi-join, fact × small dim → broadcast hash join, no shuffle.
    "join_inner_agg" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(dsum($"o_totalprice", 4).as("segment_revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // multiway dim join: customer → nation → region, all broadcast.
    "join_multiway" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_customers"),
          dsum($"c_acctbal", 4).as("total_acctbal"))
    }),

    // left-semi: parts that ship (EXISTS).
    "join_semi" -> ((s, dir) => {
      import s.implicits._
      val p = t(s, dir, "part")
      val li = t(s, dir, "lineitem").select($"l_partkey")
      p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
        .select($"p_partkey", $"p_name")
    }),

    // left-anti: customers with no orders (NOT EXISTS).
    "join_anti" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select($"o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
    })
  )

  override def oracle: Map[String, String] = Map(
    "join_inner_agg" ->
      s"""SELECT c_mktsegment, ${DSUM("o_totalprice", 4)} AS segment_revenue,
         |  COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin,

    "join_multiway" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
         |  ${DSUM("c_acctbal", 4)} AS total_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,

    "join_semi" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin
  )
}
