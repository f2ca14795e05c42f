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

    // Point-in-time (AS-OF) join — the feature-store join Spark has no
    // native operator for: each click is matched to the user's LATEST
    // purchase at or before it (p_us <= c_us, greatest p_us wins; left
    // semantics — clicks before any purchase keep a null match). The
    // generic operator is functions.AsofJoin.leftAsof (union-tag + ONE
    // keyed window, no per-row range probe — its scaladoc has the full
    // plan argument; AsofJoinSpec pins it against a brute-force model
    // with duplicate timestamps). Purchases are first collapsed per
    // (user, µs) to max(event_id) so the match is defined even under
    // same-instant duplicates (DuckDB's native ASOF JOIN, the oracle,
    // leaves that tie unspecified).
    "join_asof" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type",
          unix_micros($"ts").as("us"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"us")
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"us".as("p_us"))
        .agg(max($"event_id").as("last_purchase_id"))
        .select($"user_id", $"p_us", $"last_purchase_id")
      graft.functions.AsofJoin
        .leftAsof(clicks, purchases, "user_id", "us", "p_us")
        .select($"event_id", $"user_id", $"last_purchase_id",
          ($"us" - $"p_us").as("gap_us"))
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

    "join_asof" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |c AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, us AS p_us, MAX(event_id) AS last_purchase_id
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, us)
        |SELECT c.event_id, c.user_id, p.last_purchase_id, c.us - p.p_us AS gap_us
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.us >= p.p_us""".stripMargin,

    "join_semi" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin
  )
}
