package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of SURVEY §2 coverage: tail, rolling/grouped variance via
  * exact decimal moments, the reference's distinctive trailing window
  * anchored at the max seen event time (aggregations.py:210-245), and
  * timed_window_unique (core.py:1365).
  */
object ExtraOps extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // tail(n) (dataframe/core.py:31): last 3 events per user.
    "tail_per_key" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"user_id", $"event_id", $"value")
    }),

    // rolling(5).var()/std() (dataframe/core.py:94-127) from exact moments.
    "rolling_var_std" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-4, Window.currentRow)
      t(s, dir, "events")
        .withColumn("s1", graft.functions.native.fixed_sum($"value", 2).over(w))
        .withColumn("s2", graft.functions.native.fixed_sum($"value" * $"value", 8).over(w))
        .withColumn("cnt", count(lit(1)).over(w))
        .select($"user_id", $"event_id",
          when($"cnt" > 1, ($"s2" - $"s1" * $"s1" / $"cnt") / ($"cnt" - 1))
            .as("w_var"),
          sqrt(when($"cnt" > 1, ($"s2" - $"s1" * $"s1" / $"cnt") / ($"cnt" - 1)))
            .as("w_std"))
    }),

    // groupby().var()/std() (dataframe/core.py:864-866, aggregations.py:552).
    "groupby_var_std" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events").groupBy($"event_type")
        .agg(dsum($"value", 2).as("s1"),
          dsum($"value" * $"value", 8).as("s2"),
          count(lit(1)).as("n"))
        .select($"event_type", $"n",
          (($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("var_value"),
          sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("std_value"))
    }),

    // window(value='2h') reference semantics: rows in (max_seen - 2h, max_seen]
    // — anchored at the latest event, NOT clock-aligned (aggregations.py:233).
    "window_trailing_maxts" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
      val m = e.agg(max($"ts").as("max_ts"))
      e.crossJoin(broadcast(m))
        .filter($"ts" > $"max_ts" - expr("INTERVAL 2 HOURS"))
        .agg(count(lit(1)).as("n"), dsum($"value", 2).as("total"))
    }),

    // timed_window_unique (core.py:1365): hourly tumbling window, dedup by
    // user within the window keeping the arrival-first row.
    "timed_window_unique" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .withColumn("wstart", window($"ts", "1 hour").getField("start"))
      val w = Window.partitionBy($"wstart", $"user_id").orderBy($"ts", $"event_id")
      e.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .groupBy($"wstart")
        .agg(count(lit(1)).as("n_unique_users"), dsum($"value", 2).as("first_values_total"))
    }),

    // timed_window_unique keep="last" (core.py:1365-1481 `keep` param): a
    // duplicate key *replaces* the buffered element, so the window closes
    // with each key's most-recent row — rn = 1 over the DESC arrival order.
    "timed_window_unique_last" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .withColumn("wstart", window($"ts", "1 hour").getField("start"))
      val w = Window.partitionBy($"wstart", $"user_id").orderBy($"ts".desc, $"event_id".desc)
      e.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .groupBy($"wstart")
        .agg(count(lit(1)).as("n_unique_users"), dsum($"value", 2).as("last_values_total"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "tail_per_key" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value, ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn <= 3""".stripMargin,

    "rolling_var_std" ->
      s"""SELECT user_id, event_id,
         |  CASE WHEN cnt > 1 THEN (s2 - s1 * s1 / cnt) / (cnt - 1) END AS w_var,
         |  sqrt(CASE WHEN cnt > 1 THEN (s2 - s1 * s1 / cnt) / (cnt - 1) END) AS w_std
         |FROM (
         |  SELECT user_id, event_id,
         |    CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS s1,
         |    CAST(SUM(CAST(value * value AS DECIMAL(38,8))) OVER w AS DOUBLE) AS s2,
         |    COUNT(*) OVER w AS cnt
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY $EVT_ORDER
         |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))""".stripMargin,

    "groupby_var_std" ->
      s"""SELECT event_type, n,
         |  (s2 - s1 * s1 / n) / (n - 1) AS var_value,
         |  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std_value
         |FROM (
         |  SELECT event_type,
         |    ${DSUM("value", 2)} AS s1,
         |    ${DSUM("value * value", 8)} AS s2,
         |    COUNT(*) AS n
         |  FROM events GROUP BY event_type)""".stripMargin,

    "window_trailing_maxts" ->
      s"""SELECT COUNT(*) AS n, ${DSUM("value", 2)} AS total
         |FROM events
         |WHERE CAST(ts AS TIMESTAMP) >
         |  (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 2 HOUR FROM events)""".stripMargin,

    "timed_window_unique" ->
      s"""SELECT wstart, COUNT(*) AS n_unique_users,
         |  ${DSUM("value", 2)} AS first_values_total
         |FROM (
         |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart, user_id, value,
         |    ROW_NUMBER() OVER (
         |      PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), user_id
         |      ORDER BY $EVT_ORDER) AS rn
         |  FROM events
         |) WHERE rn = 1 GROUP BY wstart""".stripMargin,

    "timed_window_unique_last" ->
      s"""SELECT wstart, COUNT(*) AS n_unique_users,
         |  ${DSUM("value", 2)} AS last_values_total
         |FROM (
         |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart, user_id, value,
         |    ROW_NUMBER() OVER (
         |      PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), user_id
         |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
         |  FROM events
         |) WHERE rn = 1 GROUP BY wstart""".stripMargin
  )
}
