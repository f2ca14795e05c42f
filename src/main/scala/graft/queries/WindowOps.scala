package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling / cumulative / EWM operators (SURVEY §2.5).
  *
  * Numeric parity notes:
  *  - `cumprod` is computed exactly: scale (1+l_tax) to an integer, take the
  *    running integer product (magnitude ≤ 108^7 < 2^53 so it is exact in
  *    both engines regardless of algorithm), then unscale.
  *  - `ewm` with alpha=0.5 (adjust=true, pandas semantics per
  *    reference aggregations.py:151-170): y_t = Σ x_i·2^i / Σ 2^i. The 2^i
  *    weighting is an exact power-of-two float scaling, the sums are exact
  *    decimals, so both engines agree bitwise. Capped at each user's first
  *    60 events so the weights stay inside DECIMAL(38) at any scale factor.
  */
object WindowOps extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // rolling(window='1h') (dataframe/core.py:94-127) — trailing time range.
    "rolling_time_1h" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600000000L, 0L)
      t(s, dir, "events").select(
        $"user_id", $"event_id",
        graft.functions.native.fixed_sum($"value", 2).over(w).as("w_sum"),
        count(lit(1)).over(w).as("w_cnt"))
    }),

    // expanding().agg (dataframe/core.py:171) — all-history running mean.
    "expanding_mean" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events").select(
        $"user_id", $"event_id",
        (graft.functions.native.fixed_sum($"value", 2).over(w) / count(lit(1)).over(w))
          .as("expanding_mean"))
    }),

    // cumprod (dataframe/core.py:183-197) — exact integer-scaled product.
    "cumprod_tax" -> ((s, dir) => {
      import s.implicits._
      // trailing 7-row frame keeps the integer-scaled product ≤ 108^7 < 2^53,
      // exact in both engines (an unbounded frame would overflow at 13 rows).
      // (l_orderkey, l_linenumber) is not unique in the synthetic data; the
      // extra l_tax key makes the frame order deterministic (remaining ties
      // have equal factors, so the products are order-invariant).
      val wo = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber", $"l_tax")
      val w = wo.rowsBetween(-6, Window.currentRow)
      // product of ≤ 7 window factors as 6 lag()s × the current row —
      // whole-stage-codegen expressions end to end, where the previous
      // collect_list + interpreted aggregate() lambda built a per-row
      // array and left codegen for every row (guide §4: prefer built-in
      // expressions in the hot path). Missing leading rows lag to NULL
      // → factor 1, exactly the shorter frame's product.
      val prod = (1 to 6)
        .map(i => coalesce(lag($"tax_scaled", i).over(wo), lit(1L)))
        .foldLeft($"tax_scaled".cast("long"))(_ * _)
      t(s, dir, "lineitem")
        .withColumn("tax_scaled", round($"l_tax" * 100.0, 0).cast("long") + 100L)
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("prod_scaled", prod)
        .select($"l_orderkey", $"l_linenumber", $"prod_scaled",
          ($"prod_scaled".cast("double") / pow(lit(100.0), $"k")).as("cumprod_tax"))
    }),

    // ewm(alpha=0.5).mean() (dataframe/core.py:174, aggregations.py:151-170).
    "ewm_mean" -> ((s, dir) => {
      import s.implicits._
      val rnw = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val w = Window.partitionBy($"user_id").orderBy($"rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(rnw))
        .filter($"rn" <= 60)
        .withColumn("wnum", dec($"value" * pow(lit(2.0), $"rn"), 2))
        .withColumn("wden", dec(pow(lit(2.0), $"rn"), 0))
        // round to 9 dp: the exact decimal sums exceed double precision, and
        // decimal→double conversion may differ by 1 ulp between engines.
        .select($"user_id", $"event_id",
          round(sum($"wnum").over(w).cast("double") / sum($"wden").over(w).cast("double"), 9)
            .as("ewm_value"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "rolling_time_1h" ->
      s"""SELECT user_id, event_id,
         |  CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS w_sum,
         |  COUNT(*) OVER w AS w_cnt
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
         |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin,

    "expanding_mean" ->
      s"""SELECT user_id, event_id,
         |  CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE)
         |    / COUNT(*) OVER w AS expanding_mean
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY $EVT_ORDER
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "cumprod_tax" ->
      """SELECT l_orderkey, l_linenumber, prod_scaled,
        |  CAST(prod_scaled AS DOUBLE) / POWER(100.0, k) AS cumprod_tax
        |FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(PRODUCT(CAST(ROUND(l_tax * 100.0, 0) AS BIGINT) + 100) OVER w AS BIGINT)
        |      AS prod_scaled,
        |    COUNT(*) OVER w AS k
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_tax
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))""".stripMargin,

    "ewm_mean" ->
      s"""SELECT user_id, event_id,
         |  ROUND(CAST(SUM(wnum) OVER w AS DOUBLE) / CAST(SUM(wden) OVER w AS DOUBLE), 9)
         |    AS ewm_value
         |FROM (
         |  SELECT user_id, event_id, rn,
         |    CAST(value * POWER(2.0, rn) AS DECIMAL(38,2)) AS wnum,
         |    CAST(POWER(2.0, rn) AS DECIMAL(38,0)) AS wden
         |  FROM (
         |    SELECT user_id, event_id, value,
         |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY $EVT_ORDER) AS rn
         |    FROM events)
         |  WHERE rn <= 60)
         |WINDOW w AS (PARTITION BY user_id ORDER BY rn
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
  )
}
