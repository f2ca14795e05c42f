package graft.queries

import org.apache.spark.sql.functions._

/** Oracle-checked query for the online-ML layer (SURVEY §2.7,
  * `graft.streaming.River`): simple least squares fit as ONE distributed
  * aggregation over exact sufficient statistics — the same math
  * `OnlineLinearRegression` folds incrementally (RiverSpec ties the two
  * together numerically).
  *
  * Bit-parity design (QueryGroup scaladoc): every sum goes through the
  * DECIMAL(38,s) cast so it is order-independent and identical in both
  * engines; the closed-form slope/intercept arithmetic then runs in
  * DOUBLE with the exact same expression shape on both sides, so the
  * final doubles are bit-equal. One narrow scan + one aggregate — at any
  * scale this is a single reduction.
  */
object MlOps extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // y = l_extendedprice regressed on x = l_quantity
    "river_ols" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("n"),
          dsum($"l_quantity").as("sx"),
          dsum($"l_extendedprice").as("sy"),
          dsum($"l_quantity" * $"l_extendedprice", 4).as("sxy"),
          dsum($"l_quantity" * $"l_quantity", 4).as("sxx"))
        .select($"n",
          (($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sxx" - $"sx" * $"sx")).as("slope"),
          ((($"sy" - (($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sxx" - $"sx" * $"sx")) * $"sx")) / $"n").as("intercept"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "river_ols" ->
      s"""SELECT n,
         |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
         |FROM (
         |  SELECT COUNT(*) AS n,
         |    ${DSUM("l_quantity")} AS sx,
         |    ${DSUM("l_extendedprice")} AS sy,
         |    ${DSUM("l_quantity * l_extendedprice")} AS sxy,
         |    ${DSUM("l_quantity * l_quantity")} AS sxx
         |  FROM lineitem)""".stripMargin
  )
}
