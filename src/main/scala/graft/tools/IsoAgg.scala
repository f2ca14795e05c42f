package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Sessions

/** Component isolation for the exact-decimal aggregation path (`runMain
  * graft.tools.IsoAgg [sfDir]`): q1_agg/global_aggs spend most of their
  * sf1 time somewhere between the parquet scan and the DECIMAL(38,s)
  * sums — this times each candidate stage so the fix targets the real
  * cost (scan vs double→decimal cast vs decimal accumulation width).
  */
object IsoAgg {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata_sf1"
    val spark = Sessions.local(appName = "graft-isoagg")
    import spark.implicits._

    def time(label: String)(df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"ISO $label%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val keys = Seq($"l_returnflag", $"l_linestatus")

    time("scan 3 cols only")(li.select($"l_returnflag", $"l_linestatus", $"l_quantity"))
    time("group + count only")(li.groupBy(keys: _*).agg(count(lit(1)).as("n")))
    time("group + 1 double sum")(li.groupBy(keys: _*).agg(sum($"l_quantity")))
    time("group + 1 dec38 sum")(
      li.groupBy(keys: _*).agg(sum($"l_quantity".cast(DecimalType(38, 4)))))
    time("group + 1 dec18 sum")(
      li.groupBy(keys: _*).agg(sum($"l_quantity".cast(DecimalType(18, 4)))))
    time("cast dec38 only, no agg")(
      li.select($"l_quantity".cast(DecimalType(38, 4))))
    time("cast dec18 only, no agg")(
      li.select($"l_quantity".cast(DecimalType(18, 4))))
    time("q1 full: 3 dec38 sums + derived")(
      li.groupBy(keys: _*).agg(
        sum($"l_quantity".cast(DecimalType(38, 4))).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast(DecimalType(38, 4))).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(38, 6)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order")))
    time("group + 1 fixed_sum")(
      li.groupBy(keys: _*).agg(graft.functions.native.fixed_sum($"l_quantity", 4)))
    time("q1 full with fixed_sum")(
      li.groupBy(keys: _*).agg(
        graft.functions.native.fixed_sum($"l_quantity", 4).as("sum_qty"),
        graft.functions.native.fixed_sum($"l_extendedprice", 4).as("sum_base_price"),
        graft.functions.native.fixed_sum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order")))
    time("q1 full with dec18 input")(
      li.groupBy(keys: _*).agg(
        sum($"l_quantity".cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast(DecimalType(18, 4))).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 6)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order")))

    spark.stop()
  }
}
