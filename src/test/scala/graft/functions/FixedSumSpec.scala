package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSuite

/** [[FixedSum]] must be BIT-IDENTICAL to the decimal cast-sum recipe it
  * replaces in hot aggregates (`sum(cast(x as decimal(38,s))).cast
  * ("double")`, QueryGroup.dsum) — the DuckDB oracle hash-compares every
  * digit, so "close" is failure. Checked three ways: the unit-parse
  * kernel against BigDecimal on adversarial doubles, whole-column
  * group-by parity on random data with nulls/negatives across scales,
  * and window-frame parity (the rolling queries' shape).
  */
class FixedSumSpec extends SparkSuite {
  import org.apache.spark.sql.Row

  private def model(d: Double, s: Int): Long =
    JBigDecimal.valueOf(d).setScale(s, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  test("units kernel == BigDecimal.valueOf.setScale(HALF_UP).unscaled on adversarial doubles") {
    val rng = new scala.util.Random(42)
    val cases = Seq(
      0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 0.05, -0.05, 0.004999, 0.005,
      123.456789, -123.456789, 1e-30, -1e-30, 1e-7, 1.05e-4,
      104949.50, 9.2e13, -9.2e13, 0.1 + 0.2, 1.0 / 3.0, math.Pi,
      4.35, 4.45, -4.45, // shortest-repr HALF_UP boundaries
      1.0e10, 123456789.123456789) ++
      Seq.fill(3000)(rng.nextDouble() * math.pow(10, rng.nextInt(16) - 8) *
        (if (rng.nextBoolean()) -1 else 1))
    for (d <- cases; s <- Seq(0, 2, 4, 6, 8)
         if math.abs(d) < 9.2e18 / math.pow(10, s)) { // in the 64-bit term domain
      assert(FixedPoint.units(d, s) == model(d, s), s"d=$d scale=$s")
    }
  }

  test("units kernel throws loudly (no silent wrap) when a term exceeds 64 bits") {
    intercept[ArithmeticException](FixedPoint.units(1e19, 4))
    intercept[ArithmeticException](FixedPoint.units(-1e19, 4))
    assert(FixedPoint.units(9.2e14, 4) == 9200000000000000000L) // near-limit ok
  }

  test("group-by fixed_sum == sum(cast decimal) bit-for-bit, incl. nulls and empty-ish groups") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 20000).map { i =>
      val v: java.lang.Double =
        if (rng.nextInt(50) == 0) null
        else rng.nextDouble() * math.pow(10, rng.nextInt(10) - 4) *
          (if (rng.nextBoolean()) -1 else 1)
      (i % 37, v)
    } :+ ((99, null: java.lang.Double)) // an all-null group → null sum
    val df = rows.toDF("k", "v")
    for (s <- Seq(2, 4, 8)) {
      val got = df.groupBy($"k")
        .agg(native.fixed_sum($"v", s).as("s")).orderBy($"k").collect()
      val want = df.groupBy($"k")
        .agg(sum($"v".cast(DecimalType(38, s))).cast("double").as("s"))
        .orderBy($"k").collect()
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        (g.isNullAt(1), w.isNullAt(1)) match {
          case (true, true) => ()
          case (false, false) =>
            // bit-identical, not approximately equal
            assert(java.lang.Double.doubleToRawLongBits(g.getDouble(1)) ==
              java.lang.Double.doubleToRawLongBits(w.getDouble(1)),
              s"scale=$s k=${g.get(0)}: ${g.getDouble(1)} != ${w.getDouble(1)}")
          case _ => fail(s"null mismatch at k=${g.get(0)} scale=$s: $g vs $w")
        }
      }
    }
  }

  test("window-frame fixed_sum == sum(cast decimal) over rolling frames") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = (1 to 5000)
      .map(i => (i % 8, i, rng.nextDouble() * 1000 - 500)).toDF("k", "seq", "v")
    val w = Window.partitionBy($"k").orderBy($"seq").rowsBetween(-9, 0)
    val got = df.select($"k", $"seq", native.fixed_sum($"v", 2).over(w).as("s"))
    val want = df.select($"k", $"seq",
      sum($"v".cast(DecimalType(38, 2))).over(w).cast("double").as("s"))
    val joined = got.as("g").join(want.as("w"), Seq("k", "seq")).collect()
    assert(joined.length == 5000)
    joined.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), r.toString)
    }
  }

  test("order independence: repartitioned shuffle produces the identical double") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val vals = Seq.fill(30000)(rng.nextDouble() * 1e6 - 5e5)
    val a = vals.toDF("v").agg(native.fixed_sum($"v", 4)).head().getDouble(0)
    val b = vals.reverse.toDF("v").repartition(17)
      .agg(native.fixed_sum($"v", 4)).head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(a) ==
      java.lang.Double.doubleToRawLongBits(b))
  }
}
