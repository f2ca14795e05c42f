package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew exposure of the r17 window-count rewrites (VERDICT r17 #8).
  *
  * `count(*) OVER (PARTITION BY h)` (url_canonicalize, dedup_substring,
  * dedup_span_removal) puts every row of a hot key in ONE window
  * partition — AQE's skew handling splits joins, not windows, so a
  * mega-duplicated span at corpus scale would bound a single task at the
  * hot key's row count. This spec (a) PLANTS that regime — one key
  * owning 40% of a 400k-row relation, three orders of magnitude hotter
  * than the median key — and proves the drop-in salted two-phase count
  * (partial count by (h, salt) → sum by h → join back) produces the
  * IDENTICAL relation, and (b) records the measured wall of both shapes
  * on the planted corpus, so the crossover is a number in the test log
  * rather than a guess. The engine keeps the window shape because it
  * wins the typical (bounded-duplication) case by one exchange and one
  * join; the equivalence proven here is the documented fallback if a
  * corpus with a mega-hot span ever binds.
  */
class SkewWindowCountSpec extends SparkSuite {
  import spark.implicits._

  test("planted mega-hot key: salted two-phase count ≡ window count; walls recorded") {
    val n = 400000L
    // 40% of rows on one key; the rest spread over 5000 keys (~48 rows each)
    val df = spark.range(n).select(
      $"id",
      when($"id" % 10 < 4, lit("HOT"))
        .otherwise(concat(lit("k"), ($"id" % 5000).cast("string"))).as("h"))
      .transform(graft.functions.Materialize.cut)

    val windowed = df
      .withColumn("c", count(lit(1)).over(Window.partitionBy($"h")))
      .select($"id", $"h", $"c")

    val salted = {
      // deterministic salt (guide §2.5: never rand() for partitioning)
      val s = df.withColumn("salt", pmod(xxhash64($"id"), lit(64L)))
      val tot = s.groupBy($"h", $"salt").agg(count(lit(1)).as("pc"))
        .groupBy($"h").agg(sum($"pc").as("c"))
      df.join(tot, "h").select($"id", $"h", $"c")
    }

    def timeNoop(d: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both once, then record
    timeNoop(windowed); timeNoop(salted)
    val tw = timeNoop(windowed)
    val ts = timeNoop(salted)
    info(f"planted 40%%-hot key over ${n}%d rows: window-count $tw%.2f s, " +
      f"salted two-phase $ts%.2f s (hot partition = ${n * 2 / 5}%d rows in one task)")

    // exact relation equality, both directions
    assert(windowed.except(salted).isEmpty && salted.except(windowed).isEmpty,
      "salted two-phase count diverged from the window count")
    Seq(windowed, salted).foreach(d =>
      assert(d.filter($"h" === "HOT").select($"c").distinct().head().getLong(0) == n * 2 / 5))
  }
}
