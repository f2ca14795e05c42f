package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** What zorder_layout buys: after range-sorting by zkey, each output
  * split covers a NARROW range of BOTH dimensions at once, so parquet
  * min/max footer stats prune a predicate on either — which no
  * single-column sort achieves (sorting by x leaves every split spanning
  * all of y, and vice versa). Dimensions here are the normalized 0..1023
  * buckets the query emits.
  */
class ZorderSpec extends SparkSuite {
  import spark.implicits._

  private val Files = 8

  /** Mean per-split (max-min) extent of x and y under a layout. */
  private def extents(sorted: org.apache.spark.sql.DataFrame): (Double, Double) =
    sorted
      .select($"x", $"y", spark_partition_id().as("pid"))
      .groupBy($"pid")
      .agg((max($"x") - min($"x")).as("rx"), (max($"y") - min($"y")).as("ry"))
      .agg(avg($"rx"), avg($"ry"))
      .as[(Double, Double)].head()

  test("interleaveAll at 2 dims is bit-identical to interleave; N dims separate every dimension's bits") {
    import graft.functions.Zorder
    val df = Seq.tabulate(256)(i => (i % 16, (i / 16) % 16, i % 8))
      .toDF("x", "y", "w")
    val mismatch = df.select(
      Zorder.interleave($"x", $"y", 4).as("two"),
      Zorder.interleaveAll(Seq($"x", $"y"), 4).as("all"))
      .filter($"two" =!= $"all").count()
    assert(mismatch == 0L, "k=2 interleaveAll must equal interleave")
    // 3 dims: the Morton key must be injective over the grid (every bit
    // lands in its own position, no overlap between dimensions)
    val keys = df.select(
      Zorder.interleaveAll(Seq($"x", $"y", $"w"), 4).as("z"),
      $"x", $"y", $"w").distinct()
    assert(keys.select($"z").distinct().count() == keys.count(),
      "the N-dim Morton key must be injective over distinct coordinates")
  }

  test("z-ordered splits are narrow in BOTH dimensions; single sorts in only one") {
    val z = SparkEntry.queries("zorder_layout")(spark, sf()).cache()
    try {
      val (zx, zy) = extents(z.repartitionByRange(Files, $"zkey"))
      val (xx, xy) = extents(z.repartitionByRange(Files, $"x", $"event_id"))
      val (yx, yy) = extents(z.repartitionByRange(Files, $"y", $"event_id"))
      // Single-column sorts: the sorted dim is narrow, the other is wide
      // open (≥ half the 0..1023 space on this near-uniform data).
      assert(xx < 200 && xy > 512, s"x-sort baseline off: rx=$xx ry=$xy")
      assert(yy < 200 && yx > 512, s"y-sort baseline off: rx=$yx ry=$yy")
      // Z-order: 8 splits consume the top 3 interleaved bits, so each
      // split spans ≤ 1/2 of one normalized dim and ≤ 1/4 of the other
      // (dyadic regions of the curve). Assert both with slack — the
      // point is BOTH dims prune at once.
      assert(zx <= 512 + 64, s"z-layout x extent not dyadic-narrow: $zx")
      assert(zy <= 512 + 64, s"z-layout y extent not dyadic-narrow: $zy")
      assert(zx + zy < (xx + xy).min(yx + yy),
        s"z-layout must beat both single sorts on combined extent: " +
          s"z=${zx + zy} xsort=${xx + xy} ysort=${yx + yy}")
    } finally z.unpersist()
  }

  test("rank normalization spreads a skewed dimension; min/max provably collapses it") {
    // the ranked query's x dim is 2^(user_id%10): ten values, 1..512
    val z = SparkEntry.queries("zorder_layout_ranked")(spark, sf()).cache()
    try {
      val xs = z.select($"x").distinct().as[Long].collect().sorted
      assert(xs.length == 10, s"expected 10 skew values, got ${xs.toSeq}")
      // rank buckets are near-evenly spaced across the 0..1023 space
      assert(xs.head == 0 && xs.last >= 850, s"rank buckets not spread: ${xs.toSeq}")
      val minGap = xs.sliding(2).map(p => p(1) - p(0)).min
      assert(minGap >= 50, s"rank buckets bunched: ${xs.toSeq}")
      // the same values under min/max normalization: half the mass lands
      // in the bottom eighth of the bucket space — the collapse rank
      // normalization exists to fix (pure arithmetic, pinned here so the
      // contrast is a measured fact, not a comment)
      val vals = (0 until 10).map(i => 1L << i)
      val mm = vals.map(v => (v - 1) * 1023 / 511)
      assert(mm.count(_ < 128) >= 5, s"min/max collapse assumption broke: $mm")
      // and the ranked layout still yields two-dim-narrow splits
      val (zx, zy) = extents(z.repartitionByRange(Files, $"zkey"))
      assert(zx <= 512 + 64 && zy <= 512 + 64,
        s"ranked z-layout splits not dyadic-narrow: $zx, $zy")
    } finally z.unpersist()
  }

  test("the z-value key stays codegen'd; only the tiny bounds row is wide") {
    val plan = SparkEntry.queries("zorder_layout")(spark, sf())
      .queryExecution.executedPlan.toString
    // the bounds aggregate reaches the row stream as a 1-row broadcast;
    // the row stream itself must never hash- or range-shuffle
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"zkey computation must not shuffle the rows:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"zkey must stay in codegen:\n$plan")
  }
}
