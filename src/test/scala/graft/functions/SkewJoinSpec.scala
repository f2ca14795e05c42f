package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("saltedInner equals the plain join on a skewed key distribution") {
    // 10k rows of hot key 1, a handful of others
    val big = ((1 to 10000).map(i => (1L, i.toDouble)) ++
      Seq((2L, -1.0), (3L, -2.0), (99L, -3.0))).toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cool")).toDF("k", "name")
    val got = SkewJoin.saltedInner(big, dim, "k", salt = 8)
    val want = big.join(dim, "k")
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("a hot key of byte-identical rows still spreads across salt subkeys") {
    // 10k IDENTICAL rows — a content-derived salt would map all of them
    // to one subkey; the position-derived salt must still spread them
    val big = (1 to 10000).map(_ => (1L, 42.0)).toDF("k", "v")
    val salts = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .select(countDistinct($"__salt")).as[Long].head()
    assert(salts > 1, "salting must split the hot key")
    val dim = Seq((1L, "hot")).toDF("k", "name")
    assert(SkewJoin.saltedInner(big, dim, "k").count() == 10000L)
  }

  test("AQE skew-join handles the same hot key declaratively (the r8-verdict cross-check)") {
    // Spark 4 AQE can split the oversized partition at runtime with no
    // hand salting. This pins (a) that the adaptive plan really marks the
    // join skewed under graft-sized thresholds, and (b) that its result
    // set equals the salted join's — the evidence behind the guidance in
    // SkewJoin's scaladoc/README: prefer AQE for batch shuffle skew;
    // manual salting remains for what AQE can't touch — streaming joins
    // (AQE is disabled in stateful workloads), bucketed/pre-partitioned
    // writes (salting controls the layout), and skewed AGGREGATIONS
    // (AQE skew handling only rewrites joins).
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = ((1 to 100000).map(i => (1L, i.toDouble)) ++
        Seq((2L, -1.0), (3L, -2.0))).toDF("k", "v")
      val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cool")).toDF("k", "name")
      val aqe = big.join(dim, "k")
      val t0 = System.nanoTime()
      // execute THIS DataFrame's QueryExecution (a count() would build
      // its own plan and leave aqe's adaptive plan un-finalized)
      val nAqe = aqe.collect().length.toLong
      val aqeSec = (System.nanoTime() - t0) / 1e9
      val finalPlan = aqe.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
      val t1 = System.nanoTime()
      val salted = SkewJoin.saltedInner(big, dim, "k", salt = 8)
      val nSalted = salted.count()
      val saltedSec = (System.nanoTime() - t1) / 1e9
      assert(nAqe == 100002L && nSalted == nAqe)
      assert(aqe.except(salted).isEmpty && salted.except(aqe).isEmpty)
      info(f"aqe=$aqeSec%.2fs salted=$saltedSec%.2fs (timing informational)")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
