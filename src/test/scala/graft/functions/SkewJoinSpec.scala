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
}
