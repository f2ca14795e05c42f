package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** AsofJoin.leftAsof vs a brute-force per-row model on randomized data
  * (duplicate timestamps included), plus equivalence with the inlined
  * join_asof query plan on the real events table.
  */
class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  test("randomized parity with the brute-force model, duplicate times included") {
    val rnd = new scala.util.Random(8)
    // small key space + coarse times force plenty of ties and unmatched rows
    val leftRows = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
    val rightRows = Seq.tabulate(120)(j =>
      (1000L + j, rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000)))
    val left = leftRows.toDF("l_id", "k", "lt")
    val right = rightRows.toDF("r_id", "k", "rt", "payload")
      .select($"k", $"rt", $"r_id", $"payload")

    val got = AsofJoin.leftAsof(left, right, "k", "lt", "rt")
      .select($"l_id", $"r_id", $"payload")
      .as[(Long, Option[Long], Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // brute force: greatest rt <= lt; ties on rt resolved by greatest
    // (rt, r_id, payload) payload struct — r_id leads the struct after rt
    val expect = leftRows.map { case (lid, k, lt) =>
      val cands = rightRows.filter(r => r._2 == k && r._3 <= lt)
      val best = if (cands.isEmpty) (None, None)
      else {
        val m = cands.maxBy(r => (r._3, r._1, r._4)) // rt, then struct order (r_id, payload)
        (Some(m._1), Some(m._4))
      }
      lid -> best
    }.toMap
    assert(got == expect)
    assert(expect.values.exists(_._1.isEmpty), "fixture has no unmatched rows")
    assert(expect.values.count(_._1.isDefined) > 300, "fixture mostly unmatched")
  }

  test("equivalent to the join_asof query's inlined plan on real events") {
    val ev = graft.Tables(spark, sf(), "events")
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"us")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"us".as("p_us"))
      .agg(max($"event_id").as("last_purchase_id"))
      .select($"user_id", $"p_us", $"last_purchase_id")

    val got = AsofJoin.leftAsof(clicks, purchases, "user_id", "us", "p_us")
      .select($"event_id", $"user_id", $"last_purchase_id",
        ($"us" - $"p_us").as("gap_us"))
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    val query = graft.SparkEntry.queries("join_asof")(spark, sf())
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == query)
  }

  test("SQL null semantics: null keys/times never match; null left rows pass through") {
    val left = Seq(
      (1L, Option(1L), Option(10L)),  // normal match
      (2L, None: Option[Long], Option(10L)), // null key: no match, row kept
      (3L, Option(1L), None: Option[Long]),  // null time: no match, row kept
      (4L, Option(9L), Option(10L))   // key with only null-time right rows
    ).toDF("l_id", "k", "lt")
    val right = Seq(
      (Option(1L), Option(5L), 100),
      (None: Option[Long], Option(1L), 200), // null key: must never match anything
      (Option(9L), None: Option[Long], 300)  // null time: must never match anything
    ).toDF("k", "rt", "payload")
    val got = AsofJoin.leftAsof(left, right, "k", "lt", "rt")
      .select($"l_id", $"payload").as[(Long, Option[Int])].collect().toMap
    assert(got == Map(1L -> Some(100), 2L -> None, 3L -> None, 4L -> None))
  }

  test("map-typed right payloads join (excluded from the tiebreak, not an error)") {
    val left = Seq((1L, 1L, 10L)).toDF("l_id", "k", "lt")
    val right = Seq((1L, 5L, Map("f" -> 1.0)))
      .toDF("k", "rt", "features")
    val got = AsofJoin.leftAsof(left, right, "k", "lt", "rt")
      .select($"l_id", $"features").as[(Long, Map[String, Double])].collect()
    assert(got.toSeq == Seq((1L, Map("f" -> 1.0))))
  }

  test("misuse is loud: overlapping columns, mismatched time types") {
    val l = Seq((1L, 2L)).toDF("k", "t")
    val r = Seq((1L, 2L)).toDF("k", "t")
    intercept[IllegalArgumentException](AsofJoin.leftAsof(l, r, "k", "t", "t"))
    val r2 = Seq((1L, "x")).toDF("k", "rt")
    intercept[IllegalArgumentException](AsofJoin.leftAsof(l, r2, "k", "t", "rt"))
  }
}
