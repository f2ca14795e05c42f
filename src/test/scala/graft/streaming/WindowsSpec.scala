package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Reference-specific window semantics (diff_iloc/diff_loc,
  * aggregations.py:173-245) driven through micro-batches.
  */
class WindowsSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("lastN: aggregate over last N rows spans batch boundaries") {
    val in = MemoryStream[(Int, Long, Double)]
    val out = Windows.lastN(in.toDS(), 3)(_.sum)
    val q = out.toDF("key", "wsum").writeStream
      .format("memory").queryName("lastn_t").outputMode("append").start()
    in.addData((1, 1L, 1.0), (1, 2L, 2.0)); q.processAllAvailable()
    in.addData((1, 3L, 3.0), (1, 4L, 4.0)); q.processAllAvailable(); q.stop()
    val got = spark.table("lastn_t").as[(Int, Double)].collect().map(_._2).sorted
    // batch 1: window [1,2] → 3; batch 2: window [2,3,4] → 9
    assert(got.toSeq == Seq(3.0, 9.0))
  }

  test("trailingTime: window anchored at max seen event time, not the clock") {
    val in = MemoryStream[(Int, Long, Double)]
    val out = Windows.trailingTime(in.toDS(), intervalMicros = 10L)(_.sum)
    val q = out.toDF("key", "wsum").writeStream
      .format("memory").queryName("ttime_t").outputMode("append").start()
    in.addData((1, 100L, 1.0), (1, 105L, 2.0)); q.processAllAvailable()
    // max=105, window (95,105]: both in → 3
    in.addData((1, 112L, 10.0)); q.processAllAvailable()
    // max=112, window (102,112]: 105 and 112 → 12; the 100 is evicted
    in.addData((1, 108L, 5.0)); q.processAllAvailable(); q.stop()
    // late row inside window: max stays 112, (102,112]: 105,108,112 → 17
    val got = spark.table("ttime_t").as[(Int, Double)].collect().map(_._2).sorted
    assert(got.toSeq == Seq(3.0, 12.0, 17.0))
  }

  test("partitionUnique: groups of n distinct keys, keep first vs last") {
    val in = MemoryStream[(Int, Long, String)]
    val out = Windows.partitionUnique(in.toDS(), 3, keep = "first",
      groupKey = (v: String) => v.take(1))
    val q = out.toDF("key", "group").writeStream
      .format("memory").queryName("pu_t").outputMode("append").start()
    // a1 b1 a2(dup key a, keep first a1) c1 → emits [a1,b1,c1]; d1 buffered
    in.addData((1, 1L, "a1"), (1, 2L, "b1"), (1, 3L, "a2"), (1, 4L, "c1"), (1, 5L, "d1"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("pu_t").as[(Int, Seq[String])].collect()
    assert(got.toSeq == Seq((1, Seq("a1", "b1", "c1"))))
  }

  test("partitionUnique keep=last: duplicate key moves to most-recent position") {
    val in = MemoryStream[(Int, Long, String)]
    val out = Windows.partitionUnique(in.toDS(), 3, keep = "last",
      groupKey = (v: String) => v.take(1))
    val q = out.toDF("key", "group").writeStream
      .format("memory").queryName("pu_last_t").outputMode("append").start()
    // reference core.py:1245-1254 pops and re-inserts: a1 b1 a2 c1 →
    // the 'a' key moves behind 'b' and takes the new value → [b1,a2,c1]
    in.addData((1, 1L, "a1"), (1, 2L, "b1"), (1, 3L, "a2"), (1, 4L, "c1"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("pu_last_t").as[(Int, Seq[String])].collect()
    assert(got.toSeq == Seq((1, Seq("b1", "a2", "c1"))))
  }

  test("lastNGroupbyAgg: arbitrary per-group aggregation (var over trailing rows)") {
    val in = MemoryStream[(Int, Long, String, Double)]
    val out = Windows.lastNGroupbyAgg(in.toDS(), 4) { vs =>
      if (vs.size < 2) 0.0
      else { // sample variance
        val m = vs.sum / vs.size
        vs.map(x => (x - m) * (x - m)).sum / (vs.size - 1)
      }
    }
    val q = out.toDF("key", "groups").writeStream
      .format("memory").queryName("lnga_t").outputMode("append").start()
    in.addData((1, 1L, "a", 1.0), (1, 2L, "a", 3.0), (1, 3L, "b", 5.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("lnga_t").as[(Int, Map[String, Double])].collect()
    assert(got(0)._2 == Map("a" -> 2.0, "b" -> 0.0)) // var(1,3)=2; single → 0
  }

  test("lastNGroupby: per-group sums over trailing rows, empty groups pruned") {
    val in = MemoryStream[(Int, Long, String, Double)]
    val out = Windows.lastNGroupby(in.toDS(), 3)
    val q = out.toDF("key", "groups").writeStream
      .format("memory").queryName("lng_t").outputMode("append").start()
    in.addData((1, 1L, "a", 1.0), (1, 2L, "a", 2.0), (1, 3L, "b", 10.0))
    q.processAllAvailable()
    in.addData((1, 4L, "c", 100.0), (1, 5L, "c", 200.0)) // evicts both a rows
    q.processAllAvailable(); q.stop()
    val got = spark.table("lng_t").as[(Int, Map[String, (Double, Long)])].collect()
    assert(got(0)._2 == Map("a" -> (3.0, 2L), "b" -> (10.0, 1L)))
    // 'a' fell out of the window entirely → pruned from the snapshot
    assert(got(1)._2 == Map("b" -> (10.0, 1L), "c" -> (300.0, 2L)))
  }
}
