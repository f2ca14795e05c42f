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
    withRocksDBState {
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
  }

  test("lastN state writes are amortized O(1) per input row, not O(window) per batch") {
    withRocksDBState {
      val n = 50
      val batches = 30
      val perBatch = 10
      val in = MemoryStream[(Int, Long, Double)]
      val out = Windows.lastN(in.toDS(), n)(_.sum)
      val q = out.toDF("key", "wsum").writeStream
        .format("memory").queryName("lastn_wr").outputMode("append").start()
      Windows.stateRowsWritten.reset()
      (0 until batches).foreach { b =>
        in.addData((0 until perBatch).map(i => (1, (b * perBatch + i).toLong, 1.0)))
        q.processAllAvailable()
      }
      q.stop()
      val rows = batches * perBatch // 300
      val written = Windows.stateRowsWritten.sum()
      // appends = 300; compaction keeps n=50 and fires only once the stale
      // prefix outnumbers the window (≤ once per n appends) → ≤ 300 + 6×50.
      // The old full-rewrite implementation wrote Σ window sizes ≈ 1,275.
      assert(written <= rows * 2L,
        s"state writes $written for $rows input rows — not amortized O(1)")
      // sanity floor: every input row must have been appended exactly once
      assert(written >= rows)
      val sums = spark.table("lastn_wr").as[(Int, Double)].collect().map(_._2)
      assert(sums.length == batches && sums.last == n.toDouble) // full window of 1.0s
    }
  }

  test("trailingTime: window anchored at max seen event time, not the clock") {
    withRocksDBState {
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
  }

  test("trailingTime state writes: expired rows are compacted, not rewritten per batch") {
    withRocksDBState {
      val in = MemoryStream[(Int, Long, Double)]
      // 10µs window over a steadily advancing clock: each batch of 10 rows
      // expires the previous batch entirely
      val out = Windows.trailingTime(in.toDS(), intervalMicros = 10L)(_.sum)
      val q = out.toDF("key", "wsum").writeStream
        .format("memory").queryName("ttime_wr").outputMode("append").start()
      Windows.stateRowsWritten.reset()
      val batches = 20
      (0 until batches).foreach { b =>
        in.addData((0 until 10).map(i => (1, (b * 10 + i) * 2L, 1.0)))
        q.processAllAvailable()
      }
      q.stop()
      val rows = batches * 10 // 200 input rows
      val written = Windows.stateRowsWritten.sum()
      // per batch: 5 of 10 rows are already outside the window on entry
      // (drop-late semantics) → appends = 100; compactions keep ≤ 5 live
      // rows each → ≤ ~100 more. The old implementation rewrote the whole
      // live buffer every batch AND carried every in-window arrival.
      assert(written <= rows * 2L, s"state writes $written for $rows rows")
      assert(written >= 5L * batches) // the in-window half is appended once
    }
  }

  test("trailingTime: all-late batch (maxSeen unchanged) still emits and stays bounded") {
    withRocksDBState {
      val in = MemoryStream[(Int, Long, Double)]
      val out = Windows.trailingTime(in.toDS(), intervalMicros = 5L)(_.sum)
      val q = out.toDF("key", "wsum").writeStream
        .format("memory").queryName("ttime_late").outputMode("append").start()
      in.addData((1, 100L, 1.0)); q.processAllAvailable()
      in.addData((1, 80L, 9.0)); q.processAllAvailable(); q.stop() // fully late
      val got = spark.table("ttime_late").as[(Int, Double)].collect().map(_._2).sorted
      assert(got.toSeq == Seq(1.0, 1.0)) // late row dropped, window unchanged
    }
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
