package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** zip / combine_latest / zip_latest semantics (reference
  * tests/test_core.py:230-350 pattern), including state across batches.
  * Sequence numbers define arrival order; side-by-side with the reference:
  * emitting L1 L2 R1 L3 R2 across two batches.
  */
class AlignSpec extends SparkSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("zip: pairs i-th with i-th, buffering the faster side") {
    val l = MemoryStream[(Int, Long, String)]
    val r = MemoryStream[(Int, Long, Int)]
    val out = Align.zip(l.toDS(), r.toDS())
    val q = out.toDF("key", "a", "b").writeStream
      .format("memory").queryName("zip_t").outputMode("append").start()
    l.addData((1, 1L, "x"), (1, 2L, "y"), (1, 5L, "z"))
    r.addData((1, 3L, 10))
    q.processAllAvailable()
    assert(spark.table("zip_t").count() == 1) // only one right element yet
    r.addData((1, 6L, 20), (1, 7L, 30))
    q.processAllAvailable(); q.stop()
    val got = spark.table("zip_t").as[(Int, String, Int)].collect().sortBy(_._3)
    assert(got.toSeq == Seq((1, "x", 10), (1, "y", 20), (1, "z", 30)))
  }

  test("combineLatest: emits latest pair on every arrival once both sides seen") {
    val l = MemoryStream[(Int, Long, String)]
    val r = MemoryStream[(Int, Long, Int)]
    val out = Align.combineLatest(l.toDS(), r.toDS())
    val q = out.toDF("key", "seq", "a", "b").writeStream
      .format("memory").queryName("cl_t").outputMode("append").start()
    // arrival order: L(a) R(1) L(b) R(2)
    l.addData((1, 1L, "a")); q.processAllAvailable()
    r.addData((1, 2L, 1)); q.processAllAvailable()
    l.addData((1, 3L, "b")); q.processAllAvailable()
    r.addData((1, 4L, 2)); q.processAllAvailable(); q.stop()
    val got = spark.table("cl_t").as[(Int, Long, String, Int)].collect().sortBy(_._2)
      .map(t => (t._3, t._4))
    assert(got.toSeq == Seq(("a", 1), ("b", 1), ("b", 2)))
  }

  test("combineLatest emit_on: only the designated side triggers emission") {
    val l = MemoryStream[(Int, Long, String)]
    val r = MemoryStream[(Int, Long, Int)]
    // emit only on left (side 0) — right updates just refresh state
    val out = Align.combineLatest(l.toDS(), r.toDS(), emitOn = Set(0))
    val q = out.toDF("key", "seq", "a", "b").writeStream
      .format("memory").queryName("cl_eo").outputMode("append").start()
    l.addData((1, 1L, "a")); q.processAllAvailable()
    r.addData((1, 2L, 1)); q.processAllAvailable()   // no emission
    l.addData((1, 3L, "b")); q.processAllAvailable() // emits (b, 1)
    r.addData((1, 4L, 2)); q.processAllAvailable()   // no emission
    l.addData((1, 5L, "c")); q.processAllAvailable(); q.stop() // emits (c, 2)
    val got = spark.table("cl_eo").as[(Int, Long, String, Int)].collect().sortBy(_._2)
      .map(t => (t._3, t._4))
    assert(got.toSeq == Seq(("b", 1), ("c", 2)))
  }

  test("zipLatest: lossless left, paired with most recent right") {
    val l = MemoryStream[(Int, Long, String)]
    val r = MemoryStream[(Int, Long, Int)]
    val out = Align.zipLatest(l.toDS(), r.toDS())
    val q = out.toDF("key", "seq", "a", "b").writeStream
      .format("memory").queryName("zl_t").outputMode("append").start()
    // L(a) before any right → buffered (core.py:1948 lossless_buffer),
    // flushed with the first right value; then R(1) L(b) L(c) R(2) L(d)
    l.addData((1, 1L, "a")); q.processAllAvailable()
    assert(spark.table("zl_t").count() == 0) // buffered, not emitted yet
    r.addData((1, 2L, 1)); l.addData((1, 3L, "b"), (1, 4L, "c")); q.processAllAvailable()
    r.addData((1, 5L, 2)); l.addData((1, 6L, "d")); q.processAllAvailable(); q.stop()
    val got = spark.table("zl_t").as[(Int, Long, String, Int)].collect().sortBy(_._2)
      .map(t => (t._3, t._4))
    assert(got.toSeq == Seq(("a", 1), ("b", 1), ("c", 1), ("d", 2)))
  }

  test("zip maxsize: slow right side, left leftover buffer capped (drop_oldest)") {
    val l = MemoryStream[(Int, Long, String)]
    val r = MemoryStream[(Int, Long, Int)]
    val out = Align.zip(l.toDS(), r.toDS(), maxsize = 3)
    val q = out.toDF("key", "a", "b").writeStream
      .format("memory").queryName("zip_cap").outputMode("append").start()
    // 5 left elements, no right: only the newest 3 survive in state
    l.addData((1 to 5).map(i => (1, i.toLong, s"l$i")): _*)
    q.processAllAvailable()
    r.addData((1 to 3).map(i => (1, (10 + i).toLong, i)): _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table("zip_cap").as[(Int, String, Int)].collect().sortBy(_._3)
    // l1, l2 were dropped oldest-first; l3..l5 pair with r1..r3
    assert(got.toSeq == Seq((1, "l3", 1), (1, "l4", 2), (1, "l5", 3)))
  }

  test("zip maxsize drop_oldest is batch-split independent: same element " +
    "sequence, any micro-batch slicing, same pairs (r3 advice pin)") {
    // L1 L2 L3 L4 R1 R2 L5 R3 R4 R5 with maxsize=2 — element-at-a-time:
    // L buffer caps to [L3,L4]; pairs (L3,R1) (L4,R2) (L5,R3); [R4,R5] wait
    val events: Seq[(Boolean, Int, Long, String)] = Seq(
      (true, 1, 1L, "L1"), (true, 1, 2L, "L2"), (true, 1, 3L, "L3"),
      (true, 1, 4L, "L4"), (false, 1, 5L, "R1"), (false, 1, 6L, "R2"),
      (true, 1, 7L, "L5"), (false, 1, 8L, "R3"), (false, 1, 9L, "R4"),
      (false, 1, 10L, "R5"))
    def run(name: String, slices: Seq[Seq[(Boolean, Int, Long, String)]]): Seq[(String, String)] = {
      // ONE source stream split into the two zip legs: both legs read the
      // same source offsets, so each addData slice reaches both sides in
      // the SAME micro-batch — two separate MemoryStreams would race the
      // trigger thread between their addData calls and the engine could
      // batch a slice's lefts before its rights (exactly the boundary
      // dependence this test exists to rule out)
      val src = MemoryStream[(Boolean, Int, Long, String)]
      val l = src.toDS().filter(_._1).map(e => (e._2, e._3, e._4))
      val r = src.toDS().filter(!_._1).map(e => (e._2, e._3, e._4))
      val q = Align.zip(l, r, maxsize = 2)
        .toDF("key", "a", "b").writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        slices.foreach { slice => src.addData(slice); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[(Int, String, String)].collect().toSeq
        .sortBy(_._2).map(t => (t._2, t._3))
    }
    val expect = Seq(("L3", "R1"), ("L4", "R2"), ("L5", "R3"))
    assert(run("zbs_one", Seq(events)) == expect)             // one batch
    assert(run("zbs_each", events.map(Seq(_))) == expect)     // one per batch
    assert(run("zbs_mix", Seq(events.take(3), events.slice(3, 7),
      events.drop(7))) == expect)                             // uneven split
  }

  test("zipN: 3 streams + a literal upstream spliced at its position") {
    val s0 = MemoryStream[(Int, Long, String)]
    val s1 = MemoryStream[(Int, Long, String)]
    val s2 = MemoryStream[(Int, Long, String)]
    // Stream.zip(s0, "LIT", s1, s2): literal at tuple position 1
    val out = Align.zipN(Seq(s0.toDS(), s1.toDS(), s2.toDS()),
      literals = Seq((1, "LIT")))
    val q = out.toDF("key", "tup").writeStream
      .format("memory").queryName("zipn_t").outputMode("append").start()
    s0.addData((1, 1L, "a1"), (1, 2L, "a2"))
    s1.addData((1, 3L, "b1"))
    q.processAllAvailable()
    assert(spark.table("zipn_t").count() == 0) // s2 has produced nothing yet
    s2.addData((1, 4L, "c1"), (1, 5L, "c2"))
    s1.addData((1, 6L, "b2"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("zipn_t").as[(Int, Seq[String])].collect()
      .map(_._2).sortBy(_.head)
    assert(got.toSeq == Seq(
      Seq("a1", "LIT", "b1", "c1"), Seq("a2", "LIT", "b2", "c2")))
  }

  test("combineLatestN: emits latest N-tuple once all streams seen, emitOn respected") {
    val s0 = MemoryStream[(Int, Long, Int)]
    val s1 = MemoryStream[(Int, Long, Int)]
    val s2 = MemoryStream[(Int, Long, Int)]
    // only stream 0 triggers emission
    val out = Align.combineLatestN(Seq(s0.toDS(), s1.toDS(), s2.toDS()), emitOn = Set(0))
    val q = out.toDF("key", "seq", "tup").writeStream
      .format("memory").queryName("cln_t").outputMode("append").start()
    s0.addData((1, 1L, 100)); q.processAllAvailable()   // others empty: nothing
    s1.addData((1, 2L, 200)); s2.addData((1, 3L, 300)); q.processAllAvailable() // non-emitting
    s0.addData((1, 4L, 101)); q.processAllAvailable()   // emits (101, 200, 300)
    s1.addData((1, 5L, 201)); q.processAllAvailable()   // non-emitting side: refresh only
    s0.addData((1, 6L, 102)); q.processAllAvailable(); q.stop() // emits (102, 201, 300)
    val got = spark.table("cln_t").as[(Int, Long, Seq[Int])].collect()
      .sortBy(_._2).map(_._3)
    assert(got.toSeq == Seq(Seq(101, 200, 300), Seq(102, 201, 300)))
  }

  test("alignment state is sharded per key") {
    val l = MemoryStream[(Int, Long, String)]
    val r = MemoryStream[(Int, Long, Int)]
    val out = Align.zipLatest(l.toDS(), r.toDS())
    val q = out.toDF("key", "seq", "a", "b").writeStream
      .format("memory").queryName("zl_k").outputMode("append").start()
    r.addData((1, 1L, 100), (2, 2L, 200))
    l.addData((1, 3L, "k1"), (2, 4L, "k2"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("zl_k").as[(Int, Long, String, Int)].collect()
      .sortBy(_._1).map(t => (t._1, t._4))
    assert(got.toSeq == Seq((1, 100), (2, 200)))
  }
}
