package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit-level contract of the push-source offset/buffer machinery,
  * including the driver-restart rebase: a fresh stream handed a
  * checkpointed offset beyond its (empty) buffer must renumber new
  * arrivals from that offset — otherwise every event buffered before the
  * first post-restart commit is discarded as already-committed.
  */
class PushRecoverySpec extends AnyFunSuite {

  private class TestStream extends PushMicroBatchStream(numPartitions = 2) {
    override protected def startFeeder(): Unit = ()
    override protected def stopFeeder(): Unit = ()
    def feed(vs: String*): Unit = vs.foreach(push)
  }

  private def rows(ps: Array[org.apache.spark.sql.connector.read.InputPartition]): Seq[String] =
    ps.flatMap(_.asInstanceOf[PushInputPartition].rows.map(_._1)).toSeq

  test("offsets advance with pushes; commit trims; ranges replay exactly once") {
    val s = new TestStream
    assert(s.initialOffset() == PushOffset(0))
    s.feed("a", "b", "c")
    assert(s.latestOffset() == PushOffset(3))
    assert(rows(s.planInputPartitions(PushOffset(0), PushOffset(3))) == Seq("a", "b", "c"))
    s.commit(PushOffset(2))
    // committed prefix is gone; the uncommitted tail is still addressable
    assert(rows(s.planInputPartitions(PushOffset(2), PushOffset(3))) == Seq("c"))
    s.feed("d")
    assert(s.latestOffset() == PushOffset(4))
    assert(rows(s.planInputPartitions(PushOffset(3), PushOffset(4))) == Seq("d"))
  }

  test("restart rebase: recovered offset beyond a fresh buffer renumbers " +
    "new arrivals instead of discarding them") {
    // previous driver committed through offset 1000, then died
    val s = new TestStream
    val recovered = s.deserializeOffset("1000")
    assert(recovered == PushOffset(1000))
    // events arriving AFTER restart must surface at offsets >= 1000
    s.feed("x", "y")
    assert(s.latestOffset() == PushOffset(1002))
    assert(rows(s.planInputPartitions(PushOffset(1000), PushOffset(1002))) == Seq("x", "y"))
    s.commit(PushOffset(1002))
    assert(s.latestOffset() == PushOffset(1002))
    // a fully-lost pre-crash range (committed 900..1000) plans empty, not an error
    assert(rows(s.planInputPartitions(PushOffset(900), PushOffset(1000))) == Seq.empty)
  }

  test("multi-partition slicing covers the range with no duplicates") {
    val s = new TestStream
    s.feed((1 to 7).map(i => s"e$i"): _*)
    val parts = s.planInputPartitions(PushOffset(0), PushOffset(7))
    assert(parts.length == 2) // ceil(7/2 per chunk) → 2 partitions of 4+3
    assert(rows(parts) == (1 to 7).map(i => s"e$i"))
  }
}
