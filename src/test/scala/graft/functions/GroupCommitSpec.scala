package graft.functions

import graft.SparkSuite
import scala.jdk.CollectionConverters._

/** GROUP COMMIT: same-JVM appenders of one table fold through the
  * per-table queue into one manifest commit instead of convoying at
  * the CAS ([[TableLog.commitAppend]]). The fold must preserve every
  * single-writer guarantee — exactly-once per (runKey, batchId),
  * zombie fencing, per-intent drift isolation — which the storm rows
  * here and the existing TableLogSpec races pin. */
class GroupCommitSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_gc").toString + "/t"

  private def df(w: Int, b: Int) =
    Seq.tabulate(50)(i => (w * 100000L + b * 1000L + i, s"w$w-b$b"))
      .toDF("id", "v").coalesce(1)

  test("concurrent appenders: every batch lands exactly once, every ledger entry recorded") {
    val dir = fresh()
    TableLog.appendBatch(df(9, 0), dir, "warm", 0L)
    val writers = 8
    val batches = 4
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => try {
        (0 until batches).foreach { b =>
          assert(TableLog.appendBatch(df(w, b), dir, s"w$w", b.toLong))
        }
      } catch { case t: Throwable => failures.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty, s"writer failed: ${Option(failures.peek())}")
    val m = TableLog.latest(spark, dir).get
    assert(m.rows == (writers * batches + 1) * 50L)
    assert(TableLog.read(spark, dir).count() == m.rows)
    assert(TableLog.read(spark, dir).select($"id").distinct().count() == m.rows,
      "a batch committed twice")
    (0 until writers).foreach { w =>
      assert(m.commits(s"w$w") == (batches - 1).toLong,
        s"w$w's ledger entry lost in a fold")
    }
  }

  test("appends queued behind a slow commit fold into one manifest version") {
    val dir = fresh()
    TableLog.appendBatch(df(9, 0), dir, "warm", 0L) // v0
    // stall each commit attempt long enough for the other writers to
    // enqueue: the leader's NEXT drain must fold them into ONE version
    TableLog.casHook = () => Thread.sleep(300)
    try {
      val threads = (0 until 4).map { w =>
        new Thread(() =>
          assert(TableLog.appendBatch(df(w, 1), dir, s"q$w", 0L)))
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
    } finally TableLog.casHook = () => ()
    val m = TableLog.latest(spark, dir).get
    assert(m.rows == 5 * 50L)
    assert(m.commits.size == 5)
    // 4 un-folded writers would commit versions 1..4; folding must do
    // strictly better (typically v1 = first poller, v2 = the rest)
    assert(m.version <= 3L,
      s"no fold happened: ${m.version} versions for 4 queued appends")
  }

  test("first-ever appends with disagreeing schemas: one wins, the other drifts loudly — even folded into one group") {
    val dir = fresh()
    // stall the CAS so both intents land in ONE drain: the fold must
    // check the second against the FIRST's schema (the running value),
    // not against the empty table's None — the serial path's CAS-retry
    // recheck, preserved under folding
    TableLog.casHook = () => Thread.sleep(300)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val a = new Thread(() =>
        try { TableLog.appendBatch(df(1, 0), dir, "wa", 0L); outcomes.add("ok") }
        catch { case e: IllegalArgumentException =>
          outcomes.add("drift:" + e.getMessage.contains("schema drift")) })
      val b = new Thread(() =>
        try {
          TableLog.appendBatch(
            Seq.tabulate(50)(i => (i.toLong, i * 1.5))
              .toDF("id", "score").coalesce(1), dir, "wb", 0L)
          outcomes.add("ok")
        } catch { case e: IllegalArgumentException =>
          outcomes.add("drift:" + e.getMessage.contains("schema drift")) })
      a.start(); b.start(); a.join(); b.join()
    } finally TableLog.casHook = () => ()
    assert(outcomes.asScala.toSeq.sorted == Seq("drift:true", "ok"),
      s"a mis-shaped batch folded into a brand-new table: $outcomes")
    // the winner's schema is the recorded one and the table reads clean
    val m = TableLog.latest(spark, dir).get
    assert(m.rows == 50L && m.commits.size == 1)
    assert(TableLog.read(spark, dir).count() == 50L)
  }

  test("a failed group commit propagates the error to in-group-fenced replicas instead of resolving them 'already committed'") {
    val dir = fresh()
    TableLog.appendBatch(df(9, 0), dir, "warm", 0L)
    // every CAS attempt fails: NO batch can land, so no caller may
    // return at all — in particular a replica fenced against an
    // EARLIER INTENT IN ITS OWN GROUP must not resolve false ("already
    // committed") while the entry it was fenced on never reached disk;
    // a false here would advance its checkpoint past a lost batch
    TableLog.casHook = () => {
      Thread.sleep(300)
      throw new java.io.IOException("injected commit outage")
    }
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val threads = (0 until 3).map { _ =>
        new Thread(() =>
          try {
            val r = TableLog.appendBatch(df(1, 1), dir, "dup", 1L)
            outcomes.add(s"returned:$r")
          } catch {
            case _: java.io.IOException => outcomes.add("failed")
          })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
    } finally TableLog.casHook = () => ()
    assert(outcomes.asScala.forall(_ == "failed"),
      s"a replica resolved during a failed group commit: ${outcomes.asScala}")
    // nothing landed: the table is exactly the warm batch, no ledger entry
    assert(TableLog.rows(spark, dir) == 50L)
    assert(!TableLog.latest(spark, dir).get.commits.contains("dup"))
  }

  test("same-runKey replicas racing in one burst: exactly one commits, the rest fence") {
    val dir = fresh()
    TableLog.appendBatch(df(9, 0), dir, "warm", 0L)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Boolean]()
    val threads = (0 until 4).map { _ =>
      new Thread(() =>
        results.add(TableLog.appendBatch(df(1, 1), dir, "dup", 1L)))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(results.asScala.count(_.booleanValue()) == 1,
      s"zombie fence failed under group commit: $results")
    assert(TableLog.rows(spark, dir) == 100L,
      "a fenced replica's rows leaked into the table")
    assert(TableLog.latest(spark, dir).get.commits("dup") == 1L)
  }
}
