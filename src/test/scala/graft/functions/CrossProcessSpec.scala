package graft.functions

import graft.SparkSuite
import graft.tools.ForkedJvm

/** The CROSS-PROCESS multi-writer proof: every other concurrency spec
  * in this suite contends THREADS of one JVM, where the group-commit
  * queue and store mutex statics quietly serialize same-table writers.
  * Here the writers are real OS processes sharing nothing but the
  * table directory — each a forked JVM with its own SparkSession —
  * and the guarantees must come from the [[CommitStore]] CAS alone
  * (the `file:` default, [[CommitStore.AtomicLink]], is hard-link
  * publish: `link(2)` is kernel-atomic across processes).
  *
  * Pinned: exactly-once landing of every batch under cross-process
  * contention, zombie fencing ACROSS processes (replica JVMs sharing
  * one runKey), and no torn manifest at any retained version. */
class CrossProcessSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  private def readResults(f: java.nio.file.Path): Map[Long, Boolean] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(f).asScala
      .filterNot(_.startsWith("done:")).map { line =>
        val Array(b, r) = line.split(":")
        b.toLong -> r.toBoolean
      }.toMap
  }

  test("three contending JVMs: every batch lands exactly once, ledgers complete, no torn manifest") {
    val root = fresh("graft_xp")
    val dir = root.toString + "/t"
    val batches = 8
    val rows = 200
    // schema-setting warm batch from the parent, so the children race
    // appends, not the first-ever-append schema election
    TableLog.appendBatch(
      Seq.tabulate(rows)(i => (900000000L + i, "warm")).toDF("id", "v")
        .coalesce(1), dir, "warm", 0L)
    val procs = (0 until 3).map { w =>
      val results = root.resolve(s"results-$w")
      (w, results, ForkedJvm.spawn("graft.tools.MwChild",
        Seq(dir, s"w$w", "0", batches.toString, rows.toString,
          results.toString)))
    }
    procs.foreach { case (w, _, p) =>
      assert(p.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
        s"writer process $w did not finish")
      assert(p.exitValue() == 0, s"writer process $w failed")
    }
    // every child saw every one of its batches commit (distinct runKeys
    // — nothing to fence)
    procs.foreach { case (w, results, _) =>
      val got = readResults(results)
      assert(got == (0L until batches).map(_ -> true).toMap,
        s"writer $w's outcomes: $got")
    }
    val m = TableLog.latest(spark, dir).get
    assert(m.rows == (3 * batches + 1).toLong * rows)
    assert(TableLog.read(spark, dir).count() == m.rows)
    assert(TableLog.read(spark, dir).select($"id").distinct().count() == m.rows,
      "a batch committed twice across processes")
    (0 until 3).foreach(w => assert(m.commits(s"w$w") == (batches - 1).toLong,
      s"w$w's ledger entry lost to a cross-process race"))
    // no torn manifest: every retained version parses and resolves
    TableLog.retainedVersions(spark, dir).foreach(v =>
      TableLog.readAt(spark, dir, v))
  }

  test("appenders racing a maintenance process: compact/delete/vacuum rebase, no batch is lost") {
    val root = fresh("graft_xpm")
    val dir = root.toString + "/t"
    val batches = 6
    val rows = 200
    val rounds = 5
    // warm rows carry the schema AND the maintenance child's delete
    // victims (ids 900000000+i — disjoint from the appenders' pid-based
    // id space, which starts at pid * 10^9)
    val warmRows = 100
    TableLog.appendBatch(
      Seq.tabulate(warmRows)(i => (900000000L + i, "warm")).toDF("id", "v")
        .coalesce(1), dir, "warm", 0L)
    val appenders = (0 until 2).map { w =>
      val results = root.resolve(s"results-$w")
      (w, results, ForkedJvm.spawn("graft.tools.MwChild",
        Seq(dir, s"w$w", "0", batches.toString, rows.toString,
          results.toString)))
    }
    val maintResults = root.resolve("results-maint")
    val maint = ForkedJvm.spawn("graft.tools.MaintChild",
      Seq(dir, rounds.toString, "900000000", maintResults.toString))
    (appenders.map(_._3) :+ maint).zipWithIndex.foreach { case (p, i) =>
      assert(p.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
        s"process $i did not finish")
      assert(p.exitValue() == 0, s"process $i failed")
    }
    // every appended batch landed exactly once despite racing rewrites
    appenders.foreach { case (w, results, _) =>
      val got = readResults(results)
      assert(got == (0L until batches).map(_ -> true).toMap,
        s"writer $w's outcomes under maintenance contention: $got")
    }
    // every maintenance round completed (deleteIn found exactly its 10
    // planted victims each round — a lost row would have failed there)
    import scala.jdk.CollectionConverters._
    val maintLines = java.nio.file.Files.readAllLines(maintResults)
      .asScala.filter(_.startsWith("round:"))
    assert(maintLines.size == rounds, s"maintenance rounds: $maintLines")
    val m = TableLog.latest(spark, dir).get
    val expect = (warmRows - rounds * 10) + 2 * batches * rows
    assert(m.rows == expect.toLong, s"rows ${m.rows} != $expect")
    assert(TableLog.read(spark, dir).count() == m.rows)
    assert(TableLog.read(spark, dir).select($"id").distinct().count() == m.rows,
      "a batch doubled across the compact rebase")
    (0 until 2).foreach(w => assert(m.commits(s"w$w") == (batches - 1).toLong,
      s"w$w's ledger entry lost to a maintenance rewrite"))
    assert(TableLog.read(spark, dir)
      .filter($"id" >= 900000000L && $"id" < 900000000L + rounds * 10)
      .count() == 0L, "a compact rebase resurrected deleted rows")
    // no torn manifest at any retained version
    TableLog.retainedVersions(spark, dir).foreach(v =>
      TableLog.readAt(spark, dir, v))
  }

  test("replica JVMs sharing one runKey: zombie fencing holds across processes") {
    val root = fresh("graft_xpz")
    val dir = root.toString + "/t"
    val batches = 4
    val rows = 100
    TableLog.appendBatch(
      Seq.tabulate(rows)(i => (900000000L + i, "warm")).toDF("id", "v")
        .coalesce(1), dir, "warm", 0L)
    // two processes believing they are THE writer "dup" replay the same
    // batch ids — the crashed-and-restarted / zombie-leftover shape;
    // per batch, exactly one process's commit may land
    val procs = (0 until 2).map { w =>
      val results = root.resolve(s"results-$w")
      (w, results, ForkedJvm.spawn("graft.tools.MwChild",
        Seq(dir, "dup", "0", batches.toString, rows.toString,
          results.toString)))
    }
    procs.foreach { case (w, _, p) =>
      assert(p.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
        s"replica process $w did not finish")
      assert(p.exitValue() == 0, s"replica process $w failed")
    }
    val outcomes = procs.map { case (_, results, _) => readResults(results) }
    (0L until batches).foreach { b =>
      val landed = outcomes.count(_(b))
      assert(landed == 1,
        s"batch $b of runKey 'dup' committed $landed times across processes")
    }
    val m = TableLog.latest(spark, dir).get
    assert(m.commits("dup") == (batches - 1).toLong)
    assert(m.rows == (batches + 1).toLong * rows,
      "a fenced replica's rows leaked into the table")
    assert(TableLog.read(spark, dir).count() == m.rows)
  }
}
