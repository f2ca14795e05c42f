package graft.functions

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The pluggable commit CAS: the [[CommitStore]] contract itself, and
  * the TableLog race/zombie/rebase matrix re-run on a simulated
  * S3-class store ([[NonAtomicStoreFs]]) whose rename is a silently
  * overwriting copy — the environment where the classic
  * temp+rename commit is UNSOUND across processes and the
  * conditional-create store is the correct CAS. */
class CommitStoreSpec extends SparkSuite {
  import spark.implicits._

  NonAtomicStoreFs.install(spark.sparkContext.hadoopConfiguration)

  /** A table dir on the simulated object store. */
  private def freshStoreTable(): String =
    "nonatomic:" +
      java.nio.file.Files.createTempDirectory("graft_ns").toString + "/t"

  private def batchDf(b: Int, n: Int = 100) =
    Seq.tabulate(n)(i => (b * 1000L + i, s"v$b-$i")).toDF("id", "v")

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("the simulated store's rename is an overwriting copy — no CAS to ride") {
    // this is WHY the seam exists: on an object store, rename carries no
    // destination precondition, so "rename fails on existing" — the
    // HDFS commit's atomicity — simply is not there to be had, and the
    // in-JVM mutex that papers over the local-FS TOCTOU cannot reach a
    // second PROCESS. The commit must come from the store's own
    // conditional write instead.
    val base = "nonatomic:" +
      java.nio.file.Files.createTempDirectory("graft_ns").toString
    val fs = fsOf(base)
    def put(name: String, content: String): Path = {
      val p = new Path(base, name)
      val out = fs.create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      p
    }
    val loser = put("src", "second writer")
    val dst = put("dst", "first writer's committed manifest")
    assert(fs.rename(loser, dst),
      "object-store rename must succeed onto an existing destination")
    val in = fs.open(dst)
    val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(got == "second writer",
      "fixture vacuity: the simulator did not overwrite on rename")
  }

  test("ConditionalCreate.putIfAbsent: one winner under contention, content never torn") {
    val base = "nonatomic:" +
      java.nio.file.Files.createTempDirectory("graft_ns").toString
    val fs = fsOf(base)
    (0 until 20).foreach { round =>
      val dst = new Path(base, f"manifest-$round%020d")
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 8).map { w =>
        // distinct contents long enough that a torn interleaving would
        // be detectable as a mixed/truncated read-back
        val content = (s"writer-$w:" * 200).getBytes("UTF-8")
        new Thread(() =>
          if (CommitStore.ConditionalCreate.putIfAbsent(fs, dst, content))
            winners.incrementAndGet())
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(winners.get() == 1,
        s"round $round: ${winners.get()} writers won one destination")
      val in = fs.open(dst)
      val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val w = got.takeWhile(_ != ':')
      assert(got == (s"$w:" * 200).dropRight(0) &&
        got.length == s"$w:".length * 200,
        s"round $round: destination content torn or mixed")
    }
  }

  test("AtomicLink.putIfAbsent: one winner under thread contention, content never torn, temp files swept") {
    val base = java.nio.file.Files.createTempDirectory("graft_al").toString
    val fs = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 20).foreach { round =>
      val dst = new Path(base, f"manifest-$round%020d")
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 8).map { w =>
        val content = (s"writer-$w:" * 200).getBytes("UTF-8")
        new Thread(() =>
          if (CommitStore.AtomicLink.putIfAbsent(fs, dst, content))
            winners.incrementAndGet())
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(winners.get() == 1,
        s"round $round: ${winners.get()} writers won one destination")
      val in = fs.open(dst)
      val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val w = got.takeWhile(_ != ':')
      assert(got == s"$w:" * 200,
        s"round $round: destination content torn or mixed")
    }
    // losers' temp siblings are deleted in every outcome
    assert(!new java.io.File(base).listFiles()
      .exists(_.getName.startsWith(".tmp-")), "temp files leaked")
    // a second put of a committed name loses without touching content
    val dst0 = new Path(base, f"manifest-${0}%020d")
    assert(!CommitStore.AtomicLink.putIfAbsent(fs, dst0, "late".getBytes))
  }

  test("the rename store remains selectable for file: via the conf override") {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("graft.tablelog.commit.store.file", "rename")
    // newInstance, not getLocal: the FileSystem CACHE would hand back
    // an instance built with the un-overridden conf
    val fs = org.apache.hadoop.fs.FileSystem.newInstance(
      java.net.URI.create("file:///"), conf)
    try assert(CommitStore.forFs(fs) eq CommitStore.Rename,
      "the per-scheme override must beat the atomic-link default")
    finally fs.close()
  }

  test("store resolution: scheme defaults, per-scheme override, loud unknown") {
    val localFs = new Path(freshStoreTable().stripPrefix("nonatomic:"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(CommitStore.forFs(localFs) eq CommitStore.AtomicLink,
      "local filesystems must default to the hard-link store " +
        "(cross-process-atomic; CrossProcessSpec proves it with real JVMs)")
    assert(CommitStore.forFs(fsOf(freshStoreTable()))
        eq CommitStore.ConditionalCreate,
      "the installed per-scheme override was not honored")
    intercept[IllegalArgumentException](CommitStore.byName("two-phase"))
  }

  test("exactly-once appends, replay dedup and snapshot reads hold on the simulated store") {
    val dir = freshStoreTable()
    assert(TableLog.appendBatch(batchDf(0), dir, "gen-1", 0L))
    assert(TableLog.appendBatch(batchDf(1), dir, "gen-1", 1L))
    assert(!TableLog.appendBatch(batchDf(1), dir, "gen-1", 1L),
      "replay must dedup on the object store exactly as on local")
    assert(TableLog.rows(spark, dir) == 200L)
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      .toSeq == ((0L until 100L) ++ (1000L until 1100L)).toSeq)
    // time travel + CDC read the same committed history
    assert(TableLog.readAt(spark, dir, 0L).count() == 100L)
    val (d, v) = TableLog.appendsSince(spark, dir, 0L)
    assert(d.get.count() == 100L && v == 1L)
  }

  test("two appenders with distinct runKeys race one CAS on the store — both land, maps merge") {
    val dir = freshStoreTable()
    assert(TableLog.appendBatch(batchDf(0), dir, "writer-x", 0L))
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      assert(TableLog.appendBatch(batchDf(10), dir, "writer-y", 0L))
    }
    try assert(TableLog.appendBatch(batchDf(1), dir, "writer-x", 1L))
    finally TableLog.casHook = () => ()
    val m = TableLog.latest(spark, dir).get
    assert(m.commits == Map("writer-x" -> 1L, "writer-y" -> 0L),
      s"commit maps did not merge: ${m.commits}")
    val read = TableLog.read(spark, dir)
    assert(read.count() == 300L &&
      read.select("id").distinct().count() == 300L,
      "a racing append duplicated or lost rows on the simulated store")
  }

  test("a zombie replica is fenced at commit on the store — rows never double") {
    val dir = freshStoreTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      assert(TableLog.appendBatch(batchDf(1), dir, "r", 1L))
    }
    val zombieLanded =
      try TableLog.appendBatch(batchDf(1), dir, "r", 1L)
      finally TableLog.casHook = () => ()
    assert(!zombieLanded, "the zombie's duplicate commit must be fenced")
    assert(TableLog.read(spark, dir).count() == 200L)
    // vacuum reclaims the zombie's orphans through the same store
    assert(TableLog.vacuum(spark, dir, graceMs = 0L) > 0)
    assert(TableLog.read(spark, dir).count() == 200L)
  }

  test("compact rebases over a racing append on the store; restore round-trips") {
    val dir = freshStoreTable()
    (0 until 3).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      assert(TableLog.appendBatch(batchDf(3), dir, "r", 3L))
    }
    try TableLog.compact(spark, dir, targetBytes = 1L << 20)
    finally TableLog.casHook = () => ()
    val m = TableLog.latest(spark, dir).get
    // the rebase keeps the raced append's files AND its rows: 3 planned
    // batches + the one that landed inside the commit window = 400
    assert(m.op == "compact" && m.rows == 400L,
      s"compact lost the raced append: op=${m.op} rows=${m.rows}")
    assert(TableLog.read(spark, dir).count() == 400L,
      "rebased compact + raced append must serve every row")
    // delete + restore, both CAS-committed through the store
    val v = m.version
    assert(TableLog.delete(spark, dir, col("id") < 1000L) == 100L)
    assert(TableLog.read(spark, dir).count() == 300L)
    TableLog.restore(spark, dir, v)
    assert(TableLog.read(spark, dir).count() == 400L)
  }

  test("8-writer commit storm on the simulated store: no lost batches, no torn manifests") {
    val dir = freshStoreTable()
    val writers = 8
    val batches = 4
    TableLog.appendBatch(batchDf(99, 10), dir, "warm", 0L)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => try {
        (0 until batches).foreach { b =>
          TableLog.appendBatch(batchDf(w * 100 + b, 10), dir, s"w$w", b.toLong)
        }
      } catch { case t: Throwable => failures.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty, s"writer failed: ${Option(failures.peek())}")
    assert(TableLog.rows(spark, dir) == (writers * batches + 1) * 10L,
      "a commit was lost under contention on the conditional-create store")
    assert(TableLog.read(spark, dir).count() == (writers * batches + 1) * 10L)
    // every retained manifest parses and reads cleanly — a torn publish
    // would fail the manifest header check loudly here
    TableLog.retainedVersions(spark, dir).foreach(v =>
      TableLog.readAt(spark, dir, v).schema)
  }
}
