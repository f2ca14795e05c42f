package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The manifest commit log: snapshot isolation, exactly-once appends
  * across checkpoint generations, CAS commits, manifest-served stats,
  * and vacuum retention — the reader-side guarantees the raw-directory
  * maintenance loop could not make. */
class TableLogSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_tlog").toString + "/t"

  private def batchDf(b: Int, n: Int = 100) =
    Seq.tabulate(n)(i => (b * 1000L + i, s"v$b-$i")).toDF("id", "v")

  test("append → read roundtrip; rows and bytes served from the manifest") {
    val dir = freshTable()
    assert(TableLog.appendBatch(batchDf(0), dir, "run-a", 0L))
    assert(TableLog.appendBatch(batchDf(1), dir, "run-a", 1L))
    val got = TableLog.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
    assert(got == ((0L until 100L) ++ (1000L until 1100L)).toSeq)
    // stats come from the manifest — cross-check against the actual data
    assert(TableLog.rows(spark, dir) == 200L)
    val m = TableLog.latest(spark, dir).get
    assert(m.version == 1L && m.op == "append")
    val fsBytes = m.files.map { e =>
      new java.io.File(dir + "/" + e.name).length()
    }.sum
    assert(TableLog.bytes(spark, dir) == fsBytes && fsBytes > 0L)
  }

  test("replay dedup: same runKey+batchId is a no-op; a FRESH runKey with colliding batchIds appends") {
    val dir = freshTable()
    assert(TableLog.appendBatch(batchDf(0), dir, "gen-1", 0L))
    assert(TableLog.appendBatch(batchDf(1), dir, "gen-1", 1L))
    // foreachBatch replay under the same checkpoint: must dedup
    assert(!TableLog.appendBatch(batchDf(1), dir, "gen-1", 1L))
    assert(TableLog.rows(spark, dir) == 200L)
    // restart with a FRESH checkpoint: batchIds restart at 0 under a new
    // runKey — these are NEW batches and must all land (the bare-batchId
    // marker protocol silently dropped them; the r9 ADVICE high finding)
    assert(TableLog.appendBatch(batchDf(2), dir, "gen-2", 0L))
    assert(TableLog.appendBatch(batchDf(3), dir, "gen-2", 1L))
    assert(TableLog.rows(spark, dir) == 400L)
    val got = TableLog.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
    assert(got == (0 to 3).flatMap(b => b * 1000L until b * 1000L + 100L))
    // both generations' high-water marks live in the manifest
    val m = TableLog.latest(spark, dir).get
    assert(m.commits == Map("gen-1" -> 1L, "gen-2" -> 1L))
  }

  test("snapshot isolation: a reader's resolved manifest survives a live compaction + vacuum") {
    val dir = freshTable()
    (0 until 4).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    val before = TableLog.latest(spark, dir).get
    assert(before.files.length >= 4, "fixture vacuity: appends did not fragment")
    // live compaction commits a new version and vacuums with a real grace
    val written = TableLog.compact(spark, dir, targetBytes = 1L << 20)
    TableLog.vacuum(spark, dir, graceMs = 600000L)
    val after = TableLog.latest(spark, dir).get
    assert(after.version == before.version + 1 && after.op == "compact")
    assert(after.files.length == written && written < before.files.length)
    // the pre-compaction reader finishes against ITS snapshot...
    val old = TableLog.readVersion(spark, dir, before)
      .select("id").as[Long].collect().sorted.toSeq
    // ...and a post-compaction reader sees the same rows from the new files
    val now = TableLog.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
    assert(old == now && now.length == 400)
    // no mixed state is expressible: each read opened exactly one
    // manifest's file list; the two lists are disjoint
    assert(before.files.map(_.name).toSet.intersect(after.files.map(_.name).toSet).isEmpty)
    assert(TableLog.rows(spark, dir) == 400L, "compaction must preserve the row count")
  }

  test("vacuum reclaims superseded files and crash debris, protects retained manifests") {
    val dir = freshTable()
    (0 until 3).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    val preCompact = TableLog.latest(spark, dir).get
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    // crash debris: a data file landed in the table but never committed
    // to any manifest (append crashed before the manifest rename), plus
    // a stranded staging dir
    val orphan = new java.io.File(dir + "/c99-orphan.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val staging = new java.io.File(dir + "/_staging-deadbeef")
    staging.mkdirs()
    // grace 0: everything unreferenced goes NOW — but the pre-compaction
    // files are still referenced by a retained manifest, so they stay
    val deleted = TableLog.vacuum(spark, dir, graceMs = 0L)
    assert(deleted == 2, s"want exactly the orphan + staging swept, got $deleted")
    assert(!orphan.exists() && !staging.exists())
    preCompact.files.foreach { e =>
      assert(new java.io.File(dir + "/" + e.name).exists(),
        s"${e.name} is referenced by a retained manifest and must survive")
    }
    // once the referencing manifests age out of the retention window,
    // vacuum reclaims the superseded data files too
    (0 until TableLog.KeepManifests).foreach { i =>
      TableLog.appendBatch(batchDf(10 + i, n = 1), dir, "r", 10L + i)
    }
    TableLog.vacuum(spark, dir, graceMs = 0L)
    preCompact.files.foreach { e =>
      assert(!new java.io.File(dir + "/" + e.name).exists(),
        s"${e.name} out of retention but not reclaimed")
    }
    // manifest tail is pruned: the log dir stays O(KeepManifests)
    val manifests = new java.io.File(dir + "/_graft_log").listFiles()
      .map(_.getName).filter(_.startsWith("manifest-"))
    assert(manifests.length <= TableLog.KeepManifests,
      s"manifest tail not pruned: ${manifests.length}")
    // and the table still reads exactly right through all of it
    assert(TableLog.read(spark, dir).count() == 300L + TableLog.KeepManifests)
  }

  test("commit is a CAS: the same version cannot be published twice") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    val m = TableLog.latest(spark, dir).get
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a second writer that resolved the same base and tries to publish
    // the same next version must lose the rename race, not clobber
    intercept[java.util.ConcurrentModificationException] {
      TableLog.commit(fs, dir, m.copy(rows = 999L))
    }
    assert(TableLog.rows(spark, dir) == 100L, "losing writer must not corrupt the table")
  }

  test("runKey is stable per checkpoint dir and fresh per new checkpoint") {
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft_tlog_ck1").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_tlog_ck2").toString
    val k1 = TableLog.runKeyFor(spark, ckpt1)
    assert(TableLog.runKeyFor(spark, ckpt1) == k1, "same checkpoint must keep its runKey")
    assert(TableLog.runKeyFor(spark, ckpt2) != k1, "a fresh checkpoint must draw a fresh runKey")
  }

  test("a pre-TableLog parquet dir is adopted, never vacuumed away") {
    // the upgrade-in-place case: a table written before the log existed
    // has data files and NO _graft_log. vacuum must treat it as not ours
    // (return 0, touch nothing), and adopt must turn the existing files
    // into committed manifest 0 so later vacuums protect them.
    val dir = freshTable()
    batchDf(0).repartition(3).write.parquet(dir)
    val dataFiles = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(dataFiles.length >= 3)
    assert(TableLog.vacuum(spark, dir, graceMs = 0L) == 0,
      "vacuum deleted from a directory that has no manifest log")
    dataFiles.foreach(f => assert(f.exists(), s"${f.getName} deleted pre-adoption"))
    val m = TableLog.adopt(spark, dir)
    assert(m.version == 0L && m.op == "adopt" && m.rows == 100L)
    // adoption renames history under c0- so the append-tail glob can
    // never match it — even a legacy file named like an append
    assert(m.files.forall(_.name.startsWith("c0-")), m.files.map(_.name))
    assert(TableLog.adopt(spark, dir).version == 0L, "re-adopt must be a no-op")
    // post-adoption, the legacy files are referenced and survive vacuum
    TableLog.vacuum(spark, dir, graceMs = 0L)
    m.files.foreach { e =>
      assert(new java.io.File(dir + "/" + e.name).exists(),
        s"${e.name} lost after adoption")
    }
    // and normal appends continue from the adopted snapshot
    TableLog.appendBatch(batchDf(1), dir, "r", 0L)
    assert(TableLog.read(spark, dir).count() == 200L)
    // a from-the-beginning delta consumer receives the adopt snapshot
    // too — the adopted corpus exists nowhere else in the delta stream
    val (d, v) = TableLog.appendsSince(spark, dir, -1L)
    assert(v == 1L && d.get.count() == 200L,
      "appendsSince(-1) must include the adopted history")
  }

  test("fast-churn safety: pruning waits out the grace, so a recent reader's manifest survives") {
    // the r10 review finding: files must not become reclaimable the
    // instant their last referencing manifest falls past the count
    // floor — a reader that resolved that manifest seconds ago is still
    // inside the grace window. Manifest pruning is therefore part of
    // vacuum and honors the same grace as file deletion.
    val dir = freshTable()
    (0 until 3).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    val old = TableLog.latest(spark, dir).get // a "reader's" resolved snapshot
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    // churn: more than KeepManifests commits land within the grace
    (0 until TableLog.KeepManifests + 2).foreach { i =>
      TableLog.appendBatch(batchDf(10 + i, n = 1), dir, "r", 10L + i)
    }
    TableLog.vacuum(spark, dir, graceMs = 600000L)
    // inside the grace: the reader's manifest AND its files are intact
    val oldRows = TableLog.readVersion(spark, dir, old)
      .select("id").as[Long].collect().sorted.toSeq
    assert(oldRows.length == 300, "recent reader's snapshot broken by churny pruning")
    val manifestCount = new java.io.File(dir + "/_graft_log").listFiles()
      .count(_.getName.startsWith("manifest-"))
    assert(manifestCount > TableLog.KeepManifests,
      "young manifests beyond the count floor must wait out the grace")
    // once the grace has passed (grace 0 here), the tail prunes and the
    // superseded files go
    TableLog.vacuum(spark, dir, graceMs = 0L)
    val after = new java.io.File(dir + "/_graft_log").listFiles()
      .count(_.getName.startsWith("manifest-"))
    assert(after <= TableLog.KeepManifests, s"tail not pruned after grace: $after")
    old.files.foreach { e =>
      assert(!new java.io.File(dir + "/" + e.name).exists(),
        s"${e.name} out of grace and retention but not reclaimed")
    }
  }

  test("time travel reads a retained version; history lists the tail; dataBytes is manifest-served") {
    val dir = freshTable()
    (0 until 3).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    // readAt: the pre-compaction version is still retained and readable
    assert(TableLog.readAt(spark, dir, 1L).count() == 200L)
    assert(TableLog.readAt(spark, dir, 3L).count() == 300L)
    val e = intercept[IllegalStateException](TableLog.readAt(spark, dir, 99L))
    assert(e.getMessage.contains("0..3"), e.getMessage)
    // history: oldest first, ops recorded
    val h = TableLog.history(spark, dir)
    assert(h.map(_.version) == Seq(0L, 1L, 2L, 3L))
    assert(h.map(_.op) == Seq("append", "append", "append", "compact"))
    assert(h.map(_.rows) == Seq(100L, 200L, 300L, 300L))
    // Compaction.dataBytes on a TableLog table = the manifest's sum —
    // NOT the raw listing, which still holds superseded in-grace files
    val rawListing = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length()).sum
    val got = Compaction.dataBytes(spark, dir)
    assert(got == TableLog.latest(spark, dir).get.bytes)
    assert(got < rawListing,
      "manifest-served bytes should exclude superseded in-grace files")
  }

  test("readTail streams appends; compaction + vacuum mid-stream never re-emit rows") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    TableLog.appendBatch(batchDf(1), dir, "r", 1L)
    val q = TableLog.readTail(spark, dir)
      .writeStream.format("memory").queryName("tlog_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tlog_tail").count() == 200L)
      // a full rewrite lands c<v>- files — invisible to the tail
      TableLog.compact(spark, dir, targetBytes = 1L << 20)
      TableLog.vacuum(spark, dir, graceMs = 600000L)
      q.processAllAvailable()
      assert(spark.table("tlog_tail").count() == 200L,
        "compaction rewrites re-emitted through the tail")
      TableLog.appendBatch(batchDf(2), dir, "r", 2L)
      q.processAllAvailable()
      val got = spark.table("tlog_tail").select("id").as[Long].collect().sorted.toSeq
      assert(got == (0 to 2).flatMap(b => b * 1000L until b * 1000L + 100L),
        s"tail diverged: ${got.length} rows")
      // now push the consumed a<v>- files out of retention AND grace so
      // vacuum really reclaims them — the live tailer must not re-emit,
      // error, or lose anything over the deletion
      (0 until TableLog.KeepManifests + 2).foreach { i =>
        TableLog.appendBatch(batchDf(10 + i, n = 1), dir, "r", 10L + i)
      }
      TableLog.vacuum(spark, dir, graceMs = 0L)
      val a01 = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("a0-") || f.getName.startsWith("a1-"))
      assert(a01.isEmpty, s"early append files not reclaimed: ${a01.map(_.getName).toSeq}")
      q.processAllAvailable()
      val total = spark.table("tlog_tail").count()
      assert(total == 300L + TableLog.KeepManifests + 2,
        s"tail diverged across file reclamation: $total")
    } finally q.stop()
  }

  test("appendsSince: exact deltas, nothing from compaction versions, loud retention edge") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    TableLog.appendBatch(batchDf(1), dir, "r", 1L)
    val (d0, v0) = TableLog.appendsSince(spark, dir, -1L)
    assert(v0 == 1L && d0.get.count() == 200L)
    assert(TableLog.appendsSince(spark, dir, v0) == ((None, 1L)), "no new appends yet")
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    val (d1, v1) = TableLog.appendsSince(spark, dir, v0)
    assert(d1.isEmpty && v1 == 2L, "a compaction rewrite is not an append")
    TableLog.appendBatch(batchDf(2), dir, "r", 2L)
    val (d2, v2) = TableLog.appendsSince(spark, dir, v1)
    assert(v2 == 3L)
    assert(d2.get.select("id").as[Long].collect().sorted.toSeq ==
      (2000L until 2100L).toSeq, "delta must be exactly the new batch")
    // deltas straddling a compaction version still work (diff per step)
    val (d3, v3) = TableLog.appendsSince(spark, dir, v0)
    assert(v3 == 3L && d3.get.count() == 100L)
    // retention: push the early manifests out, then ask for their delta
    (0 until TableLog.KeepManifests + 2).foreach { i =>
      TableLog.appendBatch(batchDf(10 + i, n = 1), dir, "r", 10L + i)
    }
    TableLog.vacuum(spark, dir, graceMs = 0L)
    val e = intercept[IllegalArgumentException](TableLog.appendsSince(spark, dir, 0L))
    assert(e.getMessage.contains("left retention"), e.getMessage)
  }

  test("empty micro-batches advance the commit map without fabricating files") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    val empty = batchDf(1).filter(lit(false))
    assert(TableLog.appendBatch(empty, dir, "r", 1L))
    assert(!TableLog.appendBatch(empty, dir, "r", 1L), "empty batch replay must dedup too")
    val m = TableLog.latest(spark, dir).get
    assert(m.commits("r") == 1L && m.rows == 100L)
    assert(TableLog.read(spark, dir).count() == 100L)
  }
}
