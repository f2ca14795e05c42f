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

  test("head hint: advisory only — missing, stale, garbage and ahead-of-head hints all resolve correctly, racing commits too") {
    val dir = freshTable()
    (0 until 5).foreach(b => TableLog.appendBatch(batchDf(b, 10), dir, "w", b.toLong))
    // hint writes go through the Hadoop fs (as production's do) so the
    // local fs checksum sidecar stays consistent with the content
    val hintPath = new org.apache.hadoop.fs.Path(dir + "/_graft_log/_head")
    val hfs = hintPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeHint(s: String): Unit = {
      val out = hfs.create(hintPath, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    def readHint(): String = {
      val in = hfs.open(hintPath)
      try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
    }
    // steady state: the hint carries the last committed version
    assert(hfs.getFileStatus(hintPath).isFile && readHint() == "4")
    assert(TableLog.latest(spark, dir).get.version == 4L)
    // hint MISSING (pre-hint table / deleted): listing fallback
    assert(hfs.delete(hintPath, false))
    assert(TableLog.latest(spark, dir).get.version == 4L)
    // hint STALE (crash between CAS and hint write): forward probes
    writeHint("1")
    assert(TableLog.latest(spark, dir).get.version == 4L)
    // hint GARBAGE (torn concurrent overwrite): listing fallback
    writeHint("not-a-version")
    assert(TableLog.latest(spark, dir).get.version == 4L)
    // hint AHEAD of any manifest (corrupt): listing fallback
    writeHint("999999")
    assert(TableLog.latest(spark, dir).get.version == 4L)
    // hint staler than MaxHintLag: probing gives up, listing answers
    val savedLag = TableLog.MaxHintLag
    TableLog.MaxHintLag = 2
    try {
      writeHint("0")
      assert(TableLog.latest(spark, dir).get.version == 4L)
    } finally TableLog.MaxHintLag = savedLag
    // RACING commits with a hint corrupted before every CAS: resolution
    // must never trust it — every append still lands the next version
    val savedHook = TableLog.casHook
    TableLog.casHook = () => writeHint("0")
    try {
      (5 until 8).foreach(b => TableLog.appendBatch(batchDf(b, 10), dir, "w", b.toLong))
    } finally TableLog.casHook = savedHook
    val m = TableLog.latest(spark, dir).get
    assert(m.version == 7L && m.rows == 80L, s"v${m.version}, ${m.rows} rows")
    // the last commit repaired the hint
    assert(readHint() == "7")
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

  test("schema guard: a drifted batch is rejected loudly before any file lands") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    // type drift: v becomes LONG
    val typeDrift = Seq((1L, 7L)).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException](
      TableLog.appendBatch(typeDrift, dir, "r", 1L))
    assert(e1.getMessage.contains("schema drift"), e1.getMessage)
    // column drift: v renamed
    val nameDrift = Seq((1L, "x")).toDF("id", "w")
    val e2 = intercept[IllegalArgumentException](
      TableLog.appendBatch(nameDrift, dir, "r", 1L))
    assert(e2.getMessage.contains("schema drift"), e2.getMessage)
    // the table is untouched: same version, same rows, no debris staged
    val m = TableLog.latest(spark, dir).get
    assert(m.version == 0L && m.rows == 100L)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_staging")),
      "rejected batches must not leave staging debris")
    // nullability-only differences are tolerated (parquet writers and
    // streaming sources disagree freely about nullable flags)
    import org.apache.spark.sql.types._
    val nonNullable = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("v", StringType, nullable = false))))
    assert(TableLog.appendBatch(nonNullable, dir, "r", 1L),
      "nullability-only difference must not be rejected")
  }

  test("manifest stats prune reads: a range query opens only the matching files") {
    val dir = freshTable()
    // 10 batches, ids 0..999; compact with a range layout on id so each
    // rewritten file covers a narrow contiguous id span
    (0 until 10).foreach { b =>
      val df = Seq.tabulate(100)(i => (b * 100L + i, s"s$b-$i")).toDF("id", "v")
      TableLog.appendBatch(df, dir, "r", b.toLong)
    }
    TableLog.compact(spark, dir, targetBytes = 6L << 10, layoutBy = Seq("id"))
    val m = TableLog.latest(spark, dir).get
    assert(m.layout == Seq("id") && m.schema.isDefined)
    assert(m.files.length >= 4, s"fixture vacuity: only ${m.files.length} files")
    assert(m.files.forall(_.stats.contains("id")),
      "every compacted file must carry id stats")
    // the manifest's recorded bounds are the files' true bounds
    m.files.foreach { e =>
      val (mnS, mxS) = e.stats("id")
      val Seq(mn, mx) = spark.read.parquet(s"$dir/${e.name}")
        .agg(min($"id"), max($"id")).as[(Long, Long)].collect()
        .flatMap(t => Seq(t._1, t._2)).toSeq
      assert(mnS.toLong == mn && mxS.toLong == mx,
        s"${e.name}: manifest says [$mnS,$mxS], footer data is [$mn,$mx]")
    }
    // a narrow range prunes at the MANIFEST level: far fewer files
    val pruned = TableLog.prunedFiles(spark, dir, "id", 0L, 49L)
    assert(pruned.nonEmpty && pruned.size < m.files.size,
      s"no pruning happened: ${pruned.size} of ${m.files.size} files kept")
    // and the pruned read returns exactly the full-scan-and-filter rows
    val got = TableLog.readWhere(spark, dir, "id", 0L, 49L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (0L to 49L).toSeq, s"readWhere diverged: ${got.length} rows")
    // an append AFTER the layouting compact inherits the layout columns:
    // its files carry id stats too, so pruning keeps working as the
    // table grows between compactions
    TableLog.appendBatch(Seq.tabulate(50)(i => (5000L + i, s"n$i")).toDF("id", "v"),
      dir, "r", 10L)
    val m2 = TableLog.latest(spark, dir).get
    val appended = m2.files.filter(_.name.startsWith("a"))
    assert(appended.nonEmpty && appended.forall(_.stats.contains("id")),
      "post-compact appends must carry layout-column stats from their footers")
    assert(TableLog.prunedFiles(spark, dir, "id", 5000L, 5049L).size < m2.files.size)
    assert(TableLog.readWhere(spark, dir, "id", 5000L, 5010L).count() == 11L)
    // a range matching nothing reads nothing — zero files opened
    assert(TableLog.prunedFiles(spark, dir, "id", 100000L, 200000L).isEmpty)
    assert(TableLog.readWhere(spark, dir, "id", 100000L, 200000L).count() == 0L)
  }

  test("string stats compare in UTF-8 byte order — supplementary chars vs U+FFFF never mis-prune") {
    // parquet footers and Spark's UTF8String filters both order strings
    // by unsigned UTF-8 bytes; Java's String.compareTo orders by UTF-16
    // code units, which disagrees for supplementary characters (an
    // emoji's surrogate pair sorts BELOW '￿' in UTF-16 but ABOVE
    // it in UTF-8). Bounds compared in the wrong domain would prune a
    // file that contains matching rows (the r11 review finding).
    val dir = freshTable()
    val emoji = new String(Character.toChars(0x1F600))
    val rows = Seq.tabulate(2000)(i => (i.toLong, f"a$i%04d")) ++
      Seq((9001L, "￿"), (9002L, emoji))
    TableLog.appendBatch(rows.toDF("id", "s"), dir, "r", 0L)
    TableLog.compact(spark, dir, targetBytes = 2048L, layoutBy = Seq("s"))
    val m = TableLog.latest(spark, dir).get
    assert(m.files.length >= 3, s"fixture vacuity: ${m.files.length} files")
    // the point query at '￿' lands in the top range file, whose
    // footer max is the emoji — UTF-16 comparison would prune it
    val got = TableLog.readWhere(spark, dir, "s", "￿", "￿")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(9001L), s"the \\uffff row was mis-pruned: $got")
    assert(TableLog.readWhere(spark, dir, "s", emoji, emoji).count() == 1L)
    // a range straddling the divergence agrees with the full filter
    val viaFull = TableLog.read(spark, dir).filter($"s" >= "￿").count()
    val viaPruned = TableLog.readWhere(spark, dir, "s", "￿", emoji).count()
    assert(viaPruned == viaFull && viaFull == 2L,
      s"straddling range diverged: pruned=$viaPruned full=$viaFull")
  }

  test("append loses the manifest CAS to a live compaction and rebases — no lost batch, no dup rows") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    TableLog.appendBatch(batchDf(1), dir, "r", 1L)
    // one-shot conflicting committer in the CAS window: a maintenance
    // compact commits first, the append's rename loses and must rebase
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      TableLog.compact(spark, dir, targetBytes = 1L << 20)
    }
    try assert(TableLog.appendBatch(batchDf(2), dir, "r", 2L))
    finally TableLog.casHook = () => ()
    val m = TableLog.latest(spark, dir).get
    // v0, v1 appends; v2 the racing compact; v3 the rebased append
    assert(m.version == 3L && m.op == "append", s"v${m.version} op=${m.op}")
    assert(m.rows == 300L)
    assert(m.commits("r") == 2L, "the rebased append must still record its batchId")
    val got = TableLog.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
    assert(got == (0 to 2).flatMap(b => b * 1000L until b * 1000L + 100L),
      s"rebased append lost or duplicated rows: ${got.length}")
    // the rebased manifest holds the compact's rewrite PLUS the append
    assert(m.files.exists(_.name.startsWith("c2-")) &&
      m.files.exists(_.name.startsWith("a2-")))
  }

  test("compact loses the manifest CAS to a live append and rebases — rewrite swaps only its snapshot") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    TableLog.appendBatch(batchDf(1), dir, "r", 1L)
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      TableLog.appendBatch(batchDf(2), dir, "r", 2L)
    }
    try TableLog.compact(spark, dir, targetBytes = 1L << 20)
    finally TableLog.casHook = () => ()
    val m = TableLog.latest(spark, dir).get
    // v0, v1 appends; v2 the racing append; v3 the rebased compact
    assert(m.version == 3L && m.op == "compact", s"v${m.version} op=${m.op}")
    assert(m.rows == 300L, "rebased compact must count the raced-in append")
    assert(m.commits("r") == 2L, "the raced append's commit record must survive")
    val got = TableLog.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
    assert(got == (0 to 2).flatMap(b => b * 1000L until b * 1000L + 100L),
      s"rebased compact lost or duplicated rows: ${got.length}")
    // only the snapshot's files were swapped; the raced append survives as-is
    assert(m.files.exists(_.name.startsWith("a2-")),
      "the raced-in append's files must survive the rebased rewrite")
    assert(!m.files.exists(e => e.name.startsWith("a0-") || e.name.startsWith("a1-")),
      "the snapshot's files must be fully replaced by the rewrite")
  }

  test("retention reports the oldest readable version; v1 manifests still parse") {
    val dir = freshTable()
    assert(TableLog.retention(spark, dir).isEmpty, "no log yet")
    (0 until 3).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    val Some((v0, t0)) = TableLog.retention(spark, dir)
    assert(v0 == 0L && t0 > 0L)
    // push the early manifests out of retention
    (0 until TableLog.KeepManifests + 2).foreach { i =>
      TableLog.appendBatch(batchDf(10 + i, n = 1), dir, "r", 10L + i)
    }
    TableLog.vacuum(spark, dir, graceMs = 0L)
    val Some((v1, _)) = TableLog.retention(spark, dir)
    assert(v1 > 0L, "retention floor must advance as the tail prunes")
    assert(TableLog.readAt(spark, dir, v1).columns.nonEmpty,
      "the reported oldest version must actually be readable")
    // back-compat: a v1-era manifest (no schema/layout/stats lines) parses
    // and reads; the next append records the schema going forward
    val dir2 = freshTable()
    batchDf(0).coalesce(1).write.parquet(dir2)
    val dataFile = new java.io.File(dir2).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    val logDir = new java.io.File(dir2, "_graft_log"); logDir.mkdirs()
    val body = "graft-manifest-v1\nversion\t0\nrows\t100\nop\tappend\n" +
      s"commit\tlegacy\t0\nfile\t${dataFile.length()}\t${dataFile.getName}\n"
    java.nio.file.Files.write(
      new java.io.File(logDir, f"manifest-${0L}%020d").toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val legacy = TableLog.latest(spark, dir2).get
    assert(legacy.schemaJson.isEmpty && legacy.rows == 100L)
    assert(TableLog.read(spark, dir2).count() == 100L)
    TableLog.appendBatch(batchDf(1), dir2, "r", 0L)
    assert(TableLog.latest(spark, dir2).get.schema.isDefined,
      "the first post-upgrade append must start recording the schema")
  }

  test("additive schema evolution: old files read nulls, old versions keep their shape, guard flips to the new schema") {
    import org.apache.spark.sql.types._
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    val evolved = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("score", DoubleType, nullable = true)))
    val m = TableLog.evolve(spark, dir, evolved)
    assert(m.op == "evolve" && m.rows == 100L && m.files.nonEmpty)
    // pre-evolution rows surface the added column as null
    val r = TableLog.read(spark, dir)
    assert(r.columns.toSeq == Seq("id", "v", "score"))
    assert(r.filter($"score".isNull).count() == 100L)
    // the append guard now holds batches to the NEW schema
    val e1 = intercept[IllegalArgumentException](
      TableLog.appendBatch(batchDf(1), dir, "r", 1L))
    assert(e1.getMessage.contains("schema drift"), e1.getMessage)
    val withScore = Seq.tabulate(50)(i => (2000L + i, s"n$i", i / 10.0))
      .toDF("id", "v", "score")
    assert(TableLog.appendBatch(withScore, dir, "r", 1L))
    assert(TableLog.read(spark, dir).filter($"score".isNotNull).count() == 50L)
    // a delta straddling the evolution reads in the NEW shape too
    val (d, _) = TableLog.appendsSince(spark, dir, -1L)
    assert(d.get.columns.toSeq == Seq("id", "v", "score") && d.get.count() == 150L)
    // time travel keeps each version's own shape
    assert(TableLog.readAt(spark, dir, 0L).columns.toSeq == Seq("id", "v"))
    // rejected evolutions: type change, column removal, non-null addition
    val typeChange = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("score", DoubleType)))
    assert(intercept[IllegalArgumentException](
      TableLog.evolve(spark, dir, typeChange)).getMessage.contains("changes type"))
    val removal = StructType(Seq(StructField("id", LongType),
      StructField("score", DoubleType)))
    assert(intercept[IllegalArgumentException](
      TableLog.evolve(spark, dir, removal)).getMessage.contains("missing from"))
    val nonNull = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("score", DoubleType), StructField("rank", LongType, nullable = false)))
    assert(intercept[IllegalArgumentException](
      TableLog.evolve(spark, dir, nonNull)).getMessage.contains("must be nullable"))
  }

  test("deleteIn: a takedown rewrites ONLY the files holding the ids; atomic, counted, time-travel honest") {
    val dir = freshTable()
    (0 until 10).foreach { b =>
      val df = Seq.tabulate(100)(i => (b * 100L + i, s"s$b-$i")).toDF("id", "v")
      TableLog.appendBatch(df, dir, "r", b.toLong)
    }
    TableLog.compact(spark, dir, targetBytes = 6L << 10, layoutBy = Seq("id"))
    val before = TableLog.latest(spark, dir).get
    assert(before.files.length >= 4, s"fixture vacuity: ${before.files.length} files")
    // ids clustered in one narrow span → stats should confine the
    // rewrite to the files whose recorded range holds them
    val victims = Seq(10L, 11L, 12L, 37L)
    val candNames = victims.flatMap(v =>
      TableLog.prunedFiles(spark, dir, "id", v, v)).toSet
    assert(candNames.size < before.files.size,
      s"fixture vacuity: the victim ids span every file")
    val removed = TableLog.deleteIn(spark, dir, "id", victims)
    assert(removed == victims.length.toLong, s"removed $removed")
    val after = TableLog.latest(spark, dir).get
    assert(after.op == "delete" && after.rows == 1000L - victims.length)
    // untouched files keep their EXACT manifest entries (same name,
    // bytes, stats); only stat-candidate files were swapped
    val beforeByName = before.files.map(e => e.name -> e).toMap
    val untouched = after.files.filter(e => beforeByName.contains(e.name))
    assert(untouched.map(e => beforeByName(e.name)) == untouched,
      "an untouched file's manifest entry changed")
    val swappedOut = before.files.map(_.name).toSet -- after.files.map(_.name).toSet
    assert(swappedOut.nonEmpty && swappedOut.subsetOf(candNames),
      s"delete rewrote non-candidate files: ${swappedOut -- candNames}")
    // rewritten files carry the rewrite prefix and fresh layout stats
    val fresh = after.files.filterNot(e => beforeByName.contains(e.name))
    assert(fresh.forall(e => e.name.startsWith("c") && e.stats.contains("id")))
    val got = TableLog.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
    assert(got == (0L until 1000L).filterNot(victims.contains).toSeq,
      s"delete diverged: ${got.length} rows")
    // rows metadata matches reality, readWhere agrees post-delete
    assert(TableLog.rows(spark, dir) == 996L)
    assert(TableLog.readWhere(spark, dir, "id", 10L, 12L).count() == 0L)
    assert(TableLog.readWhere(spark, dir, "id", 13L, 36L).count() == 24L)
    // time travel: the pre-delete version still shows the rows (honesty
    // window until manifests prune + vacuum grace)
    assert(TableLog.readAt(spark, dir, before.version)
      .filter($"id".isin(victims: _*)).count() == victims.length.toLong)
    // the CDC surface never re-emits the delete's swapped-in files
    val (delta, ckpt) = TableLog.appendsSince(spark, dir, before.version)
    assert(delta.isEmpty && ckpt == after.version,
      "a delete version leaked kept-row files into the delta stream")
    // deleting ids that don't exist commits NOTHING
    val v0 = TableLog.latest(spark, dir).get.version
    assert(TableLog.deleteIn(spark, dir, "id", Seq(999999L)) == 0L)
    assert(TableLog.latest(spark, dir).get.version == v0,
      "a no-match delete must not commit a version")
    // general predicate delete: every remaining even id under 100
    val removedEven = TableLog.delete(spark, dir, ($"id" < 100) && ($"id" % 2 === 0))
    assert(removedEven == 48L, s"removed $removedEven") // 50 evens minus already-deleted 10, 12
    assert(TableLog.read(spark, dir).filter($"id" < 100).count() == 100L - 4L - 48L)
  }

  test("delete rebases over a racing append; compact racing a delete fails loudly, never resurrects") {
    val dir = freshTable()
    (0 until 4).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    // delete loses its CAS to an append landing in the window → rebase
    // keeps the appended batch AND removes exactly the targeted rows
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      TableLog.appendBatch(batchDf(9), dir, "r", 9L)
    }
    val removed = try TableLog.delete(spark, dir, $"id" < 10L)
      finally TableLog.casHook = () => ()
    assert(removed == 10L)
    val m = TableLog.latest(spark, dir).get
    assert(m.op == "delete" && m.rows == 500L - 10L)
    val got = TableLog.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
    assert(got == ((10L until 100L) ++ (1 to 3).flatMap(b => b * 1000L until b * 1000L + 100L)
      ++ (9000L until 9100L)).toSeq, s"rebase lost rows: ${got.length}")
    // compact whose snapshot a delete guts mid-flight must fail loudly
    // (continuing would commit the rewrite WITH the deleted rows back)
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      TableLog.delete(spark, dir, $"id" >= 9000L)
    }
    val e = try intercept[java.util.ConcurrentModificationException](
        TableLog.compact(spark, dir, targetBytes = 1L << 20))
      finally TableLog.casHook = () => ()
    assert(e.getMessage.contains("removed snapshot files"), e.getMessage)
    assert(TableLog.read(spark, dir).filter($"id" >= 9000L).count() == 0L,
      "the aborted compact resurrected deleted rows")
    // the abandoned rewrite's staged-then-landed files are unreferenced
    // debris; vacuum reclaims them and the table reads clean after
    TableLog.vacuum(spark, dir, graceMs = 0L)
    assert(TableLog.read(spark, dir).count() == 390L)
  }

  test("delete racing a compact re-plans and both commit — rows-removed exact, no resurrect") {
    val dir = freshTable()
    (0 until 4).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    // the compact lands INSIDE the delete's commit window: every file
    // the delete read and rewrote is swapped out for c-files, so its
    // plan is stale — it must re-locate its victims in the compacted
    // files and still remove exactly them, not fail the takedown and
    // not resurrect anything
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      TableLog.compact(spark, dir, targetBytes = 1L << 20)
    }
    val removed = try TableLog.deleteIn(spark, dir, "id", (0L until 10L) ++ Seq(2005L))
      finally TableLog.casHook = () => ()
    assert(removed == 11L, s"re-planned delete removed $removed rows")
    val m = TableLog.latest(spark, dir).get
    assert(m.op == "delete" && m.rows == 400L - 11L)
    val got = TableLog.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
    assert(got.length == 389 && !got.exists(id => id < 10L || id == 2005L),
      "deleted rows resurrected or extra rows lost")
    // the stale attempt's abandoned rewrites were swept eagerly: after a
    // grace-0 vacuum the directory holds exactly what some RETAINED
    // manifest references (snapshot protection), nothing else
    TableLog.vacuum(spark, dir, graceMs = 0L)
    val referenced = TableLog.history(spark, dir)
      .flatMap(_.files.map(_.name)).toSet
    val onDisk = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_")).toSet
    assert(onDisk == referenced,
      s"stale-attempt debris survived: ${(onDisk -- referenced).take(3)}")
  }

  test("a straggler append racing evolve is rejected — the evolution never silently reverts") {
    import org.apache.spark.sql.types._
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    val evolved = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("score", DoubleType, nullable = true)))
    // the straggler passes the ENTRY drift guard (pre-evolve manifest),
    // then evolve lands in its CAS window: the rebase must re-check and
    // reject the old-shape batch instead of committing its schema over
    // the evolution
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      TableLog.evolve(spark, dir, evolved)
    }
    val e = try intercept[IllegalArgumentException](
        TableLog.appendBatch(batchDf(1), dir, "r", 1L))
      finally TableLog.casHook = () => ()
    assert(e.getMessage.contains("schema drift"), e.getMessage)
    val m = TableLog.latest(spark, dir).get
    assert(m.op == "evolve" && m.schema.exists(_.fieldNames.contains("score")),
      s"evolution reverted: v${m.version} op=${m.op} schema=${m.schema.map(_.simpleString)}")
    assert(m.rows == 100L && TableLog.read(spark, dir).count() == 100L,
      "the rejected straggler's rows must not be committed")
    // the straggler's landed-but-uncommitted files are orphan debris:
    // vacuum reclaims them after grace like any crash leftover
    TableLog.vacuum(spark, dir, graceMs = 0L)
    val onDisk = new java.io.File(dir).listFiles().count(f =>
      f.isFile && f.getName.startsWith("a"))
    assert(onDisk == m.files.length,
      s"orphaned straggler files survived vacuum: $onDisk vs ${m.files.length}")
  }

  test("evolve on a pre-schema (v1) table validates against the files' actual footer schema") {
    import org.apache.spark.sql.types._
    // v1-era manifest: no schema line — evolve must still reject a
    // rename/removal (the column would silently read all-null otherwise)
    val dir = freshTable()
    batchDf(0).coalesce(1).write.parquet(dir)
    val dataFile = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    val logDir = new java.io.File(dir, "_graft_log"); logDir.mkdirs()
    val body = "graft-manifest-v1\nversion\t0\nrows\t100\nop\tappend\n" +
      s"commit\tlegacy\t0\nfile\t${dataFile.length()}\t${dataFile.getName}\n"
    java.nio.file.Files.write(
      new java.io.File(logDir, f"manifest-${0L}%020d").toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(TableLog.latest(spark, dir).get.schemaJson.isEmpty)
    val renamed = StructType(Seq(
      StructField("id", LongType), StructField("val", StringType)))
    assert(intercept[IllegalArgumentException](
      TableLog.evolve(spark, dir, renamed)).getMessage.contains("missing from"))
    val typeChange = StructType(Seq(
      StructField("id", StringType), StructField("v", StringType)))
    assert(intercept[IllegalArgumentException](
      TableLog.evolve(spark, dir, typeChange)).getMessage.contains("changes type"))
    val ok = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("score", DoubleType, nullable = true)))
    val m = TableLog.evolve(spark, dir, ok)
    assert(m.schema.exists(_.fieldNames.sameElements(Array("id", "v", "score"))))
    assert(TableLog.read(spark, dir).filter($"score".isNull).count() == 100L)
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

  test("delete keeps rows where the predicate is NULL — SQL WHERE semantics, not boolean negation") {
    import org.apache.spark.sql.types._
    val dir = freshTable()
    // pre-evolve rows lack `label` entirely → NULL after evolution; the
    // evolve contract REQUIRES added columns be nullable, so these rows
    // are first-class citizens of any later predicate delete
    TableLog.appendBatch(
      Seq.tabulate(50)(i => (i.toLong, s"s$i")).toDF("id", "v"), dir, "r", 0L)
    TableLog.evolve(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("label", StringType))))
    TableLog.appendBatch(
      Seq.tabulate(50)(i => (100L + i, s"t$i", if (i < 5) "pii" else "clean"))
        .toDF("id", "v", "label"), dir, "r", 1L)
    // compact so NULL-label and "pii" rows share rewritten files — the
    // delete's rewrite pass must KEEP the NULL rows it reads
    TableLog.compact(spark, dir, targetBytes = Long.MaxValue)
    val removed = TableLog.delete(spark, dir, col("label") === "pii")
    assert(removed == 5L, s"removed $removed — NULL-label rows counted as matches")
    val left = TableLog.read(spark, dir)
    assert(left.count() == 95L,
      "rows with a NULL predicate were silently dropped by the rewrite")
    assert(left.filter(col("label").isNull).count() == 50L,
      "the pre-evolve (NULL-label) rows did not survive the delete")
    assert(left.filter(col("label") === "pii").count() == 0L)
    assert(TableLog.latest(spark, dir).get.rows == 95L,
      "manifest row count drifted from the NULL-safe rewrite")
  }

  test("two appenders with distinct runKeys race one CAS — both batches commit, commit maps merge") {
    val dir = freshTable()
    assert(TableLog.appendBatch(batchDf(0), dir, "writer-x", 0L))
    // while writer-x is in its commit window, writer-y lands a full
    // append and wins the version; x must rebase and land too
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      assert(TableLog.appendBatch(batchDf(10), dir, "writer-y", 0L))
    }
    try assert(TableLog.appendBatch(batchDf(1), dir, "writer-x", 1L))
    finally TableLog.casHook = () => ()
    val m = TableLog.latest(spark, dir).get
    assert(m.commits == Map("writer-x" -> 1L, "writer-y" -> 0L),
      s"commit maps did not merge: ${m.commits}")
    assert(m.rows == 300L)
    val read = TableLog.read(spark, dir)
    assert(read.count() == 300L)
    assert(read.select("id").distinct().count() == 300L,
      "a racing append duplicated or lost rows")
  }

  test("a zombie replica of the same (runKey, batchId) is fenced at commit — rows never double") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    // the healthy writer lands batch 1 while the zombie's copy of the
    // SAME (runKey, batchId) sits in its commit window
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      assert(TableLog.appendBatch(batchDf(1), dir, "r", 1L))
    }
    val zombieLanded =
      try TableLog.appendBatch(batchDf(1), dir, "r", 1L)
      finally TableLog.casHook = () => ()
    assert(!zombieLanded, "the zombie's duplicate commit must be fenced, not committed")
    val m = TableLog.latest(spark, dir).get
    assert(m.rows == 200L && m.commits("r") == 1L)
    assert(TableLog.read(spark, dir).count() == 200L,
      "the fenced zombie still doubled the batch's rows")
    // the zombie's landed files are unreferenced orphans: vacuum reclaims
    // them, and the table reads identically afterwards
    val reclaimed = TableLog.vacuum(spark, dir, graceMs = 0L)
    assert(reclaimed > 0, "expected the zombie's orphaned files to be reclaimed")
    assert(TableLog.read(spark, dir).count() == 200L)
  }

  test("trackStats: append-time stats prune reads on a write-clustered column, no compaction needed") {
    val dir = freshTable()
    def batch(b: Int) = Seq.tabulate(100)(i => (b * 100L + i, s"v$b-$i"))
      .toDF("ts", "v").coalesce(1)
    (0 until 2).foreach(b => TableLog.appendBatch(batch(b), dir, "r", b.toLong))
    val reg = TableLog.trackStats(spark, dir, Seq("ts"))
    assert(reg.statsFor == Seq("ts") && reg.op == "trackstats")
    assert(TableLog.trackStats(spark, dir, Seq("ts")).version == reg.version,
      "re-registration must be an idempotent no-op, not a new commit")
    (2 until 6).foreach(b => TableLog.appendBatch(batch(b), dir, "r", b.toLong))
    assert(TableLog.latest(spark, dir).get.statsFor == Seq("ts"),
      "registration lost by a later append commit")
    // one file per batch: 2 pre-registration (no ts stats — kept
    // conservatively) + exactly the 1 post-registration file whose
    // recorded span holds the range
    val opened = TableLog.prunedFiles(spark, dir, "ts", 450L, 460L)
    assert(opened.size == 3, s"expected 2 stat-less + 1 matching file, got $opened")
    assert(TableLog.readWhere(spark, dir, "ts", 450L, 460L).count() == 11L)
    // the registration survives maintenance commits and keeps pruning
    TableLog.compact(spark, dir, targetBytes = 8L << 10, layoutBy = Seq("ts"))
    val afterCompact = TableLog.latest(spark, dir).get
    assert(afterCompact.statsFor == Seq("ts"))
    assert(TableLog.readWhere(spark, dir, "ts", 450L, 460L).count() == 11L)
    assert(TableLog.prunedFiles(spark, dir, "ts", 450L, 460L).size
      < afterCompact.files.size, "compacted table stopped pruning on ts")
    // unknown columns rejected loudly against the recorded schema
    assert(intercept[IllegalArgumentException](
      TableLog.trackStats(spark, dir, Seq("nope"))).getMessage.contains("nope"))
  }

  test("restore rolls the data back to a retained version as a new commit — ledger and CDC stay sane") {
    val dir = freshTable()
    (0 until 3).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    val v2 = TableLog.latest(spark, dir).get.version
    // the "bad" mutation: a delete that removed batch 0 entirely
    assert(TableLog.delete(spark, dir, col("id") < 1000L) == 100L)
    assert(TableLog.read(spark, dir).count() == 200L)
    val m = TableLog.restore(spark, dir, v2)
    assert(m.op == "restore" && m.rows == 300L)
    assert(TableLog.read(spark, dir).count() == 300L,
      "restore did not bring the deleted rows back")
    // the exactly-once ledger is writer history, not data: a replayed
    // (runKey, batchId) still dedups after the restore
    assert(!TableLog.appendBatch(batchDf(2), dir, "r", 2L),
      "restore must keep the CURRENT commit map — a replay re-appended")
    // CDC-invisible, like the delete it undoes: nothing re-emits
    val (delta, v) = TableLog.appendsSince(spark, dir, v2)
    assert(delta.isEmpty && v == m.version,
      "a restore version leaked re-referenced files into the delta stream")
    // life goes on: a post-restore append flows to consumers normally
    TableLog.appendBatch(batchDf(3), dir, "r", 3L)
    val (d2, _) = TableLog.appendsSince(spark, dir, v)
    assert(d2.get.count() == 100L)
    // vacuum after the restore keeps every restored file readable
    TableLog.vacuum(spark, dir, graceMs = 0L)
    assert(TableLog.read(spark, dir).count() == 400L)
    // an unretained target fails loudly with the retained range
    assert(intercept[IllegalStateException](
      TableLog.restore(spark, dir, 999L)).getMessage.contains("retained"))
    // a target BELOW the prune floor is rejected even while its manifest
    // is still readable on vacuum grace — committing its file list could
    // race a vacuum reclaiming the files mid-restore
    (4 until 4 + TableLog.KeepManifests).foreach(b =>
      TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    assert(intercept[IllegalStateException](
      TableLog.restore(spark, dir, v2)).getMessage.contains("retention floor"))
    // the escape hatch the rejection points to: exportAt materializes the
    // grace-readable version as a NEW table that owns its files
    val destDir = freshTable()
    val exported = TableLog.exportAt(spark, dir, v2, destDir)
    assert(exported.version == 0L && exported.op == "adopt" && exported.rows == 300L)
    assert(TableLog.read(spark, destDir).count() == 300L)
    // the copy is independent: the source vacuuming everything old does
    // not touch it, and the copy takes appends like any table
    TableLog.vacuum(spark, dir, graceMs = 0L)
    assert(TableLog.read(spark, destDir).count() == 300L)
    assert(TableLog.appendBatch(batchDf(50), destDir, "copy", 0L))
    assert(TableLog.rows(spark, destDir) == 400L)
    // refusing to clobber an existing table
    assert(intercept[IllegalArgumentException](
      TableLog.exportAt(spark, dir, v2, destDir)).getMessage.contains("already"))
  }

  test("restore rebases over a racing append — the new batch survives the rollback") {
    val dir = freshTable()
    (0 until 3).foreach(b => TableLog.appendBatch(batchDf(b), dir, "r", b.toLong))
    val v2 = TableLog.latest(spark, dir).get.version
    TableLog.delete(spark, dir, col("id") < 1000L)
    // an append lands inside restore's commit window
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      assert(TableLog.appendBatch(batchDf(3), dir, "r", 3L))
    }
    val m = try TableLog.restore(spark, dir, v2)
      finally TableLog.casHook = () => ()
    assert(m.rows == 400L, s"raced append lost by the restore: ${m.rows}")
    assert(m.commits("r") == 3L)
    assert(TableLog.read(spark, dir).count() == 400L)
    assert(TableLog.read(spark, dir).select("id").distinct().count() == 400L)
  }

  test("an append rebasing over a racing trackStats registration re-harvests the new column's stats") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L)
    // the registration lands INSIDE the append's commit window: the
    // append loses the CAS, rebases onto the statsFor-bearing manifest,
    // and must commit its files WITH id stats — not permanently
    // stat-less files that degrade every later prune
    TableLog.casHook = () => {
      TableLog.casHook = () => ()
      TableLog.trackStats(spark, dir, Seq("id"))
    }
    try assert(TableLog.appendBatch(batchDf(1).coalesce(1), dir, "r", 1L))
    finally TableLog.casHook = () => ()
    val m = TableLog.latest(spark, dir).get
    assert(m.statsFor == Seq("id"))
    // the prefix bakes the ENTRY-time version (a1-) even though the
    // rebase committed as version 2 — a tail-visibility tag, not a version
    val raced = m.files.filter(_.name.startsWith("a1-"))
    assert(raced.nonEmpty, "fixture vacuity: the raced append's files not found")
    assert(raced.forall(_.stats.contains("id")),
      "files of an append that rebased over trackStats carry no stats " +
        "for the newly registered column")
  }

  test("dropColumn: era-honest time travel, loud straggler guard, compact-gated name reuse") {
    import org.apache.spark.sql.types._
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0), dir, "r", 0L) // era 1: (id, v)
    val withScore = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("score", DoubleType, nullable = true)))
    TableLog.evolve(spark, dir, withScore)         // era 2: + score
    val scored = Seq.tabulate(100)(i => (1000L + i, s"s$i", i * 1.5))
      .toDF("id", "v", "score")
    TableLog.appendBatch(scored, dir, "r", 1L)
    val vEra2 = TableLog.latest(spark, dir).get.version
    val m3 = TableLog.dropColumn(spark, dir, "score") // era 3: − score
    assert(m3.op == "dropcolumn" && m3.dropped == Seq("score"))
    // era schemas: each retained version reads its own shape
    assert(TableLog.readAt(spark, dir, 0L).schema.fieldNames.toSeq == Seq("id", "v"))
    assert(TableLog.readAt(spark, dir, vEra2).schema.fieldNames.toSeq
      == Seq("id", "v", "score"))
    assert(TableLog.read(spark, dir).schema.fieldNames.toSeq == Seq("id", "v"))
    assert(TableLog.read(spark, dir).count() == 200L)
    // the era-2 read still sees the actual score values
    assert(TableLog.readAt(spark, dir, vEra2)
      .filter($"score".isNotNull).count() == 100L)
    // a straggler writer still carrying the column fails loudly
    val e = intercept[IllegalArgumentException](
      TableLog.appendBatch(scored, dir, "r", 2L))
    assert(e.getMessage.contains("schema drift"), e.getMessage)
    // re-adding the dropped name is refused while pre-drop files live…
    val reAdd = intercept[IllegalArgumentException](
      TableLog.evolve(spark, dir, withScore))
    assert(reAdd.getMessage.contains("previously"), reAdd.getMessage)
    // …but a compact purges the column physically and retires the name
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    assert(TableLog.latest(spark, dir).get.dropped.isEmpty)
    TableLog.evolve(spark, dir, withScore)
    // the re-added column is NULL everywhere — the old values did NOT
    // resurface through parquet's name-based resolution
    assert(TableLog.read(spark, dir).filter($"score".isNotNull).count() == 0L)
    assert(TableLog.appendBatch(scored, dir, "r", 3L))
    assert(TableLog.read(spark, dir).filter($"score".isNotNull).count() == 100L)
    // restoring to a PRE-drop version now would swap the old files —
    // whose parquet physically holds the dropped-era score values — back
    // under the re-added name: name-based resolution would serve the
    // supposedly-removed data. Refused loudly; the schema-diff guard
    // alone cannot see it (score is in both schemas).
    val res = intercept[IllegalStateException](
      TableLog.restore(spark, dir, vEra2))
    assert(res.getMessage.contains("resurrect"), res.getMessage)
    // …but a restore to BEFORE the column ever existed is safe — the
    // era-1 files cannot hold score values, they just read as nulls
    // under the current schema — and must not be false-refused
    val m0 = TableLog.restore(spark, dir, 0L)
    assert(m0.op == "restore" && m0.rows == 100L)
    assert(TableLog.read(spark, dir).filter($"score".isNotNull).count() == 0L,
      "a pre-add restore must serve nulls for the later-added column")
  }

  test("8-writer commit storm: no lost batches, no torn manifest/crc pairs") {
    // regression for the local-FS CAS TOCTOU: the exists-check before an
    // overwriting POSIX rename let two same-version committers both
    // "win" — one commit silently lost, and its .crc sidecar left beside
    // the other's data (every later read a ChecksumException). 8 threads
    // hit the window reliably where 2 ran for rounds without tripping it.
    val dir = freshTable()
    val writers = 8
    val batches = 6
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
      "a commit was lost under contention")
    assert(TableLog.read(spark, dir).count() == (writers * batches + 1) * 10L)
    // every retained manifest must be cleanly readable (a torn data/crc
    // pair throws ChecksumException here)
    TableLog.retainedVersions(spark, dir).foreach(v =>
      TableLog.readAt(spark, dir, v).schema)
  }

  test("consumer leases gate vacuum's manifest prune; expiry, release and the override reclaim") {
    val dir = freshTable()
    (0 until TableLog.KeepManifests + 6).foreach(b =>
      TableLog.appendBatch(batchDf(b, 10), dir, "r", b.toLong))
    val floor = TableLog.KeepManifests + 6 - TableLog.KeepManifests // = 6
    // a lagging consumer registered at version 2: everything it still
    // needs (manifests >= 2) survives an aggressive vacuum
    TableLog.renewLease(spark, dir, "lagger", 2L)
    assert(TableLog.bindingLease(spark, dir) == Some(("lagger", 2L)))
    TableLog.vacuum(spark, dir, graceMs = 0L)
    assert(TableLog.retainedVersions(spark, dir).min == 2L,
      s"lease did not bind: ${TableLog.retainedVersions(spark, dir)}")
    // the protected delta is actually reconstructible
    val (d, _) = TableLog.appendsSince(spark, dir, 2L)
    assert(d.get.count() == (TableLog.KeepManifests + 3) * 10L)
    // a SECOND, fresher lease does not bind (the lowest live one does)
    TableLog.renewLease(spark, dir, "fresh", 10L)
    assert(TableLog.bindingLease(spark, dir) == Some(("lagger", 2L)))
    // the explicit operator override reclaims past live leases
    TableLog.vacuum(spark, dir, graceMs = 0L, ignoreLeases = true)
    assert(TableLog.retainedVersions(spark, dir).min == floor.toLong,
      s"override did not reclaim: ${TableLog.retainedVersions(spark, dir)}")
    // an EXPIRED lease never binds: renew low again, age it past the TTL
    (0 until 4).foreach(b => TableLog.appendBatch(batchDf(b, 10), dir, "l2",
      b.toLong))
    TableLog.renewLease(spark, dir, "lagger", floor.toLong)
    Thread.sleep(60)
    TableLog.vacuum(spark, dir, graceMs = 0L, leaseTtlMs = 10L)
    val newFloor = TableLog.retainedVersions(spark, dir).min
    assert(newFloor > floor.toLong,
      s"an expired lease still bound the prune: min retained $newFloor")
    // releaseLease retires a decommissioned consumer outright
    TableLog.renewLease(spark, dir, "lagger", newFloor)
    TableLog.releaseLease(spark, dir, "lagger")
    assert(!TableLog.leases(spark, dir).contains("lagger"))
    // LEGACY single-file leases (version in the content, the feature's
    // first layout) still parse, still bind, release cleanly, and a
    // renewal sweeps them into the current layout
    val legacy = new java.io.File(s"$dir/_graft_log/leases/oldstyle")
    java.nio.file.Files.write(legacy.toPath, "3".getBytes)
    assert(TableLog.leases(spark, dir).get("oldstyle").exists(_._1 == 3L))
    assert(TableLog.bindingLease(spark, dir).contains(("oldstyle", 3L)))
    TableLog.renewLease(spark, dir, "oldstyle", 12L)
    assert(!legacy.exists, "renewal must sweep the legacy file")
    assert(TableLog.leases(spark, dir).get("oldstyle").exists(_._1 == 12L))
    TableLog.releaseLease(spark, dir, "oldstyle")
    assert(!TableLog.leases(spark, dir).contains("oldstyle"))
    // vacuum housekeeping: a lease abandoned past DOUBLE the STANDING
    // TTL is swept outright (it stopped binding at one TTL; the file
    // must not linger forever). A foreign entry in the leases dir —
    // which leases() refuses to parse — is never touched, and the sweep
    // follows the standing policy, NOT the per-call leaseTtlMs (a
    // one-off tight-TTL vacuum must not destroy registrations).
    TableLog.renewLease(spark, dir, "abandoned", 0L)
    val foreign = new java.io.File(s"$dir/_graft_log/leases/notes.txt")
    java.nio.file.Files.write(foreign.toPath, "not a lease".getBytes)
    Thread.sleep(50)
    TableLog.vacuum(spark, dir, graceMs = 0L, leaseTtlMs = 1L)
    assert(TableLog.leases(spark, dir).contains("abandoned"),
      "a tight per-call leaseTtlMs must not destroy a registration the " +
        "standing policy still honors")
    TableLog.vacuum(spark, dir, graceMs = 0L, leaseHousekeepTtlMs = 10L)
    assert(!TableLog.leases(spark, dir).contains("abandoned"),
      "an abandoned lease file survived vacuum housekeeping")
    assert(foreign.exists, "vacuum deleted a foreign leases-dir entry")
  }

  test("vacuum materializes each distinct segment once, not per retained manifest") {
    val dir = freshTable()
    (0 until 8).foreach(b => TableLog.appendBatch(batchDf(b, 10), dir, "r", b.toLong))
    val before = TableLog.segmentTouches.get()
    TableLog.vacuum(spark, dir, graceMs = Long.MaxValue / 4)
    val touched = TableLog.segmentTouches.get() - before
    // the 8 retained heads reference the same segments structurally
    // (head v carries v+1 refs): per-head full resolution would touch
    // 1+2+…+8 = 36; the live-set union must touch each distinct segment
    // once — the bound a deep-lagging lease turns from "slow" into
    // "O(lag × live files) per vacuum call"
    assert(touched <= 8L,
      s"vacuum touched $touched segments — per-manifest resolution is back")
  }

  test("re-renewing the SAME committed version refreshes lease freshness") {
    val dir = freshTable()
    TableLog.appendBatch(batchDf(0, 10), dir, "r", 0L)
    // a consumer confirming one committed version repeatedly (an idle
    // follower, a crash-loop replaying one batch): the <id>@version file
    // already exists, so the renewal must refresh its MTIME or the lease
    // expires — and housekeeping sweeps it — despite active renewals
    TableLog.renewLease(spark, dir, "steady", 1L)
    Thread.sleep(80)
    TableLog.renewLease(spark, dir, "steady", 1L) // same version again
    assert(TableLog.bindingLease(spark, dir, leaseTtlMs = 60L)
      .contains(("steady", 1L)),
      "a same-version re-renewal did not extend the TTL")
    // and the refreshed file survives a housekeeping sweep scoped just
    // past the refresh age
    TableLog.vacuum(spark, dir, graceMs = 0L, leaseHousekeepTtlMs = 30L)
    assert(TableLog.leases(spark, dir).contains("steady"),
      "housekeeping swept an actively-renewed lease")
  }

  test("trackStats on a timestamp column is rejected while the session writes INT96") {
    val dir = freshTable()
    val df = spark.range(10).select($"id",
      org.apache.spark.sql.functions.timestamp_micros($"id" * 1000000L).as("ts"))
    TableLog.appendBatch(df, dir, "r", 0L)
    val key = "spark.sql.parquet.outputTimestampType"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "INT96")
    try {
      // INT96 files carry no usable statistics: the registration would
      // silently never prune anything this writer appends — reject loudly
      val e = intercept[IllegalArgumentException](
        TableLog.trackStats(spark, dir, Seq("ts")))
      assert(e.getMessage.contains("INT96"), e.getMessage)
      // with a stats-capable output type the registration lands
      spark.conf.set(key, "TIMESTAMP_MICROS")
      assert(TableLog.trackStats(spark, dir, Seq("ts")).statsFor == Seq("ts"))
    } finally spark.conf.set(key, saved)
  }

  test("resurrection guards resolve names the way the reader will: case-insensitively by default") {
    import org.apache.spark.sql.types._
    assert(!spark.sessionState.conf.caseSensitiveAnalysis,
      "fixture assumption: default Spark resolution is case-insensitive")
    val dir = freshTable()
    val scored = Seq.tabulate(50)(i => (i.toLong, s"s$i", i * 1.5))
      .toDF("id", "v", "score")
    TableLog.appendBatch(scored, dir, "r", 0L)
    // dropColumn resolves its argument under the session's rules and
    // records the schema's CANONICAL spelling in the dropped set
    val m = TableLog.dropColumn(spark, dir, "SCORE")
    assert(m.dropped == Seq("score") &&
      m.schema.get.fieldNames.toSeq == Seq("id", "v"),
      s"dropped=${m.dropped} schema=${m.schema.get.simpleString}")
    // re-adding the dropped name under a DIFFERENT case is the same
    // resurrection: parquet resolves case-insensitively, so the pre-drop
    // files would serve the old score values under `SCORE`
    val reAdd = StructType(m.schema.get.fields :+
      StructField("SCORE", DoubleType, nullable = true))
    val e = intercept[IllegalArgumentException](
      TableLog.evolve(spark, dir, reAdd))
    assert(e.getMessage.contains("previously"), e.getMessage)
    // compact purges the files and retires the name; the case-variant
    // re-add is then legal…
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    TableLog.evolve(spark, dir, reAdd)
    assert(TableLog.read(spark, dir).filter($"SCORE".isNotNull).count() == 0L)
    // …but restoring to the PRE-drop version would swap files physically
    // holding `score` values back under the re-added `SCORE` — the same
    // case-blind resolution serves them, so the guard must refuse
    val res = intercept[IllegalStateException](
      TableLog.restore(spark, dir, 0L))
    assert(res.getMessage.contains("resurrect"), res.getMessage)
  }

  test("dropColumn scrubs layout/trackStats registrations; other-column pruning survives") {
    val dir = freshTable()
    val df = Seq.tabulate(2000)(i => (i.toLong, i * 10L, s"v$i")).toDF("id", "ts", "v")
    TableLog.appendBatch(df, dir, "seed", 0L)
    TableLog.trackStats(spark, dir, Seq("ts"))
    TableLog.compact(spark, dir,
      targetBytes = math.max(1L, TableLog.bytes(spark, dir) / 6),
      layoutBy = Seq("id", "ts"))
    val before = TableLog.latest(spark, dir).get
    assert(before.layout == Seq("id", "ts") && before.statsFor == Seq("ts"))
    val m = TableLog.dropColumn(spark, dir, "ts")
    assert(m.layout == Seq("id") && m.statsFor.isEmpty,
      s"registrations not scrubbed: layout=${m.layout} statsFor=${m.statsFor}")
    // id pruning still works through the untouched segments
    val kept = TableLog.prunedFiles(spark, dir, "id", 0L, 99L)
    assert(kept.nonEmpty && kept.size < m.files.size, "id pruning lost")
    assert(TableLog.read(spark, dir).filter($"id" < 100L).count() == 100L)
  }

  // ---- segmented manifests: what a commit WRITES is O(delta), not
  // O(live files) — the r11 verdict's #1 storage ceiling.

  /** Log-dir files (name → size) — the write-cost probe. */
  test("timestamp travel: versionAt resolves the mtime timeline, monotone-adjusted, loud at both edges") {
    val dir = freshTable()
    (0 until 3).foreach(b => TableLog.appendBatch(batchDf(b, 10), dir, "w", b.toLong))
    // pin explicit, well-separated commit times (the resolution source
    // is the manifest file's mtime — setTimes makes the test
    // deterministic at any commit cadence)
    val log = new org.apache.hadoop.fs.Path(dir + "/_graft_log")
    val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = 1700000000000L
    (0 to 2).foreach { v =>
      fs.setTimes(new org.apache.hadoop.fs.Path(log, f"manifest-$v%020d"),
        base + v * 60000L, -1L)
    }
    val times = TableLog.retainedCommitTimes(spark, dir)
    assert(times == Seq((0L, base), (1L, base + 60000L), (2L, base + 120000L)))
    // exact commit instants resolve to that commit; instants between
    // commits resolve to the one before
    assert(TableLog.versionAt(spark, dir, base) == 0L)
    assert(TableLog.versionAt(spark, dir, base + 1) == 0L)
    assert(TableLog.versionAt(spark, dir, base + 60000L) == 1L)
    assert(TableLog.versionAt(spark, dir, base + 119999L) == 1L)
    assert(TableLog.versionAt(spark, dir, base + 120000L) == 2L)
    assert(TableLog.readAtTimestamp(spark, dir, base + 60001L).count() == 20L)
    // BEFORE the oldest retained commit: loud, names the range
    val early = intercept[IllegalStateException] {
      TableLog.versionAt(spark, dir, base - 1)
    }
    assert(early.getMessage.contains("oldest retained"), early.getMessage)
    // AFTER the newest commit: loud (the state is not final), offers
    // the usable alternatives
    val late = intercept[IllegalStateException] {
      TableLog.versionAt(spark, dir, base + 120001L)
    }
    assert(late.getMessage.contains("VERSION AS OF 2"), late.getMessage)
    // non-monotone raw mtimes (stepped clock, racing writers, restored
    // backup): adjusted forward so a later version never maps earlier
    fs.setTimes(new org.apache.hadoop.fs.Path(log, f"manifest-${1L}%020d"),
      base + 130000L, -1L)
    val adjusted = TableLog.retainedCommitTimes(spark, dir)
    assert(adjusted.map(_._1) == Seq(0L, 1L, 2L))
    assert(adjusted(1)._2 == base + 130000L &&
      adjusted(2)._2 == base + 130001L, adjusted.toString)
    assert(TableLog.versionAt(spark, dir, base + 130000L) == 1L)
    assert(TableLog.versionAt(spark, dir, base + 130001L) == 2L)
  }

  test("timestamp travel: the path faces take timestampAsOf; forms parse; both-options is loud") {
    val dir = freshTable()
    (0 until 2).foreach(b => TableLog.appendBatch(batchDf(b, 10), dir, "w", b.toLong))
    val log = new org.apache.hadoop.fs.Path(dir + "/_graft_log")
    val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t0 = 1700000000000L
    fs.setTimes(new org.apache.hadoop.fs.Path(log, f"manifest-${0L}%020d"), t0, -1L)
    fs.setTimes(new org.apache.hadoop.fs.Path(log, f"manifest-${1L}%020d"), t0 + 60000L, -1L)
    // epoch-millis form on both provider faces
    assert(spark.read.format("tablelogv2").option("timestampAsOf", s"$t0")
      .load(dir).count() == 10L)
    assert(spark.read.format("tablelog").option("timestampAsOf", s"${t0 + 60000L}")
      .load(dir).count() == 20L)
    // ISO-instant form (t0 = 2023-11-14T22:13:20Z)
    assert(spark.read.format("tablelogv2")
      .option("timestampAsOf", java.time.Instant.ofEpochMilli(t0).toString)
      .load(dir).count() == 10L)
    // session-zone local datetime form
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    val local = java.time.Instant.ofEpochMilli(t0).atZone(zone).toLocalDateTime
    val localStr = local.toLocalDate.toString + " " + local.toLocalTime.toString
    assert(TableLog.parseTravelTimestamp(localStr, zone) == t0)
    // garbage is loud and names the accepted forms
    val bad = intercept[IllegalArgumentException] {
      TableLog.parseTravelTimestamp("next tuesday", zone)
    }
    assert(bad.getMessage.contains("ISO-8601"), bad.getMessage)
    // pinning two snapshots in one read is loud on both faces
    intercept[IllegalArgumentException] {
      spark.read.format("tablelogv2").option("timestampAsOf", s"$t0")
        .option("versionAsOf", "1").load(dir).count()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("tablelog").option("timestampAsOf", s"$t0")
        .option("versionAsOf", "1").load(dir).count()
    }
  }

  private def logFiles(dir: String): Map[String, Long] =
    new java.io.File(dir + "/_graft_log").listFiles()
      .map(f => f.getName -> f.length()).toMap

  test("segmented commits: append write bytes are independent of live-file count") {
    // two tables whose live-file counts differ 10×, same delta appended
    def mk(files: Int): String = {
      val dir = freshTable()
      val big = Seq.tabulate(20000)(i => (i.toLong, s"v$i")).toDF("id", "v")
      assert(TableLog.appendBatch(big, dir, "seed", 0L))
      val bytes = TableLog.bytes(spark, dir)
      val written = TableLog.compact(spark, dir, targetBytes = math.max(1L, bytes / files))
      assert(written >= files * 3 / 4, s"fixture vacuity: $written files for target $files")
      dir
    }
    val small = mk(100)
    val large = mk(1000)
    def appendCost(dir: String): Long = {
      val before = logFiles(dir)
      assert(TableLog.appendBatch(batchDf(7).coalesce(1), dir, "probe", 0L))
      val after = logFiles(dir)
      (after.keySet -- before.keySet).iterator.map(after).sum
    }
    val costSmall = appendCost(small)
    val costLarge = appendCost(large)
    // the commit writes one delta segment + a head of O(#segments) lines;
    // live-file count (100 vs 1000) must not leak into either
    assert(costLarge <= costSmall * 3 / 2 + 512,
      s"append commit wrote $costLarge bytes on the 1000-file table vs " +
        s"$costSmall on the 100-file table — commit cost grew with table size")
    // and the data still reads exactly right on both
    assert(TableLog.read(spark, large).count() == 20100L)
    // heads reference segments; the 1000 entries live in segment files
    val m = TableLog.latest(spark, large).get
    assert(m.segments.nonEmpty && m.files.length >= 1000,
      s"resolved ${m.files.length} files over ${m.segments.length} segments")
  }

  test("segment merge bounds the head; reads and stats survive the fold") {
    val dir = freshTable()
    val saved = TableLog.MaxSegments
    TableLog.MaxSegments = 6
    try {
      (0 until 10).foreach { b =>
        assert(TableLog.appendBatch(batchDf(b, n = 50).coalesce(1), dir, "r", b.toLong))
      }
      val m = TableLog.latest(spark, dir).get
      assert(m.segments.length <= 6,
        s"head references ${m.segments.length} segments past the bound")
      assert(m.files.length == 10 && m.rows == 500L)
      val got = TableLog.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
      assert(got == (0 until 10).flatMap(b => b * 1000L until b * 1000L + 50L))
      // merged segments preserve per-file stats verbatim (trackStats-less
      // tables still record layout stats after a compact; here assert the
      // entry identity survived: names and sizes match the disk files)
      m.files.foreach { e =>
        assert(new java.io.File(dir + "/" + e.name).length() == e.bytes)
      }
    } finally TableLog.MaxSegments = saved
  }

  test("vacuum reclaims superseded segments; retained heads keep theirs") {
    val dir = freshTable()
    (0 until 4).foreach(b => TableLog.appendBatch(batchDf(b).coalesce(1), dir, "r", b.toLong))
    TableLog.compact(spark, dir, targetBytes = 1L << 20)
    // age every pre-compact head out of retention
    (0 until TableLog.KeepManifests).foreach { i =>
      TableLog.appendBatch(batchDf(10 + i, n = 1).coalesce(1), dir, "r", 10L + i)
    }
    TableLog.vacuum(spark, dir, graceMs = 0L)
    val log = new java.io.File(dir + "/_graft_log").listFiles().map(_.getName)
    val onDisk = log.filter(_.startsWith("segment-")).toSet
    // each retained head's segment list is exactly what vacuum must keep
    val retainedSegs: Set[String] =
      TableLog.history(spark, dir).flatMap(_.segments.map(_.name)).toSet
    assert(onDisk.nonEmpty && onDisk.subsetOf(retainedSegs),
      s"orphaned segments survived vacuum: ${(onDisk -- retainedSegs).take(3)}")
    // and nothing a retained head needs was reclaimed
    assert(retainedSegs.subsetOf(onDisk),
      s"vacuum reclaimed referenced segments: ${(retainedSegs -- onDisk).take(3)}")
    assert(TableLog.read(spark, dir).count() == 400L + TableLog.KeepManifests)
  }

  test("appendsSince fails loudly on a retention gap instead of duplicating the table") {
    val dir = freshTable()
    (0 until 6).foreach(b => TableLog.appendBatch(batchDf(b, n = 20).coalesce(1), dir, "r", b.toLong))
    // simulate a concurrent vacuum pruning a mid-history manifest between
    // history()'s listing and read: version 3's head vanishes while 0..2
    // and 4..5 remain — the predecessor chain for version 4 is broken
    val victim = new java.io.File(dir + "/_graft_log/manifest-" + "%020d".format(3))
    assert(victim.delete(), "fixture vacuity: could not remove manifest-3")
    val e = intercept[IllegalArgumentException] {
      TableLog.appendsSince(spark, dir, 1L)
    }
    assert(e.getMessage.contains("left retention"),
      s"gap must surface as the documented left-retention error: ${e.getMessage}")
    // a consumer strictly ABOVE the gap still reads its delta fine
    val (d, v) = TableLog.appendsSince(spark, dir, 4L)
    assert(v == 5L && d.get.count() == 20L)
  }
}
