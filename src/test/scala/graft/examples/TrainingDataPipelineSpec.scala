package graft.examples

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The end-to-end pipeline at sf0.001: streaming dedup keepers must equal
  * the batch dedup_clusters keepers, and the token budget must equal an
  * independently computed batch aggregate over exactly those keepers.
  */
class TrainingDataPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("stream-dedup → curate: budget matches an independent batch computation") {
    withRocksDBState {
      // stage the single-file table into a directory (the streaming file
      // source watches directories; production ingest drops files here)
      val docsDir = java.nio.file.Files.createTempDirectory("graft_tdp_docs").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf() + "/documents.parquet"),
        java.nio.file.Paths.get(docsDir, "part-0.parquet"))
      val verdictDir = java.nio.file.Files.createTempDirectory("graft_tdp_v").toString
      val ckptDir = java.nio.file.Files.createTempDirectory("graft_tdp_c").toString

      TrainingDataPipeline.streamDedup(spark, docsDir, verdictDir, ckptDir)

      // keeper set == batch connected-components keepers (pinned already
      // in DedupStreamSpec for MemoryStream; here through the file path)
      val streamKeepers = spark.read.parquet(verdictDir)
        .filter($"is_keeper").select($"doc_id").as[Long].collect().toSet
      val batchKeepers = graft.queries.DedupOps.queries("dedup_clusters")(spark, sf())
        .filter("is_keeper = 1").select("doc_id").as[Long].collect().toSet
      assert(streamKeepers == batchKeepers)

      val budget = TrainingDataPipeline.tokenBudget(spark, docsDir, verdictDir)
        .orderBy("lang")
        .as[(String, Long, Long, Double)].collect().toSeq

      // independent recomputation: same keepers, straight batch plan
      val expect = spark.read.parquet(docsDir)
        .filter($"doc_id".isin(streamKeepers.toSeq: _*))
        .withColumn("bpe_tokens",
          size(graft.functions.native.bpe_tokens($"text")).cast("long"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"bpe_tokens").as("token_budget"))
        .orderBy("lang")
        .select($"lang", $"n_docs", $"token_budget")
        .as[(String, Long, Long)].collect().toSeq

      assert(budget.map(r => (r._1, r._2, r._3)) == expect)
      assert(budget.map(_._2).sum == streamKeepers.size.toLong)
      assert(budget.forall(_._3 > 0)) // every language carries real tokens

      // stage 1.5: curate (PII scrub → repetition gate → packing)
      val manifest = TrainingDataPipeline.curate(spark, docsDir, verdictDir)
        .collect()
      assert(manifest.nonEmpty)
      val ids = manifest.map(_.getAs[Long]("doc_id")).toSet
      assert(ids.subsetOf(streamKeepers), "only keepers may be packed")
      // the quality gate really drops something on this corpus
      assert(ids.size < streamKeepers.size)
      // scrubbed text carries no remaining PII pattern hits
      val leftover = TrainingDataPipeline.curate(spark, docsDir, verdictDir)
        .select(
          regexp_count(col("clean_text"),
            lit(graft.functions.Curation.EmailRe)).as("e"),
          regexp_count(col("clean_text"),
            lit(graft.functions.Curation.Ipv4Re)).as("i"))
        .agg(sum($"e" + $"i")).as[Long].head()
      assert(leftover == 0L)
      // packing offsets are consistent per shard: each doc starts where
      // the previous one ended, and window bookkeeping matches offsets
      manifest.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
        val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
        var expectStart = 0L
        ordered.foreach { r =>
          assert(r.getAs[Long]("seq_start") == expectStart,
            s"gap at doc ${r.getAs[Long]("doc_id")}")
          expectStart += r.getAs[String]("clean_text").length.toLong
          assert(r.getAs[Long]("window_id") == r.getAs[Long]("seq_start") / 8192L)
          assert(r.getAs[Long]("window_offset") == r.getAs[Long]("seq_start") % 8192L)
        }
      }
    }
  }

  test("bloom-prefiltered decontamination equals the exact-only computation") {
    import graft.functions.{TextFunctions => TF}
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    // eval suite: the dedup_decontaminate holdout convention
    val evalDocs = docs.filter($"doc_id" % 97 === 0)
    val corpus = docs.filter($"doc_id" % 97 =!= 0)

    val got = TrainingDataPipeline.decontaminate(spark, corpus, evalDocs)
      .filter($"contaminated").select($"doc_id").as[Long].collect().toSet

    // exact-only: the same flagging with NO bloom stage
    val evalSh = evalDocs
      .select(explode(TF.shingles3($"text")).as("shingle")).distinct()
    val expect = corpus
      .select($"doc_id", explode(TF.shingles3($"text")).as("shingle"))
      .join(evalSh, Seq("shingle"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= 2).select($"doc_id").as[Long].collect().toSet

    assert(got == expect, "bloom prefilter must not change the flagged set")
    assert(got.nonEmpty, "fixture vacuity: no contaminated docs at all")
    // every corpus doc got a verdict, flagged or not
    val n = TrainingDataPipeline.decontaminate(spark, corpus, evalDocs).count()
    assert(n == corpus.count())
  }

  test("per-domain cap: deterministic survivors, WindowGroupLimit plan, cap binds") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val capped = TrainingDataPipeline.capPerDomain(docs, "source", "doc_id", 20L)
    // never more than cap per domain, and the cap genuinely binds here
    val sizes = capped.groupBy($"source").count().as[(String, Long)].collect()
    assert(sizes.forall(_._2 <= 20L), s"cap exceeded: ${sizes.filter(_._2 > 20).toSeq}")
    assert(sizes.exists(_._2 == 20L), "cap never bound — fixture too small")
    // identical survivors on re-run (same seed), different draw on a new seed
    val a = capped.select($"doc_id").as[Long].collect().toSet
    val b = TrainingDataPipeline.capPerDomain(docs, "source", "doc_id", 20L)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b, "same-seed re-run must select identical survivors")
    val c = TrainingDataPipeline.capPerDomain(docs, "source", "doc_id", 20L, seed = "cap-1")
      .select($"doc_id").as[Long].collect().toSet
    assert(c != a, "a new seed should be a fresh draw")
    // the rank filter must pre-prune before the shuffle
    val plan = TrainingDataPipeline.capPerDomain(docs, "source", "doc_id", 20L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"lost the pre-shuffle prune:\n$plan")
  }

  test("maintenance loop: table compacts + z-orders WHILE the ingest streams; counts identical") {
    import graft.functions.TableLog
    val srcDir = java.nio.file.Files.createTempDirectory("graft_mnt_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_mnt_out").toString + "/t"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_mnt_ckpt").toString

    // the manifest IS the table shape now: readers never list the
    // directory (superseded files linger there until vacuum's grace)
    def manifestFiles(): Int =
      TableLog.latest(spark, outDir).map(_.files.length).getOrElse(0)
    def tableCount(): Long =
      if (manifestFiles() == 0) 0L else TableLog.read(spark, outDir).count()
    def landBatch(b: Int): Unit =
      Seq.tabulate(500)(i => (b * 500L + i, (b * 500L + i) % 97, (i % 41).toLong))
        .toDF("event_id", "user_id", "vbucket")
        // the layout key travels WITH the data, materialized at ingest
        .withColumn("zkey",
          graft.functions.Zorder.interleave(col("user_id"), col("vbucket"), 7))
        .coalesce(4).write.mode("append").parquet(srcDir)

    landBatch(0)
    val input = spark.readStream
      .schema("event_id LONG, user_id LONG, vbucket LONG, zkey LONG")
      .option("maxFilesPerTrigger", 4).parquet(srcDir)
    // maintenance every 2 batches; 64 KiB target → the compacted state is
    // 1-2 files at this fixture's size, unambiguous next to the 4-file
    // appends (exact counts under parquet footer overhead are not stable
    // enough to pin tighter)
    val q = TrainingDataPipeline.ingestWithMaintenance(
      input, outDir, ckptDir, targetBytes = 65536L,
      everyNBatches = 2, layoutBy = Seq("zkey"))
    try {
      var sawCompacted = false
      var sawFragmented = false
      // a drop is USUALLY one micro-batch (4 files, maxFilesPerTrigger =
      // 4) but the file source may catch a drop mid-write and split it —
      // so don't assume batch parity: keep landing drops and OBSERVING
      // the quiescent state between them until both table shapes (the
      // post-maintenance ≤2-file state and the appends-piled-up state)
      // have been seen between batches of the LIVE query
      var landed = 1
      while (!(sawCompacted && sawFragmented) && landed < 14) {
        q.processAllAvailable()
        val files = manifestFiles()
        val n = tableCount()
        if (files <= 2 && n >= 1000) sawCompacted = true
        if (files > 2) sawFragmented = true
        landBatch(landed)
        landed += 1
      }
      q.processAllAvailable()
      q.stop()
      assert(sawCompacted, "never observed a compacted state between live batches")
      assert(sawFragmented, "fixture vacuity: appends never fragmented the table")
      // nothing lost, nothing duplicated across all live rewrites
      val got = graft.functions.TableLog.read(spark, outDir)
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(got == (0L until landed * 500L).toSeq,
        s"row set diverged: ${got.length} rows for ${landed * 500L} written")
      // the re-layout really clustered the z key: run one more
      // maintenance rewrite at a small target (deterministic batch call,
      // the same code path the loop runs) and check the range-partitioned
      // files each span less than the global z range — the footer-pruning
      // evidence a z-ordered table exists to provide
      val written = graft.functions.TableLog.compact(
        spark, outDir, targetBytes = 8192L, layoutBy = Seq("zkey"))
      val files = graft.functions.TableLog.latest(spark, outDir).get.files
      assert(files.length == written && files.length >= 2,
        s"want >= 2 z-ordered files for the span check: ${files.length}")
      val spans = files.map { e =>
        val r = spark.read.parquet(outDir + "/" + e.name)
          .agg(min(col("zkey")), max(col("zkey"))).head()
        (r.getLong(0), r.getLong(1))
      }
      val global = (spans.map(_._1).min, spans.map(_._2).max)
      assert(spans.exists(sp => (sp._2 - sp._1) < (global._2 - global._1)),
        s"z-order layout left every file spanning the full key range: $spans")
      // those spans live in the MANIFEST now (v2 per-file stats): a
      // range read prunes files without opening a single footer, and
      // returns exactly the full-scan-and-filter rows — the z-span
      // narrowing measured above becomes actual skipped reads
      assert(files.forall(_.stats.contains("zkey")),
        "compacted manifest entries must carry zkey stats")
      val lo = global._1
      val pruned = graft.functions.TableLog.prunedFiles(spark, outDir, "zkey", lo, lo)
      assert(pruned.size < files.length,
        s"no manifest-level pruning on the z key: ${pruned.size} of ${files.length}")
      val viaPruned = graft.functions.TableLog
        .readWhere(spark, outDir, "zkey", lo, lo).count()
      val viaFull = graft.functions.TableLog.read(spark, outDir)
        .filter(col("zkey") === lo).count()
      assert(viaPruned == viaFull && viaFull >= 1,
        s"pruned read diverged: $viaPruned vs $viaFull")
    } finally q.stop()
  }

  test("maintenance ingest under a FRESH checkpoint appends — restarted batchIds never collide") {
    // the r9 ADVICE high finding: a protocol keyed on bare batchId turns
    // a fresh-checkpoint restart (batchIds resume at 0) into silent
    // no-op appends once ids collide with a prior generation's commits.
    // TableLog keys commits by the per-checkpoint runKey, so a fresh
    // checkpoint is a fresh generation end-to-end THROUGH the engine.
    // (Replay dedup within one generation is pinned in TableLogSpec.)
    import graft.functions.TableLog
    val outDir = java.nio.file.Files.createTempDirectory("graft_gen_out").toString + "/t"
    def runOnce(tag: Int): Unit = {
      val srcDir = java.nio.file.Files.createTempDirectory(s"graft_gen_src$tag").toString + "/in"
      val ckptDir = java.nio.file.Files.createTempDirectory(s"graft_gen_ck$tag").toString
      Seq.tabulate(300)(i => (tag * 1000L + i, s"g$tag-$i")).toDF("id", "v")
        .coalesce(3).write.parquet(srcDir)
      val q = TrainingDataPipeline.ingestWithMaintenance(
        spark.readStream.schema("id LONG, v STRING")
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        outDir, ckptDir, targetBytes = 65536L, everyNBatches = 2)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(0)
    assert(TableLog.rows(spark, outDir) == 300L)
    runOnce(1) // fresh checkpoint, fresh source: batchIds restart at 0
    val got = TableLog.read(spark, outDir).select("id").as[Long].collect().sorted.toSeq
    assert(got == ((0L until 300L) ++ (1000L until 1300L)).toSeq,
      s"fresh-generation batches were dropped or duplicated: ${got.length} of 600")
    // two generations, two runKeys in the commit map
    assert(TableLog.latest(spark, outDir).get.commits.size == 2)
  }

  test("maintenance ingest on a pre-TableLog table adopts it — legacy rows survive the upgrade") {
    // the r10 review finding: an r9-era table (raw parquet, no manifest
    // log) restarted under the TableLog loop must not have its history
    // vacuumed away as "unreferenced debris" — it is adopted as the
    // version-0 snapshot and new batches append on top
    import graft.functions.TableLog
    val outDir = java.nio.file.Files.createTempDirectory("graft_legacy_out").toString + "/t"
    Seq.tabulate(400)(i => (i.toLong, s"old-$i")).toDF("id", "v")
      .coalesce(2).write.parquet(outDir)
    // make the legacy files decidedly older than any grace rounding
    new java.io.File(outDir).listFiles().foreach(f =>
      f.setLastModified(System.currentTimeMillis() - 3600L * 1000))
    val srcDir = java.nio.file.Files.createTempDirectory("graft_legacy_src").toString + "/in"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_legacy_ck").toString
    Seq.tabulate(200)(i => (1000L + i, s"new-$i")).toDF("id", "v")
      .coalesce(2).write.parquet(srcDir)
    val q = TrainingDataPipeline.ingestWithMaintenance(
      spark.readStream.schema("id LONG, v STRING")
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      outDir, ckptDir, targetBytes = 65536L, everyNBatches = 2, vacuumGraceMs = 0L)
    try q.processAllAvailable() finally q.stop()
    val got = TableLog.read(spark, outDir).select("id").as[Long].collect().sorted.toSeq
    assert(got == ((0L until 400L) ++ (1000L until 1200L)).toSeq,
      s"legacy rows lost in the upgrade: ${got.length} of 600")
  }

  test("adopt after a legacy-protocol crash sweeps debris, keeps committed files with pruned markers") {
    // the r10 advice finding (refined by the r11 review): the old marker
    // protocol could crash between landing b<id>- files and creating the
    // batch's marker — that debris must not be adopted as committed rows
    // (the same-checkpoint replay would then duplicate it). But the old
    // protocol ALSO pruned markers older than lastBatch-16, so a
    // committed file may legitimately have no marker; only ids ABOVE the
    // highest marker can be uncommitted (the writer replayed at most the
    // last batch), and everything at or below it must survive.
    import graft.functions.TableLog
    import org.apache.hadoop.fs.Path
    val outDir = java.nio.file.Files.createTempDirectory("graft_legacy2_out").toString + "/t"
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def landLegacy(dir: String, prefix: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_legacy2_tmp").toString + "/d"
      rows.toDF("id", "v").coalesce(1).write.parquet(tmp)
      new java.io.File(tmp).listFiles().foreach { f =>
        if (f.getName.endsWith(".parquet"))
          fs.rename(new Path(f.toString), new Path(dir, s"$prefix-${f.getName}"))
      }
    }
    fs.mkdirs(new Path(outDir))
    landLegacy(outDir, "b0", Seq.tabulate(100)(i => (i.toLong, s"old-$i")))    // marker kept
    landLegacy(outDir, "b3", Seq.tabulate(30)(i => (200L + i, s"pruned-$i")))  // marker PRUNED, committed
    landLegacy(outDir, "b4", Seq.tabulate(20)(i => (300L + i, s"recent-$i")))  // marker kept
    landLegacy(outDir, "b5", Seq.tabulate(50)(i => (5000L + i, s"debris-$i"))) // crashed: NO marker, id > max
    val markerDir = new Path(outDir + "__batches")
    fs.mkdirs(markerDir)
    fs.create(new Path(markerDir, "0"), false).close()
    fs.create(new Path(markerDir, "4"), false).close()
    new java.io.File(outDir).listFiles().foreach(f =>
      f.setLastModified(System.currentTimeMillis() - 3600L * 1000))
    val srcDir = java.nio.file.Files.createTempDirectory("graft_legacy2_src").toString + "/in"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_legacy2_ck").toString
    Seq.tabulate(60)(i => (1000L + i, s"new-$i")).toDF("id", "v")
      .coalesce(1).write.parquet(srcDir)
    val q = TrainingDataPipeline.ingestWithMaintenance(
      spark.readStream.schema("id LONG, v STRING")
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      outDir, ckptDir, targetBytes = 65536L, everyNBatches = 2, vacuumGraceMs = 0L)
    try q.processAllAvailable() finally q.stop()
    val got = TableLog.read(spark, outDir).select("id").as[Long].collect().sorted.toSeq
    assert(got == ((0L until 100L) ++ (200L until 230L) ++ (300L until 320L) ++
        (1000L until 1060L)).toSeq,
      s"legacy upgrade diverged: ${got.length} rows; debris leaked: " +
        s"${got.exists(_ >= 5000L)}; pruned-marker rows lost: ${!got.contains(200L)}")
    // the stale marker dir is gone — its dedup role now lives in the manifest
    assert(!fs.exists(markerDir), "legacy marker dir not removed after adopt")

    // the crash-during-batch-0 shape: b<id>- files and NO marker dir at
    // all (the old protocol created the dir only at its first commit
    // point) — nothing is committed, so everything is debris and the
    // checkpoint replay must be the only source of those rows
    val outDir2 = java.nio.file.Files.createTempDirectory("graft_legacy3_out").toString + "/t"
    fs.mkdirs(new Path(outDir2))
    landLegacy(outDir2, "b0", Seq.tabulate(40)(i => (7000L + i, s"halfbatch-$i")))
    new java.io.File(outDir2).listFiles().foreach(f =>
      f.setLastModified(System.currentTimeMillis() - 3600L * 1000))
    val srcDir2 = java.nio.file.Files.createTempDirectory("graft_legacy3_src").toString + "/in"
    val ckptDir2 = java.nio.file.Files.createTempDirectory("graft_legacy3_ck").toString
    // the replayed batch lands the SAME rows the crashed attempt held
    Seq.tabulate(40)(i => (7000L + i, s"halfbatch-$i")).toDF("id", "v")
      .coalesce(1).write.parquet(srcDir2)
    val q2 = TrainingDataPipeline.ingestWithMaintenance(
      spark.readStream.schema("id LONG, v STRING")
        .option("maxFilesPerTrigger", 1).parquet(srcDir2),
      outDir2, ckptDir2, targetBytes = 65536L, everyNBatches = 2, vacuumGraceMs = 0L)
    try q2.processAllAvailable() finally q2.stop()
    val got2 = TableLog.read(spark, outDir2).select("id").as[Long].collect().sorted.toSeq
    assert(got2 == (7000L until 7040L).toSeq,
      s"batch-0 crash debris adopted and duplicated by the replay: ${got2.length} rows")
  }

  test("adopting a raw parquet dir with coincidental b-named files destroys nothing") {
    // the pure-legacy guard: a dir with part-* data files was never the
    // old marker protocol's (its writer named EVERY file b<id>-), so a
    // missing marker dir must not turn its b-named files into "debris" —
    // that would delete committed rows at upgrade
    import graft.functions.TableLog
    import org.apache.hadoop.fs.Path
    val outDir = java.nio.file.Files.createTempDirectory("graft_rawmix_out").toString + "/t"
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq.tabulate(80)(i => (i.toLong, s"raw-$i")).toDF("id", "v")
      .coalesce(1).write.parquet(outDir) // part-*.parquet + _SUCCESS
    val tmp = java.nio.file.Files.createTempDirectory("graft_rawmix_tmp").toString + "/d"
    Seq.tabulate(20)(i => (500L + i, s"bnamed-$i")).toDF("id", "v")
      .coalesce(1).write.parquet(tmp)
    new java.io.File(tmp).listFiles().foreach { f =>
      if (f.getName.endsWith(".parquet"))
        fs.rename(new Path(f.toString), new Path(outDir, s"b1-${f.getName}"))
    }
    val srcDir = java.nio.file.Files.createTempDirectory("graft_rawmix_src").toString + "/in"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_rawmix_ck").toString
    Seq.tabulate(10)(i => (900L + i, s"new-$i")).toDF("id", "v")
      .coalesce(1).write.parquet(srcDir)
    val q = TrainingDataPipeline.ingestWithMaintenance(
      spark.readStream.schema("id LONG, v STRING")
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      outDir, ckptDir, targetBytes = 65536L, everyNBatches = 2, vacuumGraceMs = 0L)
    try q.processAllAvailable() finally q.stop()
    val got = TableLog.read(spark, outDir).select("id").as[Long].collect().sorted.toSeq
    assert(got == ((0L until 80L) ++ (500L until 520L) ++ (900L until 910L)).toSeq,
      s"raw-dir adopt lost rows: ${got.length} (b-named deleted: ${!got.contains(500L)})")
  }

  test("maintenance loop survives a real stop/restart on the same checkpoint") {
    // TableLogSpec drives appendBatch replays by hand; this one drives
    // the ENGINE's replay: stop the query, land more input, restart from
    // the same checkpoint — batch ids resume under the same runKey, the
    // startup vacuum and commit-map dedup run through foreachBatch
    // itself, and the row set stays exact across the restart boundary
    val srcDir = java.nio.file.Files.createTempDirectory("graft_mnt2_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_mnt2_out").toString + "/t"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_mnt2_ckpt").toString
    def landBatch(b: Int): Unit =
      Seq.tabulate(200)(i => (b * 200L + i, s"r$b-$i")).toDF("id", "v")
        .coalesce(2).write.mode("append").parquet(srcDir)
    def start() = TrainingDataPipeline.ingestWithMaintenance(
      spark.readStream.schema("id LONG, v STRING")
        .option("maxFilesPerTrigger", 2).parquet(srcDir),
      outDir, ckptDir, targetBytes = 65536L, everyNBatches = 2)

    landBatch(0); landBatch(1)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    // input lands while the query is DOWN; restart picks it up
    landBatch(2); landBatch(3)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = graft.functions.TableLog.read(spark, outDir).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got == (0L until 800L).toSeq,
      s"restart lost or duplicated rows: ${got.length} of 800")
  }

  test("ingest with trackStatsFor: appended files prune time-ranged reads before any compaction") {
    import graft.functions.TableLog
    val outDir = java.nio.file.Files.createTempDirectory("graft_ts_out").toString + "/t"
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ts_src").toString + "/in"
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ts_ck").toString
    // 6 single-file drops with monotone ts — the ingest-time shape
    (0 until 6).foreach { b =>
      Seq.tabulate(100)(i => (b * 100L + i, s"d$b-$i")).toDF("ts", "v")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val q = TrainingDataPipeline.ingestWithMaintenance(
      spark.readStream.schema("ts LONG, v STRING")
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      outDir, ckptDir, targetBytes = 65536L,
      everyNBatches = 1000, // no compaction: the claim is append-time stats
      trackStatsFor = Seq("ts"))
    try q.processAllAvailable() finally q.stop()
    val m = TableLog.latest(spark, outDir).get
    assert(m.statsFor == Seq("ts"), s"registration missing: ${m.statsFor}")
    assert(m.files.length >= 5, s"fixture vacuity: ${m.files.length} files")
    // batch 0 predates the registration (a fresh table has no manifest
    // to register on); everything after carries ts stats
    assert(m.files.count(_.stats.contains("ts")) >= m.files.length - 1,
      "appended files after registration lack ts stats")
    val opened = TableLog.prunedFiles(spark, outDir, "ts", 450L, 460L)
    assert(opened.size < m.files.length,
      s"no manifest pruning on the ingest-time column: ${opened.size} of ${m.files.length}")
    assert(TableLog.readWhere(spark, outDir, "ts", 450L, 460L).count() == 11L)
  }
}
