package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{native, Curation, TextFunctions => TF}
import graft.streaming.Dedup

/** End-to-end training-data pipeline composing the engine's north-star
  * pieces the way a production corpus build runs them (the two-stage
  * medallion shape: a streaming ingest/dedup pass, then batch curation
  * over the keeper set):
  *
  *  1. INGEST+DEDUP (streaming): raw documents arrive as files; the
  *     MinHash band-state pipeline ([[Dedup.minhashVerdicts]]) emits one
  *     restartable verdict per doc; keepers land in a parquet handoff.
  *  2. CURATE (batch): keepers join back to their text; per doc compute
  *     quality signals (stopword ratio, type-token ratio) and the TRUE
  *     BPE token count ([[native.bpe_tokens]]); low-quality docs drop;
  *     the result is a per-language token-budget report — the number a
  *     training run actually plans against.
  *
  * Everything scales by construction: the streaming stage shuffles on
  * band/doc ids, the batch stage is one narrow scan + an equi-join + one
  * aggregation. Used by TrainingDataPipelineSpec at sf0.001.
  */
object TrainingDataPipeline {

  /** Stage 1: stream `docsDir` parquet (doc_id, text, ... ) through
    * near-dup dedup; write verdicts to `verdictDir`; blocks until all
    * currently-available input is processed. Restart-safe via `ckptDir`.
    */
  def streamDedup(spark: SparkSession, docsDir: String, verdictDir: String,
                  ckptDir: String): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(docsDir).schema
    val ds = spark.readStream.schema(schema).parquet(docsDir)
      .select($"doc_id", $"text", $"doc_id".as("seq"))
      .as[(Long, String, Long)]
    val q = Dedup.minhashVerdicts(ds)
      .toDF("doc_id", "seq", "root_doc", "is_keeper")
      .writeStream.format("parquet").option("path", verdictDir)
      .option("checkpointLocation", ckptDir).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
  }

  /** Stage 1.5 (CURATE): keepers → text normalization (NFC + control
    * strip + whitespace collapse) → PII scrub → heuristic quality gate
    * (C4/Gopher word-count, mean-word-length, stopword-diversity, code-
    * and template-page flags) → repetition-quality gate → GPT-style
    * sequence packing. Returns the packing manifest a training run
    * reads: one row per admitted doc with its cleaned text, shard, char
    * offset, owning training window, and straddle count. Every gate is
    * a narrow per-row plan (the NFC kernel's ASCII fast path; regex
    * chains; the O(doc-length) rep_metrics kernel), the packing is one
    * shuffle on the shard key — nothing here widens with corpus size.
    */
  def curate(spark: SparkSession, docsDir: String, verdictDir: String,
             maxTop2Gram: Double = 0.06, maxDup2Gram: Double = 0.05,
             maxDupWord: Double = 0.65,
             packBudget: Long = 8192L, packShards: Long = 8L,
             heurMinWords: Long = 5L, heurMinMeanLen: Double = 3.0,
             heurMaxMeanLen: Double = 10.0, heurMinStopHits: Long = 2L,
             heurStops: Seq[String] = Seq("the", "a", "and", "of", "to", "in"))
            : DataFrame = {
    import spark.implicits._
    val keepers = spark.read.parquet(verdictDir)
      .filter($"is_keeper").select($"doc_id")
    val scrubbed = spark.read.parquet(docsDir)
      .join(keepers, "doc_id")
      .withColumn("norm_text", Curation.normalizeText($"text"))
      .withColumn("clean_text", Curation.piiRedact($"norm_text"))
    val heurKept = Curation.qualityHeuristics(scrubbed, "clean_text",
        heurMinWords, heurMinMeanLen, heurMaxMeanLen, heurMinStopHits, heurStops)
      .filter($"keep")
      .select(scrubbed.columns.map(col): _*)
    val quality = Curation.qualityRepetition(heurKept, "doc_id", "clean_text",
        maxTop2Gram, maxDup2Gram, maxDupWord)
      .filter($"keep")
      .select($"doc_id", $"n_tokens")
    val admitted = heurKept
      .select($"doc_id", $"lang", $"clean_text",
        length($"clean_text").cast("long").as("n_clean_chars"))
      .join(quality, "doc_id")
    Curation.packSequences(admitted, "doc_id", "n_clean_chars",
        packShards, packBudget)
      .select($"doc_id", $"lang", $"clean_text", $"n_tokens", $"shard",
        $"seq_start", $"window_id", $"window_offset", $"n_windows")
  }

  /** Stage 1.75 (DECONTAMINATE): flag corpus docs sharing ≥ `minShared`
    * distinct 3-token shingles with the eval suite, with a Bloom
    * PREFILTER in front of the exact check — the engine's filter-verify
    * shape applied to decontamination. The 2 KiB bitset
    * ([[native.bloom_sketch]] of the eval shingles) attaches to the
    * corpus scan as one broadcast row and drops ~99% of shingles in-row
    * BEFORE the exact eval-set join: when the eval suite is small the
    * exact side broadcasts anyway and the prefilter just cuts probe
    * work, but when it is NOT broadcast-able the exact join is a
    * shuffle, and the prefilter shrinks the shuffled corpus volume to
    * the (tiny) bloom-hit subset. No false negatives: the flagged set is
    * IDENTICAL to the exact-only computation (TrainingDataPipelineSpec
    * pins the equality), because bloom misses nothing that is truly in
    * the set — FPs only cost a wasted verify probe.
    */
  def decontaminate(spark: SparkSession, docs: DataFrame, evalDocs: DataFrame,
                    minShared: Long = 2L): DataFrame = {
    import spark.implicits._
    val evalSh = evalDocs
      .select(explode(TF.shingles3($"text")).as("shingle")).distinct()
    val bits = evalSh.agg(native.bloom_sketch($"shingle").as("bits"))
    val flagged = docs
      .select($"doc_id", explode(TF.shingles3($"text")).as("shingle"))
      .crossJoin(broadcast(bits))
      .filter(native.bloom_contains($"bits", $"shingle")) // 2 KiB prefilter
      .drop("bits")
      .join(evalSh, Seq("shingle")) // exact verify — only bloom survivors
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minShared)
      .select($"doc_id", lit(true).as("contaminated"))
    docs.join(flagged, Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce($"contaminated", lit(false)))
  }

  /** Stage 1.9 (GOVERN): per-domain cap over the curated set — no
    * single source may contribute more than `cap` documents, chosen by
    * deterministic md5(seed, id) priority (the domain_cap query's
    * plan: the rank filter triggers a WindowGroupLimit, so every map
    * task pre-prunes to its local top-N per domain before the one
    * shuffle). A new `seed` is a fresh draw; re-runs with the same
    * seed select the identical survivors. */
  def capPerDomain(docs: DataFrame, domainCol: String, idCol: String,
                   cap: Long, seed: String = "cap-0"): DataFrame =
    graft.functions.Governance
      .capPerDomain(docs, domainCol, idCol, cap, seed)
      .drop("__graft_prio", "__graft_rk")

  /** Stage 2: per-language token budget over the deduped, quality-
    * filtered corpus. `minStopword`/`minTtr` are the usual cheap quality
    * gates (a doc with no stopwords is unlikely to be natural prose; a
    * degenerate type-token ratio flags boilerplate repetition). */
  def tokenBudget(spark: SparkSession, docsDir: String, verdictDir: String,
                  minStopword: Double = 0.0, minTtr: Double = 0.0): DataFrame = {
    import spark.implicits._
    val stopEn = Seq("the", "a", "and", "of", "to", "in")
    val keepers = spark.read.parquet(verdictDir)
      .filter($"is_keeper").select($"doc_id")
    spark.read.parquet(docsDir)
      .join(keepers, "doc_id") // equi-join on the doc key; AQE broadcasts when small
      .withColumn("toks", TF.tokens($"text"))
      .withColumn("stopword_ratio", TF.stopwordRatio($"toks", stopEn))
      .withColumn("ttr", TF.typeTokenRatio($"toks"))
      .filter($"stopword_ratio" >= minStopword && $"ttr" >= minTtr)
      .withColumn("bpe_tokens", size(native.bpe_tokens($"text")).cast("long"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"bpe_tokens").as("token_budget"),
        avg($"stopword_ratio").as("avg_stopword_ratio"))
  }

  /** Stage 0 maintenance loop: a streaming sink whose table does not rot.
    * Micro-batch writers emit a file per (batch × partition); a month of
    * short triggers is 10⁵ kilobyte files. This sink appends each batch,
    * then every `everyNBatches` batches compacts the table to
    * `targetBytes` files and — when `layoutBy` names columns (e.g. a
    * [[graft.functions.Zorder.interleave]] key materialized on the
    * stream) — re-layouts rows so footer min/max stats prune on them:
    * the foreachBatch-driven OPTIMIZE+ZORDER of open-format engines.
    *
    * The table is a [[graft.functions.TableLog]] table: every append and
    * every compaction commits by atomically publishing the next
    * manifest, so readers going through `TableLog.read` get snapshot
    * isolation (a reader racing a live compaction sees exactly the pre-
    * or post-rewrite file set, never a mix and never an uncommitted
    * batch), `dataBytes`-style stats come from manifest metadata instead
    * of an O(files) recursive listing, and exactly-once holds across
    * every crash/replay shape foreachBatch can produce: replays under
    * the SAME checkpoint are deduplicated by the per-checkpoint runKey's
    * committed-batch high-water mark in the manifest, while a restart
    * with a FRESH checkpoint draws a fresh runKey, so its restarted
    * batchId sequence can never collide with a prior generation's
    * commits (both directions spec'd in TrainingDataPipelineSpec /
    * TableLogSpec). Superseded and crash-orphaned files are reclaimed by
    * `TableLog.vacuum` — on startup here, and after each compaction —
    * once they outlive `vacuumGraceMs`, the window an in-flight reader
    * has to finish against its resolved snapshot.
    *
    * Why foreachBatch: maintenance needs a single-writer window, and
    * the space between two micro-batches of THIS writer is exactly that
    * window — the maintenance runs inside the sink's own callback, so no
    * coordination with the ingest is ever needed. (TableLog itself now
    * admits multiple appenders; it is the compact/vacuum leg that must
    * stay one-at-a-time.) Readers see identical rows before and after
    * each maintenance pass (TrainingDataPipelineSpec pins counts across
    * live compactions).
    *
    * `trackStatsFor` registers [[graft.functions.TableLog.trackStats]]
    * columns on the table so every appended file carries their footer
    * min/max from the FIRST commit on (an ingest time the write order
    * already clusters prunes time-ranged reads with no compaction);
    * registration needs a first manifest, so on a brand-new table it
    * lands right after batch 0 — whose files are then the only ones
    * without stats, conservatively kept by every prune.
    */
  def ingestWithMaintenance(input: DataFrame, outDir: String, ckptDir: String,
      targetBytes: Long, everyNBatches: Int, layoutBy: Seq[String] = Nil,
      vacuumGraceMs: Long = 600000L, trackStatsFor: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(everyNBatches >= 1, s"everyNBatches must be >= 1: $everyNBatches")
    require(vacuumGraceMs >= 0L, s"vacuumGraceMs must be >= 0: $vacuumGraceMs")
    val spark = input.sparkSession
    val runKey = graft.functions.TableLog.runKeyFor(spark, ckptDir)
    // a pre-TableLog table (data files, no log) is adopted as manifest 0
    // so its rows become a committed snapshot — NOT unreferenced debris
    // the startup vacuum would reclaim (the upgrade-in-place case).
    // Before adopting, sweep the OLD marker protocol's uncommitted
    // debris: adopt() commits EVERY data file present, so a `b<id>-`
    // file whose batch never reached its marker (a crash mid-append
    // under the pre-log protocol) would otherwise be adopted as
    // committed rows AND re-appended by the same-checkpoint replay —
    // duplicating the batch
    sweepLegacyUncommitted(spark, outDir)
    graft.functions.TableLog.adopt(spark, outDir)
    dropLegacyMarkerDir(spark, outDir)
    // startup sweep: files stranded by a crash (never referenced by any
    // manifest) and expired pre-compaction files go now, not at the
    // first maintenance pass
    graft.functions.TableLog.vacuum(spark, outDir, vacuumGraceMs)
    // stat registration needs a committed manifest: adopted/resumed
    // tables register now, a brand-new table right after its first batch
    var statsRegistered = trackStatsFor.isEmpty
    def ensureTracked(): Unit =
      if (!statsRegistered &&
          graft.functions.TableLog.latest(spark, outDir).isDefined) {
        graft.functions.TableLog.trackStats(spark, outDir, trackStatsFor)
        statsRegistered = true
      }
    ensureTracked()
    input.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.functions.TableLog.appendBatch(batch, outDir, runKey, batchId)
        ensureTracked()
        if ((batchId + 1) % everyNBatches == 0) {
          graft.functions.TableLog.compact(spark, outDir, targetBytes, layoutBy)
          graft.functions.TableLog.vacuum(spark, outDir, vacuumGraceMs)
          () // foreachBatch wants Unit, not the vacuum count
        }
      }
      .start()
  }

  /** Pre-adopt sweep for tables written by the OLD marker protocol this
    * loop used before [[graft.functions.TableLog]]: data files landed
    * under `b<batchId>-` prefixes and a marker in the sibling
    * `<outDir>__batches` dir was the commit point. A crash mid-append
    * left marker-less `b<id>-` files — uncommitted debris the old
    * startup sweep deleted. [[graft.functions.TableLog.adopt]] has no
    * notion of markers and would commit that debris as real rows, so
    * the sweep must run first. No-op once a `_graft_log` exists (every
    * surviving file is then manifest-committed; the marker dir is mere
    * residue for [[dropLegacyMarkerDir]]).
    *
    * What counts as debris: only `b<id>-` files with id STRICTLY ABOVE
    * the highest marker. The old writer replayed at most the LAST
    * uncommitted batch, so only ids past the newest commit can be
    * uncommitted — while ids at or below it may be committed files
    * whose markers the old protocol's tail-pruning (markers older than
    * lastBatch−16 were deleted) already removed; treating those as
    * debris would destroy committed rows at the upgrade. A missing
    * marker dir with `b<id>-` files present is the crash-during-batch-0
    * shape (the old protocol created the dir only at its first commit
    * point): nothing is committed, so every `b<id>-` file is debris —
    * but ONLY when every data file in the dir matches the pattern.
    * A dir holding `part-*` (or any other) data files was never the
    * old protocol's (its writer named every file `b<id>-`); adopting a
    * raw parquet dir that happens to contain a few `b<id>-`-named
    * files must not destroy them. */
  private def sweepLegacyUncommitted(spark: SparkSession, outDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val table = new Path(outDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(table)) return
    if (fs.exists(new Path(outDir.stripSuffix("/"), "_graft_log"))) return
    val markerDir = new Path(outDir.stripSuffix("/") + "__batches")
    val BatchFile = "^b(\\d+)-.*".r
    if (!fs.exists(markerDir)) {
      // no commit point was ever reached: sweep only when the dir is a
      // PURE old-protocol dir (every data file b<id>--named) — anything
      // else is a raw dir being adopted, whose files are real data
      val dataFiles = fs.listStatus(table).filter(f =>
        f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      val pureLegacy = dataFiles.nonEmpty &&
        dataFiles.forall(f => BatchFile.findFirstIn(f.getPath.getName).isDefined)
      if (!pureLegacy) return
    }
    val maxCommitted: Long =
      if (!fs.exists(markerDir)) -1L
      else fs.listStatus(markerDir).iterator
        .map(_.getPath.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
        .map(_.toLong).foldLeft(-1L)(math.max)
    fs.listStatus(table).iterator.foreach { f =>
      f.getPath.getName match {
        case BatchFile(id) if id.toLong > maxCommitted =>
          System.err.println(
            s"[graft] sweeping legacy uncommitted batch-$id file ${f.getPath} before adopt")
          fs.delete(f.getPath, false)
        case _ => ()
      }
    }
  }

  /** Remove the legacy `<outDir>__batches` marker dir once the table is
    * log-committed — the markers' dedup role is taken over by the
    * manifest commit map, and a stale marker dir would make every later
    * startup re-run the legacy-sweep scan for nothing. */
  private def dropLegacyMarkerDir(spark: SparkSession, outDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val markerDir = new Path(outDir.stripSuffix("/") + "__batches")
    val fs = markerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(markerDir)) fs.delete(markerDir, true)
  }
}
