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
    * Why foreachBatch: `Compaction.compactParquet`'s contract is SINGLE
    * WRITER, and the space between two micro-batches of the only writer
    * is exactly that window — the maintenance runs inside the sink's own
    * callback, so no coordination with the ingest is ever needed, and a
    * crash mid-swap is repaired by `Compaction.recover` on restart
    * (called here before the first batch touches the table). Readers see
    * identical rows before and after each maintenance pass
    * (TrainingDataPipelineSpec pins counts across live compactions).
    *
    * Exactly-once despite foreachBatch's at-least-once replay: a naive
    * `mode("append")` would re-append the whole batch when a crash lands
    * between the write and the micro-batch commit (the compaction
    * rewrite is a long such window). Each batch therefore commits
    * through a marker protocol: files land under batch-prefixed names
    * (`b<id>-…`), a marker in the sibling `<outDir>__batches` dir is the
    * commit point, and a replayed batchId either skips entirely (marker
    * present) or first deletes its own partial files (marker absent) —
    * so the WRITER lands every row of every batch exactly once no
    * matter where a crash lands (spec: the crash-replay test re-invokes
    * the batch function by hand). Compaction renames data files, but it
    * runs strictly after the marker, so compacted rows always belong to
    * committed batches. Markers are pruned as the stream advances (only
    * the latest batch can ever replay), so the marker dir stays O(1) —
    * not one file per trigger forever. Start-up also sweeps any
    * marker-less `b<id>-` files left by a crash, so a query restarted
    * with a FRESH checkpoint (new batchId sequence) cannot strand them.
    *
    * Reader caveat, stated plainly: raw parquet directories have no
    * transaction log, so between a crash and the restart's sweep a
    * reader can observe the last UNCOMMITTED batch's rows (and readers
    * racing the compaction swap can see a missing directory for the
    * rename instant — Compaction's documented window). Exactly-once
    * here is the writer/table steady-state contract; snapshot-isolated
    * readers need a table format with a log (Delta/Iceberg), where this
    * whole loop is `OPTIMIZE`.
    */
  def ingestWithMaintenance(input: DataFrame, outDir: String, ckptDir: String,
      targetBytes: Long, everyNBatches: Int,
      layoutBy: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery = {
    require(everyNBatches >= 1, s"everyNBatches must be >= 1: $everyNBatches")
    val spark = input.sparkSession
    val repaired = graft.functions.Compaction.recover(spark, outDir)
    if (repaired != "clean") // debris from a crash mid-swap — repaired
      System.err.println(s"[graft] maintenance recover on $outDir: $repaired")
    sweepUncommitted(spark, outDir)
    input.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchExactlyOnce(batch, outDir, batchId)
        if ((batchId + 1) % everyNBatches == 0) {
          graft.functions.Compaction.compactParquet(spark, outDir, targetBytes, layoutBy)
          () // foreachBatch wants Unit, not the file count
        }
      }
      .start()
  }

  /** The idempotent append of [[ingestWithMaintenance]] (package-visible
    * so the spec can replay a crashed attempt deterministically): write
    * the batch to a staging dir, rename its data files into the table
    * under `b<batchId>-` prefixes, then create the marker — the commit
    * point. Marker present → the whole call is a no-op; marker absent →
    * any `b<batchId>-` files are debris from a crashed attempt and are
    * deleted before the re-append. */
  private[examples] def appendBatchExactlyOnce(batch: DataFrame, outDir: String,
      batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val table = new Path(outDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(outDir.stripSuffix("/") + "__batches", batchId.toString)
    if (fs.exists(marker)) return // committed by a previous attempt
    // debris sweep: a prior attempt of THIS batch may have crashed
    // mid-rename; its files are identifiable by prefix and uncommitted
    if (fs.exists(table)) {
      val prefix = s"b$batchId-"
      fs.listStatus(table).iterator.filter(_.getPath.getName.startsWith(prefix))
        .foreach(f => fs.delete(f.getPath, false))
    }
    val staging = new Path(outDir.stripSuffix("/") + s"__ingest-$batchId")
    batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging.toString)
    fs.mkdirs(table)
    fs.listStatus(staging).iterator
      .filter { f => val n = f.getPath.getName; n.endsWith(".parquet") && !n.startsWith("_") }
      .foreach { f =>
        val dst = new Path(table, s"b$batchId-${f.getPath.getName}")
        if (!fs.rename(f.getPath, dst))
          throw new java.io.IOException(s"could not land ${f.getPath} as $dst")
      }
    fs.delete(staging, true)
    // commit point: marker creation is the atomic "this batch is in"
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
    // prune markers no replay can ever consult again: foreachBatch
    // replays at most the LAST uncommitted batchId, so everything older
    // than a small tail is dead weight — without this, a month of
    // 30-second triggers is ~10^5 empty marker files, the exact
    // small-file rot this loop exists to prevent
    val keepFrom = batchId - 16
    fs.listStatus(marker.getParent).iterator
      .filter { m =>
        val n = m.getPath.getName
        n.forall(_.isDigit) && n.toLong < keepFrom
      }
      .foreach(m => fs.delete(m.getPath, false))
  }

  /** Start-up sweep: delete any `b<id>-` data files whose batch has no
    * commit marker — debris from a crash mid-append that a restart with
    * a FRESH checkpoint (new batchId sequence) would otherwise strand
    * forever. With the original checkpoint the per-batch debris sweep in
    * [[appendBatchExactlyOnce]] covers the same case; this makes the
    * guarantee checkpoint-independent. */
  private def sweepUncommitted(spark: SparkSession, outDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val table = new Path(outDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(table)) return
    val markerDir = new Path(outDir.stripSuffix("/") + "__batches")
    val committed: Set[Long] =
      if (!fs.exists(markerDir)) Set.empty
      else fs.listStatus(markerDir).iterator
        .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toLong).toSet
    val BatchFile = "^b(\\d+)-.*".r
    fs.listStatus(table).iterator.foreach { f =>
      f.getPath.getName match {
        case BatchFile(id) if !committed.contains(id.toLong) =>
          System.err.println(
            s"[graft] sweeping uncommitted batch-$id file ${f.getPath}")
          fs.delete(f.getPath, false)
        case _ =>
      }
    }
  }
}
