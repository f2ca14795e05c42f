package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Bench, Sessions}
import graft.examples.{IndexFollower, TrainingDataPipeline}
import graft.functions.{AnnIndex, TableLog}

/** End-to-end COMPOSED pipeline benchmark (the r11 verdict's #8): one
  * wall-clock number for the full training-data loop, so rounds can
  * regress the system as its stages interact — shared tables, CDC
  * deltas, maintenance racing readers — not just per-query rows.
  *
  * The loop, over `documents ⋈ embeddings` of `SPARK_GRAFT_SF_DIR`:
  *  1. INGEST — 8 doc_id-ranged micro-batches appended into a TableLog
  *     corpus table ([[TableLog.appendBatch]]), `trackStats(doc_id)`
  *     registered after batch 0 so every later file carries prunable
  *     bounds from its first commit.
  *  2. DEDUP VERDICTS — the corpus streamed through the MinHash
  *     band-state dedup ([[graft.streaming.Dedup.minhashVerdicts]]) via
  *     the version-offset tail ([[TableLog.readTailVersions]]), RocksDB
  *     state, verdicts parquet'd for the curate join (stage 1 of the
  *     medallion shape TrainingDataPipeline documents).
  *  3. MAINTAIN — compact to doc_id layout + vacuum under a real grace
  *     (readers in flight keep their snapshots; CDC must not re-emit).
  *  4. FOLLOW — [[IndexFollower.catchUp]] builds the dedup signature
  *     index AND the ANN probe index from the table's CDC deltas
  *     (span-keyed: the 8-version backlog clears in one apply).
  *  5. CURATE + BUDGET — keepers handed off, then the batch curation
  *     chain (normalize → PII → heuristics → repetition → packing) and
  *     the per-language token budget ([[TrainingDataPipeline.curate]] /
  *     [[TrainingDataPipeline.tokenBudget]]).
  *  6. TAKEDOWN — a 20-id compliance removal through
  *     [[IndexFollower.takedown]]: corpus delete + index delete + ANN
  *     tombstone, the coordinated write the loop must absorb.
  *
  * Prints ONE JSON line with per-stage seconds and the same env probe
  * as [[graft.Bench]] (load1 / other JVMs / single-core CPU probe), so
  * cross-round drift adjudication stays mechanical. */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val env = Bench.contentionEnv()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = Sessions.local(appName = "graft-pipelinebench")
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val corpus = spark.read.parquet(sfDir + "/documents.parquet")
      .join(spark.read.parquet(sfDir + "/embeddings.parquet")
        .withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .select($"doc_id", $"text", $"lang", $"source", $"embedding")
      .cache()
    val nDocs = corpus.count()
    val ids = corpus.select($"doc_id").as[Long].collect().sorted

    val root = Files.createTempDirectory("graft_pipebench")
    val corpusDir = root.toString + "/corpus"
    val verdictDir = root.toString + "/verdicts"
    val handoffDir = root.toString + "/handoff"
    val ddxDir = root.toString + "/dedup_index"
    val stateDir = root.toString + "/follower_state"

    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // 1) INGEST: 8 contiguous doc_id ranges — the write order clusters
    //    the stat column, as an ingest-time column would be in production
    val nb = 8
    val cuts = (0 to nb).map(i => ids(math.min(ids.length - 1,
      i * ids.length / nb))).toVector
    val t1 = System.nanoTime()
    (0 until nb).foreach { b =>
      val hi = if (b == nb - 1) Long.MaxValue else cuts(b + 1)
      TableLog.appendBatch(
        corpus.filter($"doc_id" >= cuts(b) && $"doc_id" < hi),
        corpusDir, "ingest", b.toLong)
      if (b == 0) TableLog.trackStats(spark, corpusDir, Seq("doc_id"))
    }
    val ingestSec = sec(t1)

    // 2) DEDUP VERDICTS through the version-offset tail
    val t2 = System.nanoTime()
    val vq = graft.streaming.Dedup.minhashVerdicts(
        TableLog.readTailVersions(spark, corpusDir, since = Some(-1L))
          .select($"doc_id", $"text", $"doc_id".as("seq"))
          .as[(Long, String, Long)])
      .toDF("doc_id", "seq", "root_doc", "is_keeper")
      .writeStream.format("parquet").option("path", verdictDir)
      .option("checkpointLocation", root.toString + "/verdict_ck")
      .outputMode("append").start()
    vq.processAllAvailable(); vq.stop()
    val verdictSec = sec(t2)

    // 3) MAINTAIN: re-layout + reclaim, with CDC consumers still pending
    val t3 = System.nanoTime()
    TableLog.compact(spark, corpusDir, targetBytes = 32L << 20,
      layoutBy = Seq("doc_id"))
    TableLog.vacuum(spark, corpusDir, graceMs = 600000L)
    val maintainSec = sec(t3)

    // 4) FOLLOW: both indexes from the CDC deltas, one span apply
    val emptyCorpus = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id LONG, embedding ARRAY<FLOAT>"))
    val ann = AnnIndex.build(emptyCorpus, "pipebench_ann",
      planes = 8, buckets = 16)
    val t4 = System.nanoTime()
    IndexFollower.catchUp(spark, corpusDir, stateDir, ann, ddxDir)
    val followSec = sec(t4)

    // 5) CURATE + BUDGET over the keeper handoff
    val t5 = System.nanoTime()
    TableLog.read(spark, corpusDir).drop("embedding")
      .write.parquet(handoffDir)
    val curated = TrainingDataPipeline.curate(spark, handoffDir, verdictDir)
    val nCurated = curated.count()
    val budget = TrainingDataPipeline.tokenBudget(spark, handoffDir, verdictDir)
      .agg(sum($"token_budget")).as[Long].collect().headOption.getOrElse(0L)
    val curateSec = sec(t5)

    // 6) TAKEDOWN: 20 ids spread across the id range
    val victims = (0 until 20).map(i => ids(i * (ids.length / 20))).distinct
    val t6 = System.nanoTime()
    val td = IndexFollower.takedown(spark, corpusDir, ddxDir, ann, victims)
    val takedownSec = sec(t6)
    require(td.corpusRows == victims.length,
      s"takedown removed ${td.corpusRows} corpus rows, expected ${victims.length}")

    val total = ingestSec + verdictSec + maintainSec + followSec +
      curateSec + takedownSec
    corpus.unpersist()
    println(f"""{"metric":"pipeline_total","value":$total%.2f,"unit":"sec","stages":{"ingest":$ingestSec%.2f,"dedup_verdicts":$verdictSec%.2f,"maintain":$maintainSec%.2f,"follow":$followSec%.2f,"curate":$curateSec%.2f,"takedown":$takedownSec%.2f},"docs":$nDocs,"curated_docs":$nCurated,"token_budget":$budget,"env":$env,"sf":"$sfDir"}""")
    spark.stop()
  }
}
