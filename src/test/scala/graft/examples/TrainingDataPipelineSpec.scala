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
}
